"""Mediation path fitting + clustered bootstrap tests."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.models.mediation import (fit_mediation_model,
                                      bootstrap_indirect_effect,
                                      apply_fdr_and_enrich,
                                      join_omnibus_direct_effects,
                                      extract_report_ready_mediation_table,
                                      _classify_mediation_type,
                                      fetch_mediation_hypotheses)


def make_mediation_frame(n_subj=12, n_per=14, a=1.0, b=0.8, direct=0.2,
                         seed=0):
    """X → M → Y with known paths; Silence vs Happy contrast."""
    rng = np.random.default_rng(seed)
    rows = []
    re_m = rng.normal(0, 0.5, n_subj)
    re_y = rng.normal(0, 0.5, n_subj)
    for s in range(n_subj):
        for t in range(n_per):
            cond = "Happy" if t % 2 == 0 else "Silence"
            x = 1.0 if cond == "Happy" else 0.0
            m = a * x + re_m[s] + rng.normal(0, 0.5)
            y = b * m + direct * x + re_y[s] + rng.normal(0, 0.5)
            rows.append({"Subject ID": s, "Category or Silence": cond,
                         "GSR": m, "CMC_Flexor_max_beta": y})
    return pd.DataFrame(rows)


class TestPaths:
    def test_recovers_path_coefficients(self):
        df = make_mediation_frame()
        fit = fit_mediation_model(df, "Category or Silence",
                                  ("Happy", "Silence"), "GSR",
                                  "CMC_Flexor_max_beta")
        assert fit["status"] == "fitted"
        assert abs(fit["coef_a"] - 1.0) < 0.3
        assert abs(fit["coef_b"] - 0.8) < 0.3
        assert abs(fit["coef_cprime"] - 0.2) < 0.3
        # total ≈ direct + indirect
        assert abs(fit["coef_c"] - (0.2 + 0.8)) < 0.35
        assert abs(fit["indirect_effect"]
                   - fit["coef_a"] * fit["coef_b"]) < 1e-9

    def test_insufficient_data(self):
        df = make_mediation_frame(n_subj=3, n_per=2)
        fit = fit_mediation_model(df, "Category or Silence",
                                  ("Happy", "Silence"), "GSR",
                                  "CMC_Flexor_max_beta")
        assert fit["status"] == "insufficient_data"

    def test_missing_columns(self):
        fit = fit_mediation_model(pd.DataFrame({"a": [1]}), "X",
                                  ("A", "B"), "M", "Y")
        assert fit["status"] == "skipped_missing_columns"

    def test_hypothesis_configs(self):
        hyps = fetch_mediation_hypotheses()
        assert len(hyps) == 4
        assert all(len(h["y_vars"]) == 8 for h in hyps)


class TestBootstrap:
    def test_real_indirect_effect_significant(self):
        df = make_mediation_frame(a=1.2, b=1.0)
        fit = fit_mediation_model(df, "Category or Silence",
                                  ("Happy", "Silence"), "GSR",
                                  "CMC_Flexor_max_beta")
        boot = bootstrap_indirect_effect(fit, n_bootstrap=400)
        assert boot["bootstrap_status"] == "computed"
        assert boot["significant"]
        assert boot["ci_lower"] > 0
        # CI brackets the point estimate
        assert boot["ci_lower"] <= fit["indirect_effect"] \
            <= boot["ci_upper"]
        assert boot["bootstrap_p"] <= 0.05

    def test_null_indirect_not_significant(self):
        df = make_mediation_frame(a=0.0, b=0.0, direct=1.0, seed=3)
        fit = fit_mediation_model(df, "Category or Silence",
                                  ("Happy", "Silence"), "GSR",
                                  "CMC_Flexor_max_beta")
        boot = bootstrap_indirect_effect(fit, n_bootstrap=400)
        assert boot["bootstrap_status"] == "computed"
        assert not boot["significant"]

    def test_unfitted_passthrough(self):
        out = bootstrap_indirect_effect({"status": "insufficient_data"})
        assert out["bootstrap_status"] == "insufficient_data"
        assert np.isnan(out["ci_lower"])


class TestTaxonomyAndTables:
    def test_classification(self):
        assert _classify_mediation_type(0.01, 0.5, 1.0, 0.1, True) == \
            "full"
        assert _classify_mediation_type(0.01, 0.01, 1.0, 0.5, True) == \
            "partial"
        assert _classify_mediation_type(0.5, 0.5, 1.0, 0.5, True) == \
            "indirect_only"
        assert _classify_mediation_type(0.01, 0.01, 1.0, -0.5, True) == \
            "competitive"
        assert _classify_mediation_type(0.01, 0.5, 1.0, 0.1, False) == \
            "no_mediation"
        assert _classify_mediation_type(np.nan, 0.5, 1.0, 0.1, True) == \
            "unclassifiable"

    def test_full_pipeline_to_report_table(self):
        df = make_mediation_frame(a=1.2, b=1.0)
        fit = fit_mediation_model(df, "Category or Silence",
                                  ("Happy", "Silence"), "GSR",
                                  "CMC_Flexor_max_beta")
        boot = bootstrap_indirect_effect(fit, n_bootstrap=300)
        row = {**{k: v for k, v in fit.items() if k != "model_df"},
               **boot}
        frame = pd.DataFrame([row, row])  # two rows → FDR family works
        frame.loc[1, "outcome"] = "CMC_Flexor_max_beta"
        enriched = apply_fdr_and_enrich(frame)
        assert "mediation_type" in enriched.columns
        assert enriched["p_indirect_fdr"].notna().all()

        omnibus = pd.DataFrame([{
            "Model_Type": "LME", "N. Segments": 1,
            "Dependent_Variable": "CMC_Flexor_max_beta",
            "Parameter": "C(Q('Category or Silence'))[T.Happy]",
            "Coefficient": 1.0, "p_value_adjusted": 0.001,
            "Cohen_d": 0.9}])
        joined = join_omnibus_direct_effects(enriched, omnibus)
        assert joined["omnibus_sig"].all()
        table = extract_report_ready_mediation_table(joined)
        assert not table.empty
        assert "Indirect_a_times_b" in table.columns
        assert table["Indirect_Significant"].all()
