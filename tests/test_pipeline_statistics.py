"""Statistical-modelling orchestration tests (reference workflow shapes)."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline import statistical_modelling as sm


def make_stats_frame(n_subj=10, n_trials=18, n_segments=1, effect=1.2,
                     seed=0):
    """Synthetic 'Combined Statistics Nseg'-like frame with known effects."""
    rng = np.random.default_rng(seed)
    rows = []
    re = rng.normal(0, 1.0, n_subj)
    cats = ["Silence", "Happy", "Sad"]
    for s in range(n_subj):
        for t in range(n_trials):
            cond = cats[t % 3]
            beta_effect = {"Silence": 0.0, "Happy": effect,
                           "Sad": -effect / 2}[cond]
            force = rng.uniform(0.2, 0.8)
            for seg in range(n_segments):
                y = (2.0 + beta_effect + 0.8 * force + re[s]
                     + rng.normal(0, 0.8))
                rows.append({
                    "Subject ID": s, "Trial ID": t, "Segment ID": seg,
                    "N. Segments": n_segments,
                    "Category or Silence": cond,
                    "Median Force Level [0-1]": force,
                    "CMC_Flexor_max_beta": y})
    return pd.DataFrame(rows)


LEVEL_DEFS = [
    {"df_filter": None,
     "condition_vars": {"Category or Silence": "categorical"},
     "reference_categories": {"Category or Silence": "Silence"},
     "explanatory_vars": ["Median Force Level [0-1]"],
     "moderation_pairs": None},
    {"df_filter": lambda df: df[df["Category or Silence"] != "Sad"],
     "condition_vars": {"Category or Silence": "categorical"},
     "reference_categories": {"Category or Silence": "Silence"},
     "explanatory_vars": [], "moderation_pairs": None},
]


class TestFitBothModels:
    def test_ols_and_lme_recover_effect(self):
        df = make_stats_frame()
        out = sm.fit_both_models(
            df, "CMC_Flexor_max_beta",
            {"Category or Silence": "categorical"},
            ["Median Force Level [0-1]"], "Level 0", "H2", verbose=False,
            reference_categories={"Category or Silence": "Silence"})
        for model_type in ("OLS", "LME"):
            res = out[model_type]["results_df"]
            happy = res.loc[res["Parameter"]
                            == "C(Q('Category or Silence'))[T.Happy]"]
            assert abs(happy["Coefficient"].iloc[0] - 1.2) < 0.35
            assert happy["p-value (adjusted)"].iloc[0] < 0.01
            # sentinels present
            assert "__residual_std__" in set(res["Parameter"])
            assert "__re_std__" in set(res["Parameter"])
        # LME splits variance: re_std ≈ 1.0, residual ≈ 0.8
        lme = out["LME"]["results_df"]
        re_std = lme.loc[lme["Parameter"] == "__re_std__",
                         "Coefficient"].iloc[0]
        res_std = lme.loc[lme["Parameter"] == "__residual_std__",
                          "Coefficient"].iloc[0]
        assert abs(re_std - 1.0) < 0.5
        assert abs(res_std - 0.8) < 0.15
        assert out["LME"]["diagnostics"]["icc"] > 0.3

    def test_rank_deficient_lme_returns_none(self):
        df = make_stats_frame(n_subj=4, n_trials=6)
        df["dup"] = df["Median Force Level [0-1]"]
        out = sm.fit_mixed_effects_model(
            df, "CMC_Flexor_max_beta", {},
            ["Median Force Level [0-1]", "dup"], verbose=False)
        assert out is None


class TestRunModelLevels:
    def test_accumulates_all_levels(self):
        df = make_stats_frame()
        results, diags = [], []
        sm.run_model_levels(df, LEVEL_DEFS, "CMC_Flexor_max_beta", "H2",
                            1, results, diags, verbose=False)
        frame = pd.DataFrame(results)
        assert set(frame["Model_Type"]) == {"OLS", "LME"}
        levels = set(frame["Comparison_Level"])
        assert any(l.startswith("Level 0 ") for l in levels)
        assert any(l.startswith("Level 1 ") for l in levels)
        # level name synthesis
        assert "Level 0 (Category or Silence + Force)" in levels
        # diagnostics rows: 2 levels × 2 models
        assert len(diags) == 4
        # Cohen's d present for real params, absent for sentinels
        happy = frame[frame["Parameter"].str.contains("T.Happy")]
        assert happy["Cohen_d"].notna().all()
        sent = frame[frame["Parameter"] == "__re_std__"]
        assert sent["Cohen_d"].isna().all()


class TestFdrCorrection:
    def test_strata_and_sentinel_exclusion(self):
        df = make_stats_frame()
        results, diags = [], []
        sm.run_model_levels(df, LEVEL_DEFS, "CMC_Flexor_max_beta", "H2",
                            1, results, diags, verbose=False)
        frame = pd.DataFrame(results)
        frame["N. Segments"] = 1
        out = sm.apply_fdr_correction(frame, levels_to_correct=[1])
        assert "p_value_fdr" in out.columns
        # level 0 rows untouched
        lvl0 = out[out["Comparison_Level"].str.startswith("Level 0")]
        assert lvl0["p_value_fdr"].isna().all()
        # sentinels excluded
        sent = out[out["Parameter"].str.startswith("__")]
        assert sent["p_value_fdr"].isna().all()
        # corrected p >= raw p
        lvl1 = out[out["Comparison_Level"].str.startswith("Level 1")
                   & ~out["Parameter"].str.startswith("__")
                   & (out["Parameter"] != "Intercept")]
        valid = lvl1.dropna(subset=["p_value_fdr"])
        assert (valid["p_value_fdr"] >= valid["p_value_adjusted"]
                - 1e-12).all()
        assert "p_value_for_plot" in out.columns


class TestInfluence:
    def test_loso_dfbeta_cooks(self, tmp_path):
        df = make_stats_frame(n_subj=6, n_trials=9)
        # save as the artifact the workflow reads
        feature_dir = tmp_path / "features"
        feature_dir.mkdir()
        df.to_csv(feature_dir
                  / "2024-01-01 10_00_00 Combined Statistics 1seg.csv",
                  index=False)
        # full-fit results frame
        results, diags = [], []
        sm.run_model_levels(df, LEVEL_DEFS, "CMC_Flexor_max_beta", "H2",
                            1, results, diags, verbose=False)
        full = pd.DataFrame(results)
        full["N. Segments"] = 1

        out = sm.run_influence_analysis(
            configs=[("CMC_Flexor_max_beta", 0, 1)],
            full_results_df=full, feature_output_data=feature_dir,
            statistics_output_data=tmp_path,
            fetch_level_definitions=lambda multi: LEVEL_DEFS)
        assert set(out["Subject_ID"]) == set(range(6))
        assert (out["CooksD"] >= 0).all()
        assert out["CooksD_Threshold"].iloc[0] == pytest.approx(4 / 6)
        assert len(list(tmp_path.glob("*Influence Analysis Combined.csv")))

    def test_loso_ols_only_matches_full_refit(self):
        """The LOSO loop now requests OLS-only refits (the influence
        computation consumes only Model_Type == 'OLS' rows); influence
        inputs must be identical to a both-models refit (VERDICT r4
        #7 — the per-drop REML fits were pure waste)."""
        df = make_stats_frame(n_subj=5, n_trials=8)

        def both_models(*a, **kw):        # legacy double: no `models`
            kw.pop("models", None)
            return sm.run_model_levels(*a, **kw)

        fast = sm._run_loso(df, "CMC_Flexor_max_beta", 0, 1,
                            lambda multi: LEVEL_DEFS)
        slow = sm._run_loso(df, "CMC_Flexor_max_beta", 0, 1,
                            lambda multi: LEVEL_DEFS,
                            run_model_levels_fn=both_models)
        assert set(fast["Model_Type"]) == {"OLS"}
        assert {"OLS", "LME"} <= set(slow["Model_Type"])
        cols = ["Parameter", "Coefficient", "SE",
                "Dropped Subject ID", "Comparison_Level"]
        slow_ols = (slow[slow["Model_Type"] == "OLS"][cols]
                    .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            fast[cols].reset_index(drop=True), slow_ols)


class TestPower:
    def test_power_analysis_end_to_end(self, tmp_path):
        df = make_stats_frame(n_subj=10, n_trials=12, effect=1.5)
        feature_dir = tmp_path / "features"
        feature_dir.mkdir()
        df.to_csv(feature_dir
                  / "2024-01-01 10_00_00 Combined Statistics 1seg.csv",
                  index=False)
        results, diags = [], []
        sm.run_model_levels(df, LEVEL_DEFS, "CMC_Flexor_max_beta", "H2",
                            1, results, diags, levels_to_include=[0],
                            verbose=False)
        full = pd.DataFrame(results)
        full["N. Segments"] = 1

        cfg = sm.PowerConfig(
            dependent_var="CMC_Flexor_max_beta", comp_lvl=0, n_segments=1,
            target_parameters=["C(Q('Category or Silence'))[T.Happy]"],
            n_simulations=150, effect_multipliers=[0.1, 1.0, 2.0])
        mde_df, curve_df = sm.run_power_analysis(
            [cfg], full, feature_dir, tmp_path,
            fetch_level_definitions=lambda multi: LEVEL_DEFS)
        assert len(mde_df) == 1
        powers = curve_df.sort_values("Effect_Multiplier")["Power"].values
        assert powers[0] < powers[2]          # monotone power curve
        assert powers[2] > 0.8                # strong effect well-powered
        assert mde_df["Power_at_Observed_Effect"].iloc[0] == powers[1]
        assert len(list(tmp_path.glob("*Power Analysis MDE Summary.csv")))


class TestSubjectSummary:
    def test_contrast_and_responder_flags(self, tmp_path):
        df = make_stats_frame(n_subj=5, n_trials=9)
        results, diags = [], []
        sm.run_model_levels(df, LEVEL_DEFS, "CMC_Flexor_max_beta", "H2",
                            1, results, diags, levels_to_include=[0],
                            verbose=False)
        combined = sm.create_subject_effect_summary(
            results, df, tmp_path, LEVEL_DEFS)
        assert not combined.empty
        happy = combined[combined["Condition"] == "Happy"]
        # positive planted effect → most subjects flagged responders
        assert happy["Responder_Flag"].mean() > 0.6
        assert "Normalised_Contrast" in combined.columns


class TestMarkers:
    def test_significance_stars(self):
        df = pd.DataFrame({"p_value": [0.0001, 0.005, 0.03, 0.5, np.nan]})
        out = sm.add_significance_markers(df)
        assert list(out["p_value_sig"]) == ["***", "**", "*", "", ""]


class TestSummaryTables:
    @pytest.fixture
    def results_frame(self):
        return pd.DataFrame({
            "Hypothesis": ["H1"] * 6 + ["H2"] * 2,
            "Comparison_Level": ["Level 0 (music vs silence)"] * 4
            + ["Level 1 (categories)"] * 4,
            "Model_Type": ["OLS", "LME"] * 4,
            "Parameter": ["Intercept", "Intercept",
                          "Music Listening[T.True]",
                          "Music Listening[T.True]",
                          "__residual_std__", "__re_std__",
                          "Force", "Force"],
            "Coefficient": [1.0, 1.1, 0.3, 0.35, 0.5, 0.2, -0.1, -0.12],
            "p_value": [0.5, 0.4, 0.004, 0.02, np.nan, np.nan,
                        0.2, 0.03],
            "p_value_adjusted": [0.6, 0.5, 0.009, 0.04, np.nan,
                                 np.nan, 0.3, 0.06],
        })

    def test_create_summary_table_pivot_and_stars(self, results_frame,
                                                  tmp_path):
        table = sm.create_summary_table(
            results_frame,
            filter_conditions={
                "Parameter": lambda p: "Intercept" not in p
                and not p.startswith("__")},
            index_cols=["Parameter"], output_file="t.csv",
            output_dir=tmp_path, verbose=False)
        assert set(table["Parameter"]) == {"Music Listening[T.True]",
                                           "Force"}
        assert "Coefficient_OLS" in table.columns
        assert "Sig_LME" in table.columns
        music = table[table["Parameter"] == "Music Listening[T.True]"]
        assert music["Sig_OLS"].iloc[0] == "**"
        assert (tmp_path / "t.csv").exists()

    def test_display_summary_statistics_counts(self, results_frame):
        out = sm.display_summary_statistics(
            results_frame, printer=lambda *_: None)
        assert out["total"] == 6            # sentinels stripped
        assert out["counts"][0.05] == 3
        assert out["by_model"]["LME"] == (3, 2)

    def test_display_significant_effects_excludes_intercepts(
            self, results_frame):
        sig = sm.display_significant_effects(
            results_frame, printer=lambda *_: None)
        assert list(sig["p_value"]) == sorted(sig["p_value"])
        assert not sig["Parameter"].str.contains("Intercept").any()
        assert len(sig) == 3

    def test_generate_all_summary_tables(self, results_frame, tmp_path):
        diag = pd.DataFrame({
            "Model_Type": ["OLS", "LME"],
            "Shapiro_p": [0.3, 0.01], "AIC": [np.nan, 12.3]})
        written = sm.generate_all_summary_tables(
            results_frame, tmp_path, diagnostics_df=diag,
            file_identifier="toy", generate_per_level_tables=True,
            generate_thematic_tables=True, verbose=False)
        assert "MASTER TABLE" in written
        master = written["MASTER TABLE"]
        assert not master["Parameter"].str.startswith("__").any()
        assert "Significance" in master.columns
        assert "MUSIC EFFECTS" in written
        assert "FORCE EFFECTS" in written
        assert "SIGNIFICANT EFFECTS" in written
        sig = written["SIGNIFICANT EFFECTS"]
        assert (sig["Significance_adjusted"]
                .isin(["*", "**", "***"])).all()
        assert list(tmp_path.glob("*summary_all_results_master_toy*"))
        assert list(tmp_path.glob("*summary_level0*"))

    def test_load_recent_frames(self, tmp_path):
        from mba_tpu.utils.file_management import file_title
        pd.DataFrame({"a": [1]}).to_csv(
            tmp_path / file_title("All Time Resolutions Results",
                                  ".csv"), index=False)
        pd.DataFrame({"b": [2]}).to_csv(
            tmp_path / file_title("All Time Resolutions Diagnostics",
                                  ".csv"), index=False)
        assert sm.load_recent_results_frame(
            tmp_path)["a"].iloc[0] == 1
        assert sm.load_recent_diagnostics_frame(
            tmp_path)["b"].iloc[0] == 2
