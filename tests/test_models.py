"""Design-matrix, OLS, REML-LME, and FDR correctness tests."""
import numpy as np
import pandas as pd
import pytest
from scipy import stats

from mba_tpu.models.formula import (build_design_matrix, build_formula,
                                    apply_reference_categories)
from mba_tpu.models.ols import fit_ols
from mba_tpu.models.lme import fit_random_intercept_reml, batched_lme_pvalues
from mba_tpu.models.fdr import benjamini_hochberg


def _frame(n_subj=10, n_per=20, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    re = rng.normal(0, 2.0, n_subj)           # random intercepts
    for s in range(n_subj):
        for t in range(n_per):
            cond = ["Silence", "Happy", "Sad"][t % 3]
            force = rng.uniform(0, 1)
            effect = {"Silence": 0.0, "Happy": 1.5, "Sad": -0.8}[cond]
            y = 5.0 + effect + 2.0 * force + re[s] + rng.normal(0, 1.0)
            rows.append({"Subject ID": s, "Trial ID": t,
                         "Category or Silence": cond,
                         "Median Force Level [0-1]": force, "DV": y})
    return pd.DataFrame(rows)


class TestFormula:
    def test_parameter_names_patsy_convention(self):
        df = _frame()
        X, names = build_design_matrix(
            df, {"Category or Silence": "categorical"},
            ["Median Force Level [0-1]"],
            reference_categories={"Category or Silence": "Silence"})
        assert names[0] == "Intercept"
        assert "C(Q('Category or Silence'))[T.Happy]" in names
        assert "C(Q('Category or Silence'))[T.Sad]" in names
        assert "Q('Median Force Level [0-1]')" in names
        # reference level first → no [T.Silence] column
        assert not any("Silence]" in n for n in names)
        assert X.shape == (len(df), 4)

    def test_formula_string(self):
        f = build_formula("DV", {"Cat": "categorical", "Ord": "ordinal"},
                          ["Var X"], moderation_pairs=[("Cat", "Mod")])
        assert f == ("DV ~ C(Cat) + Ord + Q('Var X') + Mod + C(Cat):Mod")

    def test_interaction_columns(self):
        df = _frame()
        df["Skill"] = np.tile([0.0, 1.0], len(df) // 2)
        X, names = build_design_matrix(
            df, {"Category or Silence": "categorical"}, [],
            moderation_pairs=[("Category or Silence", "Skill")],
            reference_categories={"Category or Silence": "Silence"})
        assert "Skill" in names
        assert "C(Q('Category or Silence'))[T.Happy]:Skill" in names
        i_main = names.index("C(Q('Category or Silence'))[T.Happy]")
        i_skill = names.index("Skill")
        i_int = names.index("C(Q('Category or Silence'))[T.Happy]:Skill")
        np.testing.assert_allclose(X[:, i_int], X[:, i_main] * X[:, i_skill])

    def test_reference_reordering(self):
        df = _frame()
        out = apply_reference_categories(
            df.copy(), {"Category or Silence": "categorical"},
            {"Category or Silence": "Sad"})
        assert out["Category or Silence"].cat.categories[0] == "Sad"


class TestOls:
    def test_recovers_coefficients(self):
        df = _frame()
        X, names = build_design_matrix(
            df, {"Category or Silence": "categorical"},
            ["Median Force Level [0-1]"],
            reference_categories={"Category or Silence": "Silence"})
        fit = fit_ols(X, df["DV"].to_numpy())
        coef = dict(zip(names, fit["params"]))
        assert abs(coef["C(Q('Category or Silence'))[T.Happy]"] - 1.5) < 0.4
        assert abs(coef["Q('Median Force Level [0-1]')"] - 2.0) < 0.6
        assert 0 < fit["rsquared"] < 1
        assert fit["pvalues"][names.index(
            "C(Q('Category or Silence'))[T.Happy]")] < 0.01

    def test_matches_analytic_simple_regression(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(50)
        y = 3 + 0.5 * x + rng.standard_normal(50) * 0.1
        X = np.stack([np.ones(50), x], 1)
        fit = fit_ols(X, y)
        slope, intercept, r, p, se = stats.linregress(x, y)
        np.testing.assert_allclose(fit["params"], [intercept, slope],
                                   rtol=1e-10)
        np.testing.assert_allclose(fit["bse"][1], se, rtol=1e-8)
        np.testing.assert_allclose(fit["pvalues"][1], p, rtol=1e-6,
                                   atol=1e-12)


class TestLme:
    def test_recovers_variance_components(self):
        df = _frame(n_subj=20, n_per=30)
        X, names = build_design_matrix(
            df, {"Category or Silence": "categorical"},
            ["Median Force Level [0-1]"],
            reference_categories={"Category or Silence": "Silence"})
        fit = fit_random_intercept_reml(X, df["DV"].to_numpy(),
                                        df["Subject ID"].to_numpy(), names)
        # generative: σ_e = 1.0, σ_b = 2.0
        assert abs(np.sqrt(fit["scale"]) - 1.0) < 0.15
        assert abs(np.sqrt(fit["cov_re"]) - 2.0) < 0.8
        coef = fit["fe_params"]
        assert abs(coef["C(Q('Category or Silence'))[T.Happy]"] - 1.5) < 0.3
        assert fit["converged"]
        assert len(fit["random_effects"]) == 20
        # BLUPs correlate with true random intercepts? shrinkage towards 0
        assert np.std(list(fit["random_effects"].values())) > 0.5

    def test_zero_group_variance_boundary(self):
        rng = np.random.default_rng(2)
        n = 300
        X = np.stack([np.ones(n), rng.standard_normal(n)], 1)
        y = 1 + 0.5 * X[:, 1] + rng.standard_normal(n)
        groups = np.repeat(np.arange(10), 30)
        fit = fit_random_intercept_reml(X, y, groups)
        assert np.sqrt(fit["cov_re"]) < 0.2   # ≈ no between-group variance
        assert abs(fit["params"][1] - 0.5) < 0.2

    def test_rank_deficient_raises(self):
        X = np.ones((30, 2))  # duplicated column
        with pytest.raises(np.linalg.LinAlgError, match="Rank-deficient"):
            fit_random_intercept_reml(X, np.random.randn(30),
                                      np.repeat([0, 1, 2], 10))

    def test_se_larger_than_ols_for_between_subject_effect(self):
        # a between-subject covariate must have inflated SEs under LME
        rng = np.random.default_rng(3)
        n_subj, n_per = 12, 25
        subj_trait = rng.standard_normal(n_subj)
        groups = np.repeat(np.arange(n_subj), n_per)
        x = subj_trait[groups]
        y = (0.3 * x + rng.normal(0, 1.5, n_subj)[groups]
             + rng.normal(0, 1.0, n_subj * n_per))
        X = np.stack([np.ones_like(x), x], 1)
        lme = fit_random_intercept_reml(X, y, groups)
        ols = fit_ols(X, y)
        assert lme["bse"][1] > 1.5 * ols["bse"][1]


class TestBatchedLme:
    def test_matches_host_solver(self):
        df = _frame(n_subj=8, n_per=12, seed=5)
        X, names = build_design_matrix(
            df, {"Category or Silence": "categorical"}, [],
            reference_categories={"Category or Silence": "Silence"})
        y = df["DV"].to_numpy()
        groups = df["Subject ID"].to_numpy()
        host = fit_random_intercept_reml(X, y, groups, names)
        batch = batched_lme_pvalues(X, y[None, :], groups)
        np.testing.assert_allclose(batch["beta"][0], host["params"],
                                   rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(batch["bse"][0], host["bse"],
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(batch["scale"][0], host["scale"],
                                   rtol=5e-3)

    def test_power_simulation_shape_and_monotonicity(self):
        # power grows with effect size in a batched simulate+refit sweep
        rng = np.random.default_rng(7)
        n_subj, n_per = 10, 10
        n = n_subj * n_per
        groups = np.repeat(np.arange(n_subj), n_per)
        x = rng.standard_normal(n)
        X = np.stack([np.ones(n), x], 1)
        n_sims = 200
        powers = []
        for effect in (0.0, 0.3, 1.0):
            re = rng.normal(0, 1.0, (n_sims, n_subj))
            eps = rng.normal(0, 1.0, (n_sims, n))
            Y = effect * x[None, :] + re[:, groups] + eps
            out = batched_lme_pvalues(X, Y, groups)
            powers.append((out["pvalues"][:, 1] < 0.05).mean())
        assert powers[0] < 0.15          # ≈ alpha under the null
        assert powers[1] < powers[2]     # monotone in effect size
        assert powers[2] > 0.9


class TestFdr:
    def test_matches_reference_algorithm(self):
        rng = np.random.default_rng(0)
        p = np.concatenate([rng.uniform(0, 0.01, 5),
                            rng.uniform(0.2, 1, 20)])
        reject, p_adj = benjamini_hochberg(p, alpha=0.05)
        assert reject[:5].all()
        assert p_adj.min() >= p.min()
        assert (p_adj <= 1).all()
        # known example (Benjamini & Hochberg 1995 style)
        p2 = np.array([0.01, 0.04, 0.03, 0.005])
        rej2, adj2 = benjamini_hochberg(p2, alpha=0.05)
        np.testing.assert_allclose(
            adj2, [0.02, 0.04, 0.04, 0.02])
        assert rej2.all()


class TestStatisticalCalibration:
    """Under the null the inferential chain must be calibrated: p-values
    ~ Uniform(0,1), type-I error ~ alpha. This validates the whole
    batched REML pipeline statistically, not just against one fit."""

    def test_null_pvalues_uniform(self):
        from scipy import stats as sps
        rng = np.random.default_rng(0)
        n_sims, n_subj, n_per = 400, 12, 10
        n = n_subj * n_per
        groups = np.repeat(np.arange(n_subj), n_per)
        x = rng.standard_normal(n)
        X = np.column_stack([np.ones(n), x])
        # null data: random intercepts + noise, beta_x = 0
        re = rng.normal(0, 0.8, size=(n_sims, n_subj))[:, groups]
        Y = re + rng.normal(0, 1.0, size=(n_sims, n))
        out = batched_lme_pvalues(X, Y, groups)
        p = out["pvalues"][:, 1]
        assert np.isfinite(p).all()
        # type-I error at alpha=.05 within binomial tolerance
        rate = float((p < 0.05).mean())
        assert 0.02 <= rate <= 0.09, rate
        # uniformity (loose KS: z-test p-values are mildly anti-
        # conservative at this n, so only gross miscalibration fails)
        ks = sps.kstest(p, "uniform").statistic
        assert ks < 0.08, ks

    def test_power_rises_with_effect(self):
        rng = np.random.default_rng(1)
        n_subj, n_per, n_sims = 12, 10, 200
        n = n_subj * n_per
        groups = np.repeat(np.arange(n_subj), n_per)
        x = rng.standard_normal(n)
        X = np.column_stack([np.ones(n), x])
        rates = []
        for beta in (0.0, 0.3, 0.8):
            re = rng.normal(0, 0.8, size=(n_sims, n_subj))[:, groups]
            Y = beta * x + re + rng.normal(0, 1.0, size=(n_sims, n))
            p = batched_lme_pvalues(X, Y, groups)["pvalues"][:, 1]
            rates.append(float((p < 0.05).mean()))
        assert rates[0] < 0.12
        assert rates[0] < rates[1] < rates[2]
        assert rates[2] > 0.95          # large effect ~ always detected
