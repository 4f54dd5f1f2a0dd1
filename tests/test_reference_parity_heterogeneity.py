"""Cross-implementation parity for the heterogeneity tier.

The reference's ``heterogeneity_modelling`` needs only sklearn/scipy/
pandas (all present) plus its own ``signal_features`` — it is directly
importable here, giving live numerical evidence for the responder
summary, silhouette-constrained clustering, tercile banding, and the
sklearn-MI feature importances (seeded, hence comparable exactly).
"""
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_het():
    import matplotlib
    matplotlib.use("Agg")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    try:
        from src.pipeline import heterogeneity_modelling as het
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        matplotlib.use = orig_use
    return het


@pytest.fixture(scope="module")
def our_het():
    from mba_tpu.pipeline import heterogeneity_modelling as het
    return het


def _contrast_frame():
    rng = np.random.default_rng(0)
    rows = []
    for subj in range(8):
        for dv in ("CMC_beta", "CMC_gamma"):
            for cond in ("Happy", "Sad"):
                rows.append({
                    "Subject_ID": subj, "Dependent_Variable": dv,
                    "Condition_Variable": "Category or Silence",
                    "Condition": cond,
                    "Responder_Flag": bool(rng.integers(0, 2)),
                    "Normalized_Contrast": float(rng.normal())})
    return pd.DataFrame(rows)


class TestResponderSummaryParity:
    def test_identical_tables(self, ref_het, our_het):
        frame = _contrast_frame()
        conds = {"L1": ("Category or Silence", ["Happy", "Sad"])}
        ours = our_het.compute_responder_summary(
            frame, ["CMC_beta", "CMC_gamma"], conds)
        theirs = ref_het.compute_responder_summary(
            frame, ["CMC_beta", "CMC_gamma"], conds)
        pd.testing.assert_frame_equal(ours, theirs)


class TestClusteringParity:
    def test_select_best_k(self, ref_het, our_het, capsys):
        rng = np.random.default_rng(1)
        # three well-separated planted clusters of 5 subjects each
        X = np.concatenate([rng.normal(c, 0.3, (5, 4))
                            for c in (-4.0, 0.0, 4.0)])
        ours = our_het.select_best_k(X, range(2, 6), min_cluster_size=2)
        theirs = ref_het.select_best_k(X, range(2, 6),
                                       min_cluster_size=2)
        capsys.readouterr()             # reference prints scores
        assert ours[0] == theirs[0] == 3
        for k in ours[1]:
            assert abs(ours[1][k] - theirs[1][k]) < 1e-12

    def test_min_size_fallback(self, ref_het, our_het, capsys):
        rng = np.random.default_rng(2)
        X = rng.normal(0, 1, (5, 3))
        with pytest.warns(UserWarning):
            ours = our_het.select_best_k(X, range(4, 6),
                                         min_cluster_size=3)
        with pytest.warns(UserWarning):
            theirs = ref_het.select_best_k(X, range(4, 6),
                                           min_cluster_size=3)
        capsys.readouterr()
        assert ours[0] == theirs[0] == 2


class TestTercileParity:
    def test_band_assignment(self, ref_het, our_het):
        grp = pd.DataFrame({"MI_Score": [0.1, 0.5, 0.9, 0.2, 0.7,
                                         0.05, 0.95]})
        pd.testing.assert_series_equal(
            our_het._assign_tercile_band(grp),
            ref_het._assign_tercile_band(grp))

    def test_degenerate_scores_all_medium(self, ref_het, our_het):
        grp = pd.DataFrame({"MI_Score": [0.3, 0.3, 0.3]})
        pd.testing.assert_series_equal(
            our_het._assign_tercile_band(grp),
            ref_het._assign_tercile_band(grp))


class TestMiImportanceParity:
    def test_seeded_mi_identical(self, ref_het, our_het):
        from mba_tpu.pipeline.signal_features import (
            compute_feature_mi_importance)
        from src.pipeline.signal_features import (
            compute_feature_mi_importance as ref_mi)
        rng = np.random.default_rng(3)
        n = 80
        target = rng.normal(size=n)
        features = np.column_stack([
            target * 2 + rng.normal(0, 0.1, n),       # informative
            rng.normal(size=n)])                       # noise
        labels = ["informative", "noise"]
        ours = compute_feature_mi_importance(
            features, target, labels, include_barplot=False)
        theirs = ref_mi(features, target, labels, include_barplot=False)
        assert set(ours) == set(theirs) == set(labels)
        for name in labels:
            assert abs(float(ours[name])
                       - float(theirs[name])) < 1e-10, name
