"""Cross-implementation parity for the reporting tier's numeric core.

The reference's ``statistical_reporting`` imports statsmodels only for
``multipletests(..., method='fdr_bh')`` — which ``models/fdr.py``
reimplements.  Shimming that one symbol lets the ACTUAL reference module
load in this statsmodels-free environment, giving real cross-
implementation evidence for the sample-size machinery
(``_required_n_subjects`` / noncentral-t power) that golden fixtures
alone cannot provide.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_reporting():
    import matplotlib
    matplotlib.use("Agg")
    from mba_tpu.models.fdr import benjamini_hochberg

    def multipletests(pvals, alpha=0.05, method="fdr_bh", **kw):
        assert method == "fdr_bh", method
        reject, p_adj = benjamini_hochberg(pvals, alpha=alpha)
        return reject, p_adj, None, None

    shims = {}
    for name in ("statsmodels", "statsmodels.stats",
                 "statsmodels.stats.multitest"):
        if name not in sys.modules:
            shims[name] = types.ModuleType(name)
            sys.modules[name] = shims[name]
    sys.modules["statsmodels.stats.multitest"].multipletests = \
        multipletests

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    try:
        from src.pipeline import statistical_reporting as ref_rep
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        matplotlib.use = orig_use
    yield ref_rep
    for name in shims:                      # don't leak fake statsmodels
        sys.modules.pop(name, None)


class TestSampleSizeParity:
    def test_required_n_subjects_grid(self, ref_reporting):
        from mba_tpu.pipeline.statistical_reporting import (
            _required_n_subjects)
        grid = [(d, icc, k)
                for d in (0.2, 0.5, 0.8, 1.2)
                for icc in (0.0, 0.2, 0.5, 0.8)
                for k in (1, 4, 12, 40)]
        for d, icc, k in grid:
            ours = _required_n_subjects(d, icc, k)
            theirs = ref_reporting._required_n_subjects(d, icc, k)
            assert ours == theirs, (d, icc, k, ours, theirs)

    def test_required_n_edge_cases(self, ref_reporting):
        from mba_tpu.pipeline.statistical_reporting import (
            _required_n_subjects)
        for args in [(0.0, 0.2, 4), (np.nan, 0.2, 4), (0.5, 0.2, 0)]:
            assert (_required_n_subjects(*args)
                    == ref_reporting._required_n_subjects(*args)), args

    def test_alpha_and_power_knobs(self, ref_reporting):
        from mba_tpu.pipeline.statistical_reporting import (
            _required_n_subjects)
        for alpha, power in [(0.01, 0.9), (0.05, 0.95), (0.1, 0.8)]:
            ours = _required_n_subjects(0.6, 0.3, 8, alpha=alpha,
                                        target_power=power)
            theirs = ref_reporting._required_n_subjects(
                0.6, 0.3, 8, alpha=alpha, target_power=power)
            assert ours == theirs, (alpha, power, ours, theirs)


class TestFdrShimSelfCheck:
    def test_bh_matches_published_example(self):
        # sanity that the shim itself is the canonical BH step-up
        from mba_tpu.models.fdr import benjamini_hochberg
        p = np.array([0.01, 0.04, 0.03, 0.005, 0.2])
        reject, p_adj = benjamini_hochberg(p, alpha=0.05)
        order = np.argsort(p)
        # adjusted p-values are monotone in the ordered p's
        assert (np.diff(p_adj[order]) >= -1e-12).all()
        assert reject[3] and reject[0]
        assert not reject[4]


class TestLookupParity:
    def _diag(self):
        import pandas as pd
        return pd.DataFrame([
            {"Dependent_Variable": "CMC_Flexor_max_beta",
             "Model_Type": "LME",
             "Comparison_Level": "Level 1 (Category or Silence)",
             "N. Segments": 1, "ICC": 0.42, "N_Observations": 480},
            {"Dependent_Variable": "CMC_Flexor_max_beta",
             "Model_Type": "LME",
             "Comparison_Level": "Level 0 (Music vs Silence)",
             "N. Segments": 1, "ICC": 0.30, "N_Observations": 240},
            {"Dependent_Variable": "CMC_Flexor_max_beta",
             "Model_Type": "OLS",
             "Comparison_Level": "Level 1 (Category or Silence)",
             "N. Segments": 1, "ICC": 0.99, "N_Observations": 480},
        ])

    def test_lookup_icc_and_k(self, ref_reporting):
        import pandas as pd
        from mba_tpu.pipeline import statistical_reporting as ours
        diag = self._diag()
        cfg_ref = ref_reporting._ReportConfig(
            primary_n_segments=1, resolution_segments=[1, 5])
        cfg_our = ours._ReportConfig(primary_n_segments=1,
                                     resolution_segments=[1, 5])
        for lvl in (None, 0, 1):
            assert (ours._lookup_icc(diag, "CMC_Flexor_max_beta", lvl,
                                     cfg_our)
                    == ref_reporting._lookup_icc(
                        diag, "CMC_Flexor_max_beta", lvl, cfg_ref)), lvl
            assert (ours._lookup_k(diag, "CMC_Flexor_max_beta", lvl,
                                   cfg_our, n_subjects=12)
                    == ref_reporting._lookup_k(
                        diag, "CMC_Flexor_max_beta", lvl, cfg_ref,
                        n_subjects=12)), lvl
        # absent DV → both None
        assert ours._lookup_icc(diag, "nope", None, cfg_our) is None
        assert ref_reporting._lookup_icc(diag, "nope", None,
                                         cfg_ref) is None

    def test_level_int_parity(self, ref_reporting):
        """ADVICE r2: level parsing must use the reference's regex — the
        'Level N' token need not lead the string, and strings whose
        second token merely happens to be numeric must NOT parse."""
        from mba_tpu.pipeline import statistical_reporting as ours
        cases = ["Level 1 (Category or Silence)", "level 3", "Level 12",
                 "Adjusted Level 2 (post-hoc)", "Foo 3", "Group 7 items",
                 "Level", "", "no digits here", 4, 2.0]
        for s in cases:
            assert ours._level_int(s) == ref_reporting._level_int(s), s
