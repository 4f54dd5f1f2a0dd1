"""Cross-implementation parity for the visualization layer's numeric
helpers (the reference module imports cleanly — plotly is lazy)."""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_viz():
    import matplotlib
    matplotlib.use("Agg")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    try:
        from src.pipeline import visualizations as rv
    except ImportError as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        matplotlib.use = orig_use
    return rv


def _sine_cfg(phase: bool):
    return SimpleNamespace(use_phase_normalization=phase,
                           target_sine_min_pct_mvc=7.5,
                           target_sine_max_pct_mvc=22.5,
                           target_sine_frequency_hz=0.25)


class TestTargetSineParity:
    def test_phase_mode(self, ref_viz):
        from mba_tpu.pipeline.visualizations import target_sine_values
        x = np.linspace(0.0, 720.0, 97)
        np.testing.assert_allclose(
            target_sine_values(x, _sine_cfg(True)),
            ref_viz._target_sine_values(x, _sine_cfg(True)))

    def test_time_mode(self, ref_viz):
        from mba_tpu.pipeline.visualizations import target_sine_values
        x = np.linspace(0.0, 12.0, 301)
        np.testing.assert_allclose(
            target_sine_values(x, _sine_cfg(False)),
            ref_viz._target_sine_values(x, _sine_cfg(False)))


class TestPColumnParity:
    def _frame(self, **cols):
        base = {"p_value_adjusted": [0.01, 0.2]}
        base.update(cols)
        return pd.DataFrame(base)

    def test_all_sources(self, ref_viz):
        from mba_tpu.pipeline.visualizations import _resolve_p_column
        df_full = self._frame(p_value_fdr=[0.02, 0.3],
                              p_value_for_plot=[0.02, 0.2])
        df_nofdr = self._frame()
        df_nan_fdr = self._frame(p_value_fdr=[np.nan, np.nan])
        for df in (df_full, df_nofdr, df_nan_fdr):
            for source in ("auto", "autocorr"):
                assert (_resolve_p_column(df, source)
                        == ref_viz._resolve_p_column(df, source)), source
        assert (_resolve_p_column(df_full, "fdr")
                == ref_viz._resolve_p_column(df_full, "fdr"))
        with pytest.warns(UserWarning):
            ours = _resolve_p_column(df_nan_fdr, "fdr")
        with pytest.warns(UserWarning):
            theirs = ref_viz._resolve_p_column(df_nan_fdr, "fdr")
        assert ours == theirs
