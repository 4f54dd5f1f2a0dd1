"""Headless render tests for the round-2 visualization families
(VERDICT r1 item 5): time-resolution forest plots/mosaics, CMC
per-category and normalised lineplots, phase-average figures with the
target-sine panel, and the spectrogram phase strip."""
import numpy as np
import pandas as pd
import matplotlib
import matplotlib.pyplot as plt
import pytest

from mba_tpu.pipeline import visualizations as viz
from mba_tpu.pipeline.cbpa import CBPAConfig


@pytest.fixture
def results_frame():
    rows = []
    rng = np.random.default_rng(0)
    for hyp in ("H2a: CMC beta", "H3: CMC gamma"):
        for nseg in (1, 2, 5):
            for model in ("OLS", "LME"):
                rows.append({
                    "Hypothesis": hyp, "Parameter": "music[T.True]",
                    "Comparison_Level": "lvl_0", "Model_Type": model,
                    "Coefficient": rng.normal(0.1, 0.05),
                    "SE": 0.04, "p_value": rng.uniform(0.001, 0.2),
                    "p_value_fdr": rng.uniform(0.001, 0.3),
                    "N. Segments": nseg,
                    "Dependent_Variable": "CMC_Flexor_max_beta"})
    return pd.DataFrame(rows)


@pytest.fixture
def combined_frame():
    rng = np.random.default_rng(1)
    rows = []
    for subj in range(3):
        for trial in range(6):
            cat = ["Happy", "Sad", "Silence"][trial % 3]
            for seg in range(5):
                rows.append({
                    "Subject ID": subj, "Trial ID": trial,
                    "Segment ID": seg, "Category or Silence": cat,
                    "CMC_Flexor_max_beta": 0.4 + 0.05 * seg
                    + rng.normal(0, 0.02),
                    "CMC_Flexor_max_gamma": 0.3 + rng.normal(0, 0.02)})
    return pd.DataFrame(rows)


class TestTimeResolutionForest:
    def test_single_axes(self, results_frame):
        fig, ax = plt.subplots()
        viz.draw_time_resolution_forest_plot(
            ax, results_frame, "music[T.True]", "lvl_0",
            hypothesis="H2a: CMC beta")
        assert len(ax.get_yticklabels()) == 6      # 3 resolutions × 2
        plt.close(fig)

    def test_empty_selection_annotates(self, results_frame):
        fig, ax = plt.subplots()
        viz.draw_time_resolution_forest_plot(
            ax, results_frame, "nonexistent", "lvl_0")
        assert any("no rows" in t.get_text() for t in ax.texts)
        plt.close(fig)

    def test_mosaic_saves(self, results_frame, tmp_path):
        fig = viz.plot_time_resolution_forest_mosaic(
            results_frame, ["H2a: CMC beta", "H3: CMC gamma"],
            "music[T.True]", "lvl_0", output_dir=tmp_path)
        assert fig is not None
        assert list(tmp_path.glob("*Time Resolution Forest*.png"))

    def test_fdr_source_preferred(self, results_frame):
        """significance_source='auto' uses p_value_fdr when present."""
        frame = results_frame.copy()
        frame["p_value"] = 0.001          # all significant raw
        frame["p_value_fdr"] = 0.9        # none after FDR
        fig = viz.plot_time_resolution_forest_mosaic(
            frame, ["H2a: CMC beta"], "music[T.True]", "lvl_0")
        ax = fig.axes[0]
        colors = {tuple(np.round(line.get_color()
                  if isinstance(line.get_color(), tuple) else (0,), 3))
                  for line in ax.lines}
        plt.close(fig)


class TestCmcLineplots:
    def test_per_category(self, combined_frame, tmp_path):
        figs = viz.plot_cmc_lineplots_per_category(
            combined_frame, "Category or Silence", "Flexor", "max", 5,
            save_dir=tmp_path)
        assert set(figs) == {"beta", "gamma"}
        assert len(list(tmp_path.glob("*.png"))) == 2
        ax = figs["beta"].axes[0]
        # 3 category lines + threshold line
        assert len(ax.lines) == 4

    def test_normalised(self, combined_frame, tmp_path):
        figs = viz.plot_cmc_lineplot_normalised(
            combined_frame, "Flexor", "max", 5, save_dir=tmp_path)
        ax = figs["beta"].axes[0]
        # 18 trial lines + mean line + the 100% reference hline
        assert len(ax.lines) >= 19
        assert list(tmp_path.glob("*Normalised CMC*.png"))

    def test_missing_column_skipped(self, combined_frame):
        figs = viz.plot_cmc_lineplots_per_category(
            combined_frame, "Category or Silence", "Extensor", "max", 5)
        assert figs == {}


class TestTargetSine:
    def test_phase_mode_values(self):
        cfg = CBPAConfig(modality="CMC", modality_file_id="Flexor",
                         freq_band="beta", condition_column="c",
                         condition_A="a", condition_B="b",
                         use_phase_normalization=True,
                         data_root=".", output_dir=".",
                         hypothesis_label="t")
        x = np.array([0.0, 90.0, 180.0, 270.0])
        y = viz.target_sine_values(x, cfg)
        mid = 0.5 * (cfg.target_sine_min_pct_mvc
                     + cfg.target_sine_max_pct_mvc)
        assert y[0] == pytest.approx(mid)
        assert y[1] == pytest.approx(cfg.target_sine_max_pct_mvc)
        assert y[3] == pytest.approx(cfg.target_sine_min_pct_mvc)

    def test_time_mode_frequency(self):
        cfg = CBPAConfig(modality="CMC", modality_file_id="Flexor",
                         freq_band="beta", condition_column="c",
                         condition_A="a", condition_B="b",
                         use_phase_normalization=False,
                         target_sine_frequency_hz=0.25,
                         data_root=".", output_dir=".",
                         hypothesis_label="t")
        t = np.array([0.0, 1.0])                  # quarter period at 1 s
        y = viz.target_sine_values(t, cfg)
        assert y[1] == pytest.approx(cfg.target_sine_max_pct_mvc)


class TestPhaseAverageFigures:
    def _cfg(self, sine=True):
        return CBPAConfig(modality="CMC", modality_file_id="Flexor",
                          freq_band="beta", condition_column="c",
                          condition_A="a", condition_B="b",
                          use_phase_normalization=True,
                          show_target_sine=sine,
                          data_root=".", output_dir=".",
                          hypothesis_label="t")

    def test_cmc_accuracy_figure(self, tmp_path):
        rng = np.random.default_rng(2)
        grid = np.linspace(0, 360, 36, endpoint=False)
        cmc_map = rng.random((36, 11))
        acc = {"Happy": [rng.random(36) for _ in range(5)],
               "Silence": [rng.random(36) for _ in range(4)]}
        force = 15 + 7 * np.sin(2 * np.pi * grid / 360)
        fig = viz.plot_cmc_accuracy_phase_average(
            grid, cmc_map, acc, cfg=self._cfg(),
            cmc_channel_labels=[f"C{i}" for i in range(11)],
            force_mean=force, force_sd=0.1 * np.ones(36),
            save_dir=tmp_path)
        assert len(fig.axes) >= 4          # map, cbar, accuracy, sine
        assert list(tmp_path.glob("*CMC + accuracy*.png")) \
            or list(tmp_path.glob("*CMC*accuracy*.png"))

    def test_emg_psd_figure(self, tmp_path):
        rng = np.random.default_rng(3)
        grid = np.linspace(0, 360, 36, endpoint=False)
        fig = viz.plot_emg_psd_phase_average_plot(
            grid, rng.random((36, 8)), rng.random((36, 8)),
            cfg=self._cfg(), save_dir=tmp_path)
        assert len(fig.axes) >= 4
        assert list(tmp_path.glob("*EMG PSD*.png"))

    def test_without_sine_panel(self):
        rng = np.random.default_rng(4)
        grid = np.linspace(0, 360, 18, endpoint=False)
        fig = viz.plot_cmc_accuracy_phase_average(
            grid, rng.random((18, 4)), {"all": [rng.random(18)]},
            cfg=None)
        assert len(fig.axes) == 3          # no sine strip


class TestSpectrogramPhaseStrip:
    def test_phase_series_strip(self, tmp_path):
        rng = np.random.default_rng(5)
        spec = rng.random((50, 20))
        idx = pd.date_range("2026-01-01", periods=50, freq="1s")
        phases = pd.Series(
            ["Calibration"] * 10 + [None] * 5 + ["Music Trial"] * 25
            + ["Idle State"] * 10, index=idx)
        fig, ax = viz.plot_spectrogram(
            spec, timestamps=np.arange(50.0),
            frequencies=np.linspace(0, 40, 20),
            phase_series=phases, save_dir=tmp_path)
        assert len(fig.figure.axes if hasattr(fig, "figure")
                   else fig.axes) >= 3    # spec + cbar + phase strip
        assert list(tmp_path.glob("*Spectrogram*.png"))

    def test_empty_phase_series(self):
        fig, ax = viz.plot_spectrogram(
            np.random.default_rng(6).random((10, 5)),
            phase_series=pd.Series([None] * 10))
        # the strip renders the "no phases" annotation (locate the strip
        # by its ylabel — the colorbar axes comes last in fig.axes)
        strip = [a for a in fig.axes if a.get_ylabel() == "Phase"][0]
        assert any("No phases" in t.get_text() for t in strip.texts)


class TestReferenceNamedWrappers:
    def test_hypothesis_forest_mosaic(self, results_frame, tmp_path):
        df = results_frame.copy()
        df["p_value_adjusted"] = df["p_value"]
        df["p_value_for_plot"] = df["p_value_fdr"]
        fig = viz.plot_hypothesis_forest_mosaic(
            df, hypotheses=["H2a: CMC beta", "H3: CMC gamma"],
            output_dir=tmp_path, hidden=True)
        assert fig is not None
        assert len(fig.axes) == 2
        assert list(tmp_path.glob("*Coefficient Overview*"))

    def test_hypothesis_mosaic_missing_hypothesis_axis_off(
            self, results_frame):
        df = results_frame.copy()
        df["p_value_adjusted"] = df["p_value"]
        fig = viz.plot_hypothesis_forest_mosaic(
            df, hypotheses=["H2a: CMC beta", "H99: absent"], hidden=True)
        assert not fig.axes[1].axison

    def test_resolve_p_column(self, results_frame):
        df = results_frame.copy()
        df["p_value_adjusted"] = df["p_value"]
        assert viz._resolve_p_column(df, "autocorr") == "p_value_adjusted"
        assert viz._resolve_p_column(df, "fdr") == "p_value_fdr"
        df2 = df.drop(columns=["p_value_fdr"])
        with pytest.warns(UserWarning):
            assert viz._resolve_p_column(df2, "fdr") == "p_value_adjusted"
        df["p_value_for_plot"] = df["p_value_fdr"]
        assert viz._resolve_p_column(df, "auto") == "p_value_for_plot"

    def test_reassignment_sankey(self, tmp_path):
        frame = pd.DataFrame({
            "from": ["Happy", "Happy", "Sad", "Classic", None],
            "to": ["Groovy", "Happy", "Happy", "Sad", "Happy"]})
        fig = viz.plot_category_reassignment_sankey(
            frame, song_colors={"Happy": "#ff0000"},
            rename_dict={"Classic": "Classical"}, output_dir=tmp_path)
        assert fig is not None
        assert list(tmp_path.glob("*.png"))

    def test_reassignment_sankey_empty(self, capsys):
        frame = pd.DataFrame({"from": [None], "to": [None]})
        assert viz.plot_category_reassignment_sankey(frame, {}) is None
        assert "No category reassignments" in capsys.readouterr().out

    def test_check_2d_numpy_array(self):
        from mba_tpu.pipeline.signal_features import check_2d_numpy_array
        arr, ax = check_2d_numpy_array(np.zeros(5))
        assert arr.shape == (5, 1) and ax == 0
        arr, ax = check_2d_numpy_array(np.zeros((4, 2)), axis=1)
        assert arr.shape == (4, 2) and ax == 1
        with pytest.raises(AttributeError):
            check_2d_numpy_array(np.zeros((4, 2)))

    def test_plot_cmc_per_category_dict_api(self, tmp_path):
        rng = np.random.default_rng(3)
        fig, ax = viz.plot_cmc_per_category(
            {"Happy": rng.random((4, 30)), "Silence": rng.random((4, 30))},
            x_axis=np.linspace(0, 29, 30), save_dir=tmp_path)
        assert len(ax.lines) >= 2
        assert list(tmp_path.glob("*.png"))
