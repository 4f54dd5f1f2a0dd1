"""Remaining study workflows: OTB4 import, preprocessing,
time-alignment validation, music feature extraction."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.utils import file_management as filemgmt
from tests.test_utils_io import _make_otb4
from tests.test_reporting_music import _write_wav


class TestOtb4ImportWorkflow:
    def test_import_subject_three_blocks(self, tmp_path):
        from mba_tpu.workflows.otb4_import_workflow import import_subject
        otb4 = tmp_path / "rec.otb4"
        # 192 channels = 3 blocks of 64 (eeg / flexor / extensor)
        raw, gain, bits, adc_range, fs = _make_otb4(
            otb4, n_tracks=3, n_ch_per=64, n_samples=64)
        feat = tmp_path / "feat"
        import_subject(otb4, feat, subject=1)
        npys = sorted(feat.glob("*Raw*.npy"))
        assert len(npys) == 3
        eeg = np.load(next(p for p in npys if "eeg" in p.name))
        assert eeg.shape == (64, 64)
        # ADC→mV conversion matches the raw int16 payload
        expected = raw[:64].T * adc_range / 2 ** bits * 1000.0 / gain
        np.testing.assert_allclose(eeg, expected.astype(np.float32),
                                   rtol=1e-5)

    def test_subject0_grid_swap(self, tmp_path):
        from mba_tpu.workflows.otb4_import_workflow import import_subject
        otb4 = tmp_path / "rec.otb4"
        raw, gain, bits, adc_range, _ = _make_otb4(
            otb4, n_tracks=3, n_ch_per=64, n_samples=32)
        a, b = tmp_path / "a", tmp_path / "b"
        import_subject(otb4, a, subject=0, swap_emg_grids=False)
        import_subject(otb4, b, subject=0, swap_emg_grids=True)
        flex_a = np.load(filemgmt.most_recent_file(
            a, ".npy", ["Raw", "emg_1_flexor"]))
        ext_b = np.load(filemgmt.most_recent_file(
            b, ".npy", ["Raw", "emg_2_extensor"]))
        np.testing.assert_allclose(flex_a, ext_b)   # swapped grids


class TestPreprocessingWorkflow:
    def test_preprocess_subject_modality(self, tmp_path):
        from mba_tpu.workflows.preprocessing_workflow import (
            preprocess_subject_modality)
        rng = np.random.default_rng(0)
        fs = 256
        # physiological amplitudes (~10 µV) so the 3 mV artifact
        # threshold doesn't flag every channel
        data = (1e-5 * rng.standard_normal((fs * 4, 8))
                ).astype(np.float32)
        np.save(tmp_path / filemgmt.file_title("Raw emg_1_flexor 8ch",
                                               ".npy"), data)
        prepper = preprocess_subject_modality(
            0, "emg_1_flexor", tmp_path, sampling_freq=fs,
            n_ica_components=None, wavelet_type=None,
            laplacian_filter_neighbor_radius=None)
        out = prepper.np_output_data
        assert out.shape == data.shape
        assert np.isfinite(out).all()
        assert list(tmp_path.glob("*Preprocessed*emg_1_flexor*.npy"))
        assert [p for p in tmp_path.iterdir()
                if "Config" in p.name and "emg_1_flexor" in p.name]


class TestTimeAlignmentValidation:
    def test_actual_sampling_rate(self):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import calculate_actual_sampling_rate
        from mba_tpu.pipeline import data_integration as di
        from tests.test_pipeline_data_integration import make_raw_log
        log = di.prepare_log_frame(make_raw_log(), set_time_index=True)
        start, end = di.get_qtc_measurement_start_end(log,
                                                      verbose=False)
        duration = (end - start).total_seconds()
        res = calculate_actual_sampling_rate(
            int(duration * 2046.0), log, nominal_fs=2048.0)
        assert res["actual_fs"] == pytest.approx(2046.0, rel=1e-3)
        assert res["drift_ppm"] == pytest.approx(-976.6, rel=1e-2)

    def test_validate_muscle_identity(self):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import validate_muscle_identity
        rng = np.random.default_rng(0)
        fs = 50.0
        t = np.arange(int(fs * 60)) / fs
        force = np.abs(np.sin(2 * np.pi * 0.1 * t))
        flexor = force + 0.05 * rng.standard_normal(len(t))
        noise = 0.1 * rng.standard_normal(len(t))
        res = validate_muscle_identity(flexor, force, fs, fs)
        assert res["best_corr"] > 0.8
        assert "flexor-dominant" in res["interpretation"]
        res2 = validate_muscle_identity(noise, force, fs, fs)
        assert abs(res2["best_corr"]) < 0.3

    def test_emg_power_ratio(self):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import emg_power_ratio
        rng = np.random.default_rng(1)
        strong = 3.0 * rng.standard_normal(5000)
        weak = rng.standard_normal(5000)
        ratio = emg_power_ratio(strong, weak, fs=1000.0)
        assert ratio > 4.0           # 9x power -> flexor dominance


class TestMusicFeatureWorkflow:
    def test_build_song_characteristics_table(self, tmp_path):
        from mba_tpu.workflows.music_feature_extraction_workflow \
            import build_song_characteristics_table
        sr = 22050
        t = np.arange(int(sr * 6)) / sr
        # 120 BPM click track
        clicks = (np.sin(2 * np.pi * 880 * t)
                  * (np.mod(t, 0.5) < 0.03))
        _write_wav(tmp_path / "Clicks - TestArtist.wav", clicks, sr)
        table = build_song_characteristics_table(
            tmp_path, save_dir=tmp_path, duration=6.0)
        assert len(table) == 1
        row = table.iloc[0]
        assert row["Title"] == "Clicks"
        assert row["Artist"] == "TestArtist"
        # octave ambiguity tolerated (like the reference tempo test)
        assert abs(row["BPM"] - 120) < 8 or abs(row["BPM"] - 60) < 4
        assert list(tmp_path.glob(
            "*Song Characteristics Lookup Table*.csv"))

    def test_analyse_category_reassignments(self, tmp_path):
        from mba_tpu.workflows.music_feature_extraction_workflow \
            import analyse_category_reassignments
        frame = pd.DataFrame({
            "Category or Silence": ["Happy", "Happy", "Sad", "Sad"],
            "Perceived Category": ["Happy", "Sad", "Sad", "Sad"]})
        res = analyse_category_reassignments(frame, save_dir=tmp_path)
        assert res is not None


class TestTaskAlignment:
    def _setup(self):
        fs_psd, dur = 4.0, 60.0
        t = np.arange(int(fs_psd * dur)) / fs_psd
        t0 = pd.Timestamp("2026-01-01", tz="UTC")
        psd_times = pd.DatetimeIndex(
            [t0 + pd.Timedelta(seconds=s) for s in t])
        # 0.1 Hz bursts in both EMG power and force, EMG delayed 0.5 s
        force_vals = 1.0 + np.sin(2 * np.pi * 0.1 * t)
        emg = 1.0 + np.sin(2 * np.pi * 0.1 * (t - 0.5))
        force = pd.Series(force_vals, index=psd_times)
        return emg, psd_times, force, t0

    def test_detects_half_second_lag(self):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import analyze_task_alignment
        emg, psd_times, force, t0 = self._setup()
        res = analyze_task_alignment(
            emg, psd_times, force, t0,
            t0 + pd.Timedelta(seconds=60), "task0")
        assert res["error"] is None
        assert res["n_matched_peaks"] >= 4
        # force leads EMG by ~0.5 s -> matched lag ~ -0.5 s
        assert res["median_lag_sec"] == pytest.approx(-0.5, abs=0.3)
        assert abs(res["cross_corr_optimal_lag_sec"] + 0.5) < 0.5
        assert res["cross_corr_max"] > 0.8

    def test_insufficient_data(self):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import analyze_task_alignment
        emg, psd_times, force, t0 = self._setup()
        res = analyze_task_alignment(
            emg, psd_times, force, t0,
            t0 + pd.Timedelta(seconds=1), "tiny")
        assert res["error"] == "Insufficient data"

    def test_comparison_plots(self, tmp_path):
        from mba_tpu.workflows.time_alignment_validation_workflow \
            import (analyze_task_alignment,
                    create_multi_task_comparison_plot,
                    create_power_comparison_plot)
        emg, psd_times, force, t0 = self._setup()
        res = analyze_task_alignment(
            emg, psd_times, force, t0,
            t0 + pd.Timedelta(seconds=60), "task0")
        create_multi_task_comparison_plot([res], save_dir=tmp_path)
        create_power_comparison_plot(emg, emg * 0.5, psd_times, force,
                                     save_dir=tmp_path)
        assert list(tmp_path.glob("*Task Alignment Comparison*.png"))
        assert list(tmp_path.glob("*Power Comparison*.png"))


class TestPsdAvgWithStd:
    def test_bands_plotted_and_saved(self, tmp_path):
        from mba_tpu.pipeline.visualizations import plot_psd_avg_with_std
        rng = np.random.default_rng(0)
        bands = {"alpha": rng.standard_normal((100, 8)) + 3.0,
                 "beta": rng.standard_normal((100, 8))}
        fig, ax = plot_psd_avg_with_std(bands, sampling_freq=4.0,
                                        save_dir=tmp_path)
        assert len(ax.get_lines()) == 2
        assert ax.get_legend() is not None
        assert list(tmp_path.glob("*Power Spectral Density*.png"))


class TestRqbLevelDefinitions:
    def test_accuracy_levels_collinearity_flags(self):
        from mba_tpu.workflows.statistics_RQ_B_omnibus_testing_workflow \
            import fetch_accuracy_level_definitions
        full = fetch_accuracy_level_definitions(True)
        assert len(full) == 2
        l1_vars = full[1]["explanatory_vars"]
        assert "Segment ID" in l1_vars
        assert "PSD_emg_1_flexor_Global_all" in l1_vars
        assert "CMC_Flexor_max_beta" in l1_vars

        lean = fetch_accuracy_level_definitions(
            False, include_emg_psd=False, include_max_cmc=False)
        l1_lean = lean[1]["explanatory_vars"]
        assert "Segment ID" not in l1_lean
        assert not any("emg" in v for v in l1_lean if "PSD" in v)
        assert not any("max" in v for v in l1_lean if "CMC" in v)
        assert "CMC_Flexor_mean_beta" in l1_lean
