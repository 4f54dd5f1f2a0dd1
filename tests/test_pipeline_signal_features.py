"""High-level feature API tests (reference signal_features semantics)."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline import signal_features as sf


class TestMirrorChannels:
    def test_midline_unchanged_left_to_right(self):
        assert sf.mirror_eeg_channel_list(['Cz', 'C3', 'FC5']) == \
            ['Cz', 'C4', 'FC6']

    def test_right_to_left(self):
        assert sf.mirror_eeg_channel_list(['C4', 'FT10'],
                                          input_is_left=False) == \
            ['C3', 'FT9']

    def test_unrecognizable_raises(self):
        with pytest.raises(ValueError):
            sf.mirror_eeg_channel_list(['XY'])


class TestResample:
    def test_shape_contract(self):
        x = np.random.default_rng(0).standard_normal((100, 3))
        out = sf.resample_data(x, 100, 50, axis=0)
        assert out.shape == (50, 3)
        out = sf.resample_data(x.T, 100, 200, axis=1)
        assert out.shape == (3, 200)

    def test_identity(self):
        x = np.linspace(0, 1, 64)
        np.testing.assert_allclose(sf.resample_data(x, 64, 64), x,
                                   atol=1e-6)


class TestFisher:
    def test_roundtrip_squares(self):
        # the reference pair is deliberately asymmetric: forward is
        # atanh(C), inverse is tanh(z)^2 → roundtrip returns C^2
        # (signal_features.py:459-467)
        c = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
        z = sf.fisher_atanh_transform(c)
        np.testing.assert_allclose(
            sf.inverse_fisher_atanh(z),
            np.clip(c, 1e-10, 1 - 1e-10) ** 2, atol=1e-6)

    def test_threshold_filtering(self):
        vals = np.array([0.1, 0.5, 0.95])
        mask, it = sf.apply_threshold_filtering(vals, K=5, alpha=0.05)
        assert mask.tolist() == (vals > it).tolist()
        mask_b, it_b = sf.apply_threshold_filtering(
            vals, K=5, alpha=0.05, n_comparisons=100, apply_bonferroni=True)
        assert it_b > it


class TestTaskMask:
    def test_spans_to_mask(self):
        start = pd.Timestamp("2024-01-01 12:00:00", tz="UTC")
        spans = [(start + pd.Timedelta(seconds=10),
                  start + pd.Timedelta(seconds=20))]
        centers = np.arange(0, 40, 1.0)
        mask = sf.task_window_mask_from_spans(centers, spans, start,
                                              pre_buffer_sec=2.0,
                                              post_buffer_sec=3.0,
                                              verbose=False)
        np.testing.assert_array_equal(np.nonzero(mask)[0],
                                      np.arange(8, 24))


class TestTaskWiseCmc:
    def _signals(self, fs=128, seconds=8):
        rng = np.random.default_rng(0)
        n = fs * seconds
        eeg = rng.standard_normal((n, 64)).astype(np.float32)
        emg = rng.standard_normal((n, 3)).astype(np.float32)
        return eeg, emg, fs

    def test_channel_subset_and_outputs(self, tmp_path):
        eeg, emg, fs = self._signals()
        vals, lo, hi, tc, freqs = sf.compute_task_wise_aggregated_cmc(
            eeg, emg, fs, muscle_group="flexor",
            eeg_channel_subset=['C3', 'C1', 'Cz'],
            window_size_sec=1.0, save_dir=tmp_path)
        assert vals.shape[2] == 3          # subset channels
        assert vals.shape == lo.shape == hi.shape
        assert np.all(lo <= vals + 1e-6) and np.all(hi >= vals - 1e-6)
        # artifacts persisted and fetchable
        spec, t, f = sf.fetch_stored_spectrograms(
            tmp_path, "Flexor CMC", expected_n_channels=3)
        np.testing.assert_allclose(spec, vals)
        np.testing.assert_allclose(t, tc)

    def test_mask_path_and_threshold_path_agree_on_active(self):
        eeg, emg, fs = self._signals(seconds=6)
        n = eeg.shape[0]
        ws, hop = fs, fs // 2
        n_win = (n - ws) // hop + 1
        mask = np.zeros(n_win, bool)
        mask[2:6] = True
        v_fused = sf.compute_task_wise_aggregated_cmc(
            eeg[:, :4], emg, fs, "flexor", window_size_sec=1.0,
            window_mask=mask)[0]
        v_thresh = sf.compute_task_wise_aggregated_cmc(
            eeg[:, :4], emg, fs, "flexor", window_size_sec=1.0,
            window_mask=mask, enforce_independence_threshold=True,
            independence_threshold_alpha=1 - 1e-9)[0]
        # with alpha→1 the threshold→0 keeps everything: paths agree
        np.testing.assert_allclose(v_fused[mask], v_thresh[mask], atol=1e-5)
        assert np.all(v_fused[~mask] == 0)

    def test_fetch_wrong_channel_count_raises(self, tmp_path):
        eeg, emg, fs = self._signals(seconds=4)
        sf.compute_task_wise_aggregated_cmc(
            eeg[:, :2], emg, fs, "extensor", window_size_sec=1.0,
            save_dir=tmp_path)
        with pytest.raises(ValueError, match="expected 5 channels"):
            sf.fetch_stored_spectrograms(tmp_path, "Extensor CMC",
                                         expected_n_channels=5)


class TestSpectrogramF16Storage:
    def test_save_f16_fetch_upcasts(self, tmp_path):
        rng = np.random.default_rng(0)
        spec = rng.uniform(-12.0, 3.0, (6, 17, 4)).astype(np.float32)
        tc = np.linspace(0.5, 5.5, 6)
        fr = np.linspace(0, 256, 17)
        sf.save_spectrograms(spec, tc, fr, "PSD", save_dir=tmp_path,
                             identifier_suffix="f16case",
                             save_dtype=np.float16)
        got, gt, gf = sf.fetch_stored_spectrograms(tmp_path, "PSD",
                                                   file_identifier="f16case")
        # loader upcasts the storage dtype so downstream reductions
        # accumulate in f32; values carry only the f16 rounding
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, spec, atol=0.01)
        assert np.abs(got - spec).max() > 0          # really went f16
        np.testing.assert_allclose(gt, tc)
        np.testing.assert_allclose(gf, fr)


class TestAggregators:
    def test_band_aggregation_mean_and_max(self):
        freqs = np.linspace(0, 100, 101)
        spec = np.random.default_rng(1).random((4, 101, 2))
        out = sf.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour='mean')
        beta_sel = (freqs >= 13) & (freqs < 30)
        np.testing.assert_allclose(out['beta'],
                                   spec[:, beta_sel, :].mean(axis=1))
        out_max = sf.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour='max')
        np.testing.assert_allclose(out_max['beta'],
                                   spec[:, beta_sel, :].max(axis=1))

    def test_ci_coherent_max_indices(self):
        freqs = np.linspace(0, 100, 101)
        rng = np.random.default_rng(2)
        spec = rng.random((4, 101, 2))
        lo, hi = spec - 0.1, spec + 0.1
        out = sf.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour='max', lower_array=lo, upper_array=hi)
        m, l, u = out['alpha']
        np.testing.assert_allclose(l, m - 0.1, atol=1e-12)
        np.testing.assert_allclose(u, m + 0.1, atol=1e-12)

    def test_band_out_of_range_raises(self):
        freqs = np.linspace(0, 20, 21)
        spec = np.zeros((2, 21, 1))
        with pytest.raises(ValueError, match="exceeds available"):
            sf.aggregate_spectrogram_over_frequency_band(spec, freqs)

    def test_psd_aggregation_pipeline(self):
        rng = np.random.default_rng(3)
        spec = rng.random((10, 50, 4)) + 0.5
        freqs = np.linspace(0, 250, 50)
        # axes refer to the CURRENT shape after each reduction collapses one
        out = sf.aggregate_psd_spectrogram(
            spec, freqs, normalize_mvc=True, freq_slice='slow',
            aggregation_ops=[('mean', 1), ('max', 1)])
        assert out.shape == (10,)
        assert np.nanmax(sf.aggregate_psd_spectrogram(
            spec, freqs, normalize_mvc=True)) == pytest.approx(100.0)

    def test_unknown_band_raises(self):
        with pytest.raises(ValueError, match="Unknown frequency band"):
            sf.aggregate_psd_spectrogram(np.zeros((2, 3, 1)),
                                         np.arange(3.0),
                                         freq_slice='nope')


class TestHeartRate:
    def _ecg(self, bpm=75, seconds=60, fs=100, noise=0.02, seed=0):
        # half-wave rectified sine cubed ≈ realistic duty cycle so the
        # rolling 0.8-quantile threshold sits on the beat upstroke
        rng = np.random.default_rng(seed)
        t = np.arange(int(seconds * fs)) / fs
        period = 60.0 / bpm
        ecg = np.maximum(np.sin(2 * np.pi * t / period), 0.0) ** 3
        ecg += noise * rng.standard_normal(len(t))
        idx = pd.date_range("2024-01-01", periods=len(t),
                            freq=pd.Timedelta(seconds=1 / fs))
        return pd.Series(ecg, index=idx)

    def test_detects_bpm(self):
        ecg = self._ecg(bpm=75)
        bpm, hrv = sf.compute_heart_rate_and_variability(ecg, verbose=False)
        assert bpm is not None
        assert abs(bpm.dropna().median() - 75) < 5
        assert (hrv.dropna() >= 0).all()

    def test_insufficient_beats(self):
        idx = pd.date_range("2024-01-01", periods=100,
                            freq=pd.Timedelta(seconds=0.01))
        flat = pd.Series(np.zeros(100), index=idx)
        bpm, hrv = sf.compute_heart_rate_and_variability(flat,
                                                         verbose=False)
        assert bpm is None and hrv is None


class TestScaledForce:
    def test_per_trial_scaling(self):
        idx = pd.date_range("2024-01-01", periods=300, freq="100ms",
                            tz="UTC")
        force = pd.Series(np.concatenate([
            np.linspace(0, 10, 100),      # trial 1
            np.full(100, 5.0),            # gap
            np.linspace(20, 40, 100)]),   # trial 2
            index=idx)
        spans = [(idx[0], idx[99]), (idx[200], idx[299])]
        out = sf.compute_task_wise_scaled_force(
            force, None, trial_start_ends=spans, verbose=False)
        assert np.isnan(out.iloc[150])          # outside trials → NaN
        assert 0 <= out.iloc[:100].min() <= 0.05
        assert 0.95 <= out.iloc[:100].max() <= 1.0
        assert 0.95 <= out.iloc[200:].max() <= 1.0

    def test_constant_trial_maps_to_half(self):
        idx = pd.date_range("2024-01-01", periods=50, freq="100ms",
                            tz="UTC")
        force = pd.Series(np.full(50, 7.0), index=idx)
        out = sf.compute_task_wise_scaled_force(
            force, None, trial_start_ends=[(idx[0], idx[-1])],
            verbose=False)
        assert (out == 0.5).all()


class TestMiImportance:
    def test_continuous_target(self):
        rng = np.random.default_rng(0)
        x1 = rng.standard_normal(400)
        x2 = rng.standard_normal(400)
        y = 3 * x1 + 0.1 * rng.standard_normal(400)
        imp = sf.compute_feature_mi_importance(
            np.stack([x1, x2], axis=1), y, ['informative', 'noise'],
            include_barplot=False)
        assert imp['informative'] > imp['noise']

    def test_categorical_target(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((300, 2))
        y = np.where(x[:, 0] > 0, "hi", "lo")
        imp = sf.compute_feature_mi_importance(
            x, y, ['a', 'b'], include_barplot=False)
        assert imp['a'] > imp['b']
