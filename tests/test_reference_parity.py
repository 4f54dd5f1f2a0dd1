"""Direct numerical parity against the reference implementation.

These tests import the actual reference package from /root/reference and
compare its outputs with ours on identical inputs.  They are the ground
truth for the float32-tolerance parity claim (BASELINE.md).  Skipped
automatically when the reference checkout (or its deps) is unavailable.
"""
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (pure numpy/scipy/pandas subset)."""
    import matplotlib
    matplotlib.use("Agg")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    # the reference's visualizations module hard-codes mpl.use('Qt5Agg')
    # at import time; neutralize backend switching while importing it
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    try:
        from src.pipeline import (signal_features, data_analysis,
                                  data_integration, data_surrogation)
    except ImportError as e:                       # missing deps
        pytest.skip(f"reference import failed: {e}")
    finally:
        matplotlib.use = orig_use
    return SimpleNamespace(features=signal_features,
                           analysis=data_analysis,
                           integration=data_integration,
                           surrogation=data_surrogation)


@pytest.fixture(scope="module")
def mine():
    from mba_tpu.pipeline import (signal_features, data_analysis,
                                  data_integration)
    from mba_tpu.ops import surrogate, coherence, spectral
    return SimpleNamespace(features=signal_features,
                           analysis=data_analysis,
                           integration=data_integration,
                           surrogate=surrogate, coherence=coherence,
                           spectral=spectral)


def _coupled_signals(fs=256.0, seconds=16.0, n_eeg=4, n_emg=2, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / fs)
    spec[(f < 15) | (f > 30)] = 0
    shared = np.fft.irfft(spec, n=n)
    shared /= shared.std() + 1e-12
    eeg = (0.6 * shared[:, None]
           + rng.standard_normal((n, n_eeg))).astype(np.float64)
    emg = (0.6 * shared[:, None]
           + rng.standard_normal((n, n_emg))).astype(np.float64)
    return eeg, emg


class TestSpectralParity:
    def test_multitaper_psd(self, ref, mine):
        eeg, _ = _coupled_signals()
        r_spec, r_t, r_f = ref.features.multitaper_psd(
            eeg, 256.0, nw=3, window_length_sec=0.5, overlap_frac=0.5,
            axis=0, apply_log_scale=False)
        m_spec, m_t, m_f = mine.features.multitaper_psd(
            eeg, 256.0, nw=3, window_length_sec=0.5, overlap_frac=0.5,
            axis=0, apply_log_scale=False)
        np.testing.assert_allclose(m_f, r_f)
        np.testing.assert_allclose(m_t, r_t)
        assert m_spec.shape == r_spec.shape
        np.testing.assert_allclose(m_spec, r_spec, rtol=2e-3, atol=1e-8)

    def test_multitaper_psd_log_scale(self, ref, mine):
        eeg, _ = _coupled_signals(seed=1)
        r_spec, _, _ = ref.features.multitaper_psd(
            eeg, 256.0, nw=3, window_length_sec=0.5, axis=0,
            apply_log_scale=True)
        m_spec, _, _ = mine.features.multitaper_psd(
            eeg, 256.0, nw=3, window_length_sec=0.5, axis=0,
            apply_log_scale=True)
        np.testing.assert_allclose(m_spec, r_spec, atol=2e-3)

    def test_spectral_snr(self, ref, mine):
        eeg, _ = _coupled_signals(seconds=20.0, seed=2)
        r = ref.features.compute_spectral_snr(eeg, 256.0,
                                              target_freq=21.5)
        m = mine.features.compute_spectral_snr(eeg, 256.0,
                                               target_freq=21.5)
        np.testing.assert_allclose(np.asarray(m), np.asarray(r),
                                   atol=5e-3)

    def test_discrete_fourier_transform(self, ref, mine):
        eeg, _ = _coupled_signals(seed=3)
        r = ref.features.discrete_fourier_transform(eeg[:, 0], 256.0)
        m = mine.features.discrete_fourier_transform(eeg[:, 0], 256.0)
        for a, b in zip(m, r):
            np.testing.assert_allclose(np.squeeze(np.asarray(a, float)),
                                       np.squeeze(np.asarray(b, float)),
                                       rtol=1e-4, atol=1e-6)


class TestCoherenceParity:
    def test_full_cmc_dict(self, ref, mine):
        eeg, emg = _coupled_signals()
        n_windows = (eeg.shape[0] - 256) // 128 + 1
        mask = np.ones(n_windows, bool)
        mask[1] = False                       # one masked window
        kwargs = dict(sampling_freq=256.0, nw=3, window_length_sec=1.0,
                      overlap_frac=0.5, use_jackknife=True,
                      apply_independence_threshold=True,
                      window_mask=mask, verbose=False)
        r = ref.features.multitaper_magnitude_squared_coherence(
            eeg, emg, **kwargs)
        m = mine.coherence.multitaper_msc(eeg, emg, **kwargs)
        np.testing.assert_allclose(m["freqs"], r["freqs"])
        np.testing.assert_allclose(m["time_centers"], r["time_centers"])
        assert m["metadata"]["K_tapers"] == r["metadata"]["K_tapers"]
        assert m["metadata"]["IT_unadjusted"] == pytest.approx(
            r["metadata"]["IT_unadjusted"], rel=1e-6)
        np.testing.assert_allclose(m["coherence_raw"],
                                   r["coherence_raw"], atol=2e-3)
        np.testing.assert_allclose(m["coherence_ci_lower"],
                                   r["coherence_ci_lower"], atol=5e-3)
        np.testing.assert_allclose(m["coherence_ci_upper"],
                                   r["coherence_ci_upper"], atol=5e-3)
        # masked window must be exact zeros in both
        assert not r["coherence_raw"][1].any()
        assert not np.asarray(m["coherence_raw"])[1].any()
        # significance masks agree except at threshold-grazing cells
        agree = (np.asarray(m["coherence_significant"], bool)
                 == np.asarray(r["coherence_significant"], bool)).mean()
        assert agree > 0.995

    def test_jackknife_and_threshold_helpers(self, ref, mine):
        K = 5
        assert mine.coherence.cmc_independence_threshold(K) == \
            pytest.approx(
                ref.features.compute_cmc_independence_threshold(K),
                rel=1e-9)


class TestWindowAlgebraParity:
    def test_apply_window_operator_all_ops(self, ref, mine):
        rng = np.random.default_rng(0)
        t0 = pd.Timestamp("2024-01-01")
        target_ts = pd.date_range(t0, periods=400, freq="100ms")
        target = rng.standard_normal((400, 3))
        # 9 windows so the last window end (36 s) stays inside the
        # target range (39.9 s) — the reference validates strictly
        windows = pd.date_range(t0, periods=9, freq="4s")
        for op in ("mean", "median", "min", "max", "std", "mode"):
            r = ref.analysis.apply_window_operator(
                windows, target, target_timestamps=target_ts,
                window_size=4.0, is_time_center=False, operation=op)
            m = mine.analysis.apply_window_operator(
                windows, target, target_timestamps=target_ts,
                window_size=4.0, is_time_center=False, operation=op)
            np.testing.assert_allclose(np.asarray(m, float),
                                       np.asarray(r, float),
                                       rtol=1e-9, equal_nan=True,
                                       err_msg=op)

    def test_create_trial_bins(self, ref, mine):
        rng = np.random.default_rng(1)
        df = pd.DataFrame({
            "Subject ID": np.repeat([0, 1], 12),
            "Trial ID": np.tile(np.repeat(np.arange(6), 2), 2),
            "Liking": rng.integers(0, 8, 24).astype(float),
            "Tempo": rng.normal(120, 20, 24)})
        r = ref.analysis.create_trial_bins(
            df, ["Liking", "Tempo"], {"Liking": 3, "Tempo": 3})
        m = mine.analysis.create_trial_bins(
            df, ["Liking", "Tempo"], {"Liking": 3, "Tempo": 3})
        for col in r.columns:
            if col.endswith("_bin"):
                assert col in m.columns
                np.testing.assert_array_equal(
                    m[col].to_numpy(), r[col].to_numpy(), err_msg=col)

    def test_circular_smooth(self, ref, mine):
        rng = np.random.default_rng(2)
        profile = rng.standard_normal(36)
        np.testing.assert_allclose(
            mine.analysis.circular_smooth(profile, kernel_bins=5),
            ref.analysis.circular_smooth(profile, kernel_bins=5),
            rtol=1e-9)

    def test_phase_normalize_cycles(self, ref, mine):
        fs, task_freq, dur = 100.0, 0.5, 12.0
        t_rel = np.arange(int(fs * dur)) / fs
        sig = np.stack([np.sin(2 * np.pi * task_freq * t_rel),
                        np.cos(2 * np.pi * task_freq * t_rel)], axis=1)
        grid = np.linspace(0, 350, 36)
        kwargs = dict(task_freq=task_freq, trial_dur_sec=dur,
                      phase_grid=grid, min_samples_per_cycle=10,
                      use_interpolation=True,
                      interpolation_kind="linear", verbose=False)
        r = ref.analysis.phase_normalize_cycles(sig, t_rel, **kwargs)
        m = mine.analysis.phase_normalize_cycles(sig, t_rel, **kwargs)
        assert len(m) == len(r) and len(r) > 0
        for a, b in zip(m, r):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9)


class TestLogEnrichmentParity:
    @pytest.fixture(scope="class")
    def raw_log(self):
        from tests.test_pipeline_data_integration import make_raw_log
        return make_raw_log()

    def test_prepare_log_frame_columns(self, ref, mine, raw_log):
        r = ref.integration.prepare_log_frame(raw_log.copy(),
                                              set_time_index=False)
        m = mine.integration.prepare_log_frame(raw_log.copy(),
                                               set_time_index=False)
        for col in ("Music Category", "Song Title", "Song Artist",
                    "Song ID", "Silence ID", "Trial ID",
                    "Task Frequency", "Task RMSE", "Phase",
                    "Within Category Song Index"):
            assert col in r.columns, f"reference lacks {col}?"
            assert col in m.columns, f"we lack {col}"
            rv = r[col].fillna("<na>").to_numpy(dtype=object)
            mv = m[col].fillna("<na>").to_numpy(dtype=object)
            assert len(rv) == len(mv)
            same = np.array([str(a) == str(b) for a, b in zip(mv, rv)])
            assert same.all(), (
                f"{col}: {np.flatnonzero(~same)[:5]} "
                f"mine={mv[~same][:3]} ref={rv[~same][:3]}")

    def test_task_spans_match(self, ref, mine, raw_log):
        r_log = ref.integration.prepare_log_frame(raw_log.copy(),
                                                  set_time_index=True)
        m_log = mine.integration.prepare_log_frame(raw_log.copy(),
                                                   set_time_index=True)
        r_spans = ref.integration.get_all_task_start_ends(r_log, "list")
        m_spans = mine.integration.get_all_task_start_ends(m_log, "list")
        assert len(r_spans) == len(m_spans) and len(r_spans) > 0
        for (rs, re_), (ms, me) in zip(r_spans, m_spans):
            assert ms == rs and me == re_

    def test_measurement_span_matches(self, ref, mine, raw_log):
        r_log = ref.integration.prepare_log_frame(raw_log.copy(),
                                                  set_time_index=True)
        m_log = mine.integration.prepare_log_frame(raw_log.copy(),
                                                   set_time_index=True)
        r_se = ref.integration.get_qtc_measurement_start_end(
            r_log, verbose=False)
        m_se = mine.integration.get_qtc_measurement_start_end(
            m_log, verbose=False)
        assert tuple(m_se) == tuple(r_se)


class TestSerialFeatureParity:
    def test_heart_rate_and_variability(self, ref, mine):
        fs, dur = 100.0, 60.0
        t = np.arange(int(fs * dur)) / fs
        beat = np.exp(-(((t * 72 / 60) % 1.0 - 0.5) / 0.03) ** 2)
        idx = pd.date_range("2024-01-01", periods=len(t),
                            freq=pd.Timedelta(seconds=1 / fs))
        ecg = pd.Series(beat, index=idx)
        r_bpm, r_hrv = ref.features.compute_heart_rate_and_variability(
            ecg, verbose=False)
        m_bpm, m_hrv = mine.features.compute_heart_rate_and_variability(
            ecg, verbose=False)
        np.testing.assert_allclose(np.asarray(m_bpm, float),
                                   np.asarray(r_bpm, float),
                                   rtol=1e-6, atol=1e-9, equal_nan=True)
        np.testing.assert_allclose(np.asarray(m_hrv, float),
                                   np.asarray(r_hrv, float),
                                   rtol=1e-6, atol=1e-9, equal_nan=True)


class TestSurrogationParity:
    def test_generate_noise_statistics(self, ref, mine):
        # RNG streams differ; compare distributional properties
        shape = (4096, 4)
        for kind in ("white", "pink"):
            r = ref.surrogation.generate_noise(shape, kind, 1.0)
            m = np.asarray(mine.surrogate.generate_noise(
                shape, kind, 1.0, rng=np.random.default_rng(0)))
            assert m.shape == r.shape == shape
            assert m.std() == pytest.approx(r.std(), rel=0.2)
            if kind == "pink":
                # 1/sqrt(f) spectrum: low band carries more power
                def band_ratio(x):
                    s = np.abs(np.fft.rfft(x[:, 0])) ** 2
                    return s[1:100].mean() / s[1000:2000].mean()
                assert band_ratio(m) > 3
                assert band_ratio(r) > 3

    def test_insert_bad_channels_contract(self, ref, mine):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1024, 16))
        r_out, r_bad = ref.surrogation.insert_bad_channels(
            x.copy(), axis=0, n_channels=5)
        m_out, m_bad = mine.surrogate.insert_bad_channels(
            x.copy(), axis=0, n_channels=5,
            rng=np.random.default_rng(0))
        assert len(r_bad) == len(m_bad) == 5
        for out, bad in ((np.asarray(r_out), r_bad),
                         (np.asarray(m_out), m_bad)):
            cols = [b - 1 for b in bad]        # indices are 1-based
            good = [c for c in range(16) if c not in cols]
            np.testing.assert_allclose(out[:, good], x[:, good])
            for c in cols:
                scale = np.ptp(out[:, c]) / np.ptp(x[:, c])
                assert 10.0 <= scale <= 15.0


class TestChannelLayoutParity:
    def test_constants_match(self, ref):
        from src.pipeline import channel_layout as ref_layout
        from mba_tpu import channel_layout as mine_layout
        assert list(mine_layout.EEG_CHANNELS) == \
            list(ref_layout.EEG_CHANNELS)
        assert list(mine_layout.EMG_CHANNELS) == \
            list(ref_layout.EMG_CHANNELS)
        assert mine_layout.EEG_CHANNEL_IND_DICT == \
            ref_layout.EEG_CHANNEL_IND_DICT
        for area, chans in ref_layout.EEG_CHANNELS_BY_AREA.items():
            assert area in mine_layout.EEG_CHANNELS_BY_AREA
            assert list(mine_layout.EEG_CHANNELS_BY_AREA[area]) == \
                list(chans), area

    def test_dynamometer_curve_matches(self, ref):
        # the acquisition-side calibration map (reference
        # measurements_and_interactive_visuals.py:213-219)
        from mba_tpu.acquisition.sampling import dynamometer_volt_to_force
        for v in (0.5, 1.0, 1.5, 2.0, 2.5):
            assert dynamometer_volt_to_force(v) == \
                pytest.approx(2.2 * v ** 4.1071, rel=1e-9)


class TestArtifactInterop:
    """Artifacts written by one implementation must load with the other
    — users can mix the reference and mba_tpu mid-study."""

    def _arrays(self):
        rng = np.random.default_rng(0)
        spec = rng.standard_normal((6, 17, 4)).astype(np.float32)
        times = np.arange(6) * 0.5 + 0.25
        freqs = np.linspace(0, 128, 17)
        return spec, times, freqs

    def test_reference_saves_we_fetch(self, ref, mine, tmp_path):
        spec, times, freqs = self._arrays()
        ref.features.save_spectrograms(spec, times, freqs, "PSD",
                                       save_dir=tmp_path,
                                       identifier_suffix="eeg")
        got_spec, got_t, got_f = mine.features.fetch_stored_spectrograms(
            tmp_path, "PSD", file_identifier="eeg",
            expected_n_channels=4)
        np.testing.assert_allclose(got_spec, spec)
        np.testing.assert_allclose(got_t, times)
        np.testing.assert_allclose(got_f, freqs)

    def test_we_save_reference_fetches(self, ref, mine, tmp_path):
        spec, times, freqs = self._arrays()
        mine.features.save_spectrograms(spec, times, freqs, "CMC",
                                        save_dir=tmp_path,
                                        identifier_suffix="flexor")
        got_spec, got_t, got_f = ref.features.fetch_stored_spectrograms(
            tmp_path, "CMC", file_identifier="flexor",
            expected_n_channels=4)
        np.testing.assert_allclose(got_spec, spec)
        np.testing.assert_allclose(got_t, times)
        np.testing.assert_allclose(got_f, freqs)

    def test_enriched_log_csv_interop(self, ref, mine, tmp_path):
        # our enriched-log CSV loads through the reference's fetch path
        from tests.test_pipeline_data_integration import make_raw_log
        from mba_tpu.utils.file_management import file_title, assert_dir
        enriched = mine.integration.prepare_log_frame(
            make_raw_log(), set_time_index=False)
        log_dir = tmp_path / "experiment_logs"
        assert_dir(log_dir)
        enriched.to_csv(log_dir / file_title(
            "Enriched Experiment Log", ".csv"), index=False)
        got = ref.integration.fetch_enriched_log_frame(tmp_path,
                                                       verbose=False)
        assert len(got) == len(enriched)
        assert "Music Category" in got.columns
        m_cats = set(enriched["Music Category"].dropna())
        r_cats = set(got["Music Category"].dropna())
        assert m_cats == r_cats


class TestAggregatorParity:
    def test_band_aggregation_deviates_from_reference_take_bug(
            self, ref, mine):
        """DELIBERATE DEVIATION: the reference selects band bins with
        np.take(spectrograms, boolean_mask, ...) — NumPy reads the
        boolean mask as 0/1 INDICES, so the reference aggregates a
        mixture of frequency bins 0 and 1 for every band.  We use true
        boolean selection (np.compress).  This test pins BOTH
        behaviors so the deviation is explicit."""
        rng = np.random.default_rng(0)
        spec = rng.random((5, 40, 3)).astype(np.float32)
        freqs = np.linspace(0, 100, 40)
        m = mine.features.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour="mean")
        r = ref.features.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour="mean")
        # ours: delta = (0.5, 4) Hz selects exactly bin 1 (2.56 Hz)
        np.testing.assert_allclose(np.asarray(m["delta"]), spec[:, 1],
                                   rtol=1e-6)
        # reference: mean over bins [0]*39 + [1] regardless of the band
        mask = (freqs >= 0.5) & (freqs < 4)
        ref_expected = np.take(spec, mask.astype(int), axis=1
                               ).mean(axis=1)
        np.testing.assert_allclose(np.asarray(r["delta"]), ref_expected,
                                   rtol=1e-6)

    def test_band_aggregation_ci_alignment_and_pre_axis(self, mine):
        """Correct-semantics properties of our aggregator (the reference
        comparison is impossible due to its np.take bug)."""
        rng = np.random.default_rng(1)
        spec = rng.random((5, 40, 3, 2)).astype(np.float32) + 0.01
        lower = np.clip(spec - 0.1, 0, None)
        upper = spec + 0.1
        freqs = np.linspace(0, 100, 40)
        out = mine.features.aggregate_spectrogram_over_frequency_band(
            spec[..., 0], freqs, behaviour="max",
            lower_array=lower[..., 0], upper_array=upper[..., 0])
        for band, (main, lo, hi) in out.items():
            # CI bounds taken at the argmax bin stay aligned
            np.testing.assert_allclose(np.asarray(hi)
                                       - np.asarray(main), 0.1,
                                       rtol=1e-4, err_msg=band)
        pre = mine.features.aggregate_spectrogram_over_frequency_band(
            spec, freqs, behaviour="max", log_transform=True,
            pre_aggregate_axis=(3, "max"))
        beta_sel = (freqs >= 13) & (freqs < 30)
        expected = np.log10(spec.max(axis=3)[:, beta_sel]
                            + 1e-10).max(axis=1)
        np.testing.assert_allclose(np.asarray(pre["beta"]), expected,
                                   rtol=1e-5)

    def test_psd_aggregation_stages(self, ref, mine):
        rng = np.random.default_rng(2)
        psd = rng.random((6, 50, 4)).astype(np.float64) + 0.1
        freqs = np.linspace(0, 200, 50)
        cases = [
            dict(freq_slice=(10.0, 40.0),
                 aggregation_ops=[("mean", 1), ("max", 1)]),
            dict(freq_slice="beta", channel_indices=[0, 2],
                 aggregation_ops=[("mean", 2), ("mean", 1)]),
            dict(normalize_mvc=True,
                 aggregation_ops=[("mean", 1)]),
        ]
        for kwargs in cases:
            r = ref.features.aggregate_psd_spectrogram(
                psd.copy(), psd_freqs=freqs, **kwargs)
            m = mine.features.aggregate_psd_spectrogram(
                psd.copy(), psd_freqs=freqs, **kwargs)
            np.testing.assert_allclose(np.asarray(m), np.asarray(r),
                                       rtol=1e-6,
                                       err_msg=str(kwargs))

    def test_jackknife_helper_direct(self, ref, mine):
        import scipy.signal
        rng = np.random.default_rng(3)
        fs, ws = 256.0, 128
        eeg_w = rng.standard_normal((ws, 2)).astype(np.float32)
        emg_w = rng.standard_normal((ws, 3)).astype(np.float32)
        tapers, ratios = scipy.signal.windows.dpss(
            M=ws, NW=3, Kmax=5, return_ratios=True)
        tapers = tapers[ratios > 0.9]
        tapers /= np.sqrt((tapers ** 2).sum(axis=1, keepdims=True))
        r_mean, r_lo, r_hi = ref.features.jackknife_coherence_and_ci(
            tapers, eeg_w, emg_w, fs, ws)
        m_mean, m_lo, m_hi = mine.features.jackknife_coherence_and_ci(
            tapers, eeg_w, emg_w, fs, ws)
        np.testing.assert_allclose(m_mean, r_mean, atol=2e-4)
        np.testing.assert_allclose(m_lo, r_lo, atol=5e-4)
        np.testing.assert_allclose(m_hi, r_hi, atol=5e-4)


class TestMoreWindowAlgebraParity:
    def test_interpolate_per_window(self, ref, mine):
        rng = np.random.default_rng(0)
        t0 = pd.Timestamp("2024-01-01")
        idx = pd.date_range(t0, periods=100, freq="250ms")
        series = pd.Series(np.cumsum(rng.standard_normal(100)),
                           index=idx)
        # window_time_steps are RELATIVE SECONDS in both implementations
        windows = 1.0 + 2.0 * np.arange(8)
        for method in ("linear", "nearest"):
            r = ref.analysis.interpolate_per_window(
                windows, series, method=method)
            m = mine.analysis.interpolate_per_window(
                windows, series, method=method)
            np.testing.assert_allclose(np.asarray(m, float),
                                       np.asarray(r, float),
                                       rtol=1e-9, equal_nan=True,
                                       err_msg=method)

    def test_add_time_index(self, ref, mine):
        t0 = pd.Timestamp("2024-01-01 10:00:00")
        t1 = pd.Timestamp("2024-01-01 10:00:10")
        data = np.arange(40, dtype=float)
        r = ref.analysis.add_time_index(t0, t1, pd.Series(data))
        m = mine.analysis.add_time_index(t0, t1, pd.Series(data))
        assert len(r) == len(m) == 40
        assert list(r.index) == list(m.index)
        r_idx = ref.analysis.add_time_index(t0, t1, n_timesteps=15)
        m_idx = mine.analysis.add_time_index(t0, t1, n_timesteps=15)
        assert list(r_idx) == list(m_idx)


class TestValidatorParity:
    def test_force_freeze_detection(self, ref, mine):
        from tests.test_pipeline_data_integration import make_raw_log
        log = mine.integration.prepare_log_frame(make_raw_log(),
                                                 set_time_index=True)
        t0 = log.index.min()
        fs = 50.0
        n = int(95 * fs)
        rng = np.random.default_rng(0)
        fsr = 1.5 + 0.2 * rng.standard_normal(n)
        # freeze the force for 2 s inside the first trial (starts ~8 s)
        fz0 = int(15 * fs)
        fsr[fz0:fz0 + int(2 * fs)] = fsr[fz0]
        serial = pd.DataFrame(
            {"fsr": fsr},
            index=pd.date_range(t0, periods=n,
                                freq=pd.Timedelta(seconds=1 / fs)))
        # both implementations report through prints and return None
        # (the reference's '-> pd.DataFrame' annotation is inaccurate);
        # compare the per-trial verdicts in the captured output
        import io, contextlib

        def verdicts(fn):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                assert fn(log, serial) is None
            out = buf.getvalue()
            return {label: ("[WARNING]" in line)
                    for line in out.splitlines()
                    for label in ("song_000", "song_001",
                                  "silence_000")
                    if label in line}

        r_verdicts = verdicts(ref.integration.validate_force_measurements)
        m_verdicts = verdicts(mine.integration.validate_force_measurements)
        assert r_verdicts == m_verdicts
        assert m_verdicts["song_000"] is True     # planted freeze found
        assert m_verdicts["silence_000"] is False


class TestUtilsParity:
    @pytest.fixture(scope="class")
    def ref_utils(self, ref):
        from src.utils import file_management, str_conversion
        return SimpleNamespace(fm=file_management, sc=str_conversion)

    def test_file_title_format_compatible(self, ref_utils):
        from mba_tpu.utils import file_management as my_fm
        r = ref_utils.fm.file_title("My Artifact", ".csv")
        m = my_fm.file_title("My Artifact", ".csv")
        # identical grammar: 'YYYY-MM-DD HH_MM_SS My Artifact.csv'
        import re
        pat = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}_\d{2}_\d{2} "
                         r"My Artifact\.csv$")
        assert pat.match(r), r
        assert pat.match(m), m

    def test_most_recent_file_cross_resolves(self, ref_utils, tmp_path):
        # artifacts named by our file_title resolve through the
        # reference's most_recent_file and vice versa
        from mba_tpu.utils import file_management as my_fm
        old = tmp_path / "2020-01-01 00_00_00 Combined Statistics.csv"
        old.write_text("old")
        new = tmp_path / my_fm.file_title("Combined Statistics", ".csv")
        new.write_text("new")
        r_path = ref_utils.fm.most_recent_file(
            tmp_path, ".csv", ["Combined Statistics"])
        m_path = my_fm.most_recent_file(
            tmp_path, ".csv", ["Combined Statistics"])
        assert Path(r_path).name == Path(m_path).name == new.name

    def test_txt_config_parity(self, ref_utils, tmp_path):
        from mba_tpu.utils.file_management import TxtConfig as MyTxt
        cfg = tmp_path / "config.txt"
        cfg.write_text("Trial Duration --- 45.0\n"
                       "Categories --- Happy, Sad\n"
                       "Use Music --- True\n")
        r = ref_utils.fm.TxtConfig(cfg)
        m = MyTxt(cfg)
        assert r.get_as_type("Trial Duration", "float") == \
            m.get_as_type("Trial Duration", "float") == 45.0
        assert r.get_as_type("Categories", "str_list") == \
            m.get_as_type("Categories", "str_list") == ["Happy", "Sad"]
        assert r.get_as_type("Use Music", "bool") is True
        assert m.get_as_type("Use Music", "bool") is True

    def test_str_conversion_parity(self, ref_utils):
        from mba_tpu.utils import str_conversion as my_sc
        for raw in ("1.234,56 kg", "12,5V", "3,0"):
            assert my_sc.str_to_float(raw) == \
                ref_utils.sc.str_to_float(raw), raw
        # enter_line_breaks: ours wraps at word boundaries; the
        # reference scans fixed strides (and can split words when no
        # space falls in its excess window).  Require identical CONTENT
        # and bounded lines from both, not identical break positions.
        long = "word " * 60
        for fn in (my_sc.enter_line_breaks,
                   ref_utils.sc.enter_line_breaks):
            wrapped = fn(long, 50)
            assert wrapped.replace("\n", " ").split() == long.split()
        assert max(len(line) for line in
                   my_sc.enter_line_breaks(long, 50).split("\n")) <= 50


class TestScaledForceParity:
    def test_task_wise_scaled_force(self, ref, mine):
        from tests.test_pipeline_data_integration import make_raw_log
        log = mine.integration.prepare_log_frame(make_raw_log(),
                                                 set_time_index=True)
        t0 = log.index.min()
        fs = 20.0
        n = int(95 * fs)
        rng = np.random.default_rng(0)
        t = np.arange(n) / fs
        fsr = pd.Series(
            1.5 + 0.5 * np.sin(2 * np.pi * 0.2 * t)
            + 0.02 * rng.standard_normal(n),
            index=pd.date_range(t0, periods=n,
                                freq=pd.Timedelta(seconds=1 / fs)))
        r = ref.features.compute_task_wise_scaled_force(
            fsr, log, verbose=False)
        m = mine.features.compute_task_wise_scaled_force(
            fsr, log, verbose=False)
        np.testing.assert_allclose(np.asarray(m, float),
                                   np.asarray(r, float),
                                   rtol=1e-9, equal_nan=True)
        inside = ~pd.isna(np.asarray(r, float))
        assert inside.sum() > 100        # trials actually covered


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """ONE real-time dummy experiment shared by every interop class
    (real time scale: the reference's hardcoded timing constants — 6 s
    RMSE end-delay, 3.25 s latency, 2 s cutoff — need real-length
    trials; 20 s trials keep the whole module under a minute)."""
    from mba_tpu.acquisition.experiment import (ExperimentConfig,
                                                start_experiment_processes)
    root = tmp_path_factory.mktemp("interop")
    cfg = ExperimentConfig(
        subject_id=0, output_dir=root, trial_duration_sec=20.0,
        n_trials_per_category=1, categories=["Familiar Happy"],
        n_silence_trials=1, task_frequencies_hz=[0.5],
        mvc_calibration_sec=3.0, dummy_mode=True)
    start_experiment_processes(cfg, time_scale=1.0)
    return root / "subject_00"


@pytest.fixture(scope="module")
def experiment_log(ref, experiment):
    """Enriched log + experiment dir from the shared dummy run."""
    raw = ref.integration.fetch_experiment_log(experiment).fillna("")
    log = ref.integration.prepare_log_frame(raw, set_time_index=True)
    return log, experiment


class TestAcquisitionInterop:
    """Artifacts produced by OUR headless acquisition stack must load
    through the REFERENCE's fetch paths — the new experiment runner can
    feed the original analysis pipeline unchanged."""

    def test_experiment_log_loads(self, ref, experiment):
        raw = ref.integration.fetch_experiment_log(experiment)
        assert {"Time", "Music", "Event", "Questionnaire"} <= \
            set(raw.columns)
        # pandas>=3 reads empty CSV cells as NaN; the reference's regex
        # parsing predates that (old astype(str) semantics) — normalize
        raw = raw.fillna("")
        enriched = ref.integration.prepare_log_frame(
            raw, set_time_index=True)
        spans = ref.integration.get_all_task_start_ends(
            enriched, "list")        # reference default timing
        assert len(spans) == 2       # one song + one silence trial

    def test_serial_measurements_load(self, ref, experiment):
        serial = ref.integration.fetch_serial_measurements(experiment)
        assert {"fsr", "ecg", "gsr"} <= set(serial.columns)
        assert len(serial) > 100
        assert isinstance(serial.index, pd.DatetimeIndex)

    def test_questionnaires_and_personal_data_load(self, ref,
                                                   experiment):
        personal = ref.integration.fetch_personal_data(experiment)
        assert personal["Dominant hand"] == "Right"
        q = ref.integration.fetch_trial_questionnaire(experiment,
                                                      song_id=0)
        assert q["Liking"] == 3
        onboard = ref.integration.fetch_onboarding_questionnaire(
            experiment)
        assert "Listening habit" in onboard

    def test_trial_accuracy_loads(self, ref, experiment):
        acc = ref.integration.fetch_trial_accuracy(experiment,
                                                   song_id=0)
        assert len(acc) > 0

    def test_song_information_loads(self, ref, experiment):
        info = ref.integration.fetch_song_information(experiment,
                                                      song_id=0)
        assert info["Duration [ms]"] == 180000


class TestValidationAndCurationParity:
    """Validators / repair / music-feature join on the acquisition
    fixture's real artifacts, run through BOTH implementations."""

    def test_song_index_validation_agrees(self, ref, mine, experiment_log):
        log, exp_dir = experiment_log
        r = ref.integration.validate_song_indices(
            log.copy(), exp_dir, verbose=False)
        m = mine.integration.validate_song_indices(
            log.copy(), exp_dir, verbose=False)
        assert r["valid"] == m["valid"] is True
        assert len(r["matches"]) == len(m["matches"]) >= 1
        assert len(r["mismatches"]) == len(m["mismatches"]) == 0

    def test_questionnaire_validation_and_repair_agree(
            self, ref, mine, experiment_log):
        log, exp_dir = experiment_log
        r = ref.integration.validate_trial_questionnaires(
            log.copy(), exp_dir, verbose=False)
        m = mine.integration.validate_trial_questionnaires(
            log.copy(), exp_dir, verbose=False)
        assert r["valid"] == m["valid"]
        assert len(r["song_matches"]) == len(m["song_matches"]) >= 1
        assert len(r["silence_matches"]) == \
            len(m["silence_matches"]) >= 1
        assert len(r["mismatches"]) == len(m["mismatches"])
        # repair is a no-op when nothing mismatches, identical outputs
        r_fixed = ref.integration.repair_trial_questionnaire_mismatches(
            log.copy(), r)
        m_fixed = mine.integration.repair_trial_questionnaire_mismatches(
            log.copy(), m)
        assert len(r_fixed) == len(m_fixed)

    def test_music_feature_join(self, ref, mine, experiment_log,
                                tmp_path):
        from mba_tpu.utils.file_management import file_title
        log, exp_dir = experiment_log
        lookup = pd.DataFrame({
            "Title": ["Track0"], "Artist": ["Artist"],
            "BPM_manual": [120.0], "Spectral Flux Mean": [0.5],
            "Spectral Centroid Mean": [1500.0],
            "IOI Variance Coeff": [0.2], "Syncopation Ratio": [0.1]})
        path = tmp_path / file_title(
            "Song Characteristics Lookup Table", ".csv")
        lookup.to_csv(path, index=False)
        r = ref.integration.fetch_music_features(
            log, music_lookup_table_path=path, song_id=0)
        m = mine.integration.fetch_music_features(
            log, music_lookup_table_path=path, song_id=0)
        np.testing.assert_allclose(np.asarray(m, float),
                                   np.asarray(r, float))
        assert list(np.asarray(r, float)) == [120.0, 0.5, 1500.0,
                                              0.2, 0.1]


class TestTaskWiseCmcOrchestratorParity:
    """The full task-selective CMC orchestrator (mask from log + global
    grid + jackknife + EMG-max) against the reference on the same
    recording + enriched log."""

    def test_end_to_end_values(self, ref, mine):
        from tests.test_pipeline_data_integration import make_raw_log
        log = mine.integration.prepare_log_frame(make_raw_log(),
                                                 set_time_index=True)
        fs = 128.0
        t0 = log.index.min()
        span = (log.index.max() - t0).total_seconds() + 5
        n = int(span * fs)
        rng = np.random.default_rng(0)
        white = rng.standard_normal(n)
        spec = np.fft.rfft(white)
        f = np.fft.rfftfreq(n, 1 / fs)
        spec[(f < 15) | (f > 30)] = 0
        drive = np.fft.irfft(spec, n=n)
        drive /= drive.std() + 1e-12
        eeg = (0.6 * drive[:, None]
               + rng.standard_normal((n, 64))).astype(np.float64)
        emg = (0.6 * drive[:, None]
               + rng.standard_normal((n, 3))).astype(np.float64)
        # the log's relative time axis starts at the measurement start:
        # both implementations derive window centres the same way
        subset = ["C3", "C4", "Cz"]
        kwargs = dict(sampling_freq=int(fs), muscle_group="flexor",
                      log_frame=log, eeg_channel_subset=subset,
                      window_size_sec=2.0, window_overlap_ratio=0.5,
                      use_jackknife=True,
                      pre_trial_computation_buffer_sec=1.0,
                      post_trial_computation_buffer_sec=1.0)
        r_vals, r_lo, r_hi, r_t, r_f = \
            ref.features.compute_task_wise_aggregated_cmc(
                eeg, emg, **kwargs)
        m_vals, m_lo, m_hi, m_t, m_f = \
            mine.features.compute_task_wise_aggregated_cmc(
                eeg, emg, **kwargs)
        np.testing.assert_allclose(m_t, r_t)
        np.testing.assert_allclose(m_f, r_f)
        assert m_vals.shape == r_vals.shape
        active_r = np.asarray(r_vals).any(axis=(1, 2))
        active_m = np.asarray(m_vals).any(axis=(1, 2))
        np.testing.assert_array_equal(active_m, active_r)
        assert active_r.sum() > 0          # mask selected task windows
        np.testing.assert_allclose(np.asarray(m_vals),
                                   np.asarray(r_vals), atol=2e-3)
        np.testing.assert_allclose(np.asarray(m_lo),
                                   np.asarray(r_lo), atol=5e-3)
        np.testing.assert_allclose(np.asarray(m_hi),
                                   np.asarray(r_hi), atol=5e-3)


class TestEnrichedSerialFrameInterop:
    def test_our_builder_feeds_reference_fetcher(self, ref, experiment):
        from mba_tpu.workflows.data_integration_workflow import (
            integrate_subject)
        from mba_tpu.workflows.subject_feature_extraction_workflow \
            import build_enriched_serial_frame
        integrate_subject(0, experiment.parent, validate=False)
        ours = build_enriched_serial_frame(experiment)
        got = ref.integration.fetch_enriched_serial_frame(experiment)
        assert {"bpm", "hrv", "Task-wise Scaled Force"} <= \
            set(got.columns)
        assert len(got) == len(ours)
        assert isinstance(got.index, pd.DatetimeIndex)
