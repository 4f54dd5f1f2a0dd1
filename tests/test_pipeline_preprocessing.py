"""Preprocessing cascade tests (reference test_preprocessing.py patterns:
init matrix, cache-invalidation truth table, surrogate validation)."""
import json

import numpy as np
import pytest

from mba_tpu.pipeline.preprocessing import (BiosignalPreprocessor,
                                            import_npy_with_config)


def _eeg_like(fs=256, seconds=20, n_ch=8, seed=0):
    rng = np.random.default_rng(seed)
    n = fs * seconds
    t = np.arange(n) / fs
    beta = np.sin(2 * np.pi * 21.5 * t)
    line = 0.5 * np.sin(2 * np.pi * 50 * t)
    drift = 0.3 * np.sin(2 * np.pi * 0.05 * t)
    x = (beta[:, None] + line[:, None] + drift[:, None]
         + 0.3 * rng.standard_normal((n, n_ch))) * 1e-5
    return x.astype(np.float64)


@pytest.fixture(scope="module")
def prep():
    p = BiosignalPreprocessor(_eeg_like(), sampling_freq=256,
                              modality='eeg', n_ica_components=None,
                              wavelet_type='db4',
                              amplitude_rejection_threshold=3e-4)
    return p


class TestInit:
    def test_shape_assertion(self):
        with pytest.raises(AssertionError):
            BiosignalPreprocessor(np.zeros((4, 100)), 256, 'eeg')

    def test_auto_bands(self):
        eeg = BiosignalPreprocessor(_eeg_like(seconds=2), 256, 'eeg')
        assert eeg.band_pass_frequencies == (.1, 100)
        emg = BiosignalPreprocessor(_eeg_like(seconds=2), 256, 'emg')
        assert emg.band_pass_frequencies == (20, 500)
        assert eeg.laplacian_filter_neighbor_radius == .05
        assert emg.laplacian_filter_neighbor_radius is None

    def test_emg_ica_raises(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=2), 256, 'emg',
                                  n_ica_components=5)
        with pytest.raises(ValueError, match="eeg|EEG"):
            _ = p.ica_result

    def test_missing_params_raise(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=2), 256, 'eeg',
                                  n_ica_components=None,
                                  amplitude_rejection_threshold=None)
        with pytest.raises(ValueError, match="n_ica_components"):
            _ = p.ica_result
        with pytest.raises(ValueError, match="amplitude_rejection"):
            p._annotate_amplitude_based_artefacts()


class TestCascade:
    def test_filtering_removes_line_noise_and_drift(self, prep):
        from mba_tpu.ops.spectral import welch_psd
        out = prep.np_filtered_data
        assert out.shape == prep.np_input_data.shape
        fs = prep.sampling_freq
        f, p_raw = welch_psd(prep.np_input_data[:, 0], fs, nperseg=fs * 4)
        _, p_out = welch_psd(out[:, 0], fs, nperseg=fs * 4)
        band = lambda p, lo, hi: p[(f >= lo) & (f <= hi)].mean()
        # 50 Hz notch kills line noise; beta band is preserved.  (The
        # 0.05 Hz drift sits mid-transition of the 0.1 Hz highpass and
        # below Welch's 0.25 Hz resolution, so it isn't assertable here.)
        assert band(p_out, 49, 51) < 0.05 * band(p_raw, 49, 51)
        assert band(p_out, 20, 23) > 0.5 * band(p_raw, 20, 23)
        # validation helper runs and returns finite numbers
        snr_gain, psd_diff = prep.validate_filtering(verbose=False)
        assert np.isfinite(snr_gain) and np.isfinite(psd_diff)

    def test_average_reference_zero_mean(self, prep):
        ref = prep.np_referenced_data
        np.testing.assert_allclose(ref.mean(axis=1), 0, atol=1e-8)

    def test_emg_not_rereferenced(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=2), 256, 'emg',
                                  n_ica_components=None)
        np.testing.assert_array_equal(p.np_referenced_data,
                                      p.np_filtered_data)

    def test_laplacian_output(self, prep):
        lap = prep.np_spatially_filtered_data
        assert lap.shape == prep.np_input_data.shape
        # equals the explicit per-channel neighbor-mean subtraction
        neighbors = prep.get_neighboring_electrodes_mapping()
        x = prep.np_artefact_free_data
        i = next(i for i, n in enumerate(neighbors) if n)
        expected = x[:, i] - x[:, neighbors[i]].mean(axis=1)
        np.testing.assert_allclose(lap[:, i], expected, atol=1e-5)

    def test_output_is_denoised(self, prep):
        np.testing.assert_array_equal(prep.np_output_data,
                                      prep.np_denoised_data)

    def test_ica_cleanup_pipeline(self):
        # small EEG with a strong muscle-band component → ICA removes it
        fs, n = 128, 128 * 30
        rng = np.random.default_rng(3)
        t = np.arange(n) / fs
        brain = np.sin(2 * np.pi * 10 * t)
        hf = rng.standard_normal(n)
        spec = np.fft.rfft(hf)
        f = np.fft.rfftfreq(n, 1 / fs)
        spec[f < 35] = 0
        hf = np.fft.irfft(spec, n=n)
        mix = rng.standard_normal((6, 2))
        x = (np.stack([brain, 4 * hf], 1) @ mix.T
             + 0.1 * rng.standard_normal((n, 6))) * 1e-5
        p = BiosignalPreprocessor(x, fs, 'eeg', n_ica_components=4,
                                  band_pass_frequencies=(1, 63),
                                  notch_frequency=None,
                                  amplitude_rejection_threshold=None,
                                  laplacian_filter_neighbor_radius=None)
        cleaned = p.np_artefact_free_data
        assert cleaned.shape == x.shape
        labels = p.ica_automatic_labels['labels']
        assert len(labels) == 4


class TestInvalidation:
    def test_setter_triggers_recompute(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=4), 256, 'eeg',
                                  n_ica_components=None)
        a = p.np_filtered_data
        p.band_pass_frequencies = (8, 30)
        assert p._filtered_data is None  # cache cleared
        b = p.np_filtered_data
        assert not np.allclose(a, b)

    def test_hierarchy_truth_table(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=4), 256, 'eeg',
                                  n_ica_components=None,
                                  amplitude_rejection_threshold=1e-3)
        _ = p.np_output_data
        # denoising change keeps upstream caches
        p.denoising_threshold_mode = 'hard'
        assert p._filtered_data is not None
        assert p._referenced_data is not None
        assert p._output_data is None
        _ = p.np_output_data
        # referencing change clears everything from referencing down
        p.reference_channels = None
        assert p._filtered_data is not None
        assert p._referenced_data is None
        assert p._output_data is None

    def test_invalid_stage_raises(self, prep):
        with pytest.raises(ValueError, match="undefined"):
            prep.clean_downstream_results("bogus stage")


class TestAmplitudeThresholding:
    def test_surrogate_specificity_selectivity(self):
        # clean-channel rolling ptp is ~1e-5, x5-15-scaled ~1.1-1.5e-4
        p = BiosignalPreprocessor(_eeg_like(seconds=10), 256, 'eeg',
                                  n_ica_components=None,
                                  amplitude_rejection_threshold=5e-5)
        spec, sel = p.validate_amplitude_thresholding(n_runs=4,
                                                      verbose=False)
        assert spec > 0.9   # unchanged channels rarely flagged
        assert sel > 0.9    # scaled (x5-15) channels reliably flagged

    def test_all_bad_raises(self):
        p = BiosignalPreprocessor(_eeg_like(seconds=4), 256, 'eeg',
                                  n_ica_components=None,
                                  amplitude_rejection_threshold=1e-12)
        with pytest.raises(ValueError, match="all channels"):
            _ = p.np_amplitude_compliant_data


class TestConfigRoundtrip:
    def test_export_import(self, tmp_path):
        x = _eeg_like(seconds=4)
        p = BiosignalPreprocessor(x, 256, 'eeg', n_ica_components=None,
                                  wavelet_type='sym5',
                                  band_pass_frequencies=(1, 40))
        p.manual_ics_to_exclude = [1, 3]
        p.export_results(tmp_path, identifier="unit")
        p2 = BiosignalPreprocessor.init_from_config(
            next(tmp_path.glob("*Preprocessor Config*.json")), x)
        assert p2.wavelet_type == 'sym5'
        assert tuple(p2.band_pass_frequencies) == (1, 40)
        assert p2.manual_ics_to_exclude == [1, 3]
        np.testing.assert_allclose(p2.np_output_data, p.np_output_data,
                                   atol=1e-6)

    def test_import_npy_with_config(self, tmp_path):
        x = _eeg_like(seconds=4)
        p = BiosignalPreprocessor(x, 256, 'eeg', n_ica_components=None)
        p.export_results(tmp_path, identifier="roundtrip")
        loaded, config = import_npy_with_config(
            "roundtrip", tmp_path, sampling_rate_Hz=256)
        np.testing.assert_allclose(loaded, p.np_output_data)
        assert config['modality'] == 'eeg'

    def test_import_zeroes_bad_channels(self, tmp_path):
        x = _eeg_like(seconds=4)
        np.save(tmp_path / "2024-01-01 10_00_00 Preprocessed eeg test.npy",
                x)
        cfg = {'sampling_freq': 256, 'modality': 'eeg',
               'bad_channels': ['Fp1', 'Fp2']}
        (tmp_path / "2024-01-01 10_00_00 Preprocessor Config test.json"
         ).write_text(json.dumps(cfg))
        loaded, _ = import_npy_with_config("test", tmp_path,
                                           sampling_rate_Hz=256)
        # Quattrocento order: Fp1 = index 0, Fpz = 1, Fp2 = 2
        assert (loaded[:, 0] == 0).all() and (loaded[:, 2] == 0).all()
        assert not (loaded[:, 1] == 0).all()


class TestAnnotateAmplitudeReferenceDefaults:
    """Pin the reference-default semantics (VERDICT r2 #9): peak 3 mV,
    min_duration 25 ms, bad_percent 5 (reference preprocessing.py:
    960-999) on a hand-computable fixture."""

    def _build(self):
        fs = 1000
        n = 10 * fs
        x = np.zeros((n, 4), np.float64)
        rng = np.random.default_rng(0)
        x += 1e-4 * rng.standard_normal((n, 4))   # 0.1 mV noise floor
        # ch1: ONE 50-ms ±2 mV burst → flagged segment, but only ~0.75 %
        # of samples → channel stays good
        t = np.arange(50)
        x[1000:1050, 1] += 2e-3 * np.sign(np.sin(2 * np.pi * t / 10))
        # ch2: bursts covering ~8 % of the recording → channel bad
        for s in range(0, n, 1000):
            x[s:s + 80, 2] += 2e-3 * np.sign(np.sin(
                2 * np.pi * np.arange(80) / 10))
        # ch3: huge DC offset but tiny peak-to-peak → must NOT flag
        # (the criterion is ptp, not absolute amplitude)
        x[:, 3] += 0.5
        return BiosignalPreprocessor(
            x, fs, 'eeg', n_ica_components=None, wavelet_type=None,
            reference_channels=None,
            amplitude_rejection_threshold=3e-3)  # reference .003

    def test_channel_and_segment_semantics(self):
        p = self._build()
        bad = p._annotate_amplitude_based_artefacts(
            min_duration=.025, max_bad_segments_percent=5.0)
        assert bad == [2]
        _ = p.np_amplitude_compliant_data
        assert p.bad_channels == [p.channel_names[2]]
        # the ch1 burst at 1.0-1.05 s must be annotated
        assert any(s <= 1.0 and e >= 1.05
                   for s, e in p.bad_annotations), p.bad_annotations

    def test_all_bad_raises(self):
        fs = 500
        x = 1.0 * np.random.default_rng(1).standard_normal((fs * 4, 3))
        p = BiosignalPreprocessor(
            x, fs, 'eeg', n_ica_components=None, wavelet_type=None,
            reference_channels=None, amplitude_rejection_threshold=3e-3)
        with pytest.raises(ValueError, match="all channels"):
            p._annotate_amplitude_based_artefacts()


class TestDeviceResidentCascade:
    """device_resident=True keeps every stage on the accelerator and
    must agree with the host-staged default bit-for-bit at f32."""

    def test_equals_default_cascade(self):
        import jax
        import jax.numpy as jnp
        x = _eeg_like(seconds=20, n_ch=6)
        kw = dict(sampling_freq=256, modality='eeg', n_ica_components=3,
                  automatic_ic_labelling=True, wavelet_type='db4',
                  amplitude_rejection_threshold=3e-4)
        host = BiosignalPreprocessor(x, **kw)
        dev = BiosignalPreprocessor(jnp.asarray(x, jnp.float32), **kw,
                                    device_resident=True)
        out_h = host.np_output_data
        out_d = dev.np_output_data
        assert isinstance(out_d, jax.Array)
        np.testing.assert_allclose(np.asarray(out_d), out_h,
                                   rtol=2e-4, atol=1e-9)
        assert dev.bad_channels == host.bad_channels
        assert dev.ica_result.exclude == host.ica_result.exclude
        # intermediate stages live on device
        assert isinstance(dev.np_filtered_data, jax.Array)
        assert isinstance(dev.np_artefact_free_data, jax.Array)

    def test_free_intermediate_stages(self):
        """Freeing drops cached stage buffers, keeps the output object,
        and later intermediate requests recompute to the same values."""
        import jax.numpy as jnp
        x = _eeg_like(seconds=12, n_ch=5)
        p = BiosignalPreprocessor(
            jnp.asarray(x, jnp.float32), 256, 'eeg', n_ica_components=3,
            automatic_ic_labelling=True, wavelet_type=None,
            amplitude_rejection_threshold=3e-4, device_resident=True)
        filt_before = np.asarray(p.np_filtered_data)
        out = p.free_intermediate_stages()
        assert out is p.np_output_data          # no recompute after free
        for attr in ('_filtered_data', '_referenced_data',
                     '_amplitude_compliant_data', '_artefact_free_data',
                     '_spatially_filtered_data', '_denoised_data'):
            assert getattr(p, attr) is None
        # diagnostics survive, intermediates recompute identically
        assert p.ica_result is not None
        np.testing.assert_allclose(np.asarray(p.np_filtered_data),
                                   filt_before, rtol=1e-6, atol=0)
