"""Surrogate engine tests: fault injection parity + phase-randomisation
properties + null-threshold sanity."""
import numpy as np
import jax

from mba_tpu.ops.surrogate import (insert_bad_channels, add_noise_to_channels,
                                   generate_noise, phase_randomize,
                                   msc_phase_randomized_null)


class TestBadChannels:
    def test_identity_at_unity_scale(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((500, 8))
        out, inds = insert_bad_channels(x, axis=0, n_channels=3,
                                        scale_range=(1.0, 1.0), rng=rng)
        np.testing.assert_allclose(out, x)
        assert len(inds) == 3

    def test_only_listed_channels_modified(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((500, 8))
        out, inds = insert_bad_channels(x, axis=0, n_channels=2, rng=rng)
        changed = {c for c in range(8)
                   if not np.allclose(out[:, c], x[:, c])}
        assert changed == {i - 1 for i in inds}  # returned inds are 1-based
        assert len(changed) == 2


class TestNoise:
    def test_white_noise_rms(self):
        n = generate_noise((10000,), "white", 2.5,
                           np.random.default_rng(0))
        assert abs(np.sqrt(np.mean(n ** 2)) - 2.5) < 1e-9

    def test_pink_noise_spectrum_slope(self):
        n = generate_noise((2 ** 14,), "pink", 1.0, np.random.default_rng(0))
        f = np.fft.rfftfreq(len(n))
        p = np.abs(np.fft.rfft(n)) ** 2
        lo = p[(f > 0.001) & (f < 0.01)].mean()
        hi = p[(f > 0.1) & (f < 0.5)].mean()
        assert lo > 5 * hi  # 1/f: low frequencies dominate

    def test_target_snr(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((20000, 4))
        noisy = add_noise_to_channels(x, noise_db=0.0, channels=[1],
                                      random_seed=3)
        added = noisy[:, 1] - x[:, 1]
        snr = 10 * np.log10(np.mean(x[:, 1] ** 2) / np.mean(added ** 2))
        assert abs(snr) < 0.5
        np.testing.assert_allclose(noisy[:, 0], x[:, 0])


class TestPhaseRandomize:
    def test_preserves_amplitude_spectrum(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((512, 2)).astype(np.float32)
        surr = np.asarray(phase_randomize(jax.random.PRNGKey(0),
                                          x, n_surrogates=4))
        for s in surr:
            np.testing.assert_allclose(
                np.abs(np.fft.rfft(s, axis=0)),
                np.abs(np.fft.rfft(x, axis=0)), rtol=2e-3, atol=2e-3)

    def test_surrogates_differ_and_real(self):
        x = np.random.default_rng(1).standard_normal((256, 1)).astype(
            np.float32)
        surr = np.asarray(phase_randomize(jax.random.PRNGKey(1), x, 3))
        assert not np.allclose(surr[0], surr[1])
        assert np.isrealobj(surr)


class TestMscNull:
    def test_null_destroys_true_coherence(self):
        # NOTE: the shared component must be STOCHASTIC — phase
        # randomisation preserves any deterministic narrowband component
        # (a phase rotation of a sine is a time shift, and MSC is
        # shift-invariant), so a pure shared sine would survive the null.
        fs, seconds = 128, 8
        rng = np.random.default_rng(5)
        n = fs * seconds
        # band-limited stochastic shared drive around 16 Hz:
        white = rng.standard_normal(n)
        spec = np.fft.rfft(white)
        f = np.fft.rfftfreq(n, 1 / fs)
        spec[(f < 12) | (f > 20)] = 0
        shared = np.fft.irfft(spec, n=n)
        shared /= shared.std()
        eeg = (shared + 0.5 * rng.standard_normal(n))[:, None]
        emg = (shared + 0.5 * rng.standard_normal(n))[:, None]
        res = msc_phase_randomized_null(
            eeg, emg, fs, n_surrogates=100, window_length_sec=1.0,
            quantiles=(0.95,), surrogate_chunk=50, seed=0)
        f16 = np.argmin(np.abs(res["freqs"] - 16))
        observed_peak = res["observed"][f16, 0, 0]
        null_thresh = res["null_quantiles"][0.95][f16, 0, 0]
        assert observed_peak > null_thresh  # true coupling is significant
        # null thresholds bounded away from 1 (coherence destroyed)
        assert res["null_quantiles"][0.95].mean() < observed_peak

    def test_dc_excluded_from_max_stat(self):
        # regression: DC/Nyquist keep zero phase under the randomisation
        # (the surrogate must stay real), so coherence there is NOT
        # destroyed under the null.  A strong shared slow drift pins DC
        # coherence near 1 in the observed data AND in every surrogate —
        # with DC in the max statistic, p_fwe would be ~1 despite a huge
        # genuine in-band coupling.
        fs, seconds = 128, 16
        rng = np.random.default_rng(9)
        n = fs * seconds
        t = np.arange(n) / fs
        white = rng.standard_normal(n)
        spec = np.fft.rfft(white)
        f = np.fft.rfftfreq(n, 1 / fs)
        spec[(f < 12) | (f > 20)] = 0
        shared = np.fft.irfft(spec, n=n)
        shared /= shared.std()
        drift = 20.0 * np.sin(2 * np.pi * 0.02 * t)   # << 1/window_length
        eeg = (shared + drift + 0.5 * rng.standard_normal(n))[:, None]
        emg = (shared + drift + 0.5 * rng.standard_normal(n))[:, None]
        # the drift's taper-bandwidth leakage reaches ~nw/T = 3 Hz, and a
        # deterministic component survives phase randomisation anywhere it
        # lands — restrict the max statistic to the analysis band, as the
        # cohort engine does
        res = msc_phase_randomized_null(
            eeg, emg, fs, n_surrogates=100, window_length_sec=1.0,
            band=(8.0, 40.0), quantiles=(0.95,), surrogate_chunk=50,
            seed=1)
        # the shared drift drives observed DC coherence toward 1 ...
        assert res["observed"][0, 0, 0] > 0.9
        # ... and the surrogates preserve it (per-cell null at DC is
        # as high as the observed value — not a valid null there)
        assert res["null_quantiles"][0.95][0, 0, 0] > 0.9
        # but the max statistic excludes it: the 12-20 Hz coupling is
        # detected family-wise despite the pathological DC cell
        assert res["p_fwe"] < 0.05
        assert res["observed_max"] > np.quantile(res["max_stat"], 0.95)
        assert np.quantile(res["max_stat"], 0.95) < 0.8

    def test_nyquist_excluded_by_index(self):
        # regression: rfftfreq rounding puts the Nyquist bin strictly
        # below fs/2 for many rates (e.g. fs=93, 0.5-s window →
        # freqs[-1]=46.49999999999999 < 46.5), so a value-based mask
        # (freqs < fs/2) kept the never-rotated Nyquist bin in the max
        # statistic.  The mask must exclude DC/Nyquist by INDEX.
        from mba_tpu.ops.surrogate import _null_freq_mask
        for fs, wl in [(93, 0.5), (128, 1.0), (100, 0.7), (2048, 2.0)]:
            ws = int(wl * fs)
            freqs = np.fft.rfftfreq(ws, d=1.0 / fs)
            mask = _null_freq_mask(freqs, ws, None)
            assert not mask[0], (fs, wl)
            if ws % 2 == 0:
                assert not mask[-1], (fs, wl)
            assert mask[1:-1].all(), (fs, wl)
        # the fs=93 case is the one a float comparison gets wrong
        ws = int(0.5 * 93)
        freqs = np.fft.rfftfreq(ws, d=1.0 / 93)
        assert freqs[-1] < 93 / 2            # the rounding trap itself
        assert not _null_freq_mask(freqs, ws, None)[-1]
        # band restriction composes
        mask = _null_freq_mask(freqs, ws, (8.0, 30.0))
        assert mask.sum() == ((freqs >= 8) & (freqs <= 30)).sum()

    def test_band_restriction(self):
        rng = np.random.default_rng(10)
        eeg = rng.standard_normal((1024, 1)).astype(np.float32)
        emg = rng.standard_normal((1024, 1)).astype(np.float32)
        res = msc_phase_randomized_null(
            eeg, emg, 128, n_surrogates=32, window_length_sec=1.0,
            band=(13.0, 40.0), surrogate_chunk=32, max_stat_only=True,
            seed=2)
        assert res["max_stat"].shape == (32,)
        assert 0.0 < res["p_fwe"] <= 1.0
        import pytest
        with pytest.raises(ValueError):
            msc_phase_randomized_null(
                eeg, emg, 128, n_surrogates=8, window_length_sec=1.0,
                band=(70.0, 60.0), surrogate_chunk=8, max_stat_only=True)

    def test_max_stat_mode(self):
        rng = np.random.default_rng(6)
        eeg = rng.standard_normal((512, 2)).astype(np.float32)
        emg = rng.standard_normal((512, 2)).astype(np.float32)
        res = msc_phase_randomized_null(
            eeg, emg, 128, n_surrogates=64, window_length_sec=1.0,
            quantiles=(0.95,), surrogate_chunk=32, max_stat_only=True)
        assert res["max_stat"].shape == (64,)
        assert 0 < res["null_quantiles"][0.95] <= 1


class TestAutoVmapWidth:
    def test_bounds(self):
        from mba_tpu.ops.surrogate import _auto_vmap_width
        # single pair: generous width, capped at the chunk size
        assert _auto_vmap_width(119, 4096, 5, 1, 1, 64) == 64
        # 64x64 channels: transient tensors are huge -> width collapses
        w = _auto_vmap_width(119, 4096, 5, 64, 64, 64)
        assert 1 <= w <= 4
        # never below 1 even for absurd sizes
        assert _auto_vmap_width(10_000, 8192, 8, 256, 256, 512) == 1
