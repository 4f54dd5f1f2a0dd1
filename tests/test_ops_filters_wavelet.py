"""FIR filtering and wavelet denoising kernel tests."""
import numpy as np
import pytest
import scipy.signal

from mba_tpu.ops.filters import (design_bandpass_fir, design_notch_fir,
                                 fir_filter, bandpass_filter, notch_filter)
from mba_tpu.ops.wavelet import (dwt, idwt, wavedec, waverec,
                                 wavedec_lengths, wavelet_denoise,
                                 dwt_max_level, wavelet_filters)


def _tone_mix(fs=512, seconds=6, freqs=(5, 21.5, 50, 120), seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    x = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    return (x + 0.1 * rng.standard_normal(len(t))).astype(np.float64), t


def _band_power(x, fs, f0, bw=1.5):
    f, p = scipy.signal.welch(np.asarray(x, float), fs=fs, nperseg=fs * 2)
    band = (f > f0 - bw) & (f < f0 + bw)
    return p[band].mean()


class TestFirDesign:
    def test_matches_scipy_convolution(self):
        """Our overlap-save equals scipy zero-phase 'same' convolution."""
        h = design_bandpass_fir(512, 15, 30, filter_length=257)
        x, _ = _tone_mix()
        x2 = np.stack([x, x[::-1]], axis=1)
        ours = np.asarray(fir_filter(x2, h, zero_phase=True))
        # golden: reflect_limited pad + valid convolution
        half = (len(h) - 1) // 2
        left = 2 * x2[0:1] - x2[1:half + 1][::-1]
        right = 2 * x2[-1:] - x2[-half - 1:-1][::-1]
        xp = np.concatenate([left, x2, right], axis=0)
        ref = np.stack([np.convolve(xp[:, c], h, mode='valid')
                        for c in range(2)], axis=1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_chunked_equals_unchunked(self):
        h = design_bandpass_fir(512, 15, 30, filter_length=129)
        x, _ = _tone_mix(seconds=3)
        a = np.asarray(fir_filter(x, h, chunk=500))
        b = np.asarray(fir_filter(x, h, chunk=1 << 16))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_odd_length_forced(self):
        assert len(design_bandpass_fir(512, 15, 30)) % 2 == 1


class TestBandpassBehavior:
    def test_passband_kept_stopband_killed(self):
        fs = 512
        x, _ = _tone_mix(fs)
        y = np.asarray(bandpass_filter(x, fs, 15, 30))
        # 21.5 Hz passes (>80% power), 5 and 120 Hz attenuated >100x
        assert _band_power(y, fs, 21.5) > 0.5 * _band_power(x, fs, 21.5)
        assert _band_power(y, fs, 5) < 0.01 * _band_power(x, fs, 5)
        assert _band_power(y, fs, 120) < 0.01 * _band_power(x, fs, 120)

    def test_zero_phase_no_lag(self):
        fs = 512
        t = np.arange(fs * 4) / fs
        x = np.sin(2 * np.pi * 21.5 * t)
        y = np.asarray(bandpass_filter(x, fs, 15, 30))
        # cross-correlation peak at zero lag
        core = slice(fs, -fs)
        xc = np.correlate(y[core], x[core], mode='full')
        lag = np.argmax(xc) - (len(x[core]) - 1)
        assert lag == 0

    def test_highpass_and_lowpass_only(self):
        fs = 512
        x, _ = _tone_mix(fs)
        hp = np.asarray(bandpass_filter(x, fs, 15, None))
        lp = np.asarray(bandpass_filter(x, fs, None, 30))
        assert _band_power(hp, fs, 5) < 0.01 * _band_power(x, fs, 5)
        assert _band_power(lp, fs, 120) < 0.01 * _band_power(x, fs, 120)


class TestNotch:
    def test_notch_bank_kills_harmonics(self):
        fs = 1024
        t = np.arange(fs * 4) / fs
        x = (np.sin(2 * np.pi * 21.5 * t) + np.sin(2 * np.pi * 50 * t)
             + 0.7 * np.sin(2 * np.pi * 100 * t))
        y = np.asarray(notch_filter(x, fs, [50 * i for i in (1, 2, 3, 4)],
                                    notch_widths=2.0))
        assert _band_power(y, fs, 50, 0.8) < 0.02 * _band_power(x, fs, 50, 0.8)
        assert _band_power(y, fs, 100, 0.8) < 0.02 * _band_power(x, fs, 100,
                                                                 0.8)
        assert _band_power(y, fs, 21.5) > 0.5 * _band_power(x, fs, 21.5)


class TestWavelet:
    @pytest.mark.parametrize("wavelet", ["db4", "sym5", "coif1", "haar"])
    @pytest.mark.parametrize("n", [64, 100, 37])
    def test_perfect_reconstruction_single_level(self, wavelet, n):
        x = np.random.default_rng(0).standard_normal(n)
        ca, cd = dwt(x, wavelet)
        y = np.asarray(idwt(ca, cd, wavelet, n))
        np.testing.assert_allclose(y, x, atol=1e-5)

    @pytest.mark.parametrize("wavelet", ["db4", "sym5"])
    def test_perfect_reconstruction_multilevel(self, wavelet):
        n = 1000
        x = np.random.default_rng(1).standard_normal((n, 3))
        level = 4
        coeffs = wavedec(x, wavelet, level)
        lens = wavedec_lengths(n, wavelet, level)
        y = np.asarray(waverec(coeffs, wavelet, lengths=lens))
        np.testing.assert_allclose(y, x, atol=1e-4)

    def test_orthonormal_filters(self):
        for w in ["db4", "sym5", "coif1"]:
            lo, hi, _, _ = wavelet_filters(w)
            assert abs((lo ** 2).sum() - 1) < 1e-10
            assert abs(np.dot(lo, hi)) < 1e-10
            assert abs(lo.sum() - np.sqrt(2)) < 1e-6

    def test_max_level(self):
        assert dwt_max_level(1024, 8) == 7
        assert dwt_max_level(4, 8) == 0

    def test_denoising_improves_snr(self):
        fs = 256
        t = np.arange(fs * 8) / fs
        clean = np.sin(2 * np.pi * 5 * t)
        rng = np.random.default_rng(2)
        noisy = clean + 0.5 * rng.standard_normal(len(t))
        den = np.asarray(wavelet_denoise(noisy, 'db4', mode='soft'))
        assert den.shape == noisy.shape
        mse_before = np.mean((noisy - clean) ** 2)
        mse_after = np.mean((den - clean) ** 2)
        assert mse_after < 0.7 * mse_before

    def test_hard_vs_soft(self):
        # strong spikes exceed the universal threshold, so soft (shrinks
        # survivors) and hard (keeps them) must differ; pure noise would
        # be zeroed identically by both modes.
        rng = np.random.default_rng(3)
        x = rng.standard_normal(512).astype(np.float32)
        x[::37] += 25.0
        soft = np.asarray(wavelet_denoise(x, 'db4', level=2, mode='soft'))
        hard = np.asarray(wavelet_denoise(x, 'db4', level=2, mode='hard'))
        assert not np.allclose(soft, hard)
