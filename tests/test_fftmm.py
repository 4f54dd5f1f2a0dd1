"""MXU matmul-decomposed rFFT vs the reference FFT."""
import numpy as np
import pytest

from mba_tpu.ops.fftmm import rfft_mxu, _split


class TestSplit:
    def test_powers_of_two(self):
        assert _split(4096) == (128, 32) or _split(4096) == (64, 64)
        for n in (4, 8, 64, 256, 1024, 2048, 4096, 8192):
            n1, n2 = _split(n)
            assert n1 * n2 == n and n1 >= n2
            assert (n1 & (n1 - 1)) == 0 and (n2 & (n2 - 1)) == 0

    def test_rejects_non_power_of_two(self):
        with pytest.raises(ValueError):
            _split(1000)
        with pytest.raises(ValueError):
            _split(2)


class TestRfftMxu:
    @pytest.mark.parametrize("n", [64, 256, 1024, 2048, 4096])
    def test_matches_numpy_rfft(self, n):
        rng = np.random.default_rng(n)
        x = rng.standard_normal((3, n)).astype(np.float32)
        got = np.asarray(rfft_mxu(x))
        want = np.fft.rfft(x.astype(np.float64))
        assert got.shape == want.shape and got.dtype == np.complex64
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-4 * scale)

    def test_axis_arg(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((6, 512, 5)).astype(np.float32)
        got = np.asarray(rfft_mxu(x, axis=1))
        want = np.fft.rfft(x.astype(np.float64), axis=1)
        np.testing.assert_allclose(got, want,
                                   atol=2e-4 * np.abs(want).max())
        got_neg = np.asarray(rfft_mxu(x, axis=-2))
        np.testing.assert_allclose(got_neg, got, atol=0)

    def test_pure_tones_land_in_their_bins(self):
        n, fs = 2048, 2048.0
        t = np.arange(n) / fs
        x = (np.sin(2 * np.pi * 21.0 * t)
             + 0.5 * np.cos(2 * np.pi * 400.0 * t)).astype(np.float32)
        spec = np.abs(np.asarray(rfft_mxu(x)))
        assert spec.argmax() == 21
        rest = spec.copy()
        rest[[21, 400]] = 0
        assert spec[400] > 100 * rest.max()

    def test_psd_parseval(self):
        # sum |X|^2 (two-sided) == n * sum x^2
        rng = np.random.default_rng(7)
        n = 1024
        x = rng.standard_normal(n).astype(np.float32)
        spec = np.asarray(rfft_mxu(x))
        power = (np.abs(spec[0]) ** 2 + np.abs(spec[-1]) ** 2
                 + 2 * np.sum(np.abs(spec[1:-1]) ** 2))
        np.testing.assert_allclose(power, n * np.sum(x.astype(np.float64)**2),
                                   rtol=1e-4)
