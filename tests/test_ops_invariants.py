"""Randomized (seeded) shape/parameter sweeps over the core kernels:
invariants must hold for every sampled configuration."""
import numpy as np
import pytest


RNG = np.random.default_rng(2026)
MSC_CASES = [
    dict(n_sec=RNG.integers(4, 9), n_eeg=int(RNG.integers(1, 9)),
         n_emg=int(RNG.integers(1, 5)), fs=float(RNG.choice([128, 256])),
         win=float(RNG.choice([0.5, 1.0, 2.0])),
         overlap=float(RNG.choice([0.0, 0.5, 0.75])),
         nw=float(RNG.choice([2, 3])))
    for _ in range(6)
]


class TestMscInvariants:
    @pytest.mark.parametrize("case", MSC_CASES)
    def test_random_configs(self, case):
        from mba_tpu.ops.coherence import multitaper_msc
        n = int(case["n_sec"] * case["fs"])
        rng = np.random.default_rng(1)
        eeg = rng.standard_normal((n, case["n_eeg"])).astype(np.float32)
        emg = rng.standard_normal((n, case["n_emg"])).astype(np.float32)
        res = multitaper_msc(
            eeg, emg, case["fs"], nw=case["nw"],
            window_length_sec=case["win"],
            overlap_frac=case["overlap"], use_jackknife=True,
            apply_independence_threshold=True)
        c = res["coherence_raw"]
        lo = res["coherence_ci_lower"]
        hi = res["coherence_ci_upper"]
        ws = int(case["win"] * case["fs"])
        hop = int(ws * (1 - case["overlap"]))
        n_windows = (n - ws) // hop + 1
        assert c.shape == (n_windows, ws // 2 + 1, case["n_eeg"],
                           case["n_emg"]), case
        assert np.isfinite(c).all()
        assert (c >= 0).all() and (c <= 1).all()
        assert (lo <= c + 1e-6).all() and (hi >= c - 1e-6).all()
        assert (lo >= 0).all() and (hi <= 1).all()
        assert res["freqs"][-1] == pytest.approx(case["fs"] / 2)

    def test_single_channel_pair(self):
        from mba_tpu.ops.coherence import multitaper_msc
        rng = np.random.default_rng(2)
        sig = rng.standard_normal((512, 1)).astype(np.float32)
        res = multitaper_msc(sig, sig.copy(), 256.0, nw=3,
                             window_length_sec=1.0, use_jackknife=True,
                             apply_independence_threshold=False)
        # identical signals: coherence exactly 1 everywhere computed
        c = res["coherence_raw"]
        assert np.allclose(c[c > 0], 1.0, atol=1e-4)


class TestFilterInvariants:
    @pytest.mark.parametrize("l,h", [(1.0, 40.0), (None, 30.0),
                                     (5.0, None), (0.5, 100.0)])
    def test_bandpass_preserves_shape_finite(self, l, h):
        from mba_tpu.ops.filters import bandpass_filter
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2000, 3)).astype(np.float32)
        y = np.asarray(bandpass_filter(x, 256.0, l, h))
        assert y.shape == x.shape
        assert np.isfinite(y).all()

    def test_passband_gain_near_unity(self):
        from mba_tpu.ops.filters import bandpass_filter
        fs = 256.0
        t = np.arange(int(fs * 8)) / fs
        tone = np.sin(2 * np.pi * 20.0 * t)[:, None].astype(np.float32)
        y = np.asarray(bandpass_filter(tone, fs, 5.0, 40.0))[:, 0]
        core = slice(int(fs), -int(fs))
        gain = np.std(y[core]) / np.std(tone[core, 0])
        assert gain == pytest.approx(1.0, abs=0.05)


class TestWaveletInvariants:
    @pytest.mark.parametrize("wavelet", ["db4", "sym5", "coif1", "haar"])
    @pytest.mark.parametrize("n", [128, 129, 255])
    def test_perfect_reconstruction_all_lengths(self, wavelet, n):
        from mba_tpu.ops.wavelet import (wavedec, waverec,
                                         wavedec_lengths)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 2)).astype(np.float32)
        coeffs = wavedec(x, wavelet, level=3)
        lengths = wavedec_lengths(n, wavelet, level=3)
        y = np.asarray(waverec(coeffs, wavelet, lengths=lengths))
        np.testing.assert_allclose(y, x, atol=2e-5)
