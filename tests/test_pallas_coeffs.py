"""Parity: fused Pallas coefficient pair pass vs the XLA lowering.

Interpret mode on CPU — the identical kernel runs compiled on real TPU
backends (selected automatically by the engine with an XLA retry).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mba_tpu.ops import cohort_null as CN
from mba_tpu.ops.dpss import filtered_tapers
from mba_tpu.ops.pallas_coeffs import coeff_pallas_viable


def _problem(seed=0, n_sec=8.0, fs=256.0, E=3, M=4, coupled=True):
    rng = np.random.default_rng(seed)
    n = int(n_sec * fs)
    t = np.arange(n) / fs
    eeg = rng.standard_normal((n, E)).astype(np.float32)
    emg = rng.standard_normal((n, M)).astype(np.float32)
    if coupled:
        shared = np.sin(2 * np.pi * 21.0 * t
                        + 0.1 * rng.standard_normal(n).cumsum())
        eeg[:, 0] += shared
        emg[:, 1] += shared
    return eeg, emg, fs


class TestPallasCoeffsParity:
    def _run_both(self, eeg, emg, fs, ws=256, W=10, chunk=4,
                  band_lo=0, band_hi=None, weights=None):
        tapers = jnp.asarray(filtered_tapers(ws, 3, 0.9), jnp.float32)
        F = ws // 2 + 1
        band_hi = F if band_hi is None else band_hi
        starts = jnp.asarray(
            np.linspace(0, eeg.shape[0] - ws, W).astype(np.int32))
        w = jnp.asarray(np.ones(W, np.float32) if weights is None
                        else weights.astype(np.float32))
        kw = dict(window_samples=ws, band_lo=band_lo, band_hi=band_hi,
                  window_chunk=chunk)
        b0, c0 = CN._rotation_coeffs_body(
            jnp.asarray(eeg), jnp.asarray(emg), starts, w, tapers, **kw)
        b1, c1 = CN._rotation_coeffs_body(
            jnp.asarray(eeg), jnp.asarray(emg), starts, w, tapers,
            use_pallas=True, pallas_interpret=True, **kw)
        return (np.asarray(b0), np.asarray(c0),
                np.asarray(b1), np.asarray(c1))

    def test_full_band_uniform_weights(self):
        eeg, emg, fs = _problem()
        b0, c0, b1, c1 = self._run_both(eeg, emg, fs)
        np.testing.assert_allclose(b1, b0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(c1, c0, rtol=2e-5, atol=2e-6)

    def test_band_slice_odd_nF(self):
        # nF = 95 exercises the 128-lane zero padding
        eeg, emg, fs = _problem(1)
        b0, c0, b1, c1 = self._run_both(eeg, emg, fs, band_lo=5,
                                        band_hi=100)
        assert b0.shape[0] == 95
        np.testing.assert_allclose(b1, b0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(c1, c0, rtol=2e-5, atol=2e-6)

    def test_nonuniform_weights_and_padding(self):
        # W=10 with chunk=4 pads 2 windows; zero weights must stay zero
        eeg, emg, fs = _problem(2)
        w = np.array([1, 0, 2, 0.5, 1, 1, 0, 3, 1, 0.25], np.float32)
        b0, c0, b1, c1 = self._run_both(eeg, emg, fs, weights=w)
        np.testing.assert_allclose(b1, b0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(c1, c0, rtol=2e-5, atol=2e-6)

    def test_int16_transfer_dtype_inputs(self):
        eeg, emg, fs = _problem(3)
        e16 = (eeg * 1000).astype(np.int16)
        m16 = (emg * 1000).astype(np.int16)
        b0, c0, b1, c1 = self._run_both(e16, m16, fs)
        np.testing.assert_allclose(b1, b0, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(c1, c0, rtol=2e-5, atol=2e-6)

    def test_observed_statistic_identical_through_engine_algebra(self):
        # base + Σ cos-features·coef at φ=0 must match either path
        eeg, emg, fs = _problem(4)
        b0, c0, b1, c1 = self._run_both(eeg, emg, fs)
        P = c0.shape[-1]
        obs0 = b0 + c0[..., :P // 2].sum(axis=-1)
        obs1 = b1 + c1[..., :P // 2].sum(axis=-1)
        np.testing.assert_allclose(obs1, obs0, rtol=2e-5, atol=2e-6)
        # MSC-like bounds on the observed statistic
        assert np.all(obs0 > -1e-5) and np.all(obs0 < 1 + 1e-5)


class TestViabilityGuard:
    def test_study_scale_is_viable(self):
        assert coeff_pallas_viable(8, 5, 11, 64)

    def test_flagship_shapes_are_viable(self):
        # regression: the first kernel shape rejected the 64x64-pair
        # north-star config (and compile-failed at 11x64/wc=32), so the
        # production bench silently rode the XLA fallback
        assert coeff_pallas_viable(32, 5, 64, 64)
        assert coeff_pallas_viable(32, 5, 11, 64)

    def test_absurd_scale_is_not(self):
        # the window-in-grid design only runs out of VMEM when the EMG
        # axis itself (untileable: every EEG block needs all of M) is
        # pathologically large
        assert not coeff_pallas_viable(64, 8, 64, 4096)
