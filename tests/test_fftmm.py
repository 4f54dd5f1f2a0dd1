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


class TestRfftProd:
    """Production dispatcher: MXU f32-accumulation on TPU, native
    elsewhere (BENCH_FFTMM.json round-4 adoption A/B)."""

    def test_cpu_falls_back_to_native(self):
        # tests run on the CPU backend -> dispatcher must return the
        # bit-exact native rfft
        from mba_tpu.ops.fftmm import rfft_prod
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 2048)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(rfft_prod(x)),
                                      np.asarray(jnp.fft.rfft(x)))

    @pytest.mark.parametrize("n", [1000, 512, 131072])
    def test_out_of_range_lengths_fall_back(self, n):
        # odd / too-short / too-long lengths must take the native path
        # on every backend (the MXU guard is length-gated)
        from mba_tpu.ops.fftmm import rfft_prod
        import jax.numpy as jnp
        rng = np.random.default_rng(n)
        x = rng.standard_normal((2, n)).astype(np.float32)
        got = np.asarray(rfft_prod(x))
        want = np.asarray(jnp.fft.rfft(x))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("n", [2048, 4096])
    def test_f32acc_path_holds_parity_bar(self, n):
        # the exact kernel the TPU dispatch runs (HIGHEST precision),
        # forced on CPU: must sit inside the framework's 1e-5 bar,
        # ~50x tighter than the bf16 default path's 7e-4
        import jax
        rng = np.random.default_rng(n)
        x = rng.standard_normal((8, n)).astype(np.float32)
        got = np.asarray(rfft_mxu(x, precision=jax.lax.Precision.HIGHEST))
        want = np.fft.rfft(x.astype(np.float64))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-5 * scale)


class TestProductionDispatchEndToEnd:
    """End-to-end CPU coverage of the TPU production dispatch (ADVICE r4).

    On real TPU backends ``rfft_prod`` routes every spectral kernel
    (coherence, PSD, surrogate, cohort null, gram coeffs) through the
    MXU matmul FFT, so the CPU suite normally only exercises the native
    fallback.  Coherence is a RATIO of spectra, which can amplify
    per-bin spectral error — so force the dispatch guard open on CPU
    (monkeypatch ``use_mxu_fft``) and assert the framework's 1e-5 bar
    on the downstream coherence and PSD outputs, not just at FFT level.
    """

    @staticmethod
    def _force_mxu(monkeypatch):
        import jax
        from mba_tpu.ops import fftmm
        monkeypatch.setattr(fftmm, "use_mxu_fft", lambda: True)
        # the spectral kernels are jitted closures over the module-level
        # rfft_prod; drop any native-path traces so the patch is seen
        jax.clear_caches()

    @staticmethod
    def _toy_signals(fs=2048.0, seconds=6.0, n_eeg=2, n_emg=2):
        rng = np.random.default_rng(99)
        n = int(fs * seconds)
        t = np.arange(n) / fs
        shared = np.sin(2 * np.pi * 21.0 * t)
        eeg = (0.6 * shared[:, None]
               + rng.standard_normal((n, n_eeg))).astype(np.float32)
        emg = (0.6 * shared[:, None]
               + rng.standard_normal((n, n_emg))).astype(np.float32)
        return eeg, emg, fs

    def test_multitaper_msc_parity(self, monkeypatch):
        import jax
        from mba_tpu.ops.coherence import multitaper_msc
        eeg, emg, fs = self._toy_signals()
        kw = dict(sampling_freq=fs, window_length_sec=2.0,  # n=4096: in
                  use_jackknife=True,                       # MXU range
                  apply_independence_threshold=False)
        native = multitaper_msc(eeg, emg, **kw)
        self._force_mxu(monkeypatch)
        try:
            forced = multitaper_msc(eeg, emg, **kw)
        finally:
            jax.clear_caches()  # don't leak MXU traces into other tests
        np.testing.assert_allclose(
            np.asarray(forced["coherence_raw"]),
            np.asarray(native["coherence_raw"]), atol=1e-5,
            err_msg="MXU production path diverges on coherence")
        # the jackknife CI amplifies spectral round-off: the Fisher-z SE
        # is a variance of leave-one-out DIFFERENCES of near-equal
        # quantities, so the ~1e-7 per-bin FFT error can reach ~1e-4 in
        # the bounds (measured max 1.2e-4 on this fixture) — still far
        # below the CI's own statistical width
        for key in ("coherence_ci_lower", "coherence_ci_upper"):
            np.testing.assert_allclose(
                np.asarray(forced[key]), np.asarray(native[key]),
                atol=5e-4,
                err_msg=f"MXU production path diverges on {key}")

    def test_multitaper_psd_parity(self, monkeypatch):
        import jax
        from mba_tpu.ops.spectral import multitaper_psd
        eeg, _, fs = self._toy_signals()
        kw = dict(sampling_freq=fs, window_length_sec=1.0,  # n=2048
                  axis=0, apply_log_scale=False)
        native, _, _ = multitaper_psd(eeg, **kw)
        self._force_mxu(monkeypatch)
        try:
            forced, _, _ = multitaper_psd(eeg, **kw)
        finally:
            jax.clear_caches()
        scale = np.abs(native).max()
        np.testing.assert_allclose(forced, native, atol=1e-5 * scale,
                                   err_msg="MXU production path diverges "
                                           "on PSD")
