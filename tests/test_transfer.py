"""Quantized device↔host transfer (utils/transfer.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mba_tpu.utils.transfer import download_quantized, upload_quantized


class TestDownloadQuantized:
    def _spectrogram_like(self, seed=0):
        # log10-PSD-shaped values: per-channel offsets + ~30 log-unit span
        rng = np.random.default_rng(seed)
        x = rng.uniform(-18.0, 8.0, size=(40, 257, 8)).astype(np.float32)
        x += rng.uniform(-5, 5, size=(1, 1, 8)).astype(np.float32)
        return x

    def test_int16_error_bound_holds(self):
        x = self._spectrogram_like()
        host, n_bytes, bound = download_quantized(jnp.asarray(x), np.int16)
        assert host.shape == x.shape and host.dtype == np.float32
        measured = np.abs(host - x).max()
        assert measured <= bound * 1.02
        # 36-log-unit worst-case span / 65535 / 2 ≈ 2.8e-4
        assert bound < 5e-4

    def test_int8_error_bound_holds(self):
        x = self._spectrogram_like(1)
        host, n_bytes, bound = download_quantized(jnp.asarray(x), np.int8)
        assert np.abs(host - x).max() <= bound * 1.02
        assert bound < 0.1        # 36/255/2 ≈ 0.07 log units

    def test_bytes_roughly_halved(self):
        x = self._spectrogram_like(2)
        _, n16, _ = download_quantized(jnp.asarray(x), np.int16)
        _, n32, _ = download_quantized(jnp.asarray(x), None)
        assert n32 == x.nbytes
        assert n16 < 0.51 * n32
        _, n8, _ = download_quantized(jnp.asarray(x), np.int8)
        assert n8 < 0.26 * n32

    def test_per_channel_isolation(self):
        # one huge-range channel must not degrade the others
        rng = np.random.default_rng(3)
        x = rng.uniform(0.0, 1.0, size=(64, 128, 4)).astype(np.float32)
        x[..., 3] *= 1e4
        host, _, _ = download_quantized(jnp.asarray(x), np.int16)
        # channels 0-2 keep coherence-grade precision
        assert np.abs(host[..., :3] - x[..., :3]).max() < 1e-4

    def test_lane_ndim_tightens_int8(self):
        # per-(freq, channel) lanes (reduce over windows only) must cut
        # the int8 error by the span ratio — this is what makes int8
        # usable for saved log-PSD artifacts
        x = self._spectrogram_like(5)
        x += np.linspace(0, 20, x.shape[1])[None, :, None].astype(np.float32)
        h1, n1, b1 = download_quantized(jnp.asarray(x), np.int8)
        h2, n2, b2 = download_quantized(jnp.asarray(x), np.int8, lane_ndim=2)
        assert b2 < b1
        assert np.abs(h2 - x).max() <= b2 * 1.02
        # per-(F, C) spans here are ≤ the window-axis span (26 units),
        # vs the per-channel span of ~46 after the freq ramp
        assert np.abs(h2 - x).max() < np.abs(h1 - x).max()
        # sidecar: 2·F·C f32 extra vs payload
        assert n2 - n1 == 2 * (x.shape[1] - 1) * x.shape[2] * 4

    def test_lane_ndim_validation(self):
        x = jnp.zeros((4, 8, 2))
        with pytest.raises(ValueError, match="lane_ndim"):
            download_quantized(x, np.int16, lane_ndim=0)
        with pytest.raises(ValueError, match="lane_ndim"):
            download_quantized(x, np.int16, lane_ndim=3)

    def test_extremes_exact(self):
        # per-channel min and max must round-trip exactly (affine endpoints)
        rng = np.random.default_rng(4)
        x = rng.standard_normal((100, 16, 3)).astype(np.float32)
        host, _, _ = download_quantized(jnp.asarray(x), np.int16)
        np.testing.assert_allclose(
            host.max(axis=(0, 1)), x.max(axis=(0, 1)), rtol=1e-6)
        np.testing.assert_allclose(
            host.min(axis=(0, 1)), x.min(axis=(0, 1)), rtol=1e-6)

    def test_constant_channel(self):
        x = np.full((10, 5, 2), 3.25, np.float32)
        host, _, bound = download_quantized(jnp.asarray(x), np.int16)
        np.testing.assert_allclose(host, x, atol=1e-5)

    def test_none_passthrough(self):
        x = self._spectrogram_like(5)
        host, n, bound = download_quantized(jnp.asarray(x), None)
        np.testing.assert_array_equal(host, x)
        assert bound == 0.0

    def test_bad_dtype_raises(self):
        with pytest.raises(ValueError):
            download_quantized(jnp.zeros((4, 4)), np.float16)


class TestUploadQuantized:
    def _recording(self, seed=0):
        # mV-scaled biosignal-ish array with per-channel gains
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((4096, 8)).astype(np.float32)
        x *= rng.uniform(0.1, 10.0, size=8).astype(np.float32)
        return x

    def test_int16_units_preserved(self):
        x = self._recording()
        x_dev, n_bytes, bound = upload_quantized(x, np.int16)
        host = np.asarray(x_dev)
        assert host.dtype == np.float32 and host.shape == x.shape
        # absolute units restored: error ≤ half a step of each channel
        per_ch_bound = np.abs(x).max(axis=0) / 32767.0 * 0.5
        err = np.abs(host - x).max(axis=0)
        assert np.all(err <= per_ch_bound * 1.02)
        assert np.abs(host - x).max() <= bound * 1.02
        assert n_bytes < 0.51 * x.nbytes

    def test_int8(self):
        x = self._recording(1)
        x_dev, n_bytes, bound = upload_quantized(x, np.int8)
        assert np.abs(np.asarray(x_dev) - x).max() <= bound * 1.02
        assert n_bytes < 0.26 * x.nbytes

    def test_none_passthrough(self):
        x = self._recording(2)
        x_dev, n, bound = upload_quantized(x, None)
        np.testing.assert_array_equal(np.asarray(x_dev), x)
        assert n == x.nbytes and bound == 0.0

    def test_rejects_integer_input(self):
        counts = np.ones((64, 4), np.int16)
        with pytest.raises(TypeError, match="upload_counts"):
            upload_quantized(counts, np.int16)

    def test_amplitude_threshold_grade(self):
        # the preprocessor's 3 mV annotation must see identical
        # verdicts: quantization error is ~1e-4 of a 10 mV peak
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2048, 4)) * 0.5).astype(np.float32)
        x[100:150, 2] = 5.0       # a clear amplitude violation
        x_dev, _, bound = upload_quantized(x, np.int16)
        assert bound < 1e-4
        host = np.asarray(x_dev)
        assert np.array_equal(np.abs(host).max(axis=0) > 3.0,
                              np.abs(x).max(axis=0) > 3.0)
