"""Native int16 upload quantizer: bit-parity with numpy and edge cases."""
import numpy as np
import pytest

from mba_tpu.native import quantize_int16_per_channel
from mba_tpu.native.build import load_quantshim


def _numpy_reference(x):
    peak = np.maximum(np.abs(x).max(axis=-2, keepdims=True),
                      np.float32(1e-30))
    return np.round(x * (32767.0 / peak)).astype(np.int16)


class TestNativeQuantizer:
    def test_builds(self):
        lib = load_quantshim()
        assert hasattr(lib, "quantize_i16_per_col")

    def test_bit_identical_to_numpy_2d(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((4096, 8))
             * np.array([1e-4, 1e-2, 1.0, 30.0, 1e3, 1.0, 2.0, 0.5])
             ).astype(np.float32)
        np.testing.assert_array_equal(quantize_int16_per_channel(x),
                                      _numpy_reference(x))

    def test_bit_identical_to_numpy_3d(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 2048, 16)).astype(np.float32)
        np.testing.assert_array_equal(quantize_int16_per_channel(x),
                                      _numpy_reference(x))

    def test_peak_maps_to_32767(self):
        x = np.zeros((100, 2), np.float32)
        x[7, 0] = -3.5
        x[50, 1] = 0.125
        q = quantize_int16_per_channel(x)
        assert q[7, 0] == -32767
        assert q[50, 1] == 32767

    def test_zero_channel_stays_zero(self):
        x = np.zeros((64, 3), np.float32)
        x[:, 1] = np.linspace(-1, 1, 64, dtype=np.float32)
        q = quantize_int16_per_channel(x)
        assert (q[:, 0] == 0).all() and (q[:, 2] == 0).all()
        assert q[:, 1].min() == -32767 and q[:, 1].max() == 32767

    def test_half_to_even_rounding(self):
        # scale = 32767/32767 = 1 → values land exactly on .5 boundaries
        x = np.array([[0.5], [1.5], [2.5], [-0.5], [32767.0]], np.float32)
        q = quantize_int16_per_channel(x)
        np.testing.assert_array_equal(
            q[:, 0], np.array([0, 2, 2, 0, 32767], np.int16))

    def test_rejects_1d(self):
        with pytest.raises(ValueError):
            quantize_int16_per_channel(np.zeros(10, np.float32))

    def test_noncontiguous_input(self):
        rng = np.random.default_rng(2)
        base = rng.standard_normal((512, 32)).astype(np.float32)
        view = base[::2, ::2]                      # non-contiguous
        np.testing.assert_array_equal(
            quantize_int16_per_channel(view),
            _numpy_reference(np.ascontiguousarray(view)))


class TestInt8Quantizer:
    def test_bit_identical_to_numpy(self):
        from mba_tpu.native import quantize_int8_per_channel
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((2048, 8))
             * np.array([1e-3, 1.0, 50.0, 0.2, 1.0, 2.0, 1e2, 1.0])
             ).astype(np.float32)
        peak = np.maximum(np.abs(x).max(axis=-2, keepdims=True),
                          np.float32(1e-30))
        ref = np.round(x * (127.0 / peak)).astype(np.int8)
        np.testing.assert_array_equal(quantize_int8_per_channel(x), ref)

    def test_peak_maps_to_127(self):
        from mba_tpu.native import quantize_int8_per_channel
        x = np.zeros((64, 1), np.float32)
        x[10, 0] = -2.0
        q = quantize_int8_per_channel(x)
        assert q[10, 0] == -127
