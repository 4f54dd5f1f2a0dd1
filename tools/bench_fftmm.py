"""A/B: XLA's native TPU rfft vs the MXU matmul decomposition.

Times both at the hot kernels' real shape regimes (the CMC/PSD window
FFT: batch of tapered 2- and 1-second windows; the rotation-null
coefficient pass: (chunk, K, S, C) tensors, FFT over the sample axis)
with device-resident inputs and scalar-readback barriers, and writes
``BENCH_FFTMM.json``.  Run on the real chip:

    python tools/bench_fftmm.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _time(fn, reps=5):
    fn()                                   # compile / warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.min(times))


def main():
    import jax
    import jax.numpy as jnp
    from mba_tpu.ops.fftmm import rfft_mxu

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    out = {"platform": platform, "cases": []}

    # (label, shape, axis) — shapes mirror the framework's hot FFTs
    cases = [
        ("cmc_window_batch  (B=1024, n=4096)", (1024, 4096), -1),
        ("psd_window_batch  (B=2048, n=2048)", (2048, 2048), -1),
        ("coeff_pass_chunk  (8, 5, 4096, 75)", (8, 5, 4096, 75), 2),
    ]
    for label, shape, axis in cases:
        x = rng.standard_normal(shape).astype(np.float32)
        x_dev = jax.device_put(x)

        @jax.jit
        def native(x_dev=x_dev, axis=axis):
            s = jnp.fft.rfft(x_dev, axis=axis)
            return jnp.sum(jnp.abs(s))      # scalar sync

        @jax.jit
        def mxu(x_dev=x_dev, axis=axis):
            s = rfft_mxu(x_dev, axis=axis)
            return jnp.sum(jnp.abs(s))

        t_native = _time(lambda: float(native()))
        t_mxu = _time(lambda: float(mxu()))
        err = abs(float(native()) - float(mxu())) / abs(float(native()))
        n = shape[axis]
        n_ffts = int(np.prod(shape)) // n
        case = {
            "case": label,
            "native_rfft_sec": round(t_native, 5),
            "mxu_rfft_sec": round(t_mxu, 5),
            "speedup_mxu_vs_native": round(t_native / t_mxu, 2),
            "n_ffts": n_ffts,
            "fft_len": n,
            "abs_spectrum_sum_rel_err": float(f"{err:.2e}"),
        }
        out["cases"].append(case)
        print(f"[{label}] native {t_native*1e3:.1f} ms, "
              f"mxu {t_mxu*1e3:.1f} ms "
              f"({case['speedup_mxu_vs_native']}x), rel err {err:.1e}",
              file=sys.stderr)

    (REPO / "BENCH_FFTMM.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
