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

    # (label, shape, axis) — shapes mirror the framework's hot FFTs.
    # INNER_REPS re-runs the transform inside one jitted fori_loop (the
    # input is nudged per iteration so XLA cannot CSE) so the timed
    # region's compute dwarfs the ~25 ms tunnel readback floor without
    # a multi-hundred-MB upload.
    INNER_REPS = 16
    cases = [
        ("cmc_window_batch  (B=4096, n=4096)", (4096, 4096), -1),
        ("psd_window_batch  (B=8192, n=2048)", (8192, 2048), -1),
        ("coeff_pass_chunk  (8, 5, 4096, 75)", (8, 5, 4096, 75), 2),
    ]
    for label, shape, axis in cases:
        x = rng.standard_normal(shape).astype(np.float32)
        x_dev = jax.device_put(x)

        def repeat(fft_fn, x_dev=x_dev, axis=axis):
            def body(i, acc):
                s = fft_fn(x_dev * (1.0 + 1e-6 * i), axis=axis)
                return acc + jnp.sum(jnp.abs(s))
            return jax.lax.fori_loop(0, INNER_REPS, body, jnp.float32(0))

        import functools
        hi = jax.lax.Precision.HIGHEST
        native = jax.jit(lambda fn=jnp.fft.rfft: repeat(fn))
        mxu = jax.jit(lambda fn=rfft_mxu: repeat(fn))
        mxu_f32 = jax.jit(lambda fn=functools.partial(
            rfft_mxu, precision=hi): repeat(fn))

        t_native = _time(lambda: float(native()))
        t_mxu = _time(lambda: float(mxu()))
        t_mxu_f32 = _time(lambda: float(mxu_f32()))
        ref = float(native())
        err = abs(ref - float(mxu())) / abs(ref)
        err_f32 = abs(ref - float(mxu_f32())) / abs(ref)
        n = shape[axis]
        n_ffts = int(np.prod(shape)) // n * INNER_REPS
        case = {
            "case": label,
            "native_rfft_sec": round(t_native, 5),
            "mxu_rfft_sec": round(t_mxu, 5),
            "mxu_f32acc_rfft_sec": round(t_mxu_f32, 5),
            "speedup_mxu_vs_native": round(t_native / t_mxu, 2),
            "speedup_mxu_f32acc_vs_native": round(t_native / t_mxu_f32, 2),
            "n_ffts": n_ffts,
            "fft_len": n,
            "abs_spectrum_sum_rel_err": float(f"{err:.2e}"),
            "abs_spectrum_sum_rel_err_f32acc": float(f"{err_f32:.2e}"),
        }
        out["cases"].append(case)
        print(f"[{label}] native {t_native*1e3:.1f} ms, "
              f"mxu {t_mxu*1e3:.1f} ms "
              f"({case['speedup_mxu_vs_native']}x, err {err:.1e}), "
              f"mxu-f32 {t_mxu_f32*1e3:.1f} ms "
              f"({case['speedup_mxu_f32acc_vs_native']}x, "
              f"err {err_f32:.1e})",
              file=sys.stderr)

    (REPO / "BENCH_FFTMM.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
