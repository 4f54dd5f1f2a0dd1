"""A/B measurement: Pallas fused MSC epilogue vs the XLA lowering.

Justifies the dispatch gate in ``ops/coherence.py`` (Pallas only on the
jackknife+EMG-max path) with committed numbers instead of a comment
claim.  Runs both epilogues on the real TPU for both output modes:

  - max-pool  (W, F, E)      — the production CMC path
  - full-grid (W, F, E, M)   — kept on XLA; this script measures why

Writes ``BENCH_PALLAS.json`` at the repo root:
  {"device": ..., "window_chunk": W, "maxpool": {"pallas_ms": ...,
   "xla_ms": ..., "speedup": ...}, "fullgrid": {...}, "winner": {...}}

Usage:  python tools/bench_pallas_ab.py   (needs the TPU backend; the
CPU backend has no Mosaic lowering, so this intentionally fails there).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from scipy.stats import t as t_dist

from mba_tpu.ops import coherence as C
from mba_tpu.ops.dpss import filtered_tapers
from mba_tpu.ops.framing import frame_signal
from mba_tpu.ops.pallas_msc import msc_chunk_pallas

FS = 2048.0
WINDOW_SEC = 2.0
N_EEG = 64
N_EMG = 64
NW = 3
W_CHUNK = 4          # windows per program (full-grid HBM ~4 GB at W=4)
N_REPS = 5


def _time_fn(fn, *args):
    out = fn(*args)                      # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.min(times))


def main():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        raise SystemExit(f"needs a TPU backend, got {dev.platform}")

    ws = int(WINDOW_SEC * FS)
    rng = np.random.default_rng(0)
    n = ws * (W_CHUNK + 1)
    eeg = jax.device_put(rng.standard_normal((n, N_EEG)).astype(np.float32))
    emg = jax.device_put(rng.standard_normal((n, N_EMG)).astype(np.float32))
    tapers = jax.device_put(
        np.asarray(filtered_tapers(ws, NW, 0.9), np.float32))
    K = int(tapers.shape[0])
    t_crit = np.float32(t_dist.ppf(0.975, K - 1))
    inv = np.float32(1.0 / (FS * ws))
    starts = jnp.asarray(np.arange(W_CHUNK) * ws, jnp.int32)

    ef = frame_signal(eeg, starts, ws)
    mf = frame_signal(emg, starts, ws)
    jax.block_until_ready((ef, mf))

    @functools.partial(jax.jit, static_argnames=("emg_max",))
    def xla_path(ef, mf, emg_max):
        return C._msc_chunk_kernel(ef, mf, tapers, inv, t_crit,
                                   True, emg_max)

    @functools.partial(jax.jit, static_argnames=("emg_max",))
    def pallas_path(ef, mf, emg_max):
        return msc_chunk_pallas(ef, mf, tapers, t_crit, emg_max=emg_max)

    result = {"device": str(dev), "window_chunk": W_CHUNK,
              "n_eeg": N_EEG, "n_emg": N_EMG, "k_tapers": K,
              "reps": N_REPS}
    for mode, emg_max in (("maxpool", True), ("fullgrid", False)):
        t_xla = _time_fn(lambda a, b: xla_path(a, b, emg_max), ef, mf)
        t_pl = _time_fn(lambda a, b: pallas_path(a, b, emg_max), ef, mf)
        result[mode] = {
            "xla_ms_per_window": round(1e3 * t_xla / W_CHUNK, 3),
            "pallas_ms_per_window": round(1e3 * t_pl / W_CHUNK, 3),
            "pallas_speedup": round(t_xla / t_pl, 3),
        }
        print(f"{mode}: XLA {1e3 * t_xla / W_CHUNK:.2f} ms/win, "
              f"Pallas {1e3 * t_pl / W_CHUNK:.2f} ms/win "
              f"({t_xla / t_pl:.2f}x)", file=sys.stderr)

    result["winner"] = {
        mode: ("pallas" if result[mode]["pallas_speedup"] > 1.0
               else "xla") for mode in ("maxpool", "fullgrid")}
    out = os.path.join(os.path.dirname(__file__), "..",
                       "BENCH_PALLAS.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
