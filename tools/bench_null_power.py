"""Operating characteristic of the taper-rotation cohort null
(VERDICT r2 #5).

``ops/cohort_null.py`` documents that sharing one rotation across
windows conditions on the observed window-to-window phase consistency:
exact under H0, but under a true coupling the null widens (no 1/W
variance shrinkage), making the test conservative.  This tool MEASURES
that conservativeness: it sweeps planted coupling strength × window
count and compares rejection rates (α = 0.05, FWE max statistic) of

  - the production taper-rotation cohort null
    (``cohort_msc_rotation_null``, shared rotation — the study-scale
    engine),
  - its ``rotation_mode='per_window'`` opt-in (independent rotation per
    disjoint window), and
  - the public full-FFT engine (``cohort_msc_fft_null``: per-surrogate
    fresh signal-level phases, ALL windows enter the inference exactly;
    feasible only at small scale because it redoes every FFT per draw).

Writes ``BENCH_NULL_POWER.json``; ``tests/test_null_power_artifact.py``
asserts the committed bounds (H0 calibration of both engines, and the
measured power gap staying within the documented envelope).

Run: ``JAX_PLATFORMS=cpu python tools/bench_null_power.py`` (~25 min).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FS = 256.0
WINDOW_SEC = 0.5
J = 6
# shared-drive gain g plants true coherence ≈ g⁴/(g²+1)²: 0 → 0.25.
# the 0.35-0.7 range straddles each W's detection threshold, where any
# power difference between the engines would surface
COUPLINGS = (0.0, 0.35, 0.45, 0.55, 0.7, 1.0)
WINDOW_COUNTS = (8, 32, 128)
R_REPLICATES = 60
N_SURR = 200
ALPHA = 0.05


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _make_cohort(rng, n, coupling):
    shared = rng.standard_normal(n).astype(np.float32)
    eeg = np.stack([coupling * shared[:, None]
                    + rng.standard_normal((n, 1)).astype(np.float32)
                    for _ in range(J)])
    emg = np.stack([coupling * shared[:, None]
                    + rng.standard_normal((n, 1)).astype(np.float32)
                    for _ in range(J)])
    return eeg, emg


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mba_tpu.ops.cohort_null import (cohort_msc_rotation_null,
                                         cohort_msc_fft_null)
    from mba_tpu.ops.framing import window_grid

    window_samples = int(WINDOW_SEC * FS)
    hop = window_samples // 2
    band = (8.0, 40.0)

    grid = {}
    t_start = time.perf_counter()
    for W in WINDOW_COUNTS:
        n = hop * (W - 1) + window_samples
        starts_np, _ = window_grid(n, window_samples, hop, FS,
                                   convention="cmc")
        starts_np = starts_np[:W]
        for c in COUPLINGS:
            rej_rot = 0
            rej_pw = 0
            rej_fft = 0
            for r in range(R_REPLICATES):
                rng = np.random.default_rng(1000 * W + int(c * 100) + r)
                eeg, emg = _make_cohort(rng, n, c)
                kw = dict(sampling_freq=FS, n_surrogates=N_SURR,
                          window_length_sec=WINDOW_SEC, band=band,
                          surrogate_chunk=N_SURR, seed=r,
                          window_starts=np.tile(starts_np[None], (J, 1)),
                          compute_dtype=jnp.float32)
                res = cohort_msc_rotation_null(eeg, emg, **kw)
                rej_rot += res["p_fwe"] < ALPHA
                res_pw = cohort_msc_rotation_null(
                    eeg, emg, rotation_mode="per_window", **kw)
                rej_pw += res_pw["p_fwe"] < ALPHA
                res_fft = cohort_msc_fft_null(
                    eeg, emg, FS, n_surrogates=N_SURR,
                    window_length_sec=WINDOW_SEC, band=band,
                    surrogate_chunk=50, seed=r,
                    window_starts=np.tile(starts_np[None], (J, 1)))
                rej_fft += res_fft["p_fwe"] < ALPHA
            key = f"W{W}_c{c:g}"
            grid[key] = {
                "windows": W, "coupling": c,
                "power_rotation": round(rej_rot / R_REPLICATES, 3),
                "power_rotation_pw": round(rej_pw / R_REPLICATES, 3),
                "power_fullfft": round(rej_fft / R_REPLICATES, 3),
            }
            log(f"[{key}] rotation {grid[key]['power_rotation']:.2f} "
                f"/ per-window {grid[key]['power_rotation_pw']:.2f} "
                f"vs full-FFT {grid[key]['power_fullfft']:.2f} "
                f"({time.perf_counter() - t_start:.0f}s)")

    # summary: worst power gap where the full-FFT engine has real power
    gaps = [g["power_fullfft"] - g["power_rotation"]
            for g in grid.values() if g["coupling"] > 0
            and g["power_fullfft"] >= 0.2]
    h0_rates = {k: (g["power_rotation"], g["power_fullfft"],
                    g["power_rotation_pw"])
                for k, g in grid.items() if g["coupling"] == 0}
    result = {
        "description": "rejection rate (alpha=0.05, FWE max statistic) "
                       "of the taper-rotation cohort null (shared and "
                       "per-window rotation modes) vs a classic "
                       "full-FFT phase-randomisation cohort null, over "
                       "planted coupling x window count",
        "config": {"J": J, "fs": FS, "window_sec": WINDOW_SEC,
                   "band": band, "n_surrogates": N_SURR,
                   "replicates": R_REPLICATES, "alpha": ALPHA},
        "grid": grid,
        "max_power_gap_fullfft_minus_rotation": round(max(gaps), 3)
        if gaps else 0.0,
        "mean_power_gap": round(float(np.mean(gaps)), 3) if gaps else 0.0,
        "h0_rejection_rates": h0_rates,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime()),
    }
    out = REPO / "BENCH_NULL_POWER.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    log(f"[done] {out} in {time.perf_counter() - t_start:.0f}s")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
