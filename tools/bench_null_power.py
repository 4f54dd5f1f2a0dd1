"""Operating characteristic of the taper-rotation cohort null
(VERDICT r2 #5).

``ops/cohort_null.py`` documents that sharing one rotation across
windows conditions on the observed window-to-window phase consistency:
exact under H0, but under a true coupling the null widens (no 1/W
variance shrinkage), making the test conservative.  This tool MEASURES
that conservativeness: it sweeps planted coupling strength × window
count and compares rejection rates (α = 0.05, FWE max statistic) of

  - the production taper-rotation cohort null
    (``cohort_msc_rotation_null``), vs
  - a classic full-FFT phase-randomisation cohort null (per-surrogate
    fresh signal-level phases — the engine the rotation null replaces;
    feasible only at small scale because it redoes every FFT per draw).

Writes ``BENCH_NULL_POWER.json``; ``tests/test_null_power_artifact.py``
asserts the committed bounds (H0 calibration of both engines, and the
measured power gap staying within the documented envelope).

Run: ``JAX_PLATFORMS=cpu python tools/bench_null_power.py`` (~5-10 min).
"""
from __future__ import annotations

import functools
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


def _fft_null_engine(window_samples, lo, hi, tapers):
    """Jitted full-FFT cohort null: per surrogate, fresh random phases
    on the EMG signal spectrum (DC/Nyquist kept real), cohort-mean
    window-averaged MSC, max over the band."""
    import jax
    import jax.numpy as jnp

    K = tapers.shape[0]
    tap = jnp.asarray(tapers, jnp.float32)

    def _msc_map(e_frames, m_frames):
        # frames: (W, S) → band MSC map (F,)
        Ef = jnp.fft.rfft(e_frames[:, None, :] * tap[None], axis=2)
        Mf = jnp.fft.rfft(m_frames[:, None, :] * tap[None], axis=2)
        Ef = Ef[:, :, lo:hi]
        Mf = Mf[:, :, lo:hi]
        csd = (jnp.conj(Ef) * Mf).sum(axis=1)
        pe = (Ef.real ** 2 + Ef.imag ** 2).sum(axis=1)
        pm = (Mf.real ** 2 + Mf.imag ** 2).sum(axis=1)
        msc = jnp.abs(csd) ** 2 / jnp.maximum(pe * pm, 1e-30)
        return msc.mean(axis=0)                         # (F,)

    @functools.partial(jax.jit, static_argnames=("n_surr",))
    def run(key, eeg, emg, starts, n_surr):
        # eeg/emg: (J, n, 1) — single pair per subject
        n = eeg.shape[1]
        e_frames = jnp.stack([
            jax.vmap(lambda s, x=eeg[j, :, 0]:
                     jax.lax.dynamic_slice(x, (s,), (window_samples,)))(
                starts) for j in range(J)])             # (J, W, S)
        spec = jnp.fft.rfft(emg[:, :, 0], axis=1)       # (J, nf)
        nf = spec.shape[1]
        has_nyq = (n % 2 == 0)

        def one_surrogate(k):
            phases = jax.random.uniform(
                k, (J, nf), minval=0.0, maxval=2 * jnp.pi)
            # DC (and Nyquist for even n) must stay real
            phases = phases.at[:, 0].set(0.0)
            if has_nyq:
                phases = phases.at[:, -1].set(0.0)
            surr = jnp.fft.irfft(spec * jnp.exp(1j * phases), n=n,
                                 axis=1)                # (J, n)
            m_frames = jnp.stack([
                jax.vmap(lambda s, x=surr[j]:
                         jax.lax.dynamic_slice(x, (s,),
                                               (window_samples,)))(
                    starts) for j in range(J)])
            maps = jax.vmap(_msc_map)(e_frames, m_frames)   # (J, F)
            return maps.mean(axis=0).max()

        keys = jax.random.split(key, n_surr)
        max_stat = jax.lax.map(one_surrogate, keys)
        # observed: unrotated
        m_frames_obs = jnp.stack([
            jax.vmap(lambda s, x=emg[j, :, 0]:
                     jax.lax.dynamic_slice(x, (s,), (window_samples,)))(
                starts) for j in range(J)])
        observed = jax.vmap(_msc_map)(e_frames, m_frames_obs).mean(
            axis=0).max()
        return max_stat, observed

    return run


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mba_tpu.ops.cohort_null import cohort_msc_rotation_null
    from mba_tpu.ops.dpss import filtered_tapers
    from mba_tpu.ops.framing import window_grid

    window_samples = int(WINDOW_SEC * FS)
    hop = window_samples // 2
    tapers = filtered_tapers(window_samples, 3, 0.9)
    freqs_all = np.fft.rfftfreq(window_samples, 1 / FS)
    band = (8.0, 40.0)
    lo = max(int(np.searchsorted(freqs_all, band[0], "left")), 1)
    hi = min(int(np.searchsorted(freqs_all, band[1], "right")),
             len(freqs_all) - 1)
    fft_run = _fft_null_engine(window_samples, lo, hi, tapers)

    grid = {}
    t_start = time.perf_counter()
    for W in WINDOW_COUNTS:
        n = hop * (W - 1) + window_samples
        starts_np, _ = window_grid(n, window_samples, hop, FS,
                                   convention="cmc")
        starts_np = starts_np[:W]
        starts_j = jnp.asarray(starts_np, jnp.int32)
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
                ms, obs = fft_run(jax.random.PRNGKey(r),
                                  jnp.asarray(eeg), jnp.asarray(emg),
                                  starts_j, N_SURR)
                p_fft = (1.0 + float((np.asarray(ms) >= float(obs)
                                      ).sum())) / (1.0 + N_SURR)
                rej_fft += p_fft < ALPHA
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
