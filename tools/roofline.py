"""Roofline accounting for the hot device kernels.

"Speed-of-light" evidence: for each hot kernel, measure device-resident
wall time (inputs pre-placed, scalar-sum sync), count the kernel's
arithmetic (FLOPs) and its *minimum* HBM traffic (bytes that MUST cross
HBM even under perfect fusion: kernel inputs once + outputs once +
unavoidable materialized intermediates), and report achieved GFLOP/s and
GB/s against the chip's peaks.  A kernel whose achieved bandwidth sits
near the HBM roof is bandwidth-bound and cannot go meaningfully faster
on this chip without reducing its traffic; one near the FLOP roof is
compute-bound.

Peaks (TPU v5e / v5 lite, public figures): 197 TFLOP/s bf16 matmul,
~49 TFLOP/s f32, 819 GB/s HBM.  FFT work is counted as 5·N·log2(N) real
FLOPs per length-N transform (the standard split-radix convention).

Writes ``BENCH_ROOFLINE.json`` at the repo root and prints a table.
Usage: python tools/roofline.py   (needs the real TPU backend).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

PEAK_BF16_GFLOPS = 197_000.0
PEAK_F32_GFLOPS = 49_000.0
PEAK_HBM_GBS = 819.0

FS = 2048.0
WINDOW_SEC = 2.0
NW = 3
E = M = 64
SECONDS = 120.0


def _scalarize(fn):
    """Wrap a kernel so it returns ONE f32 scalar (sum of all outputs).

    block_until_ready is unreliable on the axon backend, so timing uses a
    scalar readback; fusing the reduction into the jitted program keeps
    that to a single ~50 ms tunnel round trip per rep (measured and
    subtracted via the empty-readback floor).
    """
    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        total = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(out):
            total += jnp.real(leaf).astype(jnp.float32).sum()
        return total
    return jax.jit(wrapped)


def _readback_floor(reps=5):
    """Latency of a bare scalar download through the tunnel."""
    one = jax.device_put(np.float32(1.0))
    float(one)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(one + 0)
        times.append(time.perf_counter() - t0)
    return float(np.min(times))


def _time_reps(fn, reps=5):
    fn()  # warm (compile)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return max(float(np.min(times)) - _READBACK_FLOOR, 1e-9)


_READBACK_FLOOR = 0.0


def fft_flops(n, batch):
    return 5.0 * n * math.log2(n) * batch


def kernel_cmc_fullgrid():
    """The production CMC program (jackknife CIs, full 64x64 grid),
    device-resident, one 8-window chunk."""
    import functools
    from mba_tpu.ops import coherence as C
    from mba_tpu.ops.dpss import filtered_tapers

    ws = int(WINDOW_SEC * FS)
    nF = ws // 2 + 1
    wc = 8
    tapers = jnp.asarray(filtered_tapers(ws, NW, 0.9), jnp.float32)
    K = int(tapers.shape[0])
    rng = np.random.default_rng(0)
    ef = jax.device_put(rng.standard_normal((wc, ws, E)).astype(np.float32))
    mf = jax.device_put(rng.standard_normal((wc, ws, M)).astype(np.float32))
    from scipy.stats import t as t_dist
    tcrit = float(t_dist.ppf(0.975, K - 2))

    fn = _scalarize(functools.partial(C._msc_chunk_kernel,
                                      use_jackknife=True,
                                      aggregate_emg_max=False))

    def run():
        float(fn(ef, mf, tapers, np.float32(1.0 / (FS * ws)), tcrit))

    sec = _time_reps(run)
    # FLOPs: taper-windowed rFFTs (wc*K*(E+M) of length ws) + CSD outer
    # products (wc*K*nF*E*M complex MACs = x8 real) + PSD accumulation +
    # jackknife leave-one-out epilogue (~3x the CSD pass: sums, K
    # leave-one-out ratios, Fisher variance)
    fl = (fft_flops(ws, wc * K * (E + M))
          + 8.0 * wc * K * nF * E * M          # CSD accumulate
          + 3.0 * 8.0 * wc * nF * E * M * K)   # jackknife epilogue
    # minimum HBM bytes: frames in (2 sides), spectra intermediates for
    # E/M (complex, K tapers — materialized between FFT and contraction),
    # CSD tensor (complex K x nF x E x M per window — the jackknife needs
    # every (k, f, e, m) cross product), outputs (3 f32 grids)
    by = (4.0 * wc * ws * (E + M)
          + 8.0 * wc * K * nF * (E + M)
          + 2.0 * 8.0 * wc * K * nF * E * M    # CSD write + read
          + 3.0 * 4.0 * wc * nF * E * M)
    return sec, fl, by, f"CMC full-grid jackknife ({wc} windows)"



def kernel_psd_stage():
    """The production multitaper-PSD leg (pipeline stage 3a): one
    128-window chunk of the study shape (1-s windows @ 2048 Hz, 64 ch)
    through spectral._mt_psd_kernel + the band-aggregate epilogue —
    the second-largest pure-device leg of the pipeline (VERDICT r4 #4;
    tools/profile_psd.py attributes the old 24.6 s wall to one-time
    compilation, steady-state ~0.6 s for 3406 windows)."""
    from mba_tpu.ops import spectral
    from mba_tpu.ops.dpss import dpss_windows
    from mba_tpu.pipeline import signal_features as features

    ws = int(1.0 * FS)                       # 2048
    wc = 128
    nF = ws // 2 + 1
    tapers = jnp.asarray(dpss_windows(ws, NW, 5), jnp.float32)
    K = int(tapers.shape[0])
    onesided = jnp.asarray(spectral._onesided_scale(nF, ws))
    inv_fs_n = np.float32(1.0 / (FS * ws))
    rng = np.random.default_rng(4)
    frames = jax.device_put(
        rng.standard_normal((wc, ws, E)).astype(np.float32))
    fr = np.fft.rfftfreq(ws, d=1.0 / FS)

    def full(frames):
        spec = spectral._mt_psd_kernel(frames, tapers, onesided,
                                       inv_fs_n, True)
        payload, _, _ = features.band_aggregate_spectrogram(spec, fr)
        return payload

    fn = _scalarize(full)

    def run():
        float(fn(frames))

    sec = _time_reps(run)
    fl = (fft_flops(ws, wc * K * E)              # taper FFTs
          + 1.0 * wc * K * ws * E                # taper multiply
          + 3.0 * wc * K * nF * E                # |.|^2 + K-mean
          + 4.0 * wc * nF * E)                   # log10 epilogue
    by = (4.0 * wc * ws * E                      # frames read
          + 2.0 * 4.0 * wc * nF * E              # spectrogram w+r
          + 4.0 * wc * 8 * E * 2)                # band payload out
    return sec, fl, by, f"multitaper PSD + band agg ({wc} windows)"


def _null_problem():
    """Shared problem size + inputs for the rotation-null A/B rows."""
    J, nF, N, K = 12, 175, E * M, 5
    P = K * (K - 1)
    S = 500
    rng = np.random.default_rng(1)
    coef = jax.device_put(rng.standard_normal((J, nF, N, P))
                          .astype(np.float32) * 0.05)
    base = jax.device_put(rng.uniform(0.1, 0.3, (nF, N))
                          .astype(np.float32))
    obs = jax.device_put(np.asarray(base) + 0.05)
    return coef, base, obs, J, nF, N, K, P, S


def kernel_rotation_null():
    """Cohort-null surrogate contraction: 500 surrogates x 12 subjects."""
    import functools

    J, nF, N, K = 12, 175, E * M, 5
    P = K * (K - 1)
    S = 500
    rng = np.random.default_rng(1)
    coef = jax.device_put(rng.standard_normal((J, nF, N, P))
                          .astype(np.float32))
    base = jax.device_put(rng.standard_normal((nF, N)).astype(np.float32))
    obs = jax.device_put((base + 1.0))
    key = jax.random.PRNGKey(0)
    from mba_tpu.ops.cohort_null import _null_chunk_core
    core = functools.partial(_null_chunk_core, n_chunk=S, K=K,
                             compute_dtype=jnp.bfloat16)
    R = 8   # in-program repeat: one chunk is ~20 ms, same order as the
            # tunnel's readback floor — amortize so the subtraction is
            # a small correction, not the measurement

    def repeated(key, coef, base, obs, cnt):
        def body(i, acc):
            out = core(jax.random.fold_in(key, i), coef, base, obs, cnt)
            total = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                total += jnp.real(leaf).astype(jnp.float32).sum()
            return acc + total
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    fn = jax.jit(repeated)

    def run():
        float(fn(key, coef, base, obs, jnp.zeros((nF, N), jnp.int32)))

    sec = _time_reps(run) / R
    # dominant matmul: (S, J*P) x (J*P, N) per frequency row -> 2*S*J*P*N*nF
    fl = 2.0 * S * J * P * N * nF
    # minimum bytes: coef tensor read once (bf16 = 2B after cast), G
    # features (S*J*P*nF), stat tensor write+read for max/counts
    by = (2.0 * J * nF * N * P + 4.0 * S * J * P * nF
          + 2.0 * 4.0 * S * nF * N)
    return sec, fl, by, f"rotation-null contraction ({S} surrogates)"


def kernel_rotation_null_pallas():
    """Fused Pallas null chunk (ops/pallas_null.py): the statistic tile
    never leaves VMEM, so minimum traffic is just the coefficient read
    + phase features + tiny outputs."""
    import functools
    from mba_tpu.ops.pallas_null import (prepare_null_coeffs,
                                         null_chunk_pallas_body)

    coef, base, obs, J, nF, N, K, P, S = _null_problem()
    coefT = prepare_null_coeffs(coef, jnp.bfloat16)
    float(jnp.asarray(coefT).astype(jnp.float32).sum())
    core = functools.partial(null_chunk_pallas_body, n_chunk=S,
                             K=K, J=J, P=P, compute_dtype=jnp.bfloat16)
    R = 16  # one fused chunk is ~3-5 ms — far below the ~22 ms tunnel
            # readback floor; amortize in-program (fresh key per rep)

    def repeated(key, coefT, base, obs):
        def body(i, acc):
            out = core(jax.random.fold_in(key, i), coefT, base, obs)
            total = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                total += jnp.real(leaf).astype(jnp.float32).sum()
            return acc + total
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    fn = jax.jit(repeated)

    def run():
        float(fn(jax.random.PRNGKey(0), coefT, base, obs))

    sec = _time_reps(run) / R
    fl = 2.0 * S * J * P * N * nF
    JP_pad = coefT.shape[1]
    by = (2.0 * nF * JP_pad * N          # coefT streamed once
          + 2.0 * 2.0 * S * J * P * nF    # G features: write + read
          + 4.0 * (S + nF * N))           # outputs
    return sec, fl, by, f"rotation-null PALLAS fused ({S} surrogates)"


def _coeff_problem():
    """Shared problem for the rotation-null coefficient pair pass A/B:
    the flagship north-star shape per chunk (64 EEG × 64 EMG, K=5,
    wc=32, 2-s windows @ 2048 Hz, 13-100 Hz band) over 256 windows."""
    from mba_tpu.ops.dpss import dpss_windows

    Ec, Mc, K, wc, W = 64, 64, 5, 32, 256
    ws = int(WINDOW_SEC * FS)                        # 4096
    hop = ws // 2
    band_lo, band_hi = 26, 201                       # 13-100 Hz @ 0.5 Hz
    n = (W - 1) * hop + ws
    rng = np.random.default_rng(7)
    eeg = jax.device_put(rng.standard_normal((n, Ec)).astype(np.float32))
    emg = jax.device_put(rng.standard_normal((n, Mc)).astype(np.float32))
    starts = jnp.asarray(np.arange(W) * hop, jnp.int32)
    weights = jnp.ones((W,), jnp.float32)
    tapers = jnp.asarray(dpss_windows(ws, NW, K), jnp.float32)
    return eeg, emg, starts, weights, tapers, ws, band_lo, band_hi, \
        wc, W, Ec, Mc, K


def _coeff_flops_bytes(W, Ec, Mc, K, ws, nF):
    """FLOPs shared by both lowerings + the minimum bytes of each."""
    N = Ec * Mc
    P2 = K * (K - 1) // 2
    batch = W * K * (Ec + Mc)
    fl = (fft_flops(ws, batch)                   # taper FFTs
          + 1.0 * W * K * ws * (Ec + Mc)         # taper multiply
          + W * nF * N * (16.0 * K + 8.0 * P2))  # y/diag/pair products
    Fp = 256                                     # 128-lane padded band
    spectra = 2.0 * 4.0 * batch * Fp             # re+im f32
    base_by = (4.0 * (W * ws // 2) * (Ec + Mc)   # framed signal read
               + 2.0 * spectra                   # spectra write + read
               + 4.0 * (2 * P2 + 1) * N * Fp)    # accumulator outputs
    # the XLA lowering additionally materializes yr/yi (wc,K,F,N) in HBM
    # and re-reads two taper slices per pair product + once for diag
    yr_yi = 2.0 * 4.0 * W * K * nF * N
    xla_by = base_by + yr_yi + 4.0 * W * nF * N * (2 * P2 + K)
    return fl, base_by, xla_by


def kernel_coeff_pass():
    """Rotation-null coefficient pair pass — XLA lowering."""
    import functools
    from mba_tpu.ops.cohort_null import _subject_rotation_coeffs

    (eeg, emg, starts, weights, tapers, ws, blo, bhi,
     wc, W, Ec, Mc, K) = _coeff_problem()
    fn = _scalarize(functools.partial(
        _subject_rotation_coeffs.__wrapped__, window_samples=ws,
        band_lo=blo, band_hi=bhi, window_chunk=wc, use_pallas=False))

    def run():
        float(fn(eeg, emg, starts, weights, tapers))

    sec = _time_reps(run)
    fl, _, by = _coeff_flops_bytes(W, Ec, Mc, K, ws, bhi - blo)
    return sec, fl, by, f"rotation-null coeff pass XLA ({W} windows)"


def kernel_coeff_pass_pallas():
    """Fused Pallas pair pass (ops/pallas_coeffs.py): the normalized
    taper products stay in VMEM — minimum traffic is the taper spectra
    once + the accumulator outputs."""
    import functools
    from mba_tpu.ops.cohort_null import _subject_rotation_coeffs
    from mba_tpu.ops.pallas_coeffs import coeff_pallas_viable

    (eeg, emg, starts, weights, tapers, ws, blo, bhi,
     wc, W, Ec, Mc, K) = _coeff_problem()
    if not coeff_pallas_viable(wc, K, Ec, Mc):
        raise RuntimeError("pallas coeff kernel not viable at this shape")
    # the spectra are re-streamed once per EEG block in the 3-D grid;
    # keep base_by (spectra once) as the MINIMUM-traffic convention
    fn = _scalarize(functools.partial(
        _subject_rotation_coeffs.__wrapped__, window_samples=ws,
        band_lo=blo, band_hi=bhi, window_chunk=wc, use_pallas=True))

    def run():
        float(fn(eeg, emg, starts, weights, tapers))

    sec = _time_reps(run)
    fl, by, _ = _coeff_flops_bytes(W, Ec, Mc, K, ws, bhi - blo)
    return sec, fl, by, f"rotation-null coeff pass PALLAS ({W} windows)"


def kernel_coeff_pass_gram():
    """MXU gram lowering (ops/gram_coeffs.py): pair products as
    window-contraction matmuls + taper-folded band DFT matmul.

    FLOPs counted are the ALGORITHMIC matmul flops of this lowering
    (they differ from the FFT engines': the direct band DFT trades
    O(n log n) for MXU-shaped O(n·K·F) work), so the roof %% is the
    honest utilization of the arithmetic actually issued (per-pass
    hardware cost at Precision.HIGH is 3× bf16, i.e. the bf16-roof %%
    understates MXU occupancy ~3×).
    """
    import functools
    from mba_tpu.ops.cohort_null import _subject_rotation_coeffs

    (eeg, emg, starts, weights, tapers, ws, blo, bhi,
     wc, W, Ec, Mc, K) = _coeff_problem()
    fn = _scalarize(functools.partial(
        _subject_rotation_coeffs.__wrapped__, window_samples=ws,
        band_lo=blo, band_hi=bhi, window_chunk=wc, use_gram=True))

    def run():
        float(fn(eeg, emg, starts, weights, tapers))

    sec = _time_reps(run)
    nF = bhi - blo
    P2 = K * (K - 1) // 2
    # DFT matmuls: (W, ws, C) × (ws, 2·K·nF) per modality
    fl = 2.0 * W * ws * (2 * K * nF) * (Ec + Mc)
    # gram matmuls: diag contracts (K, W); 4 pair einsums contract W
    fl += 2.0 * nF * Ec * Mc * (K * W + 4 * P2 * W)
    # operand construction (elementwise): ~10 flops per operand element
    fl += 10.0 * W * nF * (K + 2 * P2) * (Ec + Mc)
    by = (4.0 * W * ws * (Ec + Mc)                   # frames read
          + 2.0 * 4.0 * W * K * nF * (Ec + Mc)       # spectra w+r
          + 2.0 * 2.0 * 4.0 * W * (K + 2 * P2) * nF * (Ec + Mc)  # operands
          + 4.0 * (2 * P2 + 1) * nF * Ec * Mc)       # outputs
    return sec, fl, by, f"rotation-null coeff pass GRAM ({W} windows)"


def kernel_permutation_tmaps():
    """Sign-flip permutation t-maps as one matmul."""
    from mba_tpu.ops.permutation import _t_maps

    n_perm, n_sub, n_cells = 32768, 12, 64 * 40
    rng = np.random.default_rng(2)
    Xh = rng.standard_normal((n_sub, n_cells)).astype(np.float32)
    X = jax.device_put(Xh)
    sum_sq = jax.device_put((Xh ** 2).sum(axis=0))
    signs = jax.device_put(
        (rng.integers(0, 2, (n_perm, n_sub)) * 2 - 1).astype(np.float32))
    R = 100     # kernel is sub-ms: repeat in-program to rise above the
                # readback-floor noise, then divide the wall by R
    def repeated(signs, X, sum_sq):
        def body(i, acc):
            return acc + _t_maps(signs + i * 0.0, X, sum_sq).sum()
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    fn = jax.jit(repeated)

    def run():
        float(fn(signs, X, sum_sq))

    sec = _time_reps(run) / R
    fl = 2.0 * n_perm * n_sub * n_cells * 2.0   # mean + var contractions
    by = (4.0 * (n_perm * n_sub + n_sub * n_cells)
          + 4.0 * n_perm * n_cells)
    return sec, fl, by, f"sign-flip t-maps ({n_perm} perms)"


def kernel_batched_reml():
    """Batched weighted REML refits (power/bootstrap inner loop)."""
    from mba_tpu.models.lme import _batched_reml_core

    B, n, p, G = 512, 96, 4, 12
    rng = np.random.default_rng(3)
    Xd = jax.device_put(rng.standard_normal((n, p)).astype(np.float32))
    Y = jax.device_put(rng.standard_normal((B, n)).astype(np.float32))
    gidx = jax.device_put(np.repeat(np.arange(G), n // G).astype(np.int32))
    counts = jax.device_put(np.full(G, n // G, np.float32))

    import functools
    from mba_tpu.models import lme
    fn = _scalarize(functools.partial(lme._batched_reml_core.__wrapped__,
                                      n_groups=G))

    def run():
        float(fn(Xd, Y, gidx, counts))

    sec = _time_reps(run)
    # one O(n·p) sufficient-stats pass + n_levels·n_grid criterion
    # evals of O(G·p² + p³) each (models/lme.py grid search)
    evals = 3 * 17 + 1
    fl = (B * (4.0 * n * p + 2.0 * n)
          + evals * B * (2.0 * G * p * p + 2.0 * p ** 3 + 8.0 * G))
    by = 4.0 * (B * n + n * p)                  # Y read once (suff. stats)
    return sec, fl, by, f"batched REML ({B} refits)"


def main():
    global _READBACK_FLOOR
    dev = jax.devices()[0]
    _READBACK_FLOOR = _readback_floor()
    print(f"device: {dev}; scalar readback floor "
          f"{_READBACK_FLOOR*1e3:.1f} ms", file=sys.stderr)
    rows = []
    # sign-flip t-maps are sub-ms at production scale — below the
    # tunnel's ~30 ms readback floor, and a scalarized in-program repeat
    # lets XLA fuse away the t-map materialization (measuring a kernel
    # that never exists in production).  That path is covered by the
    # end-to-end permutations/s figure in bench.py instead.
    for k in (kernel_psd_stage, kernel_cmc_fullgrid, kernel_rotation_null,
              kernel_rotation_null_pallas, kernel_coeff_pass,
              kernel_coeff_pass_pallas, kernel_coeff_pass_gram,
              kernel_batched_reml):
        try:
            sec, fl, by, label = k()
        except Exception as e:      # pragma: no cover - env-dependent
            print(f"{k.__name__} failed: {e!r}", file=sys.stderr)
            continue
        gflops = fl / sec / 1e9
        gbs = by / sec / 1e9
        frac_flop = gflops / PEAK_BF16_GFLOPS
        frac_flop_f32 = gflops / PEAK_F32_GFLOPS
        frac_bw = gbs / PEAK_HBM_GBS
        if max(frac_bw, frac_flop_f32) < 0.05:
            bound = "latency/serialization"
        elif frac_bw > frac_flop_f32:
            bound = "HBM-bandwidth"
        else:
            bound = "compute"
        rows.append({
            "kernel": label, "wall_sec": round(sec, 5),
            "gflops_achieved": round(gflops, 1),
            "gbs_achieved": round(gbs, 1),
            "pct_of_hbm_roof": round(100 * frac_bw, 1),
            "pct_of_f32_flop_roof": round(100 * frac_flop_f32, 1),
            "pct_of_bf16_flop_roof": round(100 * frac_flop, 1),
            "bound": bound,
        })
        print(f"{label:46s} {sec*1e3:9.2f} ms  {gflops:9.1f} GFLOP/s "
              f"{gbs:7.1f} GB/s  HBM {100*frac_bw:5.1f}%  "
              f"f32 {100*frac_flop_f32:5.1f}%  -> {bound}",
              file=sys.stderr)
    out = {"device": str(dev),
           "peaks": {"bf16_gflops": PEAK_BF16_GFLOPS,
                     "f32_gflops": PEAK_F32_GFLOPS,
                     "hbm_gbs": PEAK_HBM_GBS},
           "readback_floor_sec": round(_READBACK_FLOOR, 4),
           "notes": ("pct_of_hbm_roof uses MINIMUM unavoidable traffic; "
                     "achieved-% is a lower bound on efficiency (real "
                     "lowering may move more bytes at full stream rate). "
                     "Sign-flip t-maps omitted: sub-ms, below the tunnel "
                     "measurement floor — see bench.py permutations/s."),
           "kernels": rows}
    path = os.path.join(os.path.dirname(__file__), "..",
                        "BENCH_ROOFLINE.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
