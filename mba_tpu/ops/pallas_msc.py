"""Pallas TPU kernel: fused jackknifed MSC epilogue.

Fuses everything after the rFFT of ``_msc_chunk_kernel``
(coherence.py:72-141 — CSD outer products, algebraic leave-one-out
jackknife, Fisher-z CIs and the CI-aligned EMG max-pool) into a single
VMEM-resident pass over frequency blocks.

Why: the XLA path materializes the (K, F, E, M) leave-one-out
cross-spectra in HBM (~0.3-1 GB per 2-s window at 64×64 channels), so
the epilogue is HBM-bandwidth-bound.  This kernel never leaves VMEM:
per frequency block it holds only the (K, FB, E) spectra and (FB, E, M)
accumulators, recomputing each taper's outer product on the VPU instead
of re-reading it from HBM (FLOPs are cheaper than bandwidth here).
Outputs are just the (F, E) max-pooled coherence + CI arrays.

Parity target: reference signal_features.py:619-839 (MSC), :484-578
(jackknife), :1132-1171 (aligned EMG max) — same math as the XLA
kernel; coherence is scale-invariant so the 1/(fs·N) PSD scaling
cancels and is omitted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FISHER_EPS = 1e-10
_F32_TINY = 1e-30
FREQ_BLOCK = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _msc_block_kernel(t_crit_ref, er_ref, ei_ref, mr_ref, mi_ref,
                      coh_ref, lo_ref, hi_ref, K: int,
                      emg_max: bool = True):
    """One (window, freq-block) grid step.

    er/ei: (1, K, FB, E) EEG rFFT real/imag; mr/mi: (1, K, FB, M).
    Outputs: EMG-max (1, FB, E) coherence mean + aligned CI bounds when
    ``emg_max``, else the full (1, FB, E, M) grids.
    """
    t_crit = t_crit_ref[0, 0]

    er = er_ref[0]                    # (K, FB, E)
    ei = ei_ref[0]
    mr = mr_ref[0]                    # (K, FB, M)
    mi = mi_ref[0]

    # ---- totals over tapers (outer products recomputed per taper) ----
    def outer(a, b):                  # (FB,E),(FB,M) -> (FB,E,M)
        return a[:, :, None] * b[:, None, :]

    FB, E = er.shape[1], er.shape[2]
    M = mr.shape[2]

    # unrolled static loops: Pallas TPU lowering has no dynamic_slice,
    # so er[k] with a traced k (fori_loop) cannot lower; FREQ_BLOCK is
    # sized so the unrolled temporaries fit the 16 MB VMEM budget
    zeros_fem = jnp.zeros((FB, E, M), jnp.float32)
    sum_cr, sum_ci = zeros_fem, zeros_fem
    for k in range(K):
        # conj(E)·M: re = er·mr + ei·mi, im = er·mi − ei·mr
        sum_cr = sum_cr + outer(er[k], mr[k]) + outer(ei[k], mi[k])
        sum_ci = sum_ci + outer(er[k], mi[k]) - outer(ei[k], mr[k])
    sum_e = jnp.sum(er * er + ei * ei, axis=0)          # (FB, E)
    sum_m = jnp.sum(mr * mr + mi * mi, axis=0)          # (FB, M)

    def coh(cr, ci, pe, pm):
        num = cr * cr + ci * ci
        den = jnp.maximum(pe[:, :, None] * pm[:, None, :], _F32_TINY)
        return jnp.clip(num / den, 0.0, 1.0)

    def fisher(c):
        c = jnp.clip(c, _FISHER_EPS, 1.0 - _FISHER_EPS)
        return 0.5 * jnp.log((1.0 + c) / (1.0 - c))

    # ---- algebraic leave-one-out jackknife (taper axis) ----
    sum_ck, sum_z, sum_z2 = zeros_fem, zeros_fem, zeros_fem
    for k in range(K):
        loo_cr = sum_cr - outer(er[k], mr[k]) - outer(ei[k], mi[k])
        loo_ci = sum_ci - outer(er[k], mi[k]) + outer(ei[k], mr[k])
        loo_e = sum_e - (er[k] * er[k] + ei[k] * ei[k])
        loo_m = sum_m - (mr[k] * mr[k] + mi[k] * mi[k])
        # the 1/(K−1) normalization cancels inside the MSC ratio
        c_k = coh(loo_cr, loo_ci, loo_e, loo_m)
        z_k = fisher(c_k)
        sum_ck, sum_z, sum_z2 = (sum_ck + c_k, sum_z + z_k,
                                 sum_z2 + z_k * z_k)

    inv_k = 1.0 / K
    coherence_mean = jnp.clip(sum_ck * inv_k, 0.0, 1.0)
    z_mean = sum_z * inv_k
    # ((K−1)/K)·Σ(z_k − z̄)² = ((K−1)/K)·(Σz² − K·z̄²)
    z_var = ((K - 1.0) * inv_k) * jnp.maximum(
        sum_z2 - K * z_mean * z_mean, 0.0)
    z_se = jnp.sqrt(z_var)

    z_center = fisher(coherence_mean)
    tanh_lo = jnp.tanh(z_center - t_crit * z_se)
    tanh_hi = jnp.tanh(z_center + t_crit * z_se)
    ci_lower = jnp.minimum(tanh_lo * tanh_lo, coherence_mean)
    ci_upper = jnp.maximum(tanh_hi * tanh_hi, coherence_mean)

    if not emg_max:
        coh_ref[0] = coherence_mean
        lo_ref[0] = ci_lower
        hi_ref[0] = ci_upper
        return

    # ---- CI-aligned EMG max-pool (argmax on the mean) ----
    m_ids = jax.lax.broadcasted_iota(jnp.int32, coherence_mean.shape, 2)
    max_idx = jnp.argmax(coherence_mean, axis=2)[:, :, None]  # (FB,E,1)
    sel = (m_ids == max_idx)
    coh_ref[0] = jnp.max(jnp.where(sel, coherence_mean, -1.0), axis=2)
    lo_ref[0] = jnp.max(jnp.where(sel, ci_lower, -1.0), axis=2)
    hi_ref[0] = jnp.max(jnp.where(sel, ci_upper, -1.0), axis=2)


@functools.partial(jax.jit, static_argnames=("interpret", "emg_max"))
def msc_jackknife_maxpool_pallas(eeg_fft_re, eeg_fft_im,
                                 emg_fft_re, emg_fft_im,
                                 t_crit, interpret: bool = False,
                                 emg_max: bool = True):
    """Jackknifed MSC from tapered rFFT spectra.

    eeg_fft_*: (W, K, F, E) float32; emg_fft_*: (W, K, F, M) float32.
    Returns dict of (W, F, E) float32 arrays (``emg_max``, CI-aligned
    max-pool) or (W, F, E, M) full grids — numerically equivalent to
    ``_msc_chunk_kernel`` with ``use_jackknife=True``.
    """
    W, K, F, E = eeg_fft_re.shape
    M = emg_fft_re.shape[-1]
    F_pad = _round_up(F, FREQ_BLOCK)
    pad = [(0, 0), (0, 0), (0, F_pad - F), (0, 0)]
    er = jnp.pad(eeg_fft_re, pad)
    ei = jnp.pad(eeg_fft_im, pad)
    mr = jnp.pad(emg_fft_re, pad)
    mi = jnp.pad(emg_fft_im, pad)
    t_crit_arr = jnp.asarray(t_crit, jnp.float32).reshape(1, 1)

    # under shard_map's varying-mesh-axes checker (check_vma=True) the
    # outputs must declare the same vma as the inputs, else pallas_call
    # refuses to trace (jax 0.9 pallas_call.py:1196)
    in_vma = getattr(jax.typeof(er), "vma", None)
    vma_kw = {"vma": in_vma} if in_vma else {}

    spec_in = lambda C: pl.BlockSpec(
        (1, K, FREQ_BLOCK, C), lambda w, f: (w, 0, f, 0),
        memory_space=pltpu.VMEM)
    if emg_max:
        spec_out = pl.BlockSpec((1, FREQ_BLOCK, E),
                                lambda w, f: (w, f, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((W, F_pad, E), jnp.float32,
                                         **vma_kw)
    else:
        spec_out = pl.BlockSpec((1, FREQ_BLOCK, E, M),
                                lambda w, f: (w, f, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((W, F_pad, E, M), jnp.float32,
                                         **vma_kw)

    coh, lo, hi = pl.pallas_call(
        functools.partial(_msc_block_kernel, K=K, emg_max=emg_max),
        grid=(W, F_pad // FREQ_BLOCK),
        in_specs=[pl.BlockSpec((1, 1), lambda w, f: (0, 0),
                               memory_space=pltpu.SMEM),
                  spec_in(E), spec_in(E), spec_in(M), spec_in(M)],
        out_specs=[spec_out, spec_out, spec_out],
        out_shape=[out_shape, out_shape, out_shape],
        # the default 16 MB scoped-VMEM budget is far below the chip's
        # physical VMEM; the unrolled taper loops need ~50 MB at FB=64
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(t_crit_arr, er, ei, mr, mi)
    return {"coherence": coh[:, :F], "ci_lower": lo[:, :F],
            "ci_upper": hi[:, :F]}


def msc_chunk_pallas(eeg_frames, emg_frames, tapers, t_crit,
                     interpret: bool = False, emg_max: bool = True):
    """Drop-in for ``_msc_chunk_kernel(..., use_jackknife=True)``:
    rFFT in XLA, epilogue in Pallas."""
    from mba_tpu.ops.fftmm import rfft_prod
    eeg_fft = rfft_prod(
        eeg_frames[:, None, :, :] * tapers[None, :, :, None], axis=2)
    emg_fft = rfft_prod(
        emg_frames[:, None, :, :] * tapers[None, :, :, None], axis=2)
    return msc_jackknife_maxpool_pallas(
        eeg_fft.real.astype(jnp.float32),
        eeg_fft.imag.astype(jnp.float32),
        emg_fft.real.astype(jnp.float32),
        emg_fft.imag.astype(jnp.float32), t_crit, interpret=interpret,
        emg_max=emg_max)
