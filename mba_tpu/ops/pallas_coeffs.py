"""Pallas TPU kernel: fused rotation-null coefficient pair pass.

The rotation-null coefficient precompute (``cohort_null.
_rotation_coeffs_body``) is the north-star's single largest device
cost: profiled at study scale (1 320 windows × 64×64 pairs × K=5
tapers), the per-subject body costs ~1.56 s of which the taper-pair
product stage is 1.21 s — the XLA lowering materializes the
per-chunk normalized taper spectra ``yr/yi`` (wc, K, F, N) in HBM
(~0.46 GB per 8-window chunk) and re-reads the k/l slices once per
each of the P/2 = K(K−1)/2 pair products (~3.7 GB of HBM re-reads per
chunk).  The FFT itself is only 0.32 s.

This kernel fuses the whole post-FFT pipeline for one window chunk —
power normalization, y construction (the E×M outer products), the
taper-diagonal powers and all P/2 upper-triangle pair products — into
VMEM-resident grid steps.  The taper spectra are read from HBM once
per EEG block; the (K, N, fb) normalized products never leave VMEM.

Scheduling: the grid is 3-D — EEG-channel blocks × 128-lane frequency
tiles × windows, with the WINDOW axis fastest.  Each step consumes one
window's spectra tile and accumulates into the (2·P2+1, E_blk·M, 128)
output block, which stays VMEM-resident across the window sweep (its
index map is independent of the window dim); a ``pl.when`` on
``program_id`` zero-initializes at the first window.  This is the
canonical TPU accumulate pattern — two earlier shapes of this kernel
failed on real hardware: a Python-unrolled window loop carrying all 21
accumulators functionally made Mosaic's register allocator spill
>100 MB of VMEM, and a ``fori_loop`` over a whole-chunk block needs
dynamic ref slicing that the TC lowering does not implement.

Layout: frequency rides the 128-lane minor axis throughout (inputs
(wc, K, C, F_pad), outputs (N, F_pad) / (P2, N, F_pad)); the caller
transposes the final (F, N)-major contract once per subject (~120 MB,
negligible).  Padding frequencies are exact zeros: zero spectra give
``den = 0 → scale = sqrt(w/eps)`` times an exactly-zero product.

Math parity with the XLA path is pinned by
``tests/test_pallas_coeffs.py`` (interpret mode, both engines on the
same inputs, incl. int16 transfer dtypes and non-uniform weights).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_TILE = 128
_VMEM_BUDGET = 64 * 1024 * 1024     # conservative: leave headroom for
                                    # Mosaic scratch + double buffering


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _step_vmem_bytes(K: int, e_blk: int, M: int) -> int:
    """Estimated VMEM residency of ONE grid step at F_TILE lanes.

    One window's spectra (double-buffered), the resident accumulator
    block, and the body's y pair + normalization temporaries.
    """
    P2 = K * (K - 1) // 2
    n_blk = e_blk * M
    inputs = 2 * 2 * K * (e_blk + M)          # Er/Ei + Mr/Mi, 2× buffered
    accum = (2 * P2 + 1) * n_blk              # diag + pr + pi outputs
    body = 2 * K * n_blk + 3 * e_blk * M      # yr/yi + den/sc slack
    return (inputs + accum + body) * F_TILE * 4


def _pick_e_block(K: int, E: int, M: int) -> int | None:
    """Largest divisor of E whose grid step fits the VMEM budget."""
    for e_blk in sorted({d for d in range(1, E + 1) if E % d == 0},
                        reverse=True):
        if _step_vmem_bytes(K, e_blk, M) < _VMEM_BUDGET:
            return e_blk
    return None


def _coeff_tile_kernel(Er_ref, Ei_ref, Mr_ref, Mi_ref, w_ref,
                       diag_ref, pr_ref, pi_ref, *,
                       ks: tuple, ls: tuple, eps: float):
    """One (EEG-block, frequency-tile, window) grid step.

    Er/Ei: (1, K, E_blk, fb) — one window's EEG taper spectra;
    Mr/Mi: (1, K, M, fb); w: (1, 1, 1) window weight.
    Outputs: diag (N_blk, fb), pr/pi (P2, N_blk, fb) — revisited across
    the window sweep (zero-initialized at window 0, accumulated after).
    """
    _, K, E_blk, fb = Er_ref.shape
    M = Mr_ref.shape[2]
    N_blk = E_blk * M
    P2 = len(ks)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        diag_ref[...] = jnp.zeros((N_blk, fb), jnp.float32)
        pr_ref[...] = jnp.zeros((P2, N_blk, fb), jnp.float32)
        pi_ref[...] = jnp.zeros((P2, N_blk, fb), jnp.float32)

    Er, Ei = Er_ref[0], Ei_ref[0]                        # (K, E_blk, fb)
    Mr, Mi = Mr_ref[0], Mi_ref[0]                        # (K, M, fb)
    wt = w_ref[0, 0, 0]
    pe = (Er * Er + Ei * Ei).sum(axis=0)                 # (E_blk, fb)
    pm = (Mr * Mr + Mi * Mi).sum(axis=0)                 # (M, fb)
    den = pe[:, None, :] * pm[None, :, :]                # (E_blk, M, fb)
    sc = jnp.sqrt(wt / jnp.maximum(den, eps))            # (E_blk, M, fb)
    # y_k = conj(E_k)·M_k · sqrt(w/den), per taper, in VMEM only
    yr = (Er[:, :, None, :] * Mr[:, None, :, :]
          + Ei[:, :, None, :] * Mi[:, None, :, :]) * sc[None]
    yi = (Er[:, :, None, :] * Mi[:, None, :, :]
          - Ei[:, :, None, :] * Mr[:, None, :, :]) * sc[None]
    yr = yr.reshape(K, N_blk, fb)
    yi = yi.reshape(K, N_blk, fb)
    diag_ref[...] += (yr * yr + yi * yi).sum(axis=0)
    for p in range(P2):
        k, l = ks[p], ls[p]
        pr_ref[p] += yr[k] * yr[l] + yi[k] * yi[l]
        pi_ref[p] += yi[k] * yr[l] - yr[k] * yi[l]


def coeff_chunk_pallas(Er, Ei, Mr, Mi, weights, ks, ls, eps,
                       interpret: bool = False):
    """Fused pair pass over one window chunk (traceable).

    Er/Ei: (wc, K, E, Fp), Mr/Mi: (wc, K, M, Fp) float32 taper spectra
    with the frequency axis already zero-padded to a 128 multiple;
    weights: (wc,) float32.

    Returns ``(diag (N, Fp), pr (P2, N, Fp), pi (P2, N, Fp))`` — window
    sums, frequency minor.
    """
    wc, K, E, Fp = Er.shape
    M = Mr.shape[2]
    N = E * M
    P2 = len(ks)
    if Fp % F_TILE:
        raise ValueError(f"Fp={Fp} must be a multiple of {F_TILE}")
    e_blk = _pick_e_block(K, E, M)
    if e_blk is None:
        raise ValueError(f"no EEG block of E={E} fits VMEM")
    n_blk = e_blk * M
    w3 = weights.astype(jnp.float32).reshape(wc, 1, 1)

    def in_spec_e(C):
        return pl.BlockSpec((1, K, C, F_TILE),
                            lambda e, f, w: (w, 0, e, f),
                            memory_space=pltpu.VMEM)

    def in_spec_m(C):
        return pl.BlockSpec((1, K, C, F_TILE),
                            lambda e, f, w: (w, 0, 0, f),
                            memory_space=pltpu.VMEM)

    diag, pr, pi = pl.pallas_call(
        functools.partial(_coeff_tile_kernel, ks=tuple(ks), ls=tuple(ls),
                          eps=float(eps)),
        grid=(E // e_blk, Fp // F_TILE, wc),
        in_specs=[
            in_spec_e(e_blk), in_spec_e(e_blk),
            in_spec_m(M), in_spec_m(M),
            pl.BlockSpec((1, 1, 1), lambda e, f, w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, F_TILE), lambda e, f, w: (e, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P2, n_blk, F_TILE), lambda e, f, w: (0, e, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P2, n_blk, F_TILE), lambda e, f, w: (0, e, f),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Fp), jnp.float32),
            jax.ShapeDtypeStruct((P2, N, Fp), jnp.float32),
            jax.ShapeDtypeStruct((P2, N, Fp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Er, Ei, Mr, Mi, w3)
    return diag, pr, pi


def coeff_pallas_viable(wc: int, K: int, E: int, M: int) -> bool:
    """Feasibility guard: some EEG block of E fits the VMEM budget.

    The grid tiles EEG channels and windows, so even the 64×64-pair
    flagship shape fits (E_blk=16 → ~24 MB/step); infeasibility needs
    a pathologically large M.
    """
    return _pick_e_block(K, E, M) is not None
