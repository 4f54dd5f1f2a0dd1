"""Pallas TPU kernel: fused rotation-null coefficient pair pass.

The rotation-null coefficient precompute (``cohort_null.
_rotation_coeffs_body``) is the north-star's single largest device
cost: profiled at study scale (1 320 windows × 11×64 pairs × K=5
tapers), the per-subject body costs ~1.56 s of which the taper-pair
product stage is 1.21 s — the XLA lowering materializes the
per-chunk normalized taper spectra ``yr/yi`` (wc, K, F, N) in HBM
(~0.46 GB per 8-window chunk) and re-reads the k/l slices once per
each of the P/2 = K(K−1)/2 pair products (~3.7 GB of HBM re-reads per
chunk).  The FFT itself is only 0.32 s.

This kernel fuses the whole post-FFT pipeline for one window chunk —
power normalization, y construction (the E×M outer products), the
taper-diagonal powers and all P/2 upper-triangle pair products — into
one VMEM-resident pass over (frequency-tile) grid steps.  The taper
spectra are read from HBM exactly once; the (K, F, N) normalized
products never leave VMEM.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _coeff_tile_kernel(Er_ref, Ei_ref, Mr_ref, Mi_ref, w_ref,
                       diag_ref, pr_ref, pi_ref, *,
                       ks: tuple, ls: tuple, eps: float):
    """One frequency-tile grid step for one window chunk.

    Er/Ei: (wc, K, E, fb) — EEG taper spectra, frequency minor;
    Mr/Mi: (wc, K, M, fb); w: (wc, 1, 1) window weights.
    Outputs: diag (N, fb), pr/pi (P2, N, fb) summed over the chunk's
    windows (the caller's scan accumulates across chunks).
    """
    wc, K, E, fb = Er_ref.shape
    M = Mr_ref.shape[2]
    N = E * M
    P2 = len(ks)
    w_all = w_ref[...]                                   # (wc, 1, 1)

    diag = jnp.zeros((N, fb), jnp.float32)
    pr = [jnp.zeros((N, fb), jnp.float32) for _ in range(P2)]
    pi = [jnp.zeros((N, fb), jnp.float32) for _ in range(P2)]
    for w in range(wc):                  # static unroll: wc is small
        Er, Ei = Er_ref[w], Ei_ref[w]                    # (K, E, fb)
        Mr, Mi = Mr_ref[w], Mi_ref[w]                    # (K, M, fb)
        pe = (Er * Er + Ei * Ei).sum(axis=0)             # (E, fb)
        pm = (Mr * Mr + Mi * Mi).sum(axis=0)             # (M, fb)
        den = pe[:, None, :] * pm[None, :, :]            # (E, M, fb)
        sc = jnp.sqrt(w_all[w][..., None]
                      / jnp.maximum(den, eps))           # (E, M, fb)
        # y_k = conj(E_k)·M_k · sqrt(w/den), per taper, in VMEM only
        yr = (Er[:, :, None, :] * Mr[:, None, :, :]
              + Ei[:, :, None, :] * Mi[:, None, :, :]) * sc[None]
        yi = (Er[:, :, None, :] * Mi[:, None, :, :]
              - Ei[:, :, None, :] * Mr[:, None, :, :]) * sc[None]
        yr = yr.reshape(K, N, fb)
        yi = yi.reshape(K, N, fb)
        diag += (yr * yr + yi * yi).sum(axis=0)
        for p in range(P2):
            k, l = ks[p], ls[p]
            pr[p] += yr[k] * yr[l] + yi[k] * yi[l]
            pi[p] += yi[k] * yr[l] - yr[k] * yi[l]
    diag_ref[...] = diag
    pr_ref[...] = jnp.stack(pr)
    pi_ref[...] = jnp.stack(pi)


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
    w3 = weights.astype(jnp.float32).reshape(wc, 1, 1)

    in_spec = lambda C: pl.BlockSpec((wc, K, C, F_TILE),
                                     lambda f: (0, 0, 0, f),
                                     memory_space=pltpu.VMEM)
    diag, pr, pi = pl.pallas_call(
        functools.partial(_coeff_tile_kernel, ks=tuple(ks), ls=tuple(ls),
                          eps=float(eps)),
        grid=(Fp // F_TILE,),
        in_specs=[
            in_spec(E), in_spec(E), in_spec(M), in_spec(M),
            pl.BlockSpec((wc, 1, 1), lambda f: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, F_TILE), lambda f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P2, N, F_TILE), lambda f: (0, 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P2, N, F_TILE), lambda f: (0, 0, f),
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
    """VMEM feasibility guard for one grid step at F_TILE lanes.

    Dominant residents: the per-window (K, N, fb) y pair (constructed
    once per unrolled window), the (2·P2+1, N, fb) accumulators and the
    chunk's input spectra.
    """
    P2 = K * (K - 1) // 2
    n = E * M
    est = (2 * K * n                      # yr/yi for one window
           + (2 * P2 + 1) * n             # accumulators
           + 2 * wc * K * (E + M)         # input spectra
           + 3 * E * M) * F_TILE * 4      # pe/pm/den/sc slack
    return est < 90 * 1024 * 1024
