"""Pallas TPU kernel: fused rotation-null surrogate chunk.

Fuses the surrogate statistic evaluation of the cohort rotation null
(``cohort_null._null_chunk_core``) into a single VMEM-resident pass.

Why: the XLA lowering materializes the (F, S, N) surrogate statistic
tensor in HBM (~1.4 GB per 500-surrogate chunk at north-star scale) and
re-reads it for the max statistic and the per-cell exceedance counts —
``BENCH_ROOFLINE.json`` puts that path at ~19 % of the HBM roof.  Here
each (frequency, cell-tile) grid step computes its (S, TN) statistic
tile on the MXU, reduces it to a running per-surrogate max and a
per-cell exceedance count in VMEM, and never writes the statistic to
HBM.  Remaining traffic is one streaming read of the coefficient
tensor + the per-frequency phase features.

Math parity: ``stat(φ) = base + G·coef / J`` exactly as
``cohort_null._null_chunk_core`` (same features, same clipping-free
statistic); the only difference is MXU accumulation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL_TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _null_tile_kernel(G_ref, coefT_ref, base_ref, obs_ref,
                      max_ref, counts_ref, *, S: int, inv_J: float):
    """One (frequency, cell-tile) grid step.

    G_ref: (1, S_pad, JP_pad) phase features for this frequency;
    coefT_ref: (1, JP_pad, TN) coefficients (J·P flattened, zero-padded);
    base_ref/obs_ref: (1, 1, TN) rotation-invariant part / observed
    stat (the singleton middle axis satisfies the TPU block-shape rule
    for the trailing two dims).
    max_ref: (S_pad, 1) running per-surrogate max (accumulated across
    the whole grid — its block index is constant so it stays resident);
    counts_ref: (1, 1, TN) per-cell exceedance counts (one block per
    step).
    """
    f = pl.program_id(0)
    n = pl.program_id(1)

    stat = jnp.dot(G_ref[0], coefT_ref[0],
                   preferred_element_type=jnp.float32)     # (S_pad, TN)
    stat = base_ref[0, 0][None, :] + stat * inv_J

    # exceedance counts over the REAL surrogates only (S is static; the
    # padded rows hold stat == base, which could spuriously exceed obs)
    ge = (stat[:S] >= obs_ref[0, 0][None, :])
    counts_ref[0, 0] = jnp.sum(ge.astype(jnp.float32),
                               axis=0).astype(jnp.int32)

    # running max over all (f, n) tiles; padded rows are sliced away by
    # the caller
    tile_max = jnp.max(stat, axis=1, keepdims=True)        # (S_pad, 1)

    is_first = jnp.logical_and(f == 0, n == 0)

    @pl.when(is_first)
    def _():
        max_ref[:] = tile_max

    @pl.when(jnp.logical_not(is_first))
    def _():
        max_ref[:] = jnp.maximum(max_ref[:], tile_max)


def _pallas_call_null(G, coefT, base, obs, S: int, J: int,
                      interpret: bool):
    """Invoke the fused kernel (traceable; see wrappers below).

    G: (nF, S_pad, JP_pad) phase features (compute dtype);
    coefT: (nF, JP_pad, N) coefficients (compute dtype, zero-padded JP);
    base/obs: (nF, N) float32.
    Returns (max_stat (S,), counts_inc (nF, N) int32).
    """
    nF, S_pad, JP_pad = G.shape
    N = coefT.shape[-1]
    TN = min(CELL_TILE, N)
    if N % TN:
        raise ValueError(f"N={N} must be a multiple of the {TN} tile")

    in_vma = getattr(jax.typeof(G), "vma", None)
    vma_kw = {"vma": in_vma} if in_vma else {}

    max_out, counts_out = pl.pallas_call(
        functools.partial(_null_tile_kernel, S=S, inv_J=1.0 / J),
        grid=(nF, N // TN),
        in_specs=[
            pl.BlockSpec((1, S_pad, JP_pad), lambda f, n: (f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, JP_pad, TN), lambda f, n: (f, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda f, n: (f, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda f, n: (f, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S_pad, 1), lambda f, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda f, n: (f, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, 1), jnp.float32, **vma_kw),
            jax.ShapeDtypeStruct((nF, 1, N), jnp.int32, **vma_kw),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(G, coefT, base.reshape(nF, 1, N), obs.reshape(nF, 1, N))
    return max_out[:S, 0], counts_out.reshape(nF, N)


@functools.partial(jax.jit,
                   static_argnames=("S", "J", "P", "interpret"))
def _null_chunk_pallas_jit(G, coefT, base, obs, S: int, J: int, P: int,
                           interpret: bool = False):
    """Fused surrogate chunk from precomputed features (tests)."""
    del P
    return _pallas_call_null(G, coefT, base.astype(jnp.float32),
                             obs.astype(jnp.float32), S, J, interpret)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def prepare_null_coeffs(coef_all, compute_dtype):
    """One-time relayout for the fused kernel.

    coef_all: (J, nF, N, P) float32 → (nF, J·P (padded to 128), N) in
    the compute dtype, zero-padded so the padding contributes nothing
    to the contraction.
    """
    J, nF, N, P = coef_all.shape
    JP = J * P
    JP_pad = _round_up(JP, 128)
    coefT = jnp.transpose(coef_all, (1, 0, 3, 2)).reshape(nF, JP, N)
    coefT = jnp.pad(coefT, [(0, 0), (0, JP_pad - JP), (0, 0)])
    return coefT.astype(compute_dtype)


def null_chunk_pallas_body(key, coefT, base, obs, n_chunk: int, K: int,
                           J: int, P: int, compute_dtype,
                           interpret: bool = False):
    """Traceable fused-chunk body (also usable inside ``shard_map``).

    Same phase-draw layout as ``_null_chunk_core`` (identical ``key`` →
    identical φ draws).
    """
    from mba_tpu.ops.cohort_null import phase_features

    nF, JP_pad, N = coefT.shape
    phi = jax.random.uniform(key, (J, n_chunk, K, nF),
                             minval=0.0, maxval=2.0 * np.pi)
    G = phase_features(phi)                          # (J, S, nF, P)
    G = jnp.transpose(G, (2, 1, 0, 3)).reshape(nF, n_chunk, J * P)
    # sub-32-bit dtypes (bf16/f16) tile at 16 sublanes on TPU; an
    # 8-multiple pad can fail Mosaic lowering and silently cost the
    # fused-kernel win via the fallback (padded rows are sliced away,
    # so the wider pad is free)
    S_pad = _round_up(n_chunk,
                      16 if jnp.dtype(compute_dtype).itemsize < 4 else 8)
    G = jnp.pad(G, [(0, 0), (0, S_pad - n_chunk),
                    (0, JP_pad - J * P)]).astype(compute_dtype)
    return _pallas_call_null(G, coefT, base.astype(jnp.float32),
                             obs.astype(jnp.float32), n_chunk, J,
                             interpret)


# one compiled program per configuration: phase draw, trig features,
# relayout and the pallas_call all trace together (eager per-op dispatch
# costs ~100 ms/chunk of tunnel round trips on remote backends)
null_chunk_pallas = functools.partial(
    jax.jit, static_argnames=("n_chunk", "K", "J", "P", "compute_dtype",
                              "interpret"))(null_chunk_pallas_body)
