"""MXU-decomposed real FFT: Cooley-Tukey as two matmul stages.

The classic TPU factorization: for ``n = n1 * n2``

    X[k1 + n1*k2] = sum_j2 [ F2[j2, k2] * W[k1, j2]
                     * sum_j1 F1[k1, j1] * x[n2*j1 + j2] ]

i.e. a length-``n1`` DFT as a matmul over the reshaped ``(n1, n2)``
input, an elementwise twiddle, and a length-``n2`` DFT as a second
matmul — O(n*(n1+n2)) flops instead of O(n log n), but on the 128x128
systolic array.

**Measured honestly** (``tools/bench_fftmm.py`` → ``BENCH_FFTMM.json``,
device-resident, in-jit repeat loops past the tunnel readback floor):
XLA's native TPU rfft is already strong at this framework's shapes —
the bf16-accumulation matmul path wins **1.26-1.39×** but its ~7e-4
spectrum error fails the parity bar.  The round-4 f32-accumulation
A/B settled adoption: **1.11-1.30×** at rel-err ≤ 1.4e-7 across all
three production shape regimes, so the production window-FFT sites
(coherence, spectral, surrogate, cohort_null, gram_coeffs,
pallas_msc) now route through :func:`rfft_prod`, which picks the MXU
f32-accumulation path on real TPU backends at power-of-2 window
lengths and falls back to ``jnp.fft.rfft`` everywhere else.

Only the onesided (rfft) spectrum is materialized: stage 2 evaluates
``k2 in [0, n2/2]`` so ~half the second matmul is skipped.  All
arithmetic is f32 real matmuls (complex is carried as explicit
real/imag pairs — axon TPUs cannot even transfer complex64, and real
matmuls give XLA full freedom to fuse the twiddle).

No reference counterpart: the reference runs ``scipy``/``numpy`` FFTs
on the host (signal_features.py:743-748); this module exists purely to
map the same transform onto TPU hardware.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _split(n: int) -> tuple[int, int]:
    """Pick (n1, n2) with n = n1*n2, both powers of 2, n1 >= n2.

    The stage-1 contraction is over n1 (wants a full 128 sublane tile),
    the stage-2 contraction over n2; favour n1 = 128 when possible.
    """
    if n & (n - 1) or n < 4:
        raise ValueError(f"rfft_mxu needs a power-of-2 length >= 4, got {n}")
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    if n >= 1024:
        n1 = max(n1, min(128, n // 8))
    return n1, n // n1


@functools.lru_cache(maxsize=8)
def _factors(n: int):
    """Constant DFT/twiddle factor tables for length n (host, cached)."""
    n1, n2 = _split(n)
    j1 = np.arange(n1)
    # stage 1: F1[k1, j1] = exp(-2i*pi*k1*j1/n1)
    ang1 = -2.0 * np.pi * np.outer(j1, j1) / n1
    c1 = np.cos(ang1).astype(np.float32)
    s1 = np.sin(ang1).astype(np.float32)
    # twiddle: W[k1, j2] = exp(-2i*pi*k1*j2/n)
    j2 = np.arange(n2)
    angw = -2.0 * np.pi * np.outer(j1, j2) / n
    wr = np.cos(angw).astype(np.float32)
    wi = np.sin(angw).astype(np.float32)
    # stage 2 (onesided): F2[j2, k2] = exp(-2i*pi*j2*k2/n2), k2 <= n2/2
    k2 = np.arange(n2 // 2 + 1)
    ang2 = -2.0 * np.pi * np.outer(j2, k2) / n2
    c2 = np.cos(ang2).astype(np.float32)
    s2 = np.sin(ang2).astype(np.float32)
    return n1, n2, c1, s1, wr, wi, c2, s2


@functools.partial(jax.jit, static_argnames=("n", "axis", "precision"))
def _rfft_mxu_jit(x, n: int, axis: int, precision=None):
    n1, n2, c1, s1, wr, wi, c2, s2 = _factors(n)
    mm = dict(preferred_element_type=jnp.float32, precision=precision)
    x = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    batch = x.shape[:-1]
    xr = x.reshape(batch + (n1, n2))        # x[j1, j2] = x[n2*j1 + j2]
    # stage 1: contract j1 (real input -> complex out as two matmuls)
    yr = jnp.einsum("kj,...jn->...kn", c1, xr, **mm)
    yi = jnp.einsum("kj,...jn->...kn", s1, xr, **mm)
    # twiddle (elementwise; XLA fuses into the surrounding matmuls)
    zr = yr * wr - yi * wi
    zi = yr * wi + yi * wr
    # stage 2: contract j2, onesided k2
    xr2 = jnp.einsum("...kj,jm->...km", zr, c2, **mm) \
        - jnp.einsum("...kj,jm->...km", zi, s2, **mm)
    xi2 = jnp.einsum("...kj,jm->...km", zr, s2, **mm) \
        + jnp.einsum("...kj,jm->...km", zi, c2, **mm)
    # reorder k = k1 + n1*k2: (..., k1, k2) -> (..., k2, k1) -> flat
    out_r = jnp.swapaxes(xr2, -1, -2).reshape(batch + (n1 * (n2 // 2 + 1),))
    out_i = jnp.swapaxes(xi2, -1, -2).reshape(batch + (n1 * (n2 // 2 + 1),))
    out_r = out_r[..., :n // 2 + 1]
    out_i = out_i[..., :n // 2 + 1]
    out = jax.lax.complex(out_r, out_i)
    return jnp.moveaxis(out, -1, axis)


def rfft_mxu(x, axis: int = -1, precision=None):
    """Onesided FFT of real input via MXU matmuls — drop-in for
    ``jnp.fft.rfft(x, axis=axis)`` at power-of-2 lengths.

    precision : forwarded to the matmuls.  At the TPU default the MXU
        truncates the f32 inputs to bf16 per pass → spectrum-sum rel
        err ~7e-4 (BENCH_FFTMM.json).  ``jax.lax.Precision.HIGHEST``
        (f32 via multi-pass bf16) restores ~1e-6 accuracy at ~3-6×
        the matmul cost — the A/B that settles whether the MXU path
        can hold the framework's parity bar (tools/bench_fftmm.py).
    """
    n = x.shape[axis]
    ax = axis if axis >= 0 else x.ndim + axis
    return _rfft_mxu_jit(x, n, ax, precision)


def use_mxu_fft() -> bool:
    """Policy helper: True only on real TPU backends (where the matmul
    path measured 1.16-1.46× vs the native FFT — BENCH_FFTMM.json); on
    CPU XLA's pocketfft beats 15×-flops matmuls outright."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Production window-FFT dispatch bounds: the MXU path was measured a
# win at n in {2048, 4096} (BENCH_FFTMM.json); below ~1024 the matmuls
# are too small to feed the systolic array, above 64k the factor
# tables (n1 x n1, up to 2048²) start to cost real VMEM/HBM and no
# production window is that long.
_PROD_MIN_LEN = 1024
_PROD_MAX_LEN = 65536


def rfft_prod(x, axis: int = -1):
    """Production ``rfft``: the f32-accumulation MXU path where it is a
    measured win, ``jnp.fft.rfft`` everywhere else.

    The round-4 A/B (tools/bench_fftmm.py → BENCH_FFTMM.json, real
    chip) settled the adoption question: with
    ``precision=HIGHEST`` (f32 accumulation on the MXU) the matmul
    decomposition beats XLA's native TPU rfft at every production
    window shape — 1.11× (CMC 2-s window batch, n=4096), 1.18× (PSD
    1-s window batch, n=2048), 1.30× (coefficient-pass chunk layout)
    — at spectrum-sum rel-err ≤ 1.4e-7, i.e. inside f32 round-off and
    far inside the framework's 1e-5 parity bar.  The bf16-accumulation
    variant is faster still (1.26-1.39×) but its ~7e-4 error fails the
    parity bar, so it stays opt-in via ``rfft_mxu(precision=None)``.

    Dispatch guard (all trace-time static): real TPU backend,
    power-of-2 length in [1024, 65536], float input.  Everything else
    (CPU tests, odd lengths, the ~3.4M-point whole-recording surrogate
    FFT) takes the native path unchanged.
    """
    n = x.shape[axis]
    if (_PROD_MIN_LEN <= n <= _PROD_MAX_LEN and not (n & (n - 1))
            and jnp.issubdtype(x.dtype, jnp.floating) and use_mxu_fft()):
        return rfft_mxu(x, axis=axis, precision=jax.lax.Precision.HIGHEST)
    return jnp.fft.rfft(x, axis=axis)
