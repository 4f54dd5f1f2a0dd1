"""Discrete wavelet transform + Donoho universal-threshold denoising.

Replaces the reference's pywt dependency (preprocessing.py:784-873):
``wavedec``/``waverec`` with db4/sym5/coif1 filter banks and symmetric
boundary extension, MAD noise estimation (σ = median|d|/0.6745), Donoho's
universal threshold σ·√(2·ln N), soft/hard coefficient shrinkage, and the
reference's policy of keeping approximation coefficients unaltered.

Analysis runs along axis 0 (time) per channel.  (The reference called
``pywt.wavedec`` without an axis argument, which transforms the trailing
*channel* axis — a latent defect; the time-axis transform here is the
physically meaningful denoiser and is what its SNR validation measures.)

Decimating convolutions are ``lax.conv_general_dilated`` with stride 2 —
static shapes, fully fused under jit.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

# orthonormal decomposition low-pass filters (standard published constants)
_DEC_LO = {
    'db4': np.array([
        -0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
        -0.18703481171888114, -0.02798376941698385, 0.6308807679295904,
        0.7148465705525415, 0.23037781330885523]),
    'sym5': np.array([
        0.027333068345077982, 0.029519490925774643, -0.039134249302383094,
        0.1993975339773936, 0.7234076904024206, 0.6339789634582119,
        0.01660210576452232, -0.17532808990845047, -0.021101834024758855,
        0.019538882735286728]),
    'coif1': np.array([
        -0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
        0.8525720202122554, 0.33789766245780922, -0.0727326195128539]),
    'haar': np.array([0.7071067811865476, 0.7071067811865476]),
}


def wavelet_filters(wavelet: str):
    """(dec_lo, dec_hi, rec_lo, rec_hi) for a named wavelet."""
    if wavelet not in _DEC_LO:
        raise ValueError(f"Unknown wavelet '{wavelet}'. "
                         f"Available: {sorted(_DEC_LO)}")
    dec_lo = _DEC_LO[wavelet]
    L = len(dec_lo)
    dec_hi = np.array([(-1) ** k * dec_lo[L - 1 - k] for k in range(L)])
    return dec_lo, dec_hi, dec_lo[::-1].copy(), dec_hi[::-1].copy()


def dwt_max_level(data_len: int, filter_len: int) -> int:
    """Maximum useful decomposition level (pywt semantics)."""
    if data_len < filter_len:
        return 0
    return int(math.floor(math.log2(data_len / (filter_len - 1))))


def _sympad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Symmetric (half-point) extension along axis 0."""
    return jnp.concatenate([x[:p][::-1], x, x[-p:][::-1]], axis=0)


def _conv_down2(x: jnp.ndarray, filt: np.ndarray) -> jnp.ndarray:
    """Symmetric-extend, correlate with ``filt``, downsample by 2.

    Matches the convention validated for perfect reconstruction: the valid
    correlation of the (L−1)-padded extension is sampled at even indices,
    keeping the first ``(n + L − 1)//2`` coefficients.
    x: (n, C) → ((n + L − 1)//2, C)
    """
    n, _ = x.shape
    L = len(filt)
    xe = _sympad(x, L - 1)[1:]   # correlation phase: offsets 1, 3, 5, ...
    out_len = (n + L - 1) // 2
    lhs = xe.T[:, None, :]                                 # (C, 1, n_ext)
    # XLA conv is correlation (no kernel flip) — pass the filter unreversed
    rhs = jnp.asarray(filt, x.dtype)[None, None, :]
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(2,), padding=[(0, 0)],
        precision=jax.lax.Precision.HIGHEST)[:, 0, :]
    return y[:, :out_len].T


def _upconv(c: jnp.ndarray, filt: np.ndarray) -> jnp.ndarray:
    """Upsample by 2 (zeros interleaved) and full-convolve with ``filt``."""
    m, ch = c.shape
    up = jnp.zeros((2 * m - 1, ch), c.dtype).at[::2].set(c)
    L = len(filt)
    lhs = jnp.pad(up, [(L - 1, L - 1), (0, 0)]).T[:, None, :]
    rhs = jnp.asarray(filt[::-1], c.dtype)[None, None, :]  # conv = corr w/ rev
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(0, 0)],
        precision=jax.lax.Precision.HIGHEST)[:, 0, :]
    return y.T                                    # (2m - 1 + L - 1, C)


def dwt(x: jnp.ndarray, wavelet: str = 'db4'):
    """Single-level DWT along axis 0.  x: (n,) or (n, C) → (cA, cD)."""
    squeeze = x.ndim == 1
    x = jnp.asarray(x)
    if squeeze:
        x = x[:, None]
    dec_lo, dec_hi, _, _ = wavelet_filters(wavelet)
    ca = _conv_down2(x, dec_lo)
    cd = _conv_down2(x, dec_hi)
    if squeeze:
        return ca[:, 0], cd[:, 0]
    return ca, cd


def idwt(ca: jnp.ndarray, cd: jnp.ndarray, wavelet: str, out_len: int):
    """Inverse single-level DWT; crops to ``out_len``."""
    squeeze = ca.ndim == 1
    ca = jnp.asarray(ca)
    cd = jnp.asarray(cd)
    if squeeze:
        ca, cd = ca[:, None], cd[:, None]
    dec_lo, dec_hi, rec_lo, rec_hi = wavelet_filters(wavelet)
    L = len(dec_lo)
    y = _upconv(ca, rec_lo[::-1]) + _upconv(cd, rec_hi[::-1])
    y = y[L - 2:L - 2 + out_len]
    return y[:, 0] if squeeze else y


def wavedec(x, wavelet: str = 'db4', level: int | None = None):
    """Multi-level decomposition → [cA_n, cD_n, ..., cD_1] (pywt order)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    L = len(_DEC_LO[wavelet])
    if level is None:
        level = dwt_max_level(n, L)
    coeffs = []
    ca = x
    for _ in range(max(level, 0)):
        ca, cd = dwt(ca, wavelet)
        coeffs.append(cd)
    coeffs.append(ca)
    return coeffs[::-1]


def waverec(coeffs, wavelet: str = 'db4', lengths: list[int] | None = None):
    """Reconstruct from wavedec coefficients.

    ``lengths``: original per-level input lengths (finest last).  If omitted
    they are inferred from the detail-coefficient lengths (exact when every
    level length was even; pywt resolves the same ambiguity identically by
    trimming).
    """
    ca = jnp.asarray(coeffs[0])
    L = len(_DEC_LO[wavelet])
    details = coeffs[1:]
    for i, cd in enumerate(details):
        cd = jnp.asarray(cd)
        if lengths is not None:
            out_len = lengths[i]
        else:
            # assume the even-length case (exact when every level input
            # length was even; pywt trims the same way otherwise)
            out_len = 2 * cd.shape[0] - L + 2
        if ca.shape[0] > cd.shape[0]:
            ca = ca[:cd.shape[0]]
        ca = idwt(ca, cd, wavelet, out_len)
    return ca


def wavedec_lengths(n: int, wavelet: str, level: int) -> list[int]:
    """Per-level input lengths for exact waverec (finest last)."""
    L = len(_DEC_LO[wavelet])
    lens = []
    cur = n
    for _ in range(level):
        lens.append(cur)
        cur = (cur + L - 1) // 2
    return lens[::-1]


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "mode"))
def wavelet_denoise(x, wavelet: str = 'db4', level: int | None = None,
                    mode: str = 'soft'):
    """Wavelet shrinkage denoising (reference preprocessing.py:811-873).

    - σ from the finest detail level: median(|cD₁|)/0.6745
    - universal threshold σ·√(2·ln len(cD₁))
    - soft/hard thresholding of ALL detail levels, approximation kept
    """
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[0]
    L = len(_DEC_LO[wavelet])
    if level is None:
        level = dwt_max_level(n, L)
    lengths = wavedec_lengths(n, wavelet, level)

    coeffs = wavedec(x, wavelet, level)
    finest = coeffs[-1]
    sigma = jnp.median(jnp.abs(finest)) / 0.6745
    uthresh = sigma * jnp.sqrt(2.0 * jnp.log(finest.shape[0]))

    def shrink(c):
        if mode == 'soft':
            return jnp.sign(c) * jnp.maximum(jnp.abs(c) - uthresh, 0.0)
        if mode == 'hard':
            return jnp.where(jnp.abs(c) > uthresh, c, 0.0)
        raise ValueError(f"unknown threshold mode: {mode}")

    denoised = [coeffs[0]] + [shrink(c) for c in coeffs[1:]]
    out = waverec(denoised, wavelet, lengths=lengths)
    return out[:, 0] if squeeze else out
