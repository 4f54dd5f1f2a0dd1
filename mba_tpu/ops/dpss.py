"""Discrete prolate spheroidal sequence (Slepian) taper generation.

The reference uses ``scipy.signal.windows.dpss`` (signal_features.py:395,
672-678).  DPSS generation is a symmetric-tridiagonal eigenproblem — a tiny,
one-off host computation — so we solve it in numpy/scipy on the host and
constant-fold the resulting taper matrix into the jitted spectral kernels
(SURVEY.md §7 "hard parts (b)").

Tapers are returned unit-energy (L2 norm 1), matching scipy's ``Kmax`` path
and the explicit re-normalisation at reference signal_features.py:677.
"""
from __future__ import annotations

import functools

import numpy as np
import scipy.linalg
from scipy.stats import beta as _beta_dist


@functools.lru_cache(maxsize=64)
def dpss_windows(window_samples: int, nw: float, k: int,
                 return_ratios: bool = False):
    """Compute the first ``k`` DPSS tapers of length ``window_samples``.

    Solves the classic Slepian tridiagonal eigenproblem (Percival & Walden
    §8.3): the tapers are eigenvectors of a symmetric tridiagonal matrix with
    diagonal ((N-1-2t)/2)^2 cos(2πW) and off-diagonal t(N-t)/2.

    Returns
    -------
    tapers : np.ndarray, shape (k, window_samples), unit L2 norm, float64.
    ratios : np.ndarray, shape (k,) — energy-concentration eigenvalues λ in
        (0, 1); only when ``return_ratios``.
    """
    n = int(window_samples)
    half_bandwidth = float(nw) / n
    t = np.arange(n, dtype=np.float64)
    diagonal = ((n - 1 - 2 * t) / 2.0) ** 2 * np.cos(2 * np.pi * half_bandwidth)
    off_diag = t[1:] * (n - t[1:]) / 2.0

    # top-k eigenvectors of the tridiagonal operator:
    eigvals, eigvecs = scipy.linalg.eigh_tridiagonal(
        diagonal, off_diag, select='i', select_range=(n - k, n - 1))
    tapers = eigvecs[:, ::-1].T  # (k, n), descending eigenvalue order

    # sign convention (match scipy): symmetric tapers have positive mean,
    # antisymmetric tapers start with a positive lobe.
    fix_even = tapers[::2].sum(axis=1) < 0
    for i, flip in enumerate(fix_even):
        if flip:
            tapers[2 * i] *= -1
    # antisymmetric: positive first derivative at the start
    for i in range(1, k, 2):
        if tapers[i, 1] - tapers[i, 0] < 0:
            if tapers[i, 0] < 0 or (tapers[i, 0] == 0 and tapers[i, 1] < 0):
                tapers[i] *= -1

    # unit energy:
    tapers /= np.sqrt((tapers ** 2).sum(axis=1, keepdims=True))

    if not return_ratios:
        return tapers

    # concentration ratios λ_k = energy of taper inside [-W, W]; computed via
    # the autocorrelation identity λ = Σ_τ r(τ) sinc-kernel(τ)  (P&W eq. 390)
    ratios = np.zeros(k)
    kernel = np.zeros(n, dtype=np.float64)
    tau = np.arange(1, n, dtype=np.float64)
    kernel[0] = 2 * half_bandwidth
    kernel[1:] = np.sin(2 * np.pi * half_bandwidth * tau) / (np.pi * tau)
    for i in range(k):
        autocorr = np.correlate(tapers[i], tapers[i], mode='full')[n - 1:]
        ratios[i] = kernel[0] * autocorr[0] + 2 * np.dot(kernel[1:],
                                                         autocorr[1:])
    ratios = np.clip(ratios, 0.0, 1.0)
    return tapers, ratios


def filtered_tapers(window_samples: int, nw: float = 3.0,
                    eigenvalue_threshold: float = 0.90) -> np.ndarray:
    """Shannon-number taper set filtered by concentration eigenvalue.

    Parity: reference signal_features.py:669-678 — k = int(2·nw − 1) tapers,
    keep those with λ > threshold, L2-normalised.
    """
    k = int(2 * nw - 1)
    tapers, ratios = dpss_windows(window_samples, nw, k, return_ratios=True)
    kept = tapers[ratios > eigenvalue_threshold]
    if kept.shape[0] == 0:
        raise ValueError(
            f"No DPSS taper exceeds eigenvalue threshold "
            f"{eigenvalue_threshold} (max λ = {ratios.max():.4f}).")
    return kept


def cmc_independence_threshold_host(K: int, alpha: float = 0.05) -> float:
    """(1−alpha) quantile of the Beta(K−2, K−2) coherence null.

    Parity: reference signal_features.py:470-481.
    """
    a = b = K - 2
    return float(_beta_dist.ppf(1 - alpha, a, b))
