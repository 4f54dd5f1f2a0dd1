"""Random-intercept linear mixed model via profiled REML.

Replaces ``statsmodels.mixedlm(...).fit(reml=True)`` (reference
statistical_modelling.py:518-532) with a native solver built on the
random-intercept structure the reference exclusively uses:

    y = Xβ + Z b + ε,   b_g ~ N(0, σ_b²),   ε ~ N(0, σ_e²)

With λ = σ_b²/σ_e², every GLS quantity reduces to group sums via the
Woodbury identity (W_g⁻¹ = I − λ/(1+λ n_g) · J), so the profiled REML
criterion is a cheap scalar function of λ:

    L(λ) = (n−p)·ln(rᵀW⁻¹r) + Σ_g ln(1+λ n_g) + ln|XᵀW⁻¹X|

Two implementations share the math:
- :func:`fit_random_intercept_reml` — host (numpy/scipy Brent) single fit
  returning the statsmodels-shaped result (fe_params, bse, z-based
  pvalues, scale, cov_re, BLUPs, llf/aic/bic).
- :func:`batched_lme_pvalues` — the TPU path: thousands of simulated
  response vectors refit simultaneously (vmap over a fixed-iteration
  golden-section search on ln λ).  This is what makes the reference's
  "very run-time extensive" power analysis (BASELINE.md) tractable.
"""
from __future__ import annotations

import functools

import numpy as np
from scipy import optimize, stats

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# shared sufficient statistics
# --------------------------------------------------------------------------
def _group_stats(X: np.ndarray, groups: np.ndarray):
    """Group indices + per-group design sums used by Woodbury reductions."""
    uniq, gidx = np.unique(groups, return_inverse=True)
    n_groups = len(uniq)
    counts = np.bincount(gidx, minlength=n_groups).astype(float)
    # Xg[g] = Σ_{i∈g} x_i   (n_groups, p)
    p = X.shape[1]
    Xg = np.zeros((n_groups, p))
    np.add.at(Xg, gidx, X)
    return uniq, gidx, counts, Xg


def _profiled_quantities(lam, X, y, gidx, counts, Xg, yg):
    """GLS β̂, residual quadratic form, and log-dets for one λ (numpy)."""
    w = lam / (1.0 + lam * counts)                       # (G,)
    xtx = X.T @ X - (Xg * w[:, None]).T @ Xg             # XᵀW⁻¹X
    xty = X.T @ y - (Xg * w[:, None]).T @ yg             # XᵀW⁻¹y
    beta = np.linalg.solve(xtx, xty)
    r = y - X @ beta
    rg = np.bincount(gidx, weights=r, minlength=len(counts))
    quad = r @ r - w @ rg ** 2                            # rᵀW⁻¹r
    logdet_w = np.sum(np.log1p(lam * counts))
    sign, logdet_xtx = np.linalg.slogdet(xtx)
    return beta, r, rg, quad, logdet_w, logdet_xtx, xtx, w


def fit_random_intercept_reml(X: np.ndarray, y: np.ndarray,
                              groups: np.ndarray,
                              param_names: list[str] | None = None) -> dict:
    """Profiled-REML random-intercept LME (statsmodels-shaped output)."""
    X = np.asarray(X, float)
    y = np.asarray(y, float)
    n, p = X.shape
    rank = np.linalg.matrix_rank(X)
    if rank < p:
        raise np.linalg.LinAlgError(
            f"Rank-deficient design matrix: rank={rank}, n_params={p}")

    uniq, gidx, counts, Xg = _group_stats(X, groups)
    yg = np.bincount(gidx, weights=y, minlength=len(uniq))

    def criterion(log_lam):
        lam = np.exp(log_lam)
        _, _, _, quad, logdet_w, logdet_xtx, _, _ = _profiled_quantities(
            lam, X, y, gidx, counts, Xg, yg)
        return ((n - p) * np.log(max(quad, 1e-300))
                + logdet_w + logdet_xtx)

    res = optimize.minimize_scalar(criterion, bounds=(-12.0, 8.0),
                                   method="bounded",
                                   options={"xatol": 1e-8})
    # boundary case: λ → 0 (no between-group variance)
    lam = float(np.exp(res.x))
    if criterion(-30.0) <= res.fun:
        lam = np.exp(-30.0)

    beta, r, rg, quad, logdet_w, logdet_xtx, xtx, w = _profiled_quantities(
        lam, X, y, gidx, counts, Xg, yg)
    scale = quad / (n - p)                                # σ_e² (REML)
    re_var = lam * scale                                  # σ_b²
    cov_beta = np.linalg.inv(xtx) * scale
    bse = np.sqrt(np.maximum(np.diag(cov_beta), 0.0))
    with np.errstate(divide='ignore', invalid='ignore'):
        zvals = np.where(bse > 0, beta / bse, np.nan)
    pvals = 2 * stats.norm.sf(np.abs(zvals))              # z-test (statsmodels)

    # BLUPs: b̂_g = λ/(1+λ n_g) · Σ_g r
    blups = (lam / (1.0 + lam * counts)) * rg

    llf = -0.5 * ((n - p) * np.log(2 * np.pi * scale)
                  + logdet_w + logdet_xtx
                  + (n - p))
    k = p + 2  # fixed effects + re variance + residual variance
    aic = -2 * llf + 2 * k
    bic = -2 * llf + k * np.log(n)

    names = (param_names if param_names is not None
             else [f"x{i}" for i in range(p)])
    return {
        "fe_params": dict(zip(names, beta)),
        "params": beta, "bse": bse, "zvalues": zvals, "pvalues": pvals,
        "scale": float(scale), "cov_re": float(re_var), "lam": lam,
        "resid": r, "random_effects": dict(zip(uniq.tolist(), blups)),
        "llf": float(llf), "aic": float(aic), "bic": float(bic),
        "converged": bool(res.success),
        "groups": uniq,
    }


# --------------------------------------------------------------------------
# batched TPU path (power simulations, bootstrap, LOSO fleets)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_groups", "n_iters"))
def _batched_reml_core(X, Y, gidx, counts, n_groups, n_iters=60):
    """Vectorised profiled REML for many response vectors at once.

    X: (n, p); Y: (S, n) simulated responses; returns (beta (S,p),
    bse (S,p), scale (S,), lam (S,)).

    All matmuls run at ``Precision.HIGHEST``: on TPU the default matmul
    precision feeds the MXU bf16 inputs (~0.4% relative error), which
    destroys X'X / X'y structure for study designs whose effects sit
    3-4 orders of magnitude below the column scales (DV ≈ 0.9 coherence
    vs category effects ≈ 1e-3, force 20-60 %MVC) — measured symptom:
    every simulated p-value ≈ 1 and power 0.000 at every multiplier
    while the identical solve on CPU (true f32) behaves.  The solve is
    O(p²·n) per response — negligible next to the surrogate/coherence
    kernels — so full f32 costs nothing measurable here.
    """
    prec = jax.lax.Precision.HIGHEST
    n, p = X.shape
    xtx_full = jnp.matmul(X.T, X, precision=prec)          # (p, p)
    Xg = jax.ops.segment_sum(X, gidx, num_segments=n_groups)  # (G, p)

    def stats_for(y):
        yg = jax.ops.segment_sum(y, gidx, num_segments=n_groups)
        xty_full = jnp.matmul(X.T, y, precision=prec)

        def quantities(lam):
            w = lam / (1.0 + lam * counts)
            xtx = xtx_full - jnp.matmul((Xg * w[:, None]).T, Xg,
                                        precision=prec)
            xty = xty_full - jnp.matmul((Xg * w[:, None]).T, yg,
                                        precision=prec)
            beta = jnp.linalg.solve(xtx, xty)
            r = y - jnp.matmul(X, beta, precision=prec)
            rg = jax.ops.segment_sum(r, gidx, num_segments=n_groups)
            quad = (jnp.vdot(r, r, precision=prec)
                    - jnp.vdot(w, rg ** 2, precision=prec))
            logdet_w = jnp.sum(jnp.log1p(lam * counts))
            _, logdet_xtx = jnp.linalg.slogdet(xtx)
            return beta, xtx, quad, logdet_w, logdet_xtx

        def criterion(log_lam):
            lam = jnp.exp(log_lam)
            _, _, quad, ldw, ldx = quantities(lam)
            return ((n - p) * jnp.log(jnp.maximum(quad, 1e-30))
                    + ldw + ldx)

        # golden-section search on ln λ ∈ [−12, 8]
        gr = 0.6180339887498949
        lo, hi = jnp.float32(-12.0), jnp.float32(8.0)

        def gs_step(state, _):
            lo, hi = state
            c = hi - gr * (hi - lo)
            d = lo + gr * (hi - lo)
            fc, fd = criterion(c), criterion(d)
            lo = jnp.where(fc < fd, lo, c)
            hi = jnp.where(fc < fd, d, hi)
            return (lo, hi), None

        (lo, hi), _ = jax.lax.scan(gs_step, (lo, hi),
                                   None, length=n_iters)
        log_lam = 0.5 * (lo + hi)
        # boundary: λ→0 if criterion prefers it
        log_lam = jnp.where(criterion(jnp.float32(-12.0))
                            <= criterion(log_lam),
                            jnp.float32(-25.0), log_lam)
        lam = jnp.exp(log_lam)
        beta, xtx, quad, _, _ = quantities(lam)
        scale = quad / (n - p)
        cov = jnp.linalg.inv(xtx) * scale
        bse = jnp.sqrt(jnp.maximum(jnp.diag(cov), 0.0))
        return beta, bse, scale, lam

    return jax.vmap(stats_for)(Y)


@functools.partial(jax.jit, static_argnames=("n_groups", "n_iters"))
def _batched_reml_weighted(Xb, Yb, Wb, gidx, n_groups, n_iters=60):
    """Vectorised profiled REML with per-batch designs and 0/1 row weights.

    Xb: (B, n, p); Yb: (B, n); Wb: (B, n) row weights (0 = absent row —
    exact row removal under the REML algebra).  Used for clustered
    bootstrap where every resample has its own padded design.  Returns
    beta (B, p).

    Matmuls at ``Precision.HIGHEST`` for the same reason as
    ``_batched_reml_core`` — the TPU's default bf16 MXU inputs destroy
    small effects against large column scales.
    """
    prec = jax.lax.Precision.HIGHEST

    def one(X, y, w):
        n_eff = jnp.sum(w)
        p = X.shape[1]
        Xw = X * w[:, None]
        counts = jax.ops.segment_sum(w, gidx, num_segments=n_groups)
        Xg = jax.ops.segment_sum(Xw, gidx, num_segments=n_groups)
        yg = jax.ops.segment_sum(y * w, gidx, num_segments=n_groups)
        xtx_full = jnp.matmul(Xw.T, X, precision=prec)
        xty_full = jnp.matmul(Xw.T, y, precision=prec)

        def quantities(lam):
            wg = lam / (1.0 + lam * counts)
            xtx = xtx_full - jnp.matmul((Xg * wg[:, None]).T, Xg,
                                        precision=prec)
            xty = xty_full - jnp.matmul((Xg * wg[:, None]).T, yg,
                                        precision=prec)
            beta = jnp.linalg.solve(xtx, xty)
            r = y - jnp.matmul(X, beta, precision=prec)
            rg = jax.ops.segment_sum(r * w, gidx, num_segments=n_groups)
            quad = (jnp.vdot(w * r, r, precision=prec)
                    - jnp.vdot(wg, rg ** 2, precision=prec))
            logdet_w = jnp.sum(jnp.log1p(lam * counts))
            _, logdet_xtx = jnp.linalg.slogdet(xtx)
            return beta, quad, logdet_w, logdet_xtx

        def criterion(log_lam):
            lam = jnp.exp(log_lam)
            _, quad, ldw, ldx = quantities(lam)
            return ((n_eff - p) * jnp.log(jnp.maximum(quad, 1e-30))
                    + ldw + ldx)

        gr = 0.6180339887498949
        lo, hi = jnp.float32(-12.0), jnp.float32(8.0)

        def gs_step(state, _):
            lo, hi = state
            c = hi - gr * (hi - lo)
            d = lo + gr * (hi - lo)
            lo = jnp.where(criterion(c) < criterion(d), lo, c)
            hi = jnp.where(criterion(c) < criterion(d), d, hi)
            return (lo, hi), None

        (lo, hi), _ = jax.lax.scan(gs_step, (lo, hi), None,
                                   length=n_iters)
        log_lam = 0.5 * (lo + hi)
        log_lam = jnp.where(criterion(jnp.float32(-12.0))
                            <= criterion(log_lam),
                            jnp.float32(-25.0), log_lam)
        beta, _, _, _ = quantities(jnp.exp(log_lam))
        return beta

    return jax.vmap(one)(Xb, Yb, Wb)


def batched_lme_pvalues(X: np.ndarray, Y: np.ndarray,
                        groups: np.ndarray) -> dict:
    """Fit S random-intercept REML models at once on device.

    X: (n, p) fixed design; Y: (S, n) responses (e.g. power simulations);
    returns dict with beta (S,p), bse (S,p), pvalues (S,p) (z-test),
    scale (S,), lam (S,).
    """
    uniq, gidx = np.unique(groups, return_inverse=True)
    counts = np.bincount(gidx, minlength=len(uniq)).astype(np.float32)
    # column equilibration: real designs mix scales (intercept 1,
    # dummies 0/1, force 20-60, trial id 0-30) — max-abs scaling drops
    # cond(X'X) by ~4 orders so the f32 device solve keeps the 2-3
    # digits the z-test needs.  Exact: beta/bse rescale covariantly,
    # λ and the residual scale are invariant (the REML criterion only
    # shifts by a λ-independent constant).
    col_scale = np.max(np.abs(X), axis=0)
    col_scale[col_scale == 0] = 1.0
    beta, bse, scale, lam = _batched_reml_core(
        jnp.asarray(X / col_scale, jnp.float32),
        jnp.asarray(Y, jnp.float32),
        jnp.asarray(gidx, jnp.int32), jnp.asarray(counts),
        n_groups=len(uniq))
    beta = np.asarray(beta, np.float64) / col_scale
    bse = np.asarray(bse, np.float64) / col_scale
    with np.errstate(divide='ignore', invalid='ignore'):
        z = np.where(bse > 0, beta / bse, np.nan)
    pvalues = 2 * stats.norm.sf(np.abs(z))
    return {"beta": beta, "bse": bse, "pvalues": pvalues,
            "scale": np.asarray(scale), "lam": np.asarray(lam)}
