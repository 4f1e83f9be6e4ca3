"""Batched a-contrario RANSAC and classic robust estimators.

Reference parity: robust_estimation/robust_estimator_ACRansac.hpp —
NFA scoring  NFA(k) = log10(e0) + logalpha(e_k)*(k-s) + log10 C(n,k)
+ log10 C(k,s)  minimized over k (exhaustive sorted evaluation, :269-306),
with logalpha = logalpha0 + multError*log10(e_k) and
loge0 = log10(MAX_MODELS * (n - s)); plus MaxConsensus / Ransac / LMedS
(robust_estimator_{MaxConsensus,Ransac,LMeds}.hpp).

TPU-first recast of the sequential loop (:326-489): draw ALL minimal
samples up front, solve them as one vmapped batch, score every model's
full residual vector with one sort + cumulative NFA scan, then run the
reference's "10% local optimization" as a second batched round sampling
from the best model's inliers.  Deterministic under a jax PRNG key.

Data layout: `data` is a pytree of arrays with leading dimension N
(correspondences); `valid` masks padding.  fit_fn maps a pytree of
(min_samples, ...) slices to (models (M, ...), model_valid (M,));
error_fn maps (model, data) -> squared residuals (N,).
"""

import math
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, tree_util

_LN10 = math.log(10.0)
_F32EPS = float(jnp.finfo(jnp.float32).eps)


class ACRansacResult(NamedTuple):
    model: Any          # best model pytree (leading dims removed)
    inliers: jnp.ndarray  # (N,) bool
    nfa: jnp.ndarray      # scalar log10-NFA (lower = more meaningful; <0 valid)
    threshold_sq: jnp.ndarray  # scalar squared residual threshold (input units)
    found: jnp.ndarray    # scalar bool — meaningful model found


def log10_comb(n, k):
    """log10 C(n, k), elementwise, via lgamma (replaces the makelogcombi
    lookup tables)."""
    n = n.astype(jnp.float64) if hasattr(n, "astype") else jnp.asarray(n, jnp.float64)
    k = jnp.asarray(k, n.dtype)
    out = (
        lax.lgamma(n + 1.0) - lax.lgamma(k + 1.0) - lax.lgamma(n - k + 1.0)
    ) / _LN10
    return jnp.where((k >= 0) & (k <= n), out, jnp.inf)


def draw_samples(key, n_samples, sample_size, weights):
    """(n_samples, sample_size) distinct indices drawn ~ weights (N,).

    Gumbel top-k trick: one sort per sample, fully batched, no rejection.
    """
    n = weights.shape[0]
    g = jax.random.gumbel(key, (n_samples, n))
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf)
    _, idx = lax.top_k(g + logw[None, :], sample_size)
    return idx


def _nfa_scan(err_sq, valid, min_samples, logalpha0, mult_error, loge0,
              max_threshold_sq):
    """Best (nfa, threshold) over all k for each model's residual row.

    err_sq: (B, N) squared residuals (+inf on invalid points).
    Returns nfa (B,), thr_sq (B,).
    """
    n_valid = jnp.sum(valid)
    B, N = err_sq.shape
    err_sorted = jnp.sort(err_sq, axis=-1)  # invalid -> +inf at the end
    k = jnp.arange(1, N + 1, dtype=err_sorted.dtype)
    logalpha = logalpha0 + mult_error * jnp.log10(err_sorted + _F32EPS)
    lc = log10_comb(n_valid, k) + log10_comb(k, float(min_samples))
    nfa_k = loge0 + logalpha * (k - min_samples)[None, :] + lc[None, :]
    ok = (
        (k > min_samples)[None, :]
        & (k <= n_valid)[None, :]
        & (err_sorted <= max_threshold_sq)
        & jnp.isfinite(err_sorted)
    )
    nfa_k = jnp.where(ok, nfa_k, jnp.inf)
    best_k = jnp.argmin(nfa_k, axis=-1)
    nfa = jnp.take_along_axis(nfa_k, best_k[..., None], axis=-1)[..., 0]
    thr = jnp.take_along_axis(err_sorted, best_k[..., None], axis=-1)[..., 0]
    return nfa, thr


def _round(key, fit_fn, error_fn, data, valid, sample_weights, min_samples,
           n_samples, logalpha0, mult_error, loge0, max_threshold_sq):
    idx = draw_samples(key, n_samples, min_samples, sample_weights)
    sub = tree_util.tree_map(lambda a: a[idx], data)
    models, mvalid = jax.vmap(fit_fn)(sub)  # (S, M, ...), (S, M)
    flat = tree_util.tree_map(lambda a: a.reshape((-1,) + a.shape[2:]), models)
    mvalid = mvalid.reshape(-1)

    err = jax.vmap(lambda m: error_fn(m, data))(flat)  # (S*M, N)
    err = jnp.where(valid[None, :] & mvalid[:, None], err, jnp.inf)
    err = jnp.where(jnp.isnan(err), jnp.inf, err)
    nfa, thr = _nfa_scan(err, valid, min_samples, logalpha0, mult_error,
                         loge0, max_threshold_sq)
    best = jnp.argmin(nfa)
    best_model = tree_util.tree_map(lambda a: a[best], flat)
    return best_model, nfa[best], thr[best], err[best]


def ac_ransac(
    key,
    fit_fn: Callable,
    error_fn: Callable,
    data: Any,
    valid: jnp.ndarray,
    min_samples: int,
    logalpha0,
    mult_error: float,
    max_models: int = 1,
    n_samples: int = 1024,
    precision_sq=jnp.inf,
) -> ACRansacResult:
    """Batched AC-RANSAC.  See module docstring for the contract.

    n_samples is split 90/10 between the global round and the
    inlier-focused local-optimization round, mirroring the reference's
    iteration reservation (robust_estimator_ACRansac.hpp:366-368).
    """
    n_valid = jnp.sum(valid)
    loge0 = jnp.log10(jnp.maximum(
        max_models * (n_valid.astype(jnp.float32) - min_samples), 1.0))
    uni = valid.astype(jnp.float32)
    k1, k2 = jax.random.split(key)

    s1 = max(n_samples * 9 // 10, 1)
    s2 = max(n_samples - s1, 1)
    model1, nfa1, thr1, err1 = _round(
        k1, fit_fn, error_fn, data, valid, uni, min_samples, s1,
        logalpha0, mult_error, loge0, precision_sq)

    # local optimization: resample from the best model's inlier set
    inl_w = ((err1 <= thr1) & valid).astype(jnp.float32)
    enough = jnp.sum(inl_w) > min_samples
    inl_w = jnp.where(enough, inl_w, uni)
    model2, nfa2, thr2, err2 = _round(
        k2, fit_fn, error_fn, data, valid, inl_w, min_samples, s2,
        logalpha0, mult_error, loge0, precision_sq)

    pick2 = nfa2 < nfa1
    model = tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(pick2, (1,) * a.ndim), b, a), model1, model2)
    nfa = jnp.where(pick2, nfa2, nfa1)
    thr = jnp.where(pick2, thr2, thr1)
    err = jnp.where(pick2, err2, err1)
    inliers = (err <= thr) & valid
    found = (nfa < 0) & (jnp.sum(inliers) > min_samples)
    return ACRansacResult(model=model, inliers=inliers, nfa=nfa,
                          threshold_sq=thr, found=found)


def ac_ransac_adaptive(
    key,
    fit_fn: Callable,
    error_fn: Callable,
    data: Any,
    valid: jnp.ndarray,
    min_samples: int,
    logalpha0,
    mult_error: float,
    max_models: int = 1,
    round_size: int = 256,
    max_rounds: int = 16,
    reserve_rounds: int = 2,
    precision_sq=jnp.inf,
):
    """Adaptive-budget AC-RANSAC: batched rounds in a lax.while_loop with
    the reference's early-exit semantics (robust_estimator_ACRansac.hpp:
    326-489 — once a meaningful model is found, only the iteration
    reserve is spent, resampling from the best model's inlier set; until
    then the full budget is available).  Hard pairs automatically get up
    to round_size*max_rounds samples, easy pairs exit after
    1 + reserve_rounds rounds.

    Returns (ACRansacResult, n_rounds).  Prefer this for SINGLE
    estimations (initial pair, localization): under vmap a while_loop
    runs to the slowest lane, so the fixed-budget ac_ransac stays the
    batched-engine default.
    """
    n_valid = jnp.sum(valid)
    loge0 = jnp.log10(jnp.maximum(
        max_models * (n_valid.astype(jnp.float32) - min_samples), 1.0))
    uni = valid.astype(jnp.float32)

    key, k0 = jax.random.split(key)
    model0, nfa0, thr0, err0 = _round(
        k0, fit_fn, error_fn, data, valid, uni, min_samples, round_size,
        logalpha0, mult_error, loge0, precision_sq)
    found_it0 = jnp.where(nfa0 < 0, jnp.int32(0), jnp.int32(max_rounds))

    def cond(c):
        it, found_it, _, nfa, _, _, _ = c
        return (it < max_rounds) & (
            (nfa >= 0) | (it <= found_it + reserve_rounds))

    def body(c):
        it, found_it, key, nfa, thr, err, model = c
        key, kr = jax.random.split(key)
        inl_w = ((err <= thr) & valid).astype(jnp.float32)
        enough = (nfa < 0) & (jnp.sum(inl_w) > min_samples)
        w = jnp.where(enough, inl_w, uni)
        m2, nfa2, thr2, err2 = _round(
            kr, fit_fn, error_fn, data, valid, w, min_samples, round_size,
            logalpha0, mult_error, loge0, precision_sq)
        better = nfa2 < nfa
        model = tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(better, (1,) * a.ndim), b, a), model, m2)
        found_it = jnp.where((nfa >= 0) & (nfa2 < 0), it, found_it)
        thr = jnp.where(better, thr2, thr)
        err = jnp.where(better, err2, err)
        nfa = jnp.minimum(nfa, nfa2)
        return (it + 1, found_it, key, nfa, thr, err, model)

    it, _, _, nfa, thr, err, model = lax.while_loop(
        cond, body, (jnp.int32(1), found_it0, key, nfa0, thr0, err0, model0))
    inliers = (err <= thr) & valid
    found = (nfa < 0) & (jnp.sum(inliers) > min_samples)
    return ACRansacResult(model=model, inliers=inliers, nfa=nfa,
                          threshold_sq=thr, found=found), it


def max_consensus(key, fit_fn, error_fn, data, valid, min_samples,
                  threshold_sq, max_models=1, n_samples=1024):
    """Plain max-consensus RANSAC (robust_estimator_MaxConsensus.hpp)."""
    idx = draw_samples(key, n_samples, min_samples, valid.astype(jnp.float32))
    sub = tree_util.tree_map(lambda a: a[idx], data)
    models, mvalid = jax.vmap(fit_fn)(sub)
    flat = tree_util.tree_map(lambda a: a.reshape((-1,) + a.shape[2:]), models)
    mvalid = mvalid.reshape(-1)
    err = jax.vmap(lambda m: error_fn(m, data))(flat)
    err = jnp.where(valid[None, :] & mvalid[:, None], err, jnp.inf)
    score = jnp.sum(err <= threshold_sq, axis=-1)
    best = jnp.argmax(score)
    model = tree_util.tree_map(lambda a: a[best], flat)
    return model, (err[best] <= threshold_sq) & valid, score[best]


def lmeds(key, fit_fn, error_fn, data, valid, min_samples, max_models=1,
          n_samples=1024):
    """Least-median-of-squares (robust_estimator_LMeds.hpp) — used for the
    GPS-prior similarity registration."""
    idx = draw_samples(key, n_samples, min_samples, valid.astype(jnp.float32))
    sub = tree_util.tree_map(lambda a: a[idx], data)
    models, mvalid = jax.vmap(fit_fn)(sub)
    flat = tree_util.tree_map(lambda a: a.reshape((-1,) + a.shape[2:]), models)
    mvalid = mvalid.reshape(-1)
    err = jax.vmap(lambda m: error_fn(m, data))(flat)
    err = jnp.where(valid[None, :] & mvalid[:, None], err, jnp.inf)
    n_valid = jnp.sum(valid)
    # median over valid entries: k-th smallest with k = n_valid // 2
    err_sorted = jnp.sort(err, axis=-1)
    med = jnp.take_along_axis(
        err_sorted, jnp.broadcast_to((n_valid // 2)[None, None],
                                     (err.shape[0], 1)), axis=-1)[:, 0]
    med = jnp.where(mvalid, med, jnp.inf)
    best = jnp.argmin(med)
    model = tree_util.tree_map(lambda a: a[best], flat)
    return model, med[best]


# logalpha0 helpers (ACParametrizationHelper, ACRansacKernelAdaptator.hpp:44-97)

def logalpha0_point_to_line(w, h, scaling=1.0):
    d = jnp.hypot(jnp.asarray(w, jnp.float64), jnp.asarray(h, jnp.float64))
    return jnp.log10(2.0 * d / (w * h) / scaling)


def logalpha0_point_to_point(w, h, scaling=1.0):
    return jnp.log10(jnp.pi / (w * jnp.asarray(h, jnp.float64)) / (scaling * scaling))


LOGALPHA0_ANGULAR = math.log10(0.5)
MULT_ERROR_POINT_TO_LINE = 0.5
MULT_ERROR_POINT_TO_POINT = 1.0
MULT_ERROR_ANGULAR = 0.25
