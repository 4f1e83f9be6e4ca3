"""Triplet translations + structure from known rotations (batched).

Reference parity: the reference solves this minimal problem with a
bisection linear program over the L-infinity reprojection feasibility
(linearProgramming/lInfinityCV/triplet_tijsAndXis_kernel.cpp
translations_Triplet_Solver::Solve, OSI-CLP BisectionLP) inside AC-RANSAC
(sfm/pipelines/global/triplet_t_ACRansac_kernelAdaptator.hpp:
logalpha0 = log10(pi), multError = 1.0, MINIMUM_SAMPLES = 4) to estimate a
robust relative-translation triplet per pose triplet
(GlobalSfM_translation_averaging.cpp Estimate_T_triplet :643-860).

TPU-first recast: with rotations known, the reprojection constraints
``x_hat x (R_i X_j + t_i) = 0`` are LINEAR in the unknowns (t_i, X_j), so
the minimal 4-track / 3-view problem is the null space of a 36x18 matrix
(gauge fixed by t_1 = 0, scale = unit singular vector) — one small
batched eigensolve per sample instead of an LP bisection.  The model
scoring (algebraic 3-view triangulation + max squared reprojection in
normalized coords, TrifocalTensorModel::Error) and the AC-RANSAC NFA
statistics are unchanged, so inlier decisions match the reference's
semantics; only the inner solver is different (and exact on noiseless
data, where the LP bisection is epsilon-approximate).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry.so3 import skew
from openmvg_tpu.ops import ransac
from openmvg_tpu.ops.triangulation import triangulate_nview


def solve_translations_known_rotations(xs, Rs, valid=None, ridge=1e-10):
    """Translations (t1=0 gauge) + structure from known rotations.

    xs: (V, m, 2) normalized image coords per view; Rs: (V, 3, 3);
    valid: optional (m,) mask over tracks (padded tracks get zero weight).

    Returns (ts (V, 3), X (m, 3)).  Null-space solve of the linear system
    ``x_hat x (R_i X_j + t_i) = 0`` with t_0 = 0, Schur-eliminating each
    track's X_j block (per-track 3x3 inverse) so the reduced eigenproblem
    is only 3(V-1) x 3(V-1) regardless of track count.  Scale = unit
    eigenvector; sign fixed by majority positive depth (cheirality).
    """
    V, m = xs.shape[0], xs.shape[1]
    dt = xs.dtype
    bear = jnp.concatenate([xs, jnp.ones(xs.shape[:-1] + (1,), dt)], -1)
    BX = skew(bear)                            # (V, m, 3, 3) coeff of t_i
    C = jnp.einsum("vmij,vjk->vmik", BX, Rs)   # (V, m, 3, 3) coeff of X_j
    nt = 3 * (V - 1)
    # per-track stacked system: B_j (3V x nt) block-diag-ish, C_j (3V x 3)
    # B rows for view 0 are zero (t_0 = 0 gauge).
    eye = jnp.eye(V, dtype=dt)[1:]             # (V-1, V) selector
    # B[v, m, 3, nt]: block v>=1 at columns 3(v-1):3v equals BX[v]
    B = jnp.einsum("uv,vmij->vmiuj", eye, BX).reshape(V, m, 3, nt)
    w = (jnp.ones((m,), dt) if valid is None else valid.astype(dt))
    Bf = (B * w[None, :, None, None]).transpose(1, 0, 2, 3).reshape(m, 3 * V, nt)
    Cf = (C * w[None, :, None, None]).transpose(1, 0, 2, 3).reshape(m, 3 * V, 3)
    CtC = jnp.einsum("mri,mrj->mij", Cf, Cf) + ridge * jnp.eye(3, dtype=dt)
    CtB = jnp.einsum("mri,mrj->mij", Cf, Bf)          # (m, 3, nt)
    G = -jnp.linalg.solve(CtC, CtB)                   # X_j = G_j t
    # S = sum_j (B_j + C_j G_j)^T (B_j + C_j G_j)
    BCG = Bf + jnp.einsum("mri,mij->mrj", Cf, G)
    S = jnp.einsum("mri,mrj->ij", BCG, BCG)
    _, Vec = jnp.linalg.eigh(S)
    t = Vec[:, 0]
    ts = jnp.concatenate([jnp.zeros((1, 3), dt), t.reshape(V - 1, 3)], 0)
    X = jnp.einsum("mij,j->mi", G, t)                 # (m, 3)
    # cheirality: majority of (weighted) depths positive, else flip
    depth = jnp.einsum("vij,mj->vmi", Rs, X)[..., 2] + ts[:, None, 2]
    vote = jnp.sum(jnp.sign(depth) * w[None, :])
    sgn = jnp.where(vote >= 0, jnp.asarray(1.0, dt), jnp.asarray(-1.0, dt))
    return ts * sgn, X * sgn


def _max_reproj_error(ts, Rs, xs, eps=1e-12):
    """TrifocalTensorModel::Error: triangulate each track with the V
    cameras, return max squared reprojection error (normalized coords)."""
    V = Rs.shape[0]
    bear = jnp.concatenate([xs, jnp.ones(xs.shape[:-1] + (1,), xs.dtype)], -1)
    # (m, V, 3) bearings per track
    b_t = jnp.swapaxes(bear, 0, 1)
    Rb = jnp.broadcast_to(Rs[None], (xs.shape[1], V, 3, 3))
    tb = jnp.broadcast_to(ts[None], (xs.shape[1], V, 3))
    X, _ = triangulate_nview(Rb, tb, b_t)    # (m, 3)
    proj = jnp.einsum("vij,mj->vmi", Rs, X) + ts[:, None, :]
    z = proj[..., 2]
    pr = proj[..., :2] / jnp.where(jnp.abs(z) < eps, eps, z)[..., None]
    err = jnp.sum((pr - xs) ** 2, -1)        # (V, m)
    err = jnp.where(z > 0, err, jnp.inf)
    return jnp.max(err, 0)                   # (m,)


class TripletTranslationResult(NamedTuple):
    ts: jnp.ndarray          # (3, 3) translations, t0 = 0 gauge, unit scale
    inliers: jnp.ndarray     # (N,) bool
    nfa: jnp.ndarray
    threshold_sq: jnp.ndarray  # squared normalized-coords threshold
    found: jnp.ndarray


def triplet_translation_acransac(key, xs, Rs, valid, n_samples=320,
                                 precision_norm=jnp.inf):
    """AC-RANSAC over tracks for the triplet translation problem.

    xs (3, N, 2) normalized coords, Rs (3, 3, 3) known global-to-camera
    rotations, valid (N,) padding mask.  precision_norm = upper bound of
    the residual in normalized coords (reference passes 4px / min_focal).
    Jittable; shapes static.
    """
    dt = xs.dtype

    def fit_fn(sub):
        # sub: (4, 3, 2) -> (3, 4, 2) per-view points
        pts = jnp.swapaxes(sub, 0, 1)
        ts, X = solve_translations_known_rotations(pts, Rs)
        depth = jnp.einsum("vij,mj->vmi", Rs, X)[..., 2] + ts[:, None, 2]
        ok = jnp.all(depth > 0) & jnp.all(jnp.isfinite(ts))
        return ts[None], ok[None]

    def error_fn(ts, data):
        return _max_reproj_error(ts, Rs, jnp.swapaxes(data, 0, 1))

    data = jnp.swapaxes(xs, 0, 1)  # (N, 3, 2) leading dim = correspondences
    res = ransac.ac_ransac(
        key, fit_fn, error_fn, data, valid,
        min_samples=4,
        logalpha0=jnp.log10(jnp.asarray(jnp.pi, dt)),
        mult_error=1.0,
        n_samples=n_samples,
        precision_sq=precision_norm ** 2,
    )
    # re-solve on all inliers (the reference refines with a tiny BA;
    # the linear LS over the full inlier set is the batched counterpart)
    pts = xs
    ts_ref, _ = solve_translations_known_rotations(
        pts, Rs, valid=res.inliers.astype(dt))
    err = _max_reproj_error(ts_ref, Rs, xs)
    refined_ok = jnp.sum((err <= res.threshold_sq) & valid) >= jnp.sum(
        res.inliers)
    ts = jnp.where(refined_ok, ts_ref, res.model)
    inl = jnp.where(refined_ok, (err <= res.threshold_sq) & valid,
                    res.inliers)
    inl = inl & res.found  # no meaningful model -> no inliers
    return TripletTranslationResult(ts=ts, inliers=inl, nfa=res.nfa,
                                    threshold_sq=res.threshold_sq,
                                    found=res.found)


_jit_cache = {}


def triplet_translation_acransac_jit(key, xs, Rs, valid, n_samples=320,
                                     precision_norm=np.inf):
    """Shape-bucketed jitted wrapper (host convenience)."""
    shape = (xs.shape, int(n_samples), xs.dtype.name
             if hasattr(xs.dtype, "name") else str(xs.dtype))
    fn = _jit_cache.get(shape)
    if fn is None:
        fn = jax.jit(lambda k, x, R, v, p: triplet_translation_acransac(
            k, x, R, v, n_samples=n_samples, precision_norm=p))
        _jit_cache[shape] = fn
    return fn(key, jnp.asarray(xs), jnp.asarray(Rs), jnp.asarray(valid),
              jnp.asarray(precision_norm, xs.dtype))
