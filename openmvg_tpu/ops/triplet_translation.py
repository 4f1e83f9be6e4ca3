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
    """TrifocalTensorModel::Error: triangulate each track with the 3
    cameras, return max squared reprojection error (normalized coords).

    Lane-major closed form: the generic triangulate_nview path builds a
    per-track (9, 4) DLT system whose trailing dims TPU tiling pads to
    (8, 128) lanes — a ~32x memory blowup that OOMs the vmapped triplet
    sampler (measured 29 GB at 12 triplets x 320 samples x 4096 tracks,
    v5e).  Here the per-track linear triangulation is the 3x3 normal
    equations of  min_X sum_v |[b_v]_x (R_v X + t_v)|^2  solved by
    adjugate, written as elementwise ops whose ONLY large axis is the
    track dim — O(m) memory, fully fusable.  Decisions match the DLT
    variant away from points at infinity (near-singular normal matrix ->
    huge X -> huge error -> outlier, the right verdict for a finite
    scene)."""
    dt = xs.dtype
    bx = [xs[v, :, 0] for v in range(3)]
    by = [xs[v, :, 1] for v in range(3)]
    M = [[jnp.zeros((), dt) for _ in range(3)] for _ in range(3)]
    rhs = [jnp.zeros((), dt) for _ in range(3)]
    for v in range(3):
        R, t = Rs[v], ts[v]
        # rows of [b]_x R and [b]_x t for b = (bx, by, 1)
        C = ([by[v] * R[2, a] - R[1, a] for a in range(3)],
             [R[0, a] - bx[v] * R[2, a] for a in range(3)],
             [bx[v] * R[1, a] - by[v] * R[0, a] for a in range(3)])
        d = (by[v] * t[2] - t[1],
             t[0] - bx[v] * t[2],
             bx[v] * t[1] - by[v] * t[0])
        for a in range(3):
            for bcol in range(a, 3):
                M[a][bcol] = M[a][bcol] + sum(
                    C[i][a] * C[i][bcol] for i in range(3))
            rhs[a] = rhs[a] - sum(C[i][a] * d[i] for i in range(3))
    for a in range(3):          # symmetric lower triangle
        for bcol in range(a):
            M[a][bcol] = M[bcol][a]
    # X = adj(M) rhs / det(M), all elementwise over the track dim
    c00 = M[1][1] * M[2][2] - M[1][2] * M[2][1]
    c01 = M[0][2] * M[2][1] - M[0][1] * M[2][2]
    c02 = M[0][1] * M[1][2] - M[0][2] * M[1][1]
    c11 = M[0][0] * M[2][2] - M[0][2] * M[2][0]
    c12 = M[0][2] * M[1][0] - M[0][0] * M[1][2]
    c22 = M[0][0] * M[1][1] - M[0][1] * M[1][0]
    det = M[0][0] * c00 + M[0][1] * (M[1][2] * M[2][0] - M[1][0] * M[2][2]) \
        + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0])
    det = jnp.where(jnp.abs(det) < eps, jnp.asarray(eps, dt), det)
    X = [(c00 * rhs[0] + c01 * rhs[1] + c02 * rhs[2]) / det,
         (c01 * rhs[0] + c11 * rhs[1] + c12 * rhs[2]) / det,
         (c02 * rhs[0] + c12 * rhs[1] + c22 * rhs[2]) / det]
    err = None
    for v in range(3):
        R, t = Rs[v], ts[v]
        px = R[0, 0] * X[0] + R[0, 1] * X[1] + R[0, 2] * X[2] + t[0]
        py = R[1, 0] * X[0] + R[1, 1] * X[1] + R[1, 2] * X[2] + t[1]
        z = R[2, 0] * X[0] + R[2, 1] * X[1] + R[2, 2] * X[2] + t[2]
        zs = jnp.where(jnp.abs(z) < eps, jnp.asarray(eps, dt), z)
        e = (px / zs - bx[v]) ** 2 + (py / zs - by[v]) ** 2
        e = jnp.where(z > 0, e, jnp.asarray(jnp.inf, dt))
        err = e if err is None else jnp.maximum(err, e)
    return err


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
