"""Two-view / resection robust estimation — the AC-RANSAC kernel layer.

Reference parity:
  - robustRelativePose (sfm/pipelines/sfm_robust_model_estimation.cpp:29-120):
    pinhole pairs -> 5-pt essential AC-RANSAC whose residual is the pixel
    point-to-line epipolar distance through F = K2^-T E K1^-1
    (ACKernelAdaptorEssential, robust_estimator_ACRansacKernelAdaptator.hpp:300+);
    non-pinhole (spherical-capable) -> 8-pt on bearings with angular error
    (ACKernelAdaptor_AngularRadianError).  Inlier floor 2.5x MINIMUM_SAMPLES,
    then cheirality pose recovery.
  - GeometricFilter F/H/E functors (matching_image_collection/*_ACRobust*):
    conditioned solve + pixel-unit NFA.
  - ACKernelAdaptorResection_K: P3P on bearings, pixel reprojection NFA.

Design: solvers run on conditioned coordinates for numerics, but residuals
and NFA run in pixel units directly (equivalent statistics, simpler
threshold plumbing — thresholds in/out are squared pixels).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openmvg_tpu.ops import (
    conditioning,
    essential,
    fundamental,
    homography,
    ransac,
    resection,
    triangulation,
)


# ---------------------------------------------------------------------------
# fundamental (pixels)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_samples", "use_8pt"))
def robust_fundamental(key, x1, x2, valid, w1, h1, w2, h2,
                       n_samples=1024, precision_sq=jnp.inf, use_8pt=False):
    """AC-RANSAC F between two images.  x1, x2 (N, 2) pixels, valid (N,).

    Returns ACRansacResult with model = F (3, 3), threshold in squared px.
    """
    T1 = conditioning.preconditioner_from_size(w1, h1, x1.dtype)
    T2 = conditioning.preconditioner_from_size(w2, h2, x2.dtype)

    if use_8pt:
        def fit(sub):
            a, b = sub
            F = fundamental.solve_8pt(
                conditioning.apply_transform(T1, a),
                conditioning.apply_transform(T2, b))
            F = T2.T @ F @ T1
            return F[None], jnp.ones((1,), bool)
        max_models = 1
    else:
        def fit(sub):
            a, b = sub
            Fs, ok = fundamental.solve_7pt(
                conditioning.apply_transform(T1, a),
                conditioning.apply_transform(T2, b))
            Fs = jnp.swapaxes(T2, 0, 1) @ Fs @ T1
            return Fs, ok
        max_models = 3

    def err(F, data):
        a, b = data
        return fundamental.point_line_error_sq(F, a, b)

    return ransac.ac_ransac(
        key, fit, err, (x1, x2), valid,
        min_samples=8 if use_8pt else 7,
        logalpha0=ransac.logalpha0_point_to_line(w2, h2),
        mult_error=ransac.MULT_ERROR_POINT_TO_LINE,
        max_models=max_models, n_samples=n_samples,
        precision_sq=precision_sq)


# ---------------------------------------------------------------------------
# homography (pixels)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_samples",))
def robust_homography(key, x1, x2, valid, w1, h1, w2, h2,
                      n_samples=1024, precision_sq=jnp.inf):
    T1 = conditioning.preconditioner_from_size(w1, h1, x1.dtype)
    T2 = conditioning.preconditioner_from_size(w2, h2, x2.dtype)
    T2inv = jnp.linalg.inv(T2)

    def fit(sub):
        a, b = sub
        H = homography.solve_homography(
            conditioning.apply_transform(T1, a),
            conditioning.apply_transform(T2, b))
        H = T2inv @ H @ T1
        return H[None], jnp.ones((1,), bool)

    def err(H, data):
        a, b = data
        return homography.asymmetric_error_sq(H, a, b)

    return ransac.ac_ransac(
        key, fit, err, (x1, x2), valid, min_samples=4,
        logalpha0=ransac.logalpha0_point_to_point(w2, h2),
        mult_error=ransac.MULT_ERROR_POINT_TO_POINT,
        max_models=1, n_samples=n_samples, precision_sq=precision_sq)


# ---------------------------------------------------------------------------
# essential via 5pt, pixel NFA (pinhole path of robustRelativePose)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential(key, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                     n_samples=1024, precision_sq=jnp.inf):
    """5-pt AC-RANSAC E.  b* (N,3) unit bearings, x* (N,2) pixels.

    Residual: pixel point-to-line distance through F = K2^-T E K1^-1
    (ACKernelAdaptorEssential::Errors).
    """
    K1inv = jnp.linalg.inv(K1)
    K2invT = jnp.linalg.inv(K2).T

    def fit(sub):
        a, b = sub
        return essential.solve_essential_5pt(a, b)

    def err(E, data):
        a, b = data
        F = K2invT @ E @ K1inv
        return fundamental.point_line_error_sq(F, x1, x2)

    return ransac.ac_ransac(
        key, fit, err, (b1, b2), valid, min_samples=5,
        logalpha0=ransac.logalpha0_point_to_line(w2, h2, 0.5),
        mult_error=ransac.MULT_ERROR_POINT_TO_LINE,
        max_models=10, n_samples=n_samples, precision_sq=precision_sq)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_angular(key, b1, b2, valid,
                             n_samples=1024, precision_sq=jnp.inf):
    """8-pt AC-RANSAC on bearings with angular error (spherical-capable
    path; ACKernelAdaptor_AngularRadianError)."""
    def fit(sub):
        a, b = sub
        E = essential.solve_essential_8pt(a, b)
        return E[None], jnp.ones((1,), bool)

    def err(E, data):
        a, b = data
        return essential.angular_error(E, a, b)

    return ransac.ac_ransac(
        key, fit, err, (b1, b2), valid, min_samples=8,
        logalpha0=ransac.LOGALPHA0_ANGULAR,
        mult_error=ransac.MULT_ERROR_ANGULAR,
        max_models=1, n_samples=n_samples, precision_sq=precision_sq)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_upright(key, b1, b2, valid,
                             n_samples=1024, precision_sq=jnp.inf):
    """3-pt upright AC-RANSAC on bearings with angular error — the
    GeometricFilter '-g u' model
    (GeometricFilter_ESphericalMatrix_AC_Angular<true>,
    E_ACRobust_Angular.hpp:105-111 with ThreePointUprightRelativePoseSolver
    dispatched from main_GeometricFilter.cpp:350-356)."""
    def fit(sub):
        a, b = sub
        E = essential.solve_essential_upright_3pt(a, b)
        return E[None], jnp.ones((1,), bool)

    def err(E, data):
        a, b = data
        return essential.angular_error(E, a, b)

    return ransac.ac_ransac(
        key, fit, err, (b1, b2), valid, min_samples=3,
        logalpha0=ransac.LOGALPHA0_ANGULAR,
        mult_error=ransac.MULT_ERROR_ANGULAR,
        max_models=1, n_samples=n_samples, precision_sq=precision_sq)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_ortho(key, x1, x2, valid, w2, h2,
                           n_samples=1024, precision_sq=jnp.inf):
    """3-pt orthographic-E AC-RANSAC on camera-plane points — the
    GeometricFilter '-g o' model (GeometricFilter_EOMatrix_RA,
    Eo_Robust.hpp:105-120: ThreePointKernel +
    OrthographicSymmetricEpipolarDistanceError; precision arrives already
    converted to camera-plane units by the caller, Eo_Robust.hpp:96-100;
    NFA logalpha0 stays on image dimensions like the reference kernel,
    robust_estimator_ACRansacKernelAdaptator.hpp:407).

    x1, x2: (N, 2) camera-plane (undistorted, normalized) coordinates."""
    def fit(sub):
        a, b = sub
        return essential.solve_essential_ortho_3pt(a, b)

    def err(E, data):
        a, b = data
        return essential.ortho_essential_error_sq(E, a, b)

    return ransac.ac_ransac(
        key, fit, err, (x1, x2), valid, min_samples=3,
        logalpha0=ransac.logalpha0_point_to_line(w2, h2, 0.5),
        mult_error=ransac.MULT_ERROR_POINT_TO_LINE,
        max_models=2, n_samples=n_samples, precision_sq=precision_sq)


def robust_resection_angular(key, bearings, X3d, valid,
                             n_samples=1024, precision_sq=jnp.inf):
    """AC-RANSAC P3P with angular reprojection error — the spherical
    resection path (solver_resection_metrics.hpp angular metric;
    SfM_Localizer dispatch for non-pinhole cameras)."""
    def fit(sub):
        b, X = sub
        R, t, ok = resection.solve_p3p(b, X)
        return (R, t), ok

    def err(model, data):
        R, t = model
        b, X = data
        d = X @ R.T + t
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
        cos = jnp.clip(jnp.sum(d * b, axis=-1), -1.0, 1.0)
        ang = jnp.arccos(cos)
        return ang * ang

    return ransac.ac_ransac(
        key, fit, err, (bearings, X3d), valid, min_samples=3,
        logalpha0=ransac.LOGALPHA0_ANGULAR,
        mult_error=ransac.MULT_ERROR_ANGULAR,
        max_models=4, n_samples=n_samples, precision_sq=precision_sq)


robust_resection_angular = partial(jax.jit, static_argnames=("n_samples",))(
    robust_resection_angular)


# ---------------------------------------------------------------------------
# vmapped pair batches (the GeometricFilter device half: the reference
# OpenMPs the pair loop, GeometricFilter.hpp:79-82; here each pow2 bucket
# of pairs is ONE device program)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_samples", "use_8pt"))
def robust_fundamental_batch(keys, x1, x2, valid, w1, h1, w2, h2,
                             n_samples=1024, precision_sq=jnp.inf,
                             use_8pt=False):
    f = partial(robust_fundamental, n_samples=n_samples,
                precision_sq=precision_sq, use_8pt=use_8pt)
    return jax.vmap(f)(keys, x1, x2, valid, w1, h1, w2, h2)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_homography_batch(keys, x1, x2, valid, w1, h1, w2, h2,
                            n_samples=1024, precision_sq=jnp.inf):
    f = partial(robust_homography, n_samples=n_samples,
                precision_sq=precision_sq)
    return jax.vmap(f)(keys, x1, x2, valid, w1, h1, w2, h2)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_batch(keys, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                           n_samples=1024, precision_sq=jnp.inf):
    f = partial(robust_essential, n_samples=n_samples,
                precision_sq=precision_sq)
    return jax.vmap(f)(keys, b1, b2, x1, x2, K1, K2, valid, w2, h2)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_angular_batch(keys, b1, b2, valid, n_samples=1024,
                                   precision_sq=jnp.inf):
    f = partial(robust_essential_angular, n_samples=n_samples,
                precision_sq=precision_sq)
    return jax.vmap(f)(keys, b1, b2, valid)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_upright_batch(keys, b1, b2, valid, n_samples=1024,
                                   precision_sq=jnp.inf):
    f = partial(robust_essential_upright, n_samples=n_samples,
                precision_sq=precision_sq)
    return jax.vmap(f)(keys, b1, b2, valid)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_essential_ortho_batch(keys, x1, x2, valid, w2, h2, precision_sq,
                                 n_samples=1024):
    """precision_sq is per-pair (camera-plane conversion differs with each
    pair's focals, Eo_Robust.hpp:96-100)."""
    def f(key, a, b, v, w2_, h2_, prec):
        return robust_essential_ortho(key, a, b, v, w2_, h2_,
                                      n_samples=n_samples, precision_sq=prec)

    return jax.vmap(f)(keys, x1, x2, valid, w2, h2, precision_sq)


# ---------------------------------------------------------------------------
# robustRelativePose
# ---------------------------------------------------------------------------

class RelativePoseInfo(NamedTuple):
    R: jnp.ndarray          # (3, 3) world0->world1 relative rotation
    t: jnp.ndarray          # (3,) unit-norm relative translation
    essential: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray    # (N,) bool
    threshold_sq: jnp.ndarray
    nfa: jnp.ndarray
    found: jnp.ndarray      # bool: NFA ok AND inliers > 2.5*min_samples


@partial(jax.jit, static_argnames=("n_samples", "angular"))
def robust_relative_pose(key, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                         n_samples=1024, precision_sq=jnp.inf, angular=False):
    """sfm_robust_model_estimation.cpp:29-120 as one batched call."""
    if angular:
        res = robust_essential_angular(key, b1, b2, valid,
                                       n_samples=n_samples,
                                       precision_sq=precision_sq)
        min_samples = 8
    else:
        res = robust_essential(key, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                               n_samples=n_samples, precision_sq=precision_sq)
        min_samples = 5
    E = res.model
    w = res.inliers.astype(E.dtype)
    R, t, n_good = essential.relative_pose_from_essential(E, b1, b2, weights=w)
    found = res.found & (jnp.sum(res.inliers) > 2.5 * min_samples) & (n_good > 0)
    return RelativePoseInfo(R=R, t=t, essential=E, inliers=res.inliers,
                            threshold_sq=res.threshold_sq, nfa=res.nfa,
                            found=found)


@partial(jax.jit, static_argnames=("round_size", "max_rounds", "angular"))
def robust_relative_pose_adaptive(key, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                                  round_size=512, max_rounds=8,
                                  angular=False, precision_sq=jnp.inf):
    """robustRelativePose through the ADAPTIVE-budget AC-RANSAC
    (ops/ransac.ac_ransac_adaptive = robust_estimator_ACRansac.hpp:326-489
    early-exit + inlier-resampling semantics): the single-estimation path
    for MakeInitialPair3D's 4096-iteration refinement
    (sequential_SfM.cpp:532 — round_size * max_rounds = the same budget,
    easy pairs exit after ~3 rounds).  Returns (RelativePoseInfo,
    n_rounds)."""
    from openmvg_tpu.ops import ransac as rn

    if angular:
        def fit(sub):
            a, b = sub
            E = essential.solve_essential_8pt(a, b)
            return E[None], jnp.ones((1,), bool)

        def err(E, data):
            a, b = data
            return essential.angular_error(E, a, b)

        res, n_rounds = rn.ac_ransac_adaptive(
            key, fit, err, (b1, b2), valid, min_samples=8,
            logalpha0=rn.LOGALPHA0_ANGULAR,
            mult_error=rn.MULT_ERROR_ANGULAR, max_models=1,
            round_size=round_size, max_rounds=max_rounds,
            precision_sq=precision_sq)
        min_samples = 8
    else:
        K1inv = jnp.linalg.inv(K1)
        K2invT = jnp.linalg.inv(K2).T

        def fit(sub):
            a, b = sub
            return essential.solve_essential_5pt(a, b)

        def err(E, data):
            F = K2invT @ E @ K1inv
            return fundamental.point_line_error_sq(F, x1, x2)

        res, n_rounds = rn.ac_ransac_adaptive(
            key, fit, err, (b1, b2), valid, min_samples=5,
            logalpha0=rn.logalpha0_point_to_line(w2, h2, 0.5),
            mult_error=rn.MULT_ERROR_POINT_TO_LINE, max_models=10,
            round_size=round_size, max_rounds=max_rounds,
            precision_sq=precision_sq)
        min_samples = 5
    E = res.model
    w = res.inliers.astype(E.dtype)
    R, t, n_good = essential.relative_pose_from_essential(E, b1, b2, weights=w)
    found = res.found & (jnp.sum(res.inliers) > 2.5 * min_samples) & (n_good > 0)
    return RelativePoseInfo(R=R, t=t, essential=E, inliers=res.inliers,
                            threshold_sq=res.threshold_sq, nfa=res.nfa,
                            found=found), n_rounds


@partial(jax.jit, static_argnames=("round_size", "max_rounds"))
def robust_resection_p3p_adaptive(key, bearings, x2d, X3d, K, valid, w, h,
                                  round_size=256, max_rounds=8,
                                  precision_sq=jnp.inf):
    """Adaptive-budget AC-RANSAC P3P — the localizer's single-estimation
    path (SfM_Localizer::Localize, SfM_Localizer.cpp:109, with the
    reference's data-dependent iteration budget).  Returns
    (ACRansacResult, n_rounds)."""
    from openmvg_tpu.ops import ransac as rn

    def fit(sub):
        b, X = sub
        R, t, ok = resection.solve_p3p(b, X)
        return (R, t), ok

    def err(model, data):
        R, t = model
        _, X = data
        Xc = X @ R.T + t
        p = Xc[..., :2] / jnp.where(
            jnp.abs(Xc[..., 2:3]) < 1e-30, 1e-30, Xc[..., 2:3])
        pix = p @ K[:2, :2].T + K[:2, 2]
        d = pix - x2d
        return jnp.sum(d * d, axis=-1)

    return rn.ac_ransac_adaptive(
        key, fit, err, (bearings, X3d), valid, min_samples=3,
        logalpha0=rn.logalpha0_point_to_point(w, h),
        mult_error=rn.MULT_ERROR_POINT_TO_POINT, max_models=4,
        round_size=round_size, max_rounds=max_rounds,
        precision_sq=precision_sq)


@partial(jax.jit, static_argnames=("n_samples", "angular"))
def robust_relative_pose_batch(keys, b1, b2, x1, x2, K1, K2, valid, w2, h2,
                               n_samples=1024, angular=False):
    """robust_relative_pose vmapped over a pair batch — the device half of
    the batched Relative_Pose_Engine (relative_pose_engine.cpp:144-191 is
    an OpenMP loop over pairs; here every pair's whole AC-RANSAC runs in
    one device program).

    keys (P, 2), b*/x* (P, K, 3|2), K1/K2 (P, 3, 3), valid (P, K),
    w2/h2 (P,).  Returns a RelativePoseInfo with leading dim P.
    """
    f = partial(robust_relative_pose, n_samples=n_samples, angular=angular)
    return jax.vmap(f)(keys, b1, b2, x1, x2, K1, K2, valid, w2, h2)


# ---------------------------------------------------------------------------
# resection (localization): P3P + pixel reprojection NFA
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_samples",))
def robust_resection_p3p(key, bearings, x2d, X3d, K, valid, w, h,
                         n_samples=1024, precision_sq=jnp.inf):
    """AC-RANSAC P3P pose (SfM_Localizer::Localize with SolverType
    P3P_*; ACKernelAdaptorResection_K).  Returns pose as (R, t) world->cam
    in the model pytree."""
    def fit(sub):
        b, X = sub
        R, t, ok = resection.solve_p3p(b, X)
        return (R, t), ok

    def err(model, data):
        R, t = model
        _, X = data
        Xc = X @ R.T + t
        p = Xc[..., :2] / jnp.where(
            jnp.abs(Xc[..., 2:3]) < 1e-30, 1e-30, Xc[..., 2:3])
        pix = p @ K[:2, :2].T + K[:2, 2]
        d = pix - x2d
        return jnp.sum(d * d, axis=-1)

    return ransac.ac_ransac(
        key, fit, err, (bearings, X3d), valid, min_samples=3,
        logalpha0=ransac.logalpha0_point_to_point(w, h),
        mult_error=ransac.MULT_ERROR_POINT_TO_POINT,
        max_models=4, n_samples=n_samples, precision_sq=precision_sq)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_resection_p3p_batch(keys, bearings, x2d, X3d, K, valid, w, h,
                               n_samples=1024):
    """robust_resection_p3p vmapped over a view batch — the device half of
    the batched resection group (sequential_SfM.cpp:863 Resection runs one
    view per OpenMP task; here every view in the resection group solves its
    whole AC-RANSAC in one device program).

    keys (V, 2), bearings (V, K, 3), x2d (V, K, 2), X3d (V, K, 3),
    K (V, 3, 3), valid (V, K), w/h (V,).  Returns an ACRansacResult with
    leading dim V; model = (R (V,3,3), t (V,3))."""
    f = partial(robust_resection_p3p, n_samples=n_samples)
    return jax.vmap(f)(keys, bearings, x2d, X3d, K, valid, w, h)


@partial(jax.jit, static_argnames=("n_samples",))
def robust_resection_angular_batch(keys, bearings, X3d, valid,
                                   n_samples=1024):
    """robust_resection_angular vmapped over a view batch (spherical)."""
    f = partial(robust_resection_angular, n_samples=n_samples)
    return jax.vmap(f)(keys, bearings, X3d, valid)


@partial(jax.jit, static_argnames=("iters",))
def refine_poses_batch(rotvec, t, kind, params, wh, X, xy, w_obs,
                       iters=8, huber_a=16.0):
    """Batched pose-only LM refine — SfM_Localizer::RefinePose
    (SfM_Localizer.cpp:345) for a whole resection group in ONE device
    program.  The reference refines each new pose with a ceres BA over a
    tiny one-view scene; the round-3 engine instead built a FULL-scene BA
    problem per view with one pose free (hundreds of extra dispatches +
    compiles).  Here each view's own 2D-3D inliers drive an independent
    6-parameter LM, vmapped over the group.

    rotvec/t (V, 3) world->cam axis-angle + translation; kind (V,),
    params (V, 8), wh (V, 2) camera rows; X (V, K, 3) world points;
    xy (V, K, 2) pixels; w_obs (V, K) weights (0 = padding/outlier).
    Returns (rotvec, t) refined."""
    from openmvg_tpu.geometry import so3
    from openmvg_tpu.models import cameras as cm

    def res_one(p6, kind1, params1, wh1, X1, x1):
        Xc = so3.rotate(p6[:3], X1) + p6[3:]
        return cm.residual(kind1, params1, wh1[0], wh1[1], Xc, x1)

    def run_one(rv, tv, kindv, paramsv, whv, Xv, xyv, wv):
        def res_one_v(p6, X1, x1):
            return res_one(p6, kindv, paramsv, whv, X1, x1)

        def cost_vv(p6):
            r = jax.vmap(res_one_v, in_axes=(None, 0, 0))(p6, Xv, xyv)
            s = jnp.sum(r * r, -1)
            rho = jnp.where(s <= huber_a, s,
                            2.0 * jnp.sqrt(huber_a * jnp.maximum(s, 0.0))
                            - huber_a)
            return 0.5 * jnp.sum(rho * wv)

        def step(carry, _):
            p6, lam, cost = carry
            r = jax.vmap(res_one_v, in_axes=(None, 0, 0))(p6, Xv, xyv)
            J = jax.vmap(jax.jacfwd(res_one_v), in_axes=(None, 0, 0))(
                p6, Xv, xyv)
            s = jnp.sum(r * r, -1)
            wh_ = jnp.where(s <= huber_a, 1.0,
                            jnp.sqrt(huber_a / jnp.maximum(s, 1e-30)))
            w = jnp.sqrt(wh_ * jnp.maximum(wv, 0.0))
            rw = r * w[:, None]
            Jw = J * w[:, None, None]
            g = -jnp.einsum("kab,ka->b", Jw, rw)
            H = jnp.einsum("kab,kac->bc", Jw, Jw)
            Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12)) \
                + 1e-12 * jnp.eye(6, dtype=H.dtype)
            d = jnp.linalg.solve(Hd, g)
            p6_new = p6 + d
            cost_new = cost_vv(p6_new)
            accept = cost_new < cost
            p6 = jnp.where(accept, p6_new, p6)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, cost_new, cost)
            return (p6, lam, cost), None

        p6_0 = jnp.concatenate([rv, tv])
        (p6, _, _), _ = jax.lax.scan(
            step, (p6_0, jnp.asarray(1e-4, p6_0.dtype), cost_vv(p6_0)),
            None, length=iters)
        return p6[:3], p6[3:]

    return jax.vmap(run_one)(rotvec, t, kind, params, wh, X, xy, w_obs)
