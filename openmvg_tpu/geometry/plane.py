"""Robust 3D plane estimation: minimal solver + error models.

Reference parity: openMVG geometry/plane_estimation_kernel.hpp —
PlaneSolver (3-point half-plane fit), AbsDistanceError (point-to-plane
absolute distance) and AbsAngularError (bearing-vs-normal angle about the
sample centroid), usable with the robust estimators in ops/ransac
(max_consensus / lmeds / ac_ransac) exactly as the reference pairs its
kernel with MaxConsensus.

A plane is (normal, d) with unit `normal` and n.x + d = 0, the same
Hessian normal form as the reference's Half_plane (Eigen Hyperplane).
All functions are pure jnp and batch over leading axes.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Plane(NamedTuple):
    normal: jnp.ndarray    # (..., 3) unit normal
    d: jnp.ndarray         # (...,) offset: n.x + d = 0
    centroid: jnp.ndarray  # (..., 3) mean of the fitting sample


def plane_from_3_points(pts):
    """(..., 3, 3) sample -> (Plane, valid).  Half_plane_p analogue.

    valid is False for (near-)collinear samples.
    """
    a, b, c = pts[..., 0, :], pts[..., 1, :], pts[..., 2, :]
    n = jnp.cross(b - a, c - a)
    norm = jnp.linalg.norm(n, axis=-1)
    valid = norm > 1e-12
    n = n / jnp.maximum(norm, 1e-12)[..., None]
    d = -jnp.sum(n * a, axis=-1)
    centroid = (a + b + c) / 3.0
    return Plane(n, d, centroid), valid


def abs_distance(plane, x):
    """|n.x + d| point-to-plane distance (AbsDistanceError).  x (..., 3)."""
    return jnp.abs(
        jnp.sum(plane.normal * x, axis=-1) + plane.d)


def abs_angular_error(plane, x):
    """|angle(bearing, normal) - pi/2| in radians (AbsAngularError):
    bearing is the direction from the sample centroid to x.  Biased toward
    planes with large spatial support, as in the reference."""
    bearing = x - plane.centroid
    bearing = bearing / jnp.maximum(
        jnp.linalg.norm(bearing, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.clip(jnp.sum(bearing * plane.normal, axis=-1), -1.0, 1.0)
    return jnp.abs(jnp.arccos(cosang) - jnp.pi / 2.0)


def fit_plane_max_consensus(key, points, threshold, n_samples=256,
                            angular=False):
    """Robust plane fit over (N, 3) points (HaflPlaneKernel + MaxConsensus).

    threshold: inlier bound on the chosen error (distance units, or
    radians when angular=True).  Returns (Plane, inlier_mask, score).
    """
    from openmvg_tpu.ops import ransac

    points = jnp.asarray(points)
    valid = jnp.ones(points.shape[0], bool)

    def fit(sample_pts):
        plane, ok = plane_from_3_points(sample_pts[None])
        return plane, ok

    err_fn = abs_angular_error if angular else abs_distance

    def error(plane, data):
        # squared error to match max_consensus's threshold_sq contract
        e = err_fn(plane, data)
        return e * e

    model, inliers, score = ransac.max_consensus(
        key, fit, error, points, valid, min_samples=3,
        threshold_sq=threshold * threshold, n_samples=n_samples)
    return model, inliers, score
