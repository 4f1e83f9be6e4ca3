"""7-DoF similarity transforms and Umeyama point-set alignment.

Reference parity: openMVG geometry/rigid_transformation3D_srt.hpp FindRTS
(least-squares scale/rotation/translation between 3D point sets) and
geometry/Similarity3 — used by GT evaluation (tools_precisionEvaluationToGt.hpp)
and GPS-prior registration.  Implemented as the closed-form Umeyama method,
batched and jit-safe.
"""

from typing import NamedTuple

import jax.numpy as jnp


class Similarity(NamedTuple):
    """x' = scale * R @ x + t."""

    scale: jnp.ndarray  # (...,)
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    def apply(self, X):
        return self.scale[..., None] * jnp.einsum("...ij,...j->...i", self.R, X) + self.t


def find_rts(x, y, weights=None):
    """Least-squares similarity mapping points x -> y (both (..., N, 3)).

    Umeyama's closed form; equivalent to FindRTS
    (geometry/rigid_transformation3D_srt.cpp).  `weights` (..., N) optional.
    """
    if weights is None:
        weights = jnp.ones(x.shape[:-1], dtype=x.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    mu_x = jnp.sum(x * w[..., None], axis=-2)
    mu_y = jnp.sum(y * w[..., None], axis=-2)
    xc = x - mu_x[..., None, :]
    yc = y - mu_y[..., None, :]
    # weighted covariance (3,3): sum_i w_i yc_i xc_i^T
    cov = jnp.einsum("...n,...ni,...nj->...ij", w, yc, xc)
    var_x = jnp.sum(w * jnp.sum(xc * xc, axis=-1), axis=-1)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    R = (U * S[..., None, :]) @ Vt
    scale = jnp.sum(D * S, axis=-1) / jnp.maximum(var_x, 1e-12)
    t = mu_y - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_x)
    return Similarity(scale=scale, R=R, t=t)


def align_poses_rts(centers_est, centers_gt):
    """Similarity aligning estimated camera centers to GT (the evalQuality
    protocol, software/SfM/tools_precisionEvaluationToGt.hpp:21-60)."""
    return find_rts(centers_est, centers_gt)
