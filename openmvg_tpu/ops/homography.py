"""Batched 4-point DLT homography + asymmetric transfer error.

Reference parity: multiview/solver_homography_kernel.cpp (FourPointSolver
via DLT nullspace, AsymmetricError = squared transfer distance in image 2).
Convention: x2 ~ H x1, points (..., N, 2).
"""

import jax.numpy as jnp

from openmvg_tpu.ops.fundamental import nullspace


def homography_design(x1, x2):
    """DLT rows: each correspondence contributes 2 rows of (..., 2N, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, o, z, z, z, -u1 * u2, -v1 * u2, -u2], axis=-1)
    r2 = jnp.stack([z, z, z, u1, v1, o, -u1 * v2, -v1 * v2, -v2], axis=-1)
    return jnp.concatenate([r1, r2], axis=-2)


def solve_homography(x1, x2, weights=None):
    """(..., N>=4, 2) pairs -> (..., 3, 3) H (h22 normalized where stable)."""
    A = homography_design(x1, x2)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        A = A * w2[..., None]
    h = nullspace(A, 1)[..., 0, :]
    H = h.reshape(h.shape[:-1] + (3, 3))
    scale = jnp.linalg.norm(h, axis=-1)
    return H / jnp.maximum(scale, 1e-30)[..., None, None]


def asymmetric_error_sq(H, x1, x2):
    """Squared transfer distance |x2 - proj(H x1)|^2
    (homography kernel AsymmetricError)."""
    num = (
        jnp.einsum("...ij,...nj->...ni", H[..., :2, :2], x1) + H[..., None, :2, 2]
    )
    den = jnp.einsum("...j,...nj->...n", H[..., 2, :2], x1) + H[..., None, 2, 2]
    proj = num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)[..., None]
    d = proj - x2
    return jnp.sum(d * d, axis=-1)
