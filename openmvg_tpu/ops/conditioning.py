"""Point conditioning for DLT-style solvers (HZ 4.4.4).

Reference parity: multiview/conditioning.cpp —
  - PreconditionerFromPoints(points): per-axis variance normalization to
    scale sqrt(2), centroid at origin (used by the plain kernels)
  - PreconditionerFromPoints(w, h): image-size normalization
    diag(1/sqrt(wh)) with centered principal point (used by the AC-RANSAC
    kernel adaptors so thresholds stay comparable across pairs)
Both return 3x3 T with normalized = T @ homogeneous(points).
"""

import jax.numpy as jnp


def preconditioner_from_points(points, mask=None):
    """(..., N, 2) -> (..., 3, 3) variance-based Hartley normalizer."""
    if mask is None:
        w = jnp.ones(points.shape[:-1], points.dtype)
    else:
        w = mask.astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(points * w[..., None], axis=-2) / cnt
    var = jnp.sum((points - mean[..., None, :]) ** 2 * w[..., None], axis=-2) / cnt[..., 0:1]
    ok = var >= 1e-8
    factor = jnp.where(ok, jnp.sqrt(2.0 / jnp.maximum(var, 1e-8)), 1.0)
    mean = jnp.where(ok, mean, 1.0)
    z = jnp.zeros_like(factor[..., 0])
    o = jnp.ones_like(z)
    T = jnp.stack(
        [
            jnp.stack([factor[..., 0], z, -factor[..., 0] * mean[..., 0]], axis=-1),
            jnp.stack([z, factor[..., 1], -factor[..., 1] * mean[..., 1]], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return T


def preconditioner_from_size(width, height, dtype=jnp.float64):
    """Image-size normalizer (conditioning.cpp:55-64)."""
    d = 1.0 / jnp.sqrt(jnp.asarray(width * height, dtype))
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype
    )
    T = T.at[0, 0].set(d).at[1, 1].set(d)
    T = T.at[0, 2].set(-0.5 * width * d).at[1, 2].set(-0.5 * height * d)
    return T


def apply_transform(T, points):
    """Apply 3x3 T to inhomogeneous (..., N, 2) points -> (..., N, 2)."""
    h = points @ jnp.swapaxes(T[..., :2, :2], -1, -2) + T[..., None, :2, 2]
    w = points @ T[..., 2, :2][..., :, None] + T[..., 2, 2][..., None, None]
    return h / w
