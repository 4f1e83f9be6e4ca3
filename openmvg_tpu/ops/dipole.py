"""DIPOLE — 20-d luminance-invariant dipole descriptor.

Reference parity: features/dipole/dipole_descriptor.hpp — 12 first-order
samples on a ring of radius lambda1 = 3.5*scale combined by a fixed 8x12
difference matrix, plus 12 second-order radial differences at
lambda1±lambda2 (lambda2 = lambda1/2); both blocks L2-normalized
(affine-luminance invariance).  "Angular smoothed" variant averages each
sample over 3 ring angles (±angleSubdiv/2).

One fused gather per batch of keypoints; no per-sample loops.
"""

import jax
import jax.numpy as jnp
import numpy as np

# 8x12 first-order dipole combination (dipole_descriptor.hpp:92-100)
_A = np.array([
    [0, 0, 0, 1, 0, 0, 0, 0, 0, -1, 0, 0],
    [0, -1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, -1, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 0, 1, 0, 0, -1, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0, 0, -1, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, -1],
    [0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0],
    [1, 0, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0],
], np.float32)


def _bilinear(img, y, x):
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = y - y0
    fx = x - x0
    return (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
            + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)


def dipole_describe(image, xy, scale, orientation=None, smoothed=True,
                    magnif_factor=3.5):
    """Batched 20-d dipole descriptors.

    image: (H, W) float gray; xy (K, 2); scale (K,); orientation (K,)
    radians (0 if None).  smoothed=True is the reference default
    (angular-smoothed dipole)."""
    image = jnp.asarray(image, jnp.float32)
    xy = jnp.asarray(xy, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    K = xy.shape[0]
    ang0 = (jnp.zeros(K, jnp.float32) if orientation is None
            else jnp.asarray(orientation, jnp.float32))
    lambda1 = scale * magnif_factor
    lambda2 = lambda1 / 2.0
    sub = 2.0 * jnp.pi / 12.0
    base = jnp.arange(12, dtype=jnp.float32) * sub          # (12,)
    if smoothed:
        offs = jnp.asarray([0.0, -sub / 2, sub / 2], jnp.float32)
    else:
        offs = jnp.asarray([0.0], jnp.float32)
    ang = ang0[:, None, None] + base[None, :, None] + offs[None, None, :]
    ca, sa = jnp.cos(ang), jnp.sin(ang)                      # (K, 12, S)

    def ring(radius):
        xs = xy[:, 0, None, None] + radius[:, None, None] * ca
        ys = xy[:, 1, None, None] + radius[:, None, None] * sa
        return jnp.mean(_bilinear(image, ys, xs), axis=-1)   # (K, 12)

    f1 = ring(lambda1)
    f2 = ring(lambda1 + lambda2) - ring(lambda1 - lambda2)
    b1 = f1 @ jnp.asarray(_A.T)                              # (K, 8)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([b1, b2], axis=-1)                # (K, 20)
