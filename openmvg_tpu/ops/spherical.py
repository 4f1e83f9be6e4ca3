"""Spherical (equirectangular) image utilities.

Reference parity: spherical/cubic_image_sampler.hpp:57 (equirect ->
6-face cubemap resampling with per-face pinhole cameras) and
spherical/image_resampling.hpp:20 (generic pose-rotated pinhole resampling
from an equirectangular panorama); CLI main_openMVGSpherical2Cubic.cpp.

TPU design: one batched bilinear gather per output image.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry import so3

# face order parity with GetCubicRotations (cubic_image_sampler.hpp):
# front, right, back, left, up, down as rotations applied to bearings
_FACE_ROT = [
    (0.0, 0.0, 0.0),
    (0.0, -np.pi / 2, 0.0),
    (0.0, np.pi, 0.0),
    (0.0, np.pi / 2, 0.0),
    (-np.pi / 2, 0.0, 0.0),
    (np.pi / 2, 0.0, 0.0),
]


def _bilinear_hw(img, y, x):
    H, W = img.shape[:2]
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    x0 = jnp.floor(x).astype(jnp.int32) % W
    x1 = (x0 + 1) % W
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    fx = (x - jnp.floor(x))[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x1]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def sample_pinhole_from_equirect(pano, R, focal, out_size):
    """Render a pinhole view (R: world->cam of the virtual camera) from an
    equirectangular panorama (H, W, C)."""
    pano = jnp.asarray(pano)
    H, W = pano.shape[:2]
    n = out_size
    ys, xs = jnp.meshgrid(jnp.arange(n, dtype=jnp.float32),
                          jnp.arange(n, dtype=jnp.float32), indexing="ij")
    d = jnp.stack([(xs - n / 2 + 0.5) / focal, (ys - n / 2 + 0.5) / focal,
                   jnp.ones_like(xs)], axis=-1)
    # camera ray -> world
    dw = jnp.einsum("ji,hwj->hwi", jnp.asarray(R, jnp.float32), d)
    lon = jnp.arctan2(dw[..., 0], dw[..., 2])
    lat = jnp.arctan2(-dw[..., 1], jnp.hypot(dw[..., 0], dw[..., 2]))
    u = (lon / (2 * jnp.pi) + 0.5) * W - 0.5
    v = (0.5 - lat / jnp.pi) * H - 0.5
    flat = pano.reshape(H, W, -1).astype(jnp.float32)
    out = _bilinear_hw(flat, v, u)
    return out.reshape((n, n) + pano.shape[2:])


def spherical_to_cubic(pano, out_size=None):
    """Equirect -> 6 cubemap faces + their pinhole intrinsics/rotations.

    Returns (faces (6, S, S, C), rotations (6, 3, 3), focal).
    """
    pano = np.asarray(pano)
    H = pano.shape[0]
    S = out_size or H // 2
    focal = S / 2.0  # 90 deg fov faces
    faces, rots = [], []
    for (rx, ry, rz) in _FACE_ROT:
        R = np.asarray(so3.expmap(jnp.asarray([rx, 0.0, 0.0]))) @ \
            np.asarray(so3.expmap(jnp.asarray([0.0, ry, 0.0])))
        faces.append(np.asarray(sample_pinhole_from_equirect(pano, R, focal, S)))
        rots.append(R)
    return np.stack(faces), np.stack(rots), focal
