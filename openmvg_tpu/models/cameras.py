"""Batched camera models — the six openMVG intrinsic types as one pytree.

Reference parity (openMVG/cameras/):
  - kind enum values mirror EINTRINSIC (Camera_Common.hpp:39-49):
      1 PINHOLE, 2 RADIAL_K1, 3 RADIAL_K3, 4 BROWN_T2, 5 FISHEYE, 7 SPHERICAL
  - pinhole projection + cam2ima/ima2cam (Camera_Pinhole.hpp:33)
  - radial distortion x_d = x_u (1 + k1 r^2 [+ k2 r^4 + k3 r^6]) with
    bisection undistortion (Camera_Pinhole_Radial.hpp:38,78,284)
  - Brown T2 radial+tangential with fixed-point undistortion
    (Camera_Pinhole_Brown.hpp:27,97)
  - fisheye 4-coefficient theta-polynomial (Camera_Pinhole_Fisheye.hpp:86-136)
  - spherical equirectangular (Camera_Spherical.hpp:89-148)

Design: instead of a virtual-dispatch class per model, a camera is
(kind, width, height, params[8]) where params = [f, ppx, ppy, d0..d4]
(the exact getParams() ordering used by openMVG BA).  All ops are pure
jnp functions over a single camera + (N,2)/(N,3) point arrays; per-model
branches are computed dense and selected with jnp.where — on TPU the
elementwise distortion math is negligible next to the matmuls it feeds,
and dense-select keeps everything vmap/jit friendly with no lax.switch.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

# EINTRINSIC parity values (cameras/Camera_Common.hpp:39-49)
PINHOLE = 1
PINHOLE_RADIAL_K1 = 2
PINHOLE_RADIAL_K3 = 3
PINHOLE_BROWN = 4
PINHOLE_FISHEYE = 5
SPHERICAL = 7

KIND_NAMES = {
    PINHOLE: "pinhole",
    PINHOLE_RADIAL_K1: "pinhole_radial_k1",
    PINHOLE_RADIAL_K3: "pinhole_radial_k3",
    PINHOLE_BROWN: "pinhole_brown_t2",
    PINHOLE_FISHEYE: "fisheye",
    SPHERICAL: "spherical",
}
KIND_FROM_NAME = {v: k for k, v in KIND_NAMES.items()}

# number of optimizable params per kind (getParams() length)
N_PARAMS = {
    PINHOLE: 3,
    PINHOLE_RADIAL_K1: 4,
    PINHOLE_RADIAL_K3: 6,
    PINHOLE_BROWN: 8,
    PINHOLE_FISHEYE: 7,
    SPHERICAL: 0,
}
MAX_PARAMS = 8


class Cameras(NamedTuple):
    """A batch of intrinsics (dense 'map' keyed by intrinsic id)."""

    kind: jnp.ndarray    # (I,) int32 EINTRINSIC value
    width: jnp.ndarray   # (I,) float
    height: jnp.ndarray  # (I,) float
    params: jnp.ndarray  # (I, 8) float: [f, ppx, ppy, d0, d1, d2, d3, d4]

    @property
    def focal(self):
        return self.params[..., 0]

    @property
    def principal_point(self):
        return self.params[..., 1:3]


def make_pinhole(width, height, focal, ppx=None, ppy=None, kind=PINHOLE, disto=()):
    """Convenience single-camera constructor (host side)."""
    ppx = width / 2.0 if ppx is None else ppx
    ppy = height / 2.0 if ppy is None else ppy
    params = np.zeros((MAX_PARAMS,), dtype=np.float64)
    params[0:3] = [focal, ppx, ppy]
    disto = np.asarray(disto, dtype=np.float64)
    params[3:3 + disto.size] = disto
    return Cameras(
        kind=np.array([kind], np.int32),
        width=np.array([width], np.float64),
        height=np.array([height], np.float64),
        params=params[None],
    )


def stack_cameras(cams):
    """Concatenate a list of Cameras batches."""
    return Cameras(*[np.concatenate([np.asarray(getattr(c, f)) for c in cams]) for f in Cameras._fields])


# ---------------------------------------------------------------------------
# cam <-> image plane
# ---------------------------------------------------------------------------

def cam2ima(kind, params, width, height, p):
    """Normalized camera-plane point(s) (..., 2) -> pixel(s).

    Pinhole family: f * p + pp (Camera_Pinhole.hpp cam2ima)
    Spherical: p * max(w,h) + [w/2, h/2] (Camera_Spherical.hpp:89)
    """
    f = params[..., 0:1]
    pp = params[..., 1:3]
    pin = f * p + pp
    size = jnp.maximum(width, height)[..., None]
    sph = p * size + jnp.stack([width, height], axis=-1) * 0.5
    return jnp.where(kind[..., None] == SPHERICAL, sph, pin)


def ima2cam(kind, params, width, height, p):
    """Pixel(s) (..., 2) -> normalized camera plane."""
    f = params[..., 0:1]
    pp = params[..., 1:3]
    pin = (p - pp) / f
    size = jnp.maximum(width, height)[..., None]
    sph = (p - jnp.stack([width, height], axis=-1) * 0.5) / size
    return jnp.where(kind[..., None] == SPHERICAL, sph, pin)


# ---------------------------------------------------------------------------
# distortion
# ---------------------------------------------------------------------------

def _brown_disto_term(params, p):
    """Additive Brown T2 distortion term (Camera_Pinhole_Brown.hpp distoFunction).

    With t1 = t2 = 0 this is exactly the radial K1/K3 multiplicative model
    written additively, so one formula covers kinds 2, 3, 4.
    """
    k1, k2, k3, t1, t2 = (params[..., 3 + i] for i in range(5))
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    k_diff = k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    t_x = t2 * (r2 + 2 * x * x) + 2 * t1 * x * y
    t_y = t1 * (r2 + 2 * y * y) + 2 * t2 * x * y
    return jnp.stack([x * k_diff + t_x, y * k_diff + t_y], axis=-1)


def _fisheye_add_disto(params, p):
    """Camera_Pinhole_Fisheye.hpp:86-105."""
    k1, k2, k3, k4 = (params[..., 3 + i] for i in range(4))
    eps = 1e-8
    r = jnp.hypot(p[..., 0], p[..., 1])
    theta = jnp.arctan(r)
    th2 = theta * theta
    theta_dist = theta * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    cdist = jnp.where(r > eps, theta_dist / jnp.maximum(r, eps), 1.0)
    return p * cdist[..., None]


def add_disto(kind, params, p):
    """Apply the distortion field to normalized camera points (..., 2)."""
    brown = p + _brown_disto_term(params, p)
    fish = _fisheye_add_disto(params, p)
    has_poly = (kind == PINHOLE_RADIAL_K1) | (kind == PINHOLE_RADIAL_K3) | (kind == PINHOLE_BROWN)
    out = jnp.where(has_poly[..., None], brown, p)
    return jnp.where((kind == PINHOLE_FISHEYE)[..., None], fish, out)


def _radial_remove_disto(params, p, n_bisect=48):
    """Bisection undistortion for the pure-radial models.

    Fixed-iteration recast of bisection_Radius_Solve
    (Camera_Pinhole_Radial.hpp:38-70): find r_u^2 with
    disto(r_u^2) * r_u^2 ... more precisely functor(r2) = r2*(1+k1 r2+...)^2,
    solve functor(r_u2) = r_d2.  Bracket [0, grow(r_d2)] then bisect a
    fixed 48 times (relative accuracy ~2^-48 in fp64, fp32-limited on TPU).
    """
    k1, k2, k3 = params[..., 3], params[..., 4], params[..., 5]
    r_d2 = jnp.sum(p * p, axis=-1)

    def functor(r2):
        c = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        return r2 * c * c

    # upper bracket: grow from r_d2 until functor >= r_d2 (8 doublings max)
    def grow(_, ub):
        return jnp.where(functor(ub) < r_d2, ub * 2.0, ub)

    ub = lax.fori_loop(0, 10, grow, jnp.maximum(r_d2, 1e-12))
    lb = jnp.zeros_like(ub)

    def bisect(_, carry):
        lb, ub = carry
        mid = 0.5 * (lb + ub)
        high = functor(mid) > r_d2
        return jnp.where(high, lb, mid), jnp.where(high, mid, ub)

    lb, ub = lax.fori_loop(0, n_bisect, bisect, (lb, ub))
    r_u2 = 0.5 * (lb + ub)
    scale = jnp.where(r_d2 > 1e-16, jnp.sqrt(r_u2 / jnp.maximum(r_d2, 1e-16)), 1.0)
    return p * scale[..., None]


def _brown_remove_disto(params, p, n_iter=20):
    """Fixed-point undistortion (Camera_Pinhole_Brown.hpp:97-110), fixed 20 iters."""
    def body(_, p_u):
        return p - _brown_disto_term(params, p_u)

    return lax.fori_loop(0, n_iter, body, p)


def _fisheye_remove_disto(params, p, n_iter=10):
    """Camera_Pinhole_Fisheye.hpp:112-136 (10 fixed-point iterations + tan)."""
    k1, k2, k3, k4 = (params[..., 3 + i] for i in range(4))
    eps = 1e-8
    theta_dist = jnp.hypot(p[..., 0], p[..., 1])

    def body(_, theta):
        th2 = theta * theta
        return theta_dist / (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))

    theta = lax.fori_loop(0, n_iter, body, theta_dist)
    scale = jnp.where(theta_dist > eps, jnp.tan(theta) / jnp.maximum(theta_dist, eps), 1.0)
    return p * scale[..., None]


def remove_disto(kind, params, p):
    """Invert the distortion field on normalized camera points (..., 2)."""
    radial = _radial_remove_disto(params, p)
    brown = _brown_remove_disto(params, p)
    fish = _fisheye_remove_disto(params, p)
    out = p
    is_radial = (kind == PINHOLE_RADIAL_K1) | (kind == PINHOLE_RADIAL_K3)
    out = jnp.where(is_radial[..., None], radial, out)
    out = jnp.where((kind == PINHOLE_BROWN)[..., None], brown, out)
    out = jnp.where((kind == PINHOLE_FISHEYE)[..., None], fish, out)
    return out


# ---------------------------------------------------------------------------
# projection / bearing
# ---------------------------------------------------------------------------

def project_cam(kind, params, width, height, Xc, ignore_distortion=False):
    """Camera-frame 3D point(s) (..., 3) -> pixel(s) (..., 2).

    Pinhole family: disto(X/Z) -> cam2ima (Camera_Pinhole.hpp project)
    Spherical: lon/lat atan2 mapping (Camera_Spherical.hpp:141-148)
    """
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, jnp.where(z < 0, -1e-12, 1e-12), z)
    p = jnp.stack([x / zs, y / zs], axis=-1)
    if not ignore_distortion:
        p = add_disto(kind, params, p)
    pin = cam2ima(kind, params, width, height, p)

    lon = jnp.arctan2(x, z)
    lat = jnp.arctan2(-y, jnp.hypot(x, z))
    two_pi = 2.0 * jnp.pi
    sph_cam = jnp.stack([lon / two_pi, -lat / two_pi], axis=-1)
    sph = cam2ima(kind, params, width, height, sph_cam)
    return jnp.where(kind[..., None] == SPHERICAL, sph, pin)


def bearing(kind, params, width, height, pix):
    """Pixel(s) (..., 2) -> unit bearing vector(s) (..., 3).

    Parity: IntrinsicBase::operator()(Mat2X) — pinhole: undistorted
    homogeneous ray normalized; spherical: Camera_Spherical.hpp:114-132.
    """
    uv = ima2cam(kind, params, width, height, pix)
    und = remove_disto(kind, params, uv)
    h = jnp.concatenate([und, jnp.ones_like(und[..., :1])], axis=-1)
    pin = h / jnp.linalg.norm(h, axis=-1, keepdims=True)

    two_pi = 2.0 * jnp.pi
    lon = uv[..., 0] * two_pi
    lat = -uv[..., 1] * two_pi
    sph = jnp.stack(
        [jnp.cos(lat) * jnp.sin(lon), -jnp.sin(lat), jnp.cos(lat) * jnp.cos(lon)], axis=-1
    )
    return jnp.where(kind[..., None] == SPHERICAL, sph, pin)


def residual(kind, params, width, height, Xc, observed):
    """Reprojection residual project(Xc) - observed, (..., 2).

    Parity: IntrinsicBase::residual (Camera_Intrinsics.hpp:208).
    """
    return project_cam(kind, params, width, height, Xc) - observed


def image_plane_to_camera_plane_error(kind, params, width, height, value):
    """Scale a pixel-unit threshold to the camera plane.

    Parity: imagePlane_toCameraPlaneError — pinhole: value/focal,
    spherical: value/max(w,h) (Camera_Spherical.hpp:186).
    """
    pin = value / params[..., 0]
    sph = value / jnp.maximum(width, height)
    return jnp.where(kind == SPHERICAL, sph, pin)


_bearing_jit = None
_project_cam_jit = None


def bearing_jit(*args):
    """Jitted `bearing` for host callers (pad shapes via
    utils/hostmath.padded_apply — eager calls cost ~20 one-op XLA
    programs each through the axon tunnel)."""
    global _bearing_jit
    if _bearing_jit is None:
        import jax

        _bearing_jit = jax.jit(bearing)
    return _bearing_jit(*args)


def project_cam_jit(*args):
    """Jitted `project_cam` for host callers (see bearing_jit)."""
    global _project_cam_jit
    if _project_cam_jit is None:
        import jax

        _project_cam_jit = jax.jit(project_cam)
    return _project_cam_jit(*args)


def K_matrix(params):
    """(..., 3, 3) calibration matrix for pinhole-family cameras."""
    f = params[..., 0]
    ppx = params[..., 1]
    ppy = params[..., 2]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    return jnp.stack(
        [
            jnp.stack([f, z, ppx], axis=-1),
            jnp.stack([z, f, ppy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
