"""Host-side numpy twins of small device functions + padded jit dispatch.

Through the axon TPU tunnel every EAGER jnp op is its own XLA program:
~0.4 s to compile cold (below the 1 s persistent-cache floor, so it was
never cached) and a ~26 ms round-trip warm.  A 12-view incremental run
issued 622 of them (measured round 4: 259 s of the 300 s wall-clock),
dwarfing the real device work.  Rules enforced by this module:

  * trivial per-element host math (K matrices, axis-angle conversions)
    runs in numpy — zero device traffic;
  * anything that genuinely wants the device goes through a jitted
    function on pow2-padded shapes (padded_apply) so executables are
    compiled once per size bucket and reused.

The numpy twins mirror geometry/so3.py and models/cameras.py:K_matrix
exactly (same Taylor branches); keep them in sync.
"""

import numpy as np

_EPS = 1e-8


def K_matrix_np(params):
    """(..., >=3) pinhole params -> (..., 3, 3) calibration matrix
    (numpy twin of models/cameras.py:K_matrix)."""
    params = np.asarray(params)
    f = params[..., 0]
    ppx = params[..., 1]
    ppy = params[..., 2]
    K = np.zeros(f.shape + (3, 3), params.dtype)
    K[..., 0, 0] = f
    K[..., 0, 2] = ppx
    K[..., 1, 1] = f
    K[..., 1, 2] = ppy
    K[..., 2, 2] = 1.0
    return K


def expmap_np(w):
    """Axis-angle (..., 3) -> rotation (..., 3, 3); numpy twin of
    geometry/so3.py:expmap (same Rodrigues + Taylor branches)."""
    w = np.asarray(w, np.float64)
    theta2 = np.sum(w * w, axis=-1)
    theta = np.sqrt(np.maximum(theta2, _EPS**2))
    small = theta2 < _EPS
    a = np.where(small, 1.0 - theta2 / 6.0, np.sin(theta) / theta)
    b = np.where(small, 0.5 - theta2 / 24.0,
                 (1.0 - np.cos(theta)) / np.maximum(theta2, _EPS**2))
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = np.zeros_like(wx)
    K = np.stack([
        np.stack([z, -wz, wy], axis=-1),
        np.stack([wz, z, -wx], axis=-1),
        np.stack([-wy, wx, z], axis=-1),
    ], axis=-2)
    eye = np.broadcast_to(np.eye(3), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def logmap_np(R):
    """Rotation (..., 3, 3) -> axis-angle (..., 3); numpy twin of
    geometry/so3.py:logmap (same near-0 / near-pi handling)."""
    R = np.asarray(R, np.float64)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = np.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_t)
    v = np.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1) * 0.5
    sin_t = np.sin(theta)
    small = theta < 1e-5
    near_pi = theta > np.pi - 1e-3
    scale = np.where(small, 1.0 + theta * theta / 6.0,
                     theta / np.maximum(sin_t, 1e-12))
    w_generic = v * scale[..., None]
    diag = np.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    denom = np.maximum(1.0 - cos_t, 1e-12)
    axis = np.sqrt(np.maximum((diag - cos_t[..., None]) / denom[..., None],
                              0.0))
    sign = np.where(v >= 0, 1.0, -1.0)
    w_pi = axis * sign * theta[..., None]
    return np.where(near_pi[..., None], w_pi, w_generic)


def _brown_disto_term_np(params, p):
    """Numpy twin of models/cameras.py:_brown_disto_term."""
    k1, k2, k3, t1, t2 = (params[..., 3 + i] for i in range(5))
    x, y = p[..., 0], p[..., 1]
    r2 = x * x + y * y
    k_diff = k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    t_x = t2 * (r2 + 2 * x * x) + 2 * t1 * x * y
    t_y = t1 * (r2 + 2 * y * y) + 2 * t2 * x * y
    return np.stack([x * k_diff + t_x, y * k_diff + t_y], axis=-1)


def project_cam_np(kind, params, width, height, Xc):
    """Numpy f64 twin of models/cameras.py:project_cam (all six models).

    Used for host-side metrics (scene.reprojection_residuals) where f64
    exactness matters and a device round-trip through the axon tunnel
    would cost more than the arithmetic.  Keep in sync with the jnp
    version (same distortion formulas, same spherical mapping,
    Camera_Pinhole*.hpp / Camera_Spherical.hpp:141-148).
    """
    kind = np.asarray(kind, np.int32)
    params = np.asarray(params, np.float64)
    width = np.asarray(width, np.float64)
    height = np.asarray(height, np.float64)
    Xc = np.asarray(Xc, np.float64)
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = np.where(np.abs(z) < 1e-12, np.where(z < 0, -1e-12, 1e-12), z)
    p = np.stack([x / zs, y / zs], axis=-1)
    # distortion (dense-select like the device path)
    brown = p + _brown_disto_term_np(params, p)
    k1, k2, k3, k4 = (params[..., 3 + i] for i in range(4))
    r = np.hypot(p[..., 0], p[..., 1])
    theta = np.arctan(r)
    th2 = theta * theta
    theta_dist = theta * (1 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    cdist = np.where(r > 1e-8, theta_dist / np.maximum(r, 1e-8), 1.0)
    fish = p * cdist[..., None]
    has_poly = (kind == 2) | (kind == 3) | (kind == 4)  # K1/K3/BROWN
    pd = np.where(has_poly[..., None], brown, p)
    pd = np.where((kind == 5)[..., None], fish, pd)  # FISHEYE
    f = params[..., 0:1]
    pp = params[..., 1:3]
    pin = f * pd + pp
    # spherical (kind 7)
    lon = np.arctan2(x, z)
    lat = np.arctan2(-y, np.hypot(x, z))
    two_pi = 2.0 * np.pi
    size = np.maximum(width, height)[..., None]
    sph = (np.stack([lon / two_pi, -lat / two_pi], axis=-1) * size
           + np.stack([width, height], axis=-1) * 0.5)
    return np.where((kind == 7)[..., None], sph, pin)


def pow2(n, lo=64):
    k = lo
    while k < n:
        k *= 2
    return k


def padded_apply(jit_fn, arrays, lo=64, out_slice=True):
    """Call `jit_fn(*arrays)` with every array pow2-padded along axis 0
    (edge-replicated so padded rows stay numerically tame), slicing the
    result back to the true length.  One compiled executable per pow2
    bucket instead of one eager program per call."""
    import jax.numpy as jnp

    arrays = [np.asarray(a) for a in arrays]
    n = len(arrays[0])
    if n == 0:
        raise ValueError("padded_apply on empty input")
    k = pow2(n, lo)

    def pad(a):
        if k == len(a):
            return a
        fill = a[-1:] if len(a) else np.zeros((1,) + a.shape[1:], a.dtype)
        return np.concatenate([a, np.repeat(fill, k - len(a), axis=0)])

    out = jit_fn(*[jnp.asarray(pad(a)) for a in arrays])
    out = np.asarray(out)
    return out[:n] if out_slice else out
