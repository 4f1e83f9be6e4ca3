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
