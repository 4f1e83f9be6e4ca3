"""Scene-level robust track triangulation.

Reference parity: sfm/sfm_data_triangulation.cpp (blind + robust N-view
triangulation engines, :37-71): for each candidate track, triangulate from
all posed observations, keep if cheirality holds everywhere, reprojection
error is below threshold in every view and the maximum pairwise ray angle
exceeds a minimum.

Batched: tracks are padded to (T, K) observation slots with masks; one
vmapped N-view eigensolve + residual check per batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.ops.triangulation import triangulate_nview
from openmvg_tpu.sfm.scene import Scene


def _next_pow2(n, lo=8):
    k = lo
    while k < n:
        k *= 2
    return k


@jax.jit
def _triangulate_batch(Rs, ts, bearings, weights, kind, params, wi, hi, x_obs,
                       min_angle_cos, max_resid_sq):
    """(T, K, ...) padded track observations -> (X (T,3), ok (T,))."""
    X, cheir = triangulate_nview(Rs, ts, bearings, weights=weights)
    # residual check in every observing view
    Xc = jnp.einsum("tkij,tj->tki", Rs, X) + ts
    proj = cm.project_cam(kind, params, wi, hi, Xc)
    d = proj - x_obs
    res_ok = jnp.all((jnp.sum(d * d, -1) <= max_resid_sq) | (weights <= 0), axis=-1)
    # max pairwise angle between world rays
    rays = jnp.einsum("tkji,tkj->tki", Rs, bearings)
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-30)
    G = jnp.einsum("tki,tli->tkl", rays, rays)
    pair_ok = (weights[:, :, None] > 0) & (weights[:, None, :] > 0)
    G = jnp.where(pair_ok, G, 1.0)
    angle_ok = jnp.min(G, axis=(-2, -1)) < min_angle_cos
    n_obs = jnp.sum(weights > 0, axis=-1)
    return X, cheir & res_ok & angle_ok & (n_obs >= 2)


def triangulate_tracks(scene: Scene, obs_view, obs_x, track_of_obs, n_tracks,
                       min_angle_deg=2.0, max_residual_px=4.0, max_slots=16):
    """Triangulate `n_tracks` tracks given their posed observations.

    obs_view (M,), obs_x (M, 2), track_of_obs (M,) in [0, n_tracks).
    Only observations whose view has a valid pose should be passed.
    Returns (X (n_tracks, 3), ok (n_tracks,)) numpy arrays.
    """
    if n_tracks == 0 or len(obs_view) == 0:
        return np.zeros((0, 3)), np.zeros(0, bool)
    order = np.argsort(track_of_obs, kind="stable")
    tr_s = track_of_obs[order]
    slot = np.arange(len(tr_s)) - np.searchsorted(tr_s, tr_s)
    keep = slot < max_slots
    tr_s, slot = tr_s[keep], slot[keep]
    ov = obs_view[order][keep]
    ox = obs_x[order][keep]

    K = _next_pow2(int(slot.max()) + 1 if len(slot) else 2, lo=2)
    # pow2-pad the track count too: T rode raw through the jit boundary,
    # recompiling _triangulate_batch nearly every engine round (~30-40 s
    # each through the axon tunnel); padded tracks have ws=0 -> ok=False
    T = _next_pow2(max(n_tracks, 1), lo=256)
    Rs = np.tile(np.eye(3), (T, K, 1, 1))
    ts = np.zeros((T, K, 3))
    bs = np.zeros((T, K, 3))
    bs[..., 2] = 1.0
    ws = np.zeros((T, K))
    xs = np.zeros((T, K, 2))
    kinds = np.zeros((T, K), np.int32)
    prs = np.zeros((T, K, cm.MAX_PARAMS))
    wis = np.ones((T, K))
    his = np.ones((T, K))

    pid = scene.view_pose[ov]
    iid = scene.view_intrinsic[ov]
    cams = scene.cameras
    kk = np.asarray(cams.kind)[iid]
    pp = np.asarray(cams.params)[iid]
    ww = np.asarray(cams.width)[iid]
    hh = np.asarray(cams.height)[iid]
    from openmvg_tpu.utils import hostmath

    b = hostmath.padded_apply(cm.bearing_jit, (kk, pp, ww, hh, ox))
    R = scene.pose_R[pid]
    t = -np.einsum("nij,nj->ni", R, scene.pose_C[pid])

    Rs[tr_s, slot] = R
    ts[tr_s, slot] = t
    bs[tr_s, slot] = b
    ws[tr_s, slot] = 1.0
    xs[tr_s, slot] = ox
    kinds[tr_s, slot] = kk
    prs[tr_s, slot] = pp
    wis[tr_s, slot] = ww
    his[tr_s, slot] = hh

    X, ok = _triangulate_batch(
        jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(bs), jnp.asarray(ws),
        jnp.asarray(kinds), jnp.asarray(prs), jnp.asarray(wis),
        jnp.asarray(his), jnp.asarray(xs),
        float(np.cos(np.radians(min_angle_deg))), max_residual_px**2)
    return np.asarray(X)[:n_tracks], np.asarray(ok)[:n_tracks]
