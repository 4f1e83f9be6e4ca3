"""GPS-prior registration of a reconstruction.

Reference parity: sfm_data_BA_ceres.cpp:181-239 — before BA with GPS
priors, fit a robust (LMedS) Similarity between current pose centers and
their priors and pre-transform the scene; and
Geodesy/registration_to_exif_gps_position.cpp — rigid+scale registration
of an existing reconstruction onto EXIF GPS positions (ECEF).
"""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.ops import ransac


def fit_similarity_lmeds(src, dst, key=None, n_samples=256):
    """Robust similarity src->dst via LMedS over 3-point minimal fits."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    n = len(src)
    if n < 3:
        raise ValueError("need >= 3 correspondences")
    if n == 3:
        return find_rts(jnp.asarray(src[None]), jnp.asarray(dst[None]))
    key = jax.random.PRNGKey(0) if key is None else key

    def fit(sub):
        a, b = sub
        sim = find_rts(a[None], b[None])
        model = jnp.concatenate([
            sim.scale.reshape(-1), sim.R.reshape(-1), sim.t.reshape(-1)])
        return model[None], jnp.ones((1,), bool)

    def err(m, data):
        a, b = data
        s = m[0]
        R = m[1:10].reshape(3, 3)
        t = m[10:13]
        pred = s * a @ R.T + t
        return jnp.sum((pred - b) ** 2, axis=-1)

    model, _ = ransac.lmeds(key, fit, err, (jnp.asarray(src), jnp.asarray(dst)),
                            jnp.ones(n, bool), 3, n_samples=n_samples)
    from openmvg_tpu.geometry.similarity import Similarity

    return Similarity(scale=model[0], R=model[1:10].reshape(3, 3),
                      t=model[10:13])


def apply_similarity_to_scene(scene, sim):
    """Transform poses + structure in place (sfm_data_transform.cpp
    ApplySimilarity): C' = s R C + t, R_pose' = R_pose R^T, X' = s R X + t."""
    s = float(np.asarray(sim.scale))
    R = np.asarray(sim.R)
    t = np.asarray(sim.t)
    valid = scene.pose_valid
    scene.pose_C[valid] = s * scene.pose_C[valid] @ R.T + t
    scene.pose_R[valid] = np.einsum("nij,kj->nik", scene.pose_R[valid], R)
    if len(scene.X):
        scene.X[:] = s * scene.X @ R.T + t
    return scene


def register_to_gps(scene, use_priors_from_scene=True, positions=None):
    """Register the reconstruction onto GPS positions (ECEF / local)."""
    if positions is None:
        if scene.prior_center is None:
            raise ValueError("scene has no GPS priors")
        mask = np.any(scene.prior_center_weight > 0, axis=1)
        views = np.nonzero(mask)[0]
        positions = scene.prior_center[views]
    else:
        views = np.arange(len(positions))
    pids = scene.view_pose[views]
    ok = (pids >= 0) & scene.pose_valid[np.clip(pids, 0, max(scene.n_poses - 1, 0))]
    src = scene.pose_C[pids[ok]]
    dst = np.asarray(positions)[ok]
    sim = fit_similarity_lmeds(src, dst)
    return apply_similarity_to_scene(scene, sim), sim
