"""End-to-end spherical (equirectangular) SfM — the reference handles
Intrinsic_Spherical scenes through the same engines via the angular-error
8-pt path (sfm_robust_model_estimation.cpp:29-120)."""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.pipeline_incremental import (IncrementalConfig,
                                                  incremental_sfm)
from openmvg_tpu.sfm.scene import Scene
from openmvg_tpu.utils.synthetic import ring_scene
import pytest

pytestmark = pytest.mark.slow  # spherical engine e2e


def _spherical_scene_and_data(n_views=6, n_points=150, seed=0):
    s = ring_scene(n_views=n_views, n_points=n_points, seed=seed)
    W, H = 2048, 1024
    sc = Scene()
    sc.view_filename = [f"v{i}.jpg" for i in range(n_views)]
    sc.view_intrinsic = np.zeros(n_views, np.int32)
    sc.view_pose = np.arange(n_views, dtype=np.int32)
    sc.view_wh = np.tile([[W, H]], (n_views, 1)).astype(np.int32)
    params = np.zeros((1, cm.MAX_PARAMS))
    sc.cameras = cm.Cameras(kind=np.array([cm.SPHERICAL], np.int32),
                            width=np.array([float(W)]),
                            height=np.array([float(H)]), params=params)
    sc.pose_valid = np.zeros(n_views, bool)
    sc.pose_R = np.tile(np.eye(3), (n_views, 1, 1))
    sc.pose_C = np.zeros((n_views, 3))

    kind = jnp.asarray(cm.SPHERICAL)
    prm = jnp.asarray(params[0])
    feats, matches = [], {}
    Xc = np.einsum("vij,pj->vpi", s.R, s.X) + s.t[:, None, :]
    for v in range(n_views):
        px = np.asarray(jnp.stack([
            cm.project_cam(kind, prm, float(W), float(H), jnp.asarray(xc))
            for xc in Xc[v]]))
        feats.append(px)
    for i in range(n_views):
        for j in range(i + 1, min(i + 3, n_views)):
            vis = np.arange(n_points)  # spherical sees everything
            matches[(i, j)] = np.stack([vis, vis], axis=1)
    return s, sc, feats, matches


def test_spherical_incremental_sfm():
    s, sc, feats, matches = _spherical_scene_and_data()
    cfg = IncrementalConfig(init_pair_samples=512, ransac_samples=512, resection_samples=512,
                            min_init_inliers=40, ba_iterations=15)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert sc.n_landmarks > 100
    est = jnp.asarray(sc.pose_C[None])
    gt = jnp.asarray(s.C[None])
    sim = find_rts(est, gt)
    aligned = np.asarray(sim.apply(est))[0]
    err = np.linalg.norm(aligned - s.C, axis=1)
    assert err.max() < 0.05 * 2.0  # within 5% of the ring radius


def test_spherical_global_sfm():
    from openmvg_tpu.sfm import pipeline_global as G

    s, sc, feats, matches = _spherical_scene_and_data(seed=4)
    cfg = G.GlobalConfig(ransac_samples=512, ba_iterations=15)
    G.global_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    est = jnp.asarray(sc.pose_C[None])
    gt = jnp.asarray(s.C[None])
    sim = find_rts(est, gt)
    aligned = np.asarray(sim.apply(est))[0]
    assert np.linalg.norm(aligned - s.C, axis=1).max() < 0.1 * 2.0
