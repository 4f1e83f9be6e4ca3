"""End-to-end incremental SfM on a synthetic scene — parity with
sequential_SfM_test.cpp: run the whole engine headlessly, assert all poses
recovered, landmark count, RMSE < 0.5 px, and GT trajectory via 7DoF
alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.pipeline_incremental import IncrementalConfig, incremental_sfm
from openmvg_tpu.sfm.scene import Scene, rmse
from openmvg_tpu.utils.synthetic import ring_scene


def scene_and_data(s, noise_px=0.0, seed=0):
    rng = np.random.default_rng(seed)
    V = s.n_views
    sc = Scene()
    sc.view_filename = [f"v{i}.jpg" for i in range(V)]
    sc.view_intrinsic = np.zeros(V, np.int32)
    sc.view_pose = np.arange(V, dtype=np.int32)
    sc.view_wh = np.tile([[1000, 1000]], (V, 1)).astype(np.int32)
    sc.cameras = cm.make_pinhole(1000, 1000, s.K[0, 0, 0], s.K[0, 0, 2], s.K[0, 1, 2])
    sc.pose_valid = np.zeros(V, bool)
    sc.pose_R = np.tile(np.eye(3), (V, 1, 1))
    sc.pose_C = np.zeros((V, 3))

    feats = []
    for v in range(V):
        x = s.x[v] + (rng.normal(scale=noise_px, size=s.x[v].shape) if noise_px else 0)
        feats.append(x)
    # contiguous pair matches on co-visible points (feature id == point id)
    matches = {}
    for i in range(V):
        for j in range(i + 1, min(i + 4, V)):
            vis = np.nonzero(s.visible[i] & s.visible[j])[0]
            matches[(i, j)] = np.stack([vis, vis], axis=1)
    return sc, feats, matches


def test_incremental_pipeline_exact():
    s = ring_scene(n_views=8, n_points=120, seed=0)
    sc, feats, matches = scene_and_data(s)
    cfg = IncrementalConfig(ransac_samples=512, resection_samples=512,
                            init_pair_samples=512,
                            min_init_inliers=40, ba_iterations=15)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert sc.n_landmarks > 100
    assert rmse(sc) < 0.3

    # 7DoF alignment to GT (the evalQuality protocol)
    est = jnp.asarray(sc.pose_C[None])
    gt = jnp.asarray(s.C[None])
    sim = find_rts(est, gt)
    aligned = np.asarray(sim.apply(est))[0]
    ate = np.sqrt(np.mean(np.sum((aligned - s.C) ** 2, axis=1)))
    assert ate < 0.01 * 2.0  # well under 1% of the ring radius


@pytest.mark.slow
def test_incremental_pipeline_noisy():
    s = ring_scene(n_views=8, n_points=120, seed=1)
    sc, feats, matches = scene_and_data(s, noise_px=0.4, seed=2)
    cfg = IncrementalConfig(ransac_samples=512, resection_samples=512,
                            init_pair_samples=512,
                            min_init_inliers=40, ba_iterations=15)
    incremental_sfm(sc, feats, matches, cfg, seed=1)
    assert int(sc.pose_valid.sum()) == s.n_views
    # injected noise is 0.4 px/axis -> residual-norm floor ~0.57 px
    assert rmse(sc) < 0.7


@pytest.mark.slow
def test_incremental_24_views_noisy():
    """Scale check: 24 cameras, 400 points, 0.3px noise — all poses
    recovered, sub-pixel rmse."""
    s = ring_scene(n_views=24, n_points=400, seed=0)
    sc, feats, matches = scene_and_data(s, noise_px=0.3)
    cfg = IncrementalConfig(init_pair_samples=512, ransac_samples=512, resection_samples=512,
                            min_init_inliers=40, ba_iterations=10)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == 24
    assert sc.n_landmarks > 350
    assert rmse(sc) < 0.6


@pytest.mark.slow
def test_incremental_v2_schedule():
    """INCREMENTALV2 (sequential_SfM2.cpp:84-203): the track_inlier_ratio
    {0.2, 0.0} AddingMissingView schedule reconstructs the full ring with
    the same accuracy as V1."""
    s = ring_scene(n_views=8, n_points=120, seed=0)
    sc, feats, matches = scene_and_data(s)
    cfg = IncrementalConfig(ransac_samples=512, resection_samples=512,
                            init_pair_samples=512,
                            min_init_inliers=40, ba_iterations=15,
                            engine_version=2)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert sc.n_landmarks > 100
    assert rmse(sc) < 0.3
