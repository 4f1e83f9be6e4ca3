"""Scene snapshot round-trip + incremental initializer options."""

import numpy as np
import pytest

from openmvg_tpu.io.snapshot import load_snapshot, save_snapshot
from openmvg_tpu.sfm.pipeline_incremental import IncrementalConfig, incremental_sfm
from openmvg_tpu.sfm.scene import rmse
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_incremental import scene_and_data


def test_snapshot_roundtrip(tmp_path):
    from tests.test_io_tracks import make_scene

    sc = make_scene()
    sc.prior_center = np.random.default_rng(0).normal(size=(3, 3))
    sc.prior_center_weight = np.ones((3, 3))
    p = str(tmp_path / "snap.npz")
    save_snapshot(sc, p)
    s2 = load_snapshot(p)
    assert s2.root_path == sc.root_path
    assert s2.view_filename == sc.view_filename
    np.testing.assert_allclose(s2.pose_R, sc.pose_R)
    np.testing.assert_allclose(s2.X, sc.X)
    np.testing.assert_array_equal(s2.obs_valid, sc.obs_valid)
    np.testing.assert_allclose(s2.prior_center, sc.prior_center)
    np.testing.assert_allclose(s2.cameras.params, sc.cameras.params)


@pytest.mark.slow
def test_incremental_max_pair_initializer():
    s = ring_scene(n_views=6, n_points=100, seed=3)
    sc, feats, matches = scene_and_data(s)
    cfg = IncrementalConfig(init_pair_samples=512, initializer="MAX_PAIR", ransac_samples=512,
                            resection_samples=512, min_init_inliers=40,
                            ba_iterations=12)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert rmse(sc) < 0.3


@pytest.mark.slow
def test_incremental_existing_poses_initializer():
    s = ring_scene(n_views=6, n_points=100, seed=4)
    sc, feats, matches = scene_and_data(s)
    # seed three ground-truth poses
    for v in range(3):
        sc.pose_valid[v] = True
        sc.pose_R[v] = s.R[v]
        sc.pose_C[v] = s.C[v]
    cfg = IncrementalConfig(init_pair_samples=512, initializer="EXISTING_POSES", ransac_samples=512,
                            resection_samples=512, ba_iterations=12)
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert rmse(sc) < 0.3


def test_per_round_dumps(tmp_path):
    """dump_dir writes per-round PLYs + a resumable snapshot
    (sequential_SfM.cpp:200-203 analogue)."""
    import os

    from openmvg_tpu.io.snapshot import load_snapshot
    from openmvg_tpu.sfm.pipeline_incremental import (IncrementalConfig,
                                                      incremental_sfm)
    from openmvg_tpu.utils.synthetic import ring_scene
    from tests.test_incremental import scene_and_data

    s = ring_scene(n_views=6, n_points=60, seed=0)
    sc, feats, matches = scene_and_data(s)
    cfg = IncrementalConfig(init_pair_samples=512, ransac_samples=256, resection_samples=256,
                            min_init_inliers=30, ba_iterations=8,
                            dump_dir=str(tmp_path / "rounds"))
    incremental_sfm(sc, feats, matches, cfg, seed=0)
    plys = [f for f in os.listdir(str(tmp_path / "rounds"))
            if f.endswith(".ply")]
    assert len(plys) >= 1
    snap = load_snapshot(str(tmp_path / "rounds" / "latest_snapshot.npz"))
    assert snap.n_landmarks > 0 and int(snap.pose_valid.sum()) >= 2
