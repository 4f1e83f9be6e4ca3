"""Stellar engine end-to-end test (stellar_SfM_test.cpp analogue)."""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.sfm.pipeline_stellar import StellarConfig, stellar_sfm
from openmvg_tpu.sfm.scene import rmse
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_incremental import scene_and_data


def test_stellar_sfm():
    s = ring_scene(n_views=8, n_points=120, seed=0)
    sc, feats, matches = scene_and_data(s)
    cfg = StellarConfig(ransac_samples=512, ba_iterations=15)
    stellar_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert sc.n_landmarks > 80
    assert rmse(sc) < 0.3

    est = jnp.asarray(sc.pose_C[None])
    gt = jnp.asarray(s.C[None])
    sim = find_rts(est, gt)
    aligned = np.asarray(sim.apply(est))[0]
    ate = np.sqrt(np.mean(np.sum((aligned - s.C) ** 2, axis=1)))
    assert ate < 0.02, ate
