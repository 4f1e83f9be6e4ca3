"""Global SfM engine end-to-end (global_SfM_test.cpp analogue): method
matrix over rotation x translation averaging on a synthetic scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.sfm import pipeline_global as G
from openmvg_tpu.sfm.scene import rmse
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_incremental import scene_and_data

pytestmark = pytest.mark.slow  # full global-engine e2e matrix


@pytest.mark.parametrize("rot,trans", [
    (G.ROTATION_AVERAGING_L2, G.TRANSLATION_AVERAGING_SOFTL1),
    (G.ROTATION_AVERAGING_L1, G.TRANSLATION_AVERAGING_SOFTL1),
    (G.ROTATION_AVERAGING_L2, G.TRANSLATION_AVERAGING_L2_CHORDAL),
    (G.ROTATION_AVERAGING_L1, G.TRANSLATION_AVERAGING_L1),
    (G.ROTATION_AVERAGING_L2, G.TRANSLATION_AVERAGING_L1),
])
def test_global_sfm(rot, trans):
    s = ring_scene(n_views=8, n_points=120, seed=0)
    sc, feats, matches = scene_and_data(s)
    cfg = G.GlobalConfig(rotation_averaging=rot, translation_averaging=trans,
                         ransac_samples=512, ba_iterations=15)
    G.global_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert sc.n_landmarks > 80
    assert rmse(sc) < 0.3

    est = jnp.asarray(sc.pose_C[None])
    gt = jnp.asarray(s.C[None])
    sim = find_rts(est, gt)
    aligned = np.asarray(sim.apply(est))[0]
    ate = np.sqrt(np.mean(np.sum((aligned - s.C) ** 2, axis=1)))
    assert ate < 0.02, ate
