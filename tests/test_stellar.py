"""Stellar engine end-to-end test (stellar_SfM_test.cpp analogue)."""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry.similarity import find_rts
from openmvg_tpu.sfm.pipeline_stellar import StellarConfig, stellar_sfm
from openmvg_tpu.sfm.scene import rmse
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_incremental import scene_and_data
import pytest

pytestmark = pytest.mark.slow  # stellar engine e2e


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


def test_stellar_sfm_star_simplification():
    """STAR_X graph simplification path (sfm_stellar_engine.cpp:267-308)."""
    s = ring_scene(n_views=8, n_points=120, seed=1)
    sc, feats, matches = scene_and_data(s)
    cfg = StellarConfig(ransac_samples=512, ba_iterations=15,
                        graph_simplification="STAR_X",
                        graph_simplification_value=4)
    stellar_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert rmse(sc) < 0.3


def test_stellar_sfm_noisy():
    """stellar_SfM_test.cpp tolerance analogue with pixel noise."""
    s = ring_scene(n_views=8, n_points=150, seed=2)
    sc, feats, matches = scene_and_data(s, noise_px=0.4, seed=5)
    cfg = StellarConfig(ransac_samples=512, ba_iterations=15)
    stellar_sfm(sc, feats, matches, cfg, seed=0)
    assert int(sc.pose_valid.sum()) == s.n_views
    assert rmse(sc) < 0.7


def test_pod_scale_solver_recovers_ratios():
    """The L1 log-scale solve reproduces known per-edge scales from
    noisy 2-uplet depth ratios."""
    import numpy as np
    from openmvg_tpu.sfm.pipeline_stellar import _pod_scales_l1, StellarConfig

    rng = np.random.default_rng(0)
    edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
    true = {e: float(s) for e, s in zip(edges, [1.0, 0.5, 2.0, 0.25])}
    # shared synthetic tracks: depth maps consistent with the true scales
    depth_maps = {}
    base = {t: rng.uniform(1, 5) for t in range(40)}
    for e in edges:
        noise = rng.normal(1.0, 0.01, size=40)
        depth_maps[e] = {t: base[t] * true[e] * noise[t] for t in base}
    got = _pod_scales_l1(depth_maps, edges, StellarConfig())
    # scales are defined up to one global factor (normalized max=1)
    f = true[(0, 3)] / got[(0, 3)]
    for e in edges:
        assert abs(got[e] * f - true[e]) / true[e] < 0.05, (e, got)
