"""Bundle adjustment tests — the sfm_data_BA_test.cpp analogue:
perturb a perfect synthetic scene, require BA to recover sub-pixel RMSE."""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm import ba
from openmvg_tpu.sfm.scene import Scene, rmse
from openmvg_tpu.utils.synthetic import ring_scene


def scene_from_ring(s, noise_X=0.0, noise_pose=0.0, noise_px=0.0, seed=0,
                    kind=cm.PINHOLE):
    rng = np.random.default_rng(seed)
    sc = Scene()
    V, P = s.n_views, s.n_points
    sc.view_filename = [f"v{i}.jpg" for i in range(V)]
    sc.view_intrinsic = np.zeros(V, np.int32)
    sc.view_pose = np.arange(V, dtype=np.int32)
    sc.view_wh = np.tile([[1000, 1000]], (V, 1)).astype(np.int32)
    sc.cameras = cm.make_pinhole(1000, 1000, s.K[0, 0, 0], s.K[0, 0, 2],
                                 s.K[0, 1, 2], kind=kind)
    sc.pose_valid = np.ones(V, bool)
    sc.pose_R = s.R.copy()
    sc.pose_C = s.C.copy()
    if noise_pose > 0:
        sc.pose_C = sc.pose_C + rng.normal(scale=noise_pose, size=sc.pose_C.shape)
    sc.X = s.X + (rng.normal(scale=noise_X, size=s.X.shape) if noise_X else 0.0)
    sc.X_valid = np.ones(P, bool)
    ol, ov, ox = [], [], []
    for v in range(V):
        for pt in range(P):
            if s.visible[v, pt]:
                ol.append(pt)
                ov.append(v)
                ox.append(s.x[v, pt])
    sc.obs_landmark = np.asarray(ol, np.int32)
    sc.obs_view = np.asarray(ov, np.int32)
    sc.obs_x = np.asarray(ox) + (rng.normal(scale=noise_px, size=(len(ol), 2))
                                 if noise_px else 0.0)
    sc.obs_feat = np.asarray(ol, np.int32)  # feature id == point row per view
    sc.obs_valid = np.ones(len(ol), bool)
    return sc


def test_ba_recovers_noisy_structure():
    s = ring_scene(n_views=8, n_points=80, seed=0)
    sc = scene_from_ring(s, noise_X=0.02, seed=1)
    before = rmse(sc)
    assert before > 1.0
    prob, maps = ba.problem_from_scene(sc)
    cfg = ba.BAConfig(max_iterations=20)
    prob, cost, n_acc = ba.adjust(prob, cfg)
    ba.scene_from_problem(sc, prob, maps)
    after = rmse(sc)
    assert after < 0.01, (before, after)
    assert n_acc > 0


def test_ba_poses_and_structure():
    s = ring_scene(n_views=8, n_points=80, seed=2)
    sc = scene_from_ring(s, noise_X=0.01, noise_pose=0.02, seed=3)
    before = rmse(sc)
    prob, maps = ba.problem_from_scene(sc)
    prob, cost, _ = ba.adjust(prob, ba.BAConfig(max_iterations=30))
    ba.scene_from_problem(sc, prob, maps)
    after = rmse(sc)
    assert after < 0.01, (before, after)


def test_ba_holds_fixed_when_masked():
    s = ring_scene(n_views=6, n_points=50, seed=4)
    sc = scene_from_ring(s, noise_X=0.01, seed=5)
    X0 = sc.X.copy()
    R0 = sc.pose_R.copy()
    # fp64 explicitly: this asserts BIT-level fixing through the
    # rotvec<->R roundtrip, which f32 (the honest TPU default) perturbs
    # at ~1e-7; masked-update semantics themselves are dtype-free
    prob, maps = ba.problem_from_scene(
        sc, refine_rotation=False, refine_translation=False,
        refine_structure=True, dtype=jnp.float64)
    prob, _, _ = ba.adjust(prob, ba.BAConfig(max_iterations=15))
    ba.scene_from_problem(sc, prob, maps)
    np.testing.assert_allclose(sc.pose_R, R0, atol=1e-12)  # poses untouched
    assert np.abs(sc.X - X0).max() > 1e-4  # structure moved
    assert rmse(sc) < 0.01


def test_ba_with_intrinsics_refinement():
    s = ring_scene(n_views=10, n_points=120, seed=6)
    sc = scene_from_ring(s, seed=7)
    # corrupt the focal by 2%
    p = np.asarray(sc.cameras.params).copy()
    p[0, 0] *= 1.02
    sc.cameras = sc.cameras._replace(params=p)
    before = rmse(sc)
    assert before > 1.0
    prob, maps = ba.problem_from_scene(sc, refine_intrinsics=ba.ADJUST_ALL)
    prob, _, _ = ba.adjust(prob, ba.BAConfig(max_iterations=30))
    ba.scene_from_problem(sc, prob, maps)
    after = rmse(sc)
    assert after < 0.05, (before, after)
    # focal recovered within 0.2%
    assert abs(float(sc.cameras.params[0, 0]) - s.K[0, 0, 0]) / s.K[0, 0, 0] < 0.002


def test_ba_huber_rejects_outliers():
    s = ring_scene(n_views=8, n_points=80, seed=8)
    sc = scene_from_ring(s, noise_X=0.01, seed=9)
    # corrupt 5% of observations massively
    rng = np.random.default_rng(10)
    n = len(sc.obs_x)
    bad = rng.choice(n, n // 20, replace=False)
    sc.obs_x[bad] += rng.uniform(50, 200, size=(len(bad), 2))
    prob, maps = ba.problem_from_scene(sc)
    prob, _, _ = ba.adjust(prob, ba.BAConfig(max_iterations=30))
    ba.scene_from_problem(sc, prob, maps)
    r, _ = __import__("openmvg_tpu.sfm.scene", fromlist=["reprojection_residuals"]).reprojection_residuals(sc)
    errs = np.linalg.norm(r, axis=1)
    good = np.setdiff1d(np.arange(n), bad)
    # inlier residuals small despite outliers present (huber_a=16 parity
    # downweights but does not fully reject; median stays sub-pixel)
    assert np.median(errs[good]) < 0.5
    # and clearly better than a non-robust run on the same data
    sc2 = scene_from_ring(s, noise_X=0.01, seed=9)
    sc2.obs_x[bad] = sc.obs_x[bad]
    prob2, maps2 = ba.problem_from_scene(sc2)
    prob2, _, _ = ba.adjust(prob2, ba.BAConfig(max_iterations=30, use_huber=False))
    ba.scene_from_problem(sc2, prob2, maps2)
    r2, _ = __import__("openmvg_tpu.sfm.scene", fromlist=["reprojection_residuals"]).reprojection_residuals(sc2)
    errs2 = np.linalg.norm(r2, axis=1)
    assert np.median(errs[good]) < np.median(errs2[good])


def test_fast_pinhole_jacobians_match_generic():
    """The closed-form PINHOLE residual/Jacobian path (ba.jacobians
    cam_fast=True) must reproduce the vmapped-jacfwd path."""
    import jax.numpy as jnp
    import numpy as np

    from openmvg_tpu.sfm import ba
    from openmvg_tpu.utils.synthetic import big_ba_problem

    prob, O = big_ba_problem(n_poses=12, n_points=500, obs_per_point=6,
                             seed=7, noise_px=1.0, noise_X=0.05)
    cfg = ba.BAConfig()
    r0, Jp0, Ji0, Jx0 = ba.jacobians(prob, cfg, cam_fast=False)
    r1, Jp1, Ji1, Jx1 = ba.jacobians(prob, cfg, cam_fast=True)
    assert np.allclose(r0, r1, atol=1e-3)
    assert np.allclose(Jx0, Jx1, rtol=1e-4, atol=1e-4)
    assert np.allclose(Ji0, Ji1, rtol=1e-4, atol=1e-4)
    assert np.allclose(Jp0, Jp1, rtol=1e-4, atol=2e-3), \
        np.abs(np.asarray(Jp0) - np.asarray(Jp1)).max()
    c0 = float(ba.robust_cost(prob, cfg, cam_fast=False))
    c1 = float(ba.robust_cost(prob, cfg, cam_fast=True))
    assert abs(c0 - c1) <= 1e-4 * max(abs(c0), 1.0)
