"""Tests: GPS priors in BA, control points, GPS registration, binary scene
codec, reports, Hamming matching, preemptive subset."""

import numpy as np

from openmvg_tpu.sfm import ba
from openmvg_tpu.sfm.scene import rmse
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_ba import scene_from_ring


def test_gps_priors_pull_centers():
    import jax.numpy as jnp

    s = ring_scene(n_views=6, n_points=60, seed=0)
    sc = scene_from_ring(s, noise_pose=0.05, seed=1)
    # priors at the true centers with strong weight
    sc.prior_center = s.C.copy()
    sc.prior_center_weight = np.full((s.n_views, 3), 100.0)
    prob, maps = ba.problem_from_scene(sc, use_gps_priors=True)
    prob, _, _ = ba.adjust(prob, ba.BAConfig(max_iterations=25))
    ba.scene_from_problem(sc, prob, maps)
    # centers recovered to the GT (gauge fixed by the priors)
    err = np.linalg.norm(sc.pose_C - s.C, axis=1)
    assert err.max() < 5e-3, err
    assert rmse(sc) < 0.05


def test_control_points_stay_fixed():
    s = ring_scene(n_views=6, n_points=60, seed=2)
    sc = scene_from_ring(s, noise_X=0.02, seed=3)
    # control points: 3 exact landmarks with observations
    cp_idx = [0, 5, 10]
    sc.cp_X = s.X[cp_idx].copy()
    ol, ov, ox = [], [], []
    for ci, l in enumerate(cp_idx):
        for v in range(s.n_views):
            if s.visible[v, l]:
                ol.append(ci)
                ov.append(v)
                ox.append(s.x[v, l])
    sc.cp_obs_landmark = np.asarray(ol, np.int32)
    sc.cp_obs_view = np.asarray(ov, np.int32)
    sc.cp_obs_x = np.asarray(ox)
    sc.cp_obs_feat = np.zeros(len(ol), np.int32)
    prob, maps = ba.problem_from_scene(sc, use_control_points=True)
    prob, _, _ = ba.adjust(prob, ba.BAConfig(max_iterations=20))
    ba.scene_from_problem(sc, prob, maps)
    np.testing.assert_allclose(sc.cp_X, s.X[cp_idx])  # GCPs untouched
    assert rmse(sc) < 0.05


def test_gps_registration():
    from openmvg_tpu.sfm.gps_registration import (apply_similarity_to_scene,
                                                  fit_similarity_lmeds,
                                                  register_to_gps)

    s = ring_scene(n_views=8, n_points=40, seed=4)
    sc = scene_from_ring(s, seed=5)
    # scramble the scene by a known similarity
    from openmvg_tpu.geometry.similarity import Similarity
    import jax.numpy as jnp

    R = np.asarray(__import__("openmvg_tpu.geometry.so3", fromlist=["expmap"])
                   .expmap(jnp.asarray([0.2, -0.1, 0.3])))
    sim = Similarity(scale=jnp.asarray(2.5), R=jnp.asarray(R),
                     t=jnp.asarray([1.0, -2.0, 0.5]))
    apply_similarity_to_scene(sc, sim)
    # register back onto GT centers via priors
    sc.prior_center = s.C.copy()
    sc.prior_center_weight = np.ones((s.n_views, 3))
    register_to_gps(sc)
    np.testing.assert_allclose(sc.pose_C, s.C, atol=1e-6)
    assert rmse(sc) < 1e-6


def test_bin_roundtrip(tmp_path):
    from openmvg_tpu.io.sfm_data import load_sfm_data, save_sfm_data
    from tests.test_io_tracks import make_scene

    sc = make_scene()
    p = str(tmp_path / "sfm_data.bin")
    save_sfm_data(sc, p)
    s2 = load_sfm_data(p)
    assert s2.root_path == sc.root_path
    assert s2.view_filename == sc.view_filename
    np.testing.assert_array_equal(s2.cameras.kind, sc.cameras.kind)
    np.testing.assert_allclose(s2.cameras.params, sc.cameras.params)
    np.testing.assert_allclose(s2.pose_R[sc.pose_valid],
                               sc.pose_R[sc.pose_valid])
    np.testing.assert_array_equal(s2.X_valid, sc.X_valid)
    np.testing.assert_allclose(s2.X[s2.X_valid], sc.X[sc.X_valid])
    assert s2.n_observations == sc.n_observations


def test_report_and_svg(tmp_path):
    from openmvg_tpu.utils.report import (generate_sfm_report, svg_features,
                                          svg_matches)

    s = ring_scene(n_views=4, n_points=30, seed=6)
    sc = scene_from_ring(s, seed=7)
    out = str(tmp_path / "report.html")
    generate_sfm_report(sc, out)
    txt = open(out).read()
    assert "estimated poses" in txt and "svg" in txt
    svg_features((100, 100), np.array([[10, 10, 2, 0], [50, 60, 3, 1]]),
                 str(tmp_path / "f.svg"))
    svg_matches((100, 100), (100, 100), np.array([[10.0, 10]]),
                np.array([[20.0, 30]]), np.array([[0, 0]]),
                str(tmp_path / "m.svg"))
    assert "<circle" in open(str(tmp_path / "f.svg")).read()


def test_hamming_matching():
    import jax.numpy as jnp
    from openmvg_tpu.ops import matching

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, size=(60, 60), dtype=np.uint8)
    perm = rng.permutation(60)
    b = a[perm].copy()
    # flip a couple of bits in b
    b[:, 0] ^= 1
    res = matching.match_brute_force_hamming(jnp.asarray(a), jnp.asarray(b),
                                             ratio=0.9)
    m = np.asarray(res.mask)
    inv = np.empty(60, np.int64)
    inv[perm] = np.arange(60)
    assert m.sum() > 55
    np.testing.assert_array_equal(np.asarray(res.idx_b)[m], inv[m])


def test_preemptive_subset():
    from openmvg_tpu.ops.matching import preemptive_subset

    feats = np.zeros((300, 4))
    feats[:, 2] = np.arange(300)  # scale ascending
    descs = np.arange(300)[:, None].repeat(8, 1)
    f2, d2 = preemptive_subset(feats, descs, k=50)
    assert len(f2) == 50
    assert f2[:, 2].min() == 250  # largest scales kept
    np.testing.assert_array_equal(d2[:, 0], f2[:, 2])


def test_f64_polish_tightens_f32_scene():
    from openmvg_tpu import native
    from openmvg_tpu.sfm.polish import f64_polish

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    s = ring_scene(n_views=8, n_points=60, seed=11)
    sc = scene_from_ring(s, seed=12)
    # emulate the f32 production BA output: round all state to f32
    sc.pose_R = sc.pose_R.astype(np.float32).astype(np.float64)
    sc.pose_C = sc.pose_C.astype(np.float32).astype(np.float64)
    sc.X = sc.X.astype(np.float32).astype(np.float64)
    before = rmse(sc)
    n = f64_polish(sc)
    after = rmse(sc)
    assert n > 0
    assert after < before * 0.2, (before, after)
    # rotations stay orthonormal
    RtR = np.einsum("nji,njk->nik", sc.pose_R, sc.pose_R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (8, 1, 1)), atol=1e-9)


def test_f64_polish_recovers_intrinsics():
    """The alternated closed-form intrinsic update (polish.py:_intrinsics_ls)
    must pull a drifted focal/principal point back to the value the f64
    observations imply — parity with ceres refining intrinsics in f64
    (sfm_data_BA_ceres.cpp ADJUST_ALL)."""
    from openmvg_tpu import native
    from openmvg_tpu.sfm.polish import f64_polish

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    s = ring_scene(n_views=8, n_points=60, seed=21)
    sc = scene_from_ring(s, seed=22)
    p = np.array(sc.cameras.params, np.float64)
    f_gt, cx_gt, cy_gt = p[0, 0:3]
    # emulate f32-converged drift: focal off by 0.1%, pp by 0.3 px
    p[0, 0] = f_gt * 1.001
    p[0, 1] = cx_gt + 0.3
    sc.cameras = sc.cameras._replace(params=p)
    sc.pose_R = sc.pose_R.astype(np.float32).astype(np.float64)
    sc.pose_C = sc.pose_C.astype(np.float32).astype(np.float64)
    sc.X = sc.X.astype(np.float32).astype(np.float64)
    n = f64_polish(sc, refine_intrinsics=True)
    assert n > 0
    f_out, cx_out, cy_out = np.asarray(sc.cameras.params, np.float64)[0, 0:3]
    # the drift was 0.1% / 0.3 px; polished values must land well inside it
    assert abs(f_out - f_gt) / f_gt < 2e-4, (f_out, f_gt)
    assert abs(cx_out - cx_gt) < 0.05, (cx_out, cx_gt)
    assert rmse(sc) < 0.05
