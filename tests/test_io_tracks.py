import numpy as np

from openmvg_tpu.io import features_io, matches_io, sfm_data
from openmvg_tpu.io.ply import save_scene_ply
from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm import tracks as T
from openmvg_tpu.sfm.scene import Scene
from openmvg_tpu.utils import graph


def make_scene():
    s = Scene(root_path="/tmp/imgs")
    s.view_filename = ["a.jpg", "b.jpg", "c.jpg"]
    s.view_intrinsic = np.array([0, 0, 1], np.int32)
    s.view_pose = np.array([0, 1, 2], np.int32)
    s.view_wh = np.array([[640, 480]] * 3, np.int32)
    s.cameras = cm.stack_cameras([
        cm.make_pinhole(640, 480, 500.0, kind=cm.PINHOLE_RADIAL_K3,
                        disto=(0.01, -0.02, 0.003)),
        cm.make_pinhole(640, 480, 520.0),
    ])
    s.pose_valid = np.array([True, True, False])
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    s.pose_R = np.tile(np.eye(3), (3, 1, 1))
    s.pose_R[0] = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix()
    s.pose_C = rng.normal(size=(3, 3))
    s.X = rng.normal(size=(4, 3))
    s.X_valid = np.array([True, True, False, True])
    s.obs_landmark = np.array([0, 0, 1, 3, 3], np.int32)
    s.obs_view = np.array([0, 1, 0, 1, 2], np.int32)
    s.obs_x = rng.uniform(0, 600, size=(5, 2))
    s.obs_feat = np.array([5, 9, 2, 7, 8], np.int32)
    s.obs_valid = np.ones(5, bool)
    return s


def test_sfm_data_json_roundtrip(tmp_path):
    s = make_scene()
    p = str(tmp_path / "sfm_data.json")
    sfm_data.save_sfm_data(s, p)
    s2 = sfm_data.load_sfm_data(p)
    assert s2.root_path == s.root_path
    assert s2.view_filename == s.view_filename
    np.testing.assert_array_equal(s2.view_intrinsic, s.view_intrinsic)
    np.testing.assert_array_equal(s2.cameras.kind, s.cameras.kind)
    np.testing.assert_allclose(s2.cameras.params, s.cameras.params)
    np.testing.assert_array_equal(s2.pose_valid, s.pose_valid)
    np.testing.assert_allclose(s2.pose_R[s.pose_valid], s.pose_R[s.pose_valid])
    np.testing.assert_allclose(s2.pose_C[s.pose_valid], s.pose_C[s.pose_valid])
    np.testing.assert_array_equal(s2.X_valid, s.X_valid)
    np.testing.assert_allclose(s2.X[s2.X_valid], s.X[s.X_valid])
    # observations (order within landmark preserved)
    assert s2.n_observations == s.n_observations
    save_scene_ply(s2, str(tmp_path / "scene.ply"))


def test_feat_desc_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    feats = rng.uniform(0, 100, size=(17, 4))
    d = rng.integers(0, 255, size=(17, 128)).astype(np.uint8)
    features_io.save_feats(str(tmp_path / "a.feat"), feats)
    features_io.save_descs(str(tmp_path / "a.desc"), d)
    f2 = features_io.load_feats(str(tmp_path / "a.feat"))
    d2 = features_io.load_descs(str(tmp_path / "a.desc"))
    np.testing.assert_allclose(f2, feats)
    np.testing.assert_array_equal(d2, d)


def test_matches_roundtrip(tmp_path):
    m = {(0, 1): np.array([[0, 1], [2, 3], [5, 5]]),
         (1, 2): np.array([[7, 1]])}
    for name in ["m.bin", "m.txt"]:
        matches_io.save_matches(m, str(tmp_path / name))
        m2 = matches_io.load_matches(str(tmp_path / name))
        assert set(m2) == set(m)
        for k in m:
            np.testing.assert_array_equal(m2[k], m[k])


def test_tracks_build():
    """Parity scenario from tracks_test.cpp: chains + a conflict."""
    matches = {
        (0, 1): np.array([[0, 0], [1, 1], [2, 2]]),
        (1, 2): np.array([[0, 0], [1, 1]]),
        (0, 2): np.array([[0, 0], [1, 1]]),
    }
    tr = T.build_tracks(matches, min_length=2)
    assert tr.n_tracks == 3
    lengths = np.sort(tr.lengths())
    np.testing.assert_array_equal(lengths, [2, 3, 3])
    # track visible in all of 0,1,2 -> the two triple tracks
    shared = T.tracks_in_views(tr, [0, 1, 2])
    assert len(shared) == 2


def test_tracks_conflict_rejected():
    # feature 0 of view 0 matches two distinct features of view 1 -> merged
    # track has view 1 twice -> rejected entirely
    matches = {
        (0, 1): np.array([[0, 0], [0, 1]]),
        (1, 2): np.array([[5, 5]]),
    }
    tr = T.build_tracks(matches, min_length=2)
    assert tr.n_tracks == 1  # only the 5-5 track survives
    assert len(tr.track_id) == 2


def test_graph_utils():
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    comps = graph.connected_components(pairs)
    assert len(comps) == 1
    # edge 2-3 is a bridge; largest biedge component is {0,1,2} or {3,4,5}
    bi = graph.largest_biedge_connected_component(pairs)
    assert bi in ({0, 1, 2}, {3, 4, 5})
    trip = set(graph.list_triplets(pairs))
    assert trip == {(0, 1, 2), (3, 4, 5)}
    assert len(graph.exhaustive_pairs(4)) == 6
    assert graph.contiguous_pairs(4, 1) == [(0, 1), (1, 2), (2, 3)]


def test_sfm_data_xml_roundtrip(tmp_path):
    """XML (cereal XMLOutputArchive shape) matches JSON structurally and
    round-trips the scene."""
    from openmvg_tpu.io.sfm_data import load_sfm_data, save_sfm_data
    from openmvg_tpu.utils.synthetic import ring_scene
    from tests.test_ba import scene_from_ring

    s = ring_scene(n_views=5, n_points=30, seed=0)
    sc = scene_from_ring(s, seed=1)
    path = str(tmp_path / "sfm_data.xml")
    assert save_sfm_data(sc, path)
    txt = open(path).read()
    assert txt.startswith('<?xml version="1.0" encoding="utf-8"?>')
    assert "<cereal>" in txt and "<views size=" in txt
    back = load_sfm_data(path)
    assert back.n_views == sc.n_views
    assert back.n_landmarks == sc.n_landmarks
    np.testing.assert_allclose(back.pose_R, sc.pose_R, atol=1e-12)
    np.testing.assert_allclose(back.pose_C, sc.pose_C, atol=1e-12)
    np.testing.assert_allclose(back.X[back.X_valid], sc.X[sc.X_valid],
                               atol=1e-12)
    np.testing.assert_allclose(np.sort(back.obs_x, axis=0),
                               np.sort(sc.obs_x, axis=0), atol=1e-12)
    assert back.view_filename == sc.view_filename

    # cross-format equivalence: xml -> json -> xml preserves the doc
    jpath = str(tmp_path / "sfm_data.json")
    save_sfm_data(back, jpath)
    back2 = load_sfm_data(jpath)
    np.testing.assert_allclose(back2.X[back2.X_valid], sc.X[sc.X_valid],
                               atol=1e-12)


def test_gps_prior_roundtrip(tmp_path):
    """ViewPriors survive JSON (use_pose_center_prior / center /
    center_weight, sfm_view_priors_io.hpp field names) and the cereal .bin
    framing (cereal-true since round 3); views without a prior stay prior-free."""
    from tests.test_ba import scene_from_ring
    from openmvg_tpu.io.sfm_data_bin import (load_sfm_data_bin,
                                             save_sfm_data_bin)
    from openmvg_tpu.utils.synthetic import ring_scene

    sc = scene_from_ring(ring_scene(n_views=4, n_points=10, seed=0), seed=1)
    sc.prior_center = np.zeros((4, 3))
    sc.prior_center_weight = np.zeros((4, 3))
    sc.prior_center[1] = [1.5, -2.0, 3.25]
    sc.prior_center_weight[1] = [1.0, 1.0, 2.0]
    sc.prior_center[3] = [-4.0, 0.5, 9.0]
    sc.prior_center_weight[3] = [0.5, 0.5, 0.5]

    jp = str(tmp_path / "s.json")
    sfm_data.save_sfm_data(sc, jp)
    import json as _json
    doc = _json.load(open(jp))
    d1 = doc["views"][1]["value"]["ptr_wrapper"]["data"]
    assert d1["use_pose_center_prior"] is True
    assert d1["center"] == [1.5, -2.0, 3.25]
    assert doc["views"][1]["value"].get("polymorphic_name") == "view_priors"
    assert "use_pose_center_prior" not in \
        doc["views"][0]["value"]["ptr_wrapper"]["data"]

    back = sfm_data.load_sfm_data(jp)
    np.testing.assert_allclose(back.prior_center[1], sc.prior_center[1])
    np.testing.assert_allclose(back.prior_center_weight[3],
                               sc.prior_center_weight[3])
    assert np.all(back.prior_center_weight[0] == 0)

    bp = str(tmp_path / "s.bin")
    save_sfm_data_bin(sc, bp)
    back2 = load_sfm_data_bin(bp)
    np.testing.assert_allclose(back2.prior_center[1], sc.prior_center[1])
    np.testing.assert_allclose(back2.prior_center_weight[1], [1, 1, 2])
    assert np.all(back2.prior_center_weight[2] == 0)
