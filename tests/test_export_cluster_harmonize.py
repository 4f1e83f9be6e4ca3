"""Tests: exporters (BAF/Bundler/PMVS/MVE), clustering, match splitting,
color harmonization."""

import os

import numpy as np

from openmvg_tpu.io import exporters
from openmvg_tpu.sfm import clustering, color_harmonization as ch
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_ba import scene_from_ring


def _scene():
    s = ring_scene(n_views=6, n_points=40, seed=0)
    return s, scene_from_ring(s, seed=1)


def test_exporters_write(tmp_path):
    s, sc = _scene()
    assert exporters.export_baf(sc, str(tmp_path / "scene.baf"))
    txt = open(str(tmp_path / "scene.baf")).read().split("\n")
    assert txt[0] == "1" and txt[1] == "6" and txt[2] == "40"
    assert os.path.exists(str(tmp_path / "scene.baf_imgList.txt"))

    assert exporters.export_bundler(sc, str(tmp_path / "bundle.out"))
    lines = open(str(tmp_path / "bundle.out")).read().split("\n")
    assert lines[0].startswith("# Bundle")
    ncam, npts = map(int, lines[1].split())
    assert ncam == 6 and npts == 40

    assert exporters.export_pmvs(sc, str(tmp_path / "pmvs"))
    assert os.path.exists(str(tmp_path / "pmvs/txt/00000000.txt"))
    assert os.path.exists(str(tmp_path / "pmvs/pmvs_options.txt"))

    assert exporters.export_mve(sc, str(tmp_path / "mve"))
    meta = open(str(tmp_path / "mve/views/view_0000.mve/meta.ini")).read()
    assert "focal_length" in meta and "rotation" in meta


def test_bundler_projection_consistency(tmp_path):
    """Round-trip check: bundler cameras reproject the exported points."""
    s, sc = _scene()
    path = str(tmp_path / "bundle.out")
    exporters.export_bundler(sc, path)
    tok = open(path).read().split("\n")
    ncam, npts = map(int, tok[1].split())
    # parse first camera
    f0 = float(tok[2].split()[0])
    R = np.array([[float(x) for x in tok[3 + r].split()] for r in range(3)])
    t = np.array([float(x) for x in tok[6].split()])
    # first point
    base = 2 + ncam * 5
    X = np.array([float(x) for x in tok[base].split()])
    meas = tok[base + 2].split()
    # find a measurement from camera 0
    n_meas = int(meas[0])
    for m in range(n_meas):
        cam, feat, mx, my = meas[1 + 4 * m: 5 + 4 * m]
        if int(cam) == 0:
            Xc = R @ X + t
            # bundler: y up, projection = -f * X/Z (z negative forward)
            u = -f0 * Xc[0] / Xc[2]
            v = -f0 * Xc[1] / Xc[2]
            assert abs(u - float(mx)) < 1e-6
            assert abs(v - float(my)) < 1e-6
            return
    raise AssertionError("no measurement from camera 0")


def test_clustering_and_split():
    s, sc = _scene()
    clusters = clustering.cluster_views(sc, 2)
    assert len(clusters) == 2
    assert set().union(*clusters) <= set(range(6))
    sub = clustering.scene_for_views(sc, clusters[0])
    assert sub.n_observations <= sc.n_observations
    assert sub.n_landmarks > 0

    matches = {(0, 1): np.ones((5, 2), np.int64),
               (1, 2): np.ones((5, 2), np.int64),
               (4, 5): np.ones((5, 2), np.int64)}
    parts = clustering.split_matches_by_component(matches, min_nodes=2)
    sizes = sorted(len(p) for p in parts)
    assert sizes == [1, 2]


def test_color_harmonization():
    rng = np.random.default_rng(0)
    # image 1 and 2 are gain/offset distortions of image 0's samples
    base = rng.uniform(0.2, 0.8, 2000)
    true = [(1.0, 0.0), (1.3, -0.05), (0.8, 0.1)]
    samples = [np.clip(g * base + o, 0, 1) for (g, o) in true]
    pair_data = {}
    for (i, j) in [(0, 1), (1, 2), (0, 2)]:
        pair_data[(i, j)] = ch.pair_quantiles(samples[i], samples[j])
    gains, offsets = ch.solve_gain_offset(3, pair_data, ref_image=0)
    # harmonizing with the solved corrections maps everything back to ref:
    # g_i * s_i + o_i should equal g_0 * s_0 + o_0 = s_0
    for i, (g_true, o_true) in enumerate(true):
        corrected_q = gains[i] * np.quantile(samples[i], 0.5) + offsets[i]
        ref_q = np.quantile(samples[0], 0.5)
        assert abs(corrected_q - ref_q) < 0.01, (i, corrected_q, ref_q)
