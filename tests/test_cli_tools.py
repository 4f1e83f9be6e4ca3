"""Tests: auxiliary CLI tools (convert, points-filter, frustum-filter,
change-origin, list-pairs, convert-matches, matches2tracks, split-matches)."""

import json
import os

import numpy as np

from openmvg_tpu.cli import main
from openmvg_tpu.io.matches_io import load_matches, save_matches
from openmvg_tpu.io.sfm_data import load_sfm_data, save_sfm_data
from openmvg_tpu.utils.synthetic import ring_scene
from tests.test_ba import scene_from_ring


def _setup(tmp_path):
    s = ring_scene(n_views=6, n_points=40, seed=0)
    sc = scene_from_ring(s, seed=1)
    sp = str(tmp_path / "sfm_data.json")
    save_sfm_data(sc, sp)
    m = {(0, 1): np.stack([np.arange(10)] * 2, 1),
         (1, 2): np.stack([np.arange(10)] * 2, 1),
         (3, 4): np.stack([np.arange(8)] * 2, 1),
         (4, 5): np.stack([np.arange(8)] * 2, 1)}
    mp = str(tmp_path / "matches.bin")
    save_matches(m, mp)
    return sp, mp


def test_convert_part_flags(tmp_path):
    sp, _ = _setup(tmp_path)
    out = str(tmp_path / "out.json")
    assert main(["convert", "-i", sp, "-o", out, "-V", "-I", "-E"]) == 0
    sc = load_sfm_data(out)
    assert sc.n_views == 6 and sc.n_landmarks == 0


def test_points_filter_keeps_clean_scene(tmp_path):
    sp, _ = _setup(tmp_path)
    out = str(tmp_path / "f.json")
    assert main(["points-filter", "-i", sp, "-o", out]) == 0
    assert load_sfm_data(out).n_landmarks == 40


def test_frustum_filter_and_list_pairs(tmp_path):
    sp, _ = _setup(tmp_path)
    pf = str(tmp_path / "pf.txt")
    assert main(["frustum-filter", "-i", sp, "-o", pf]) == 0
    assert len(open(pf).read().split("\n")[0].split()) == 2
    lp = str(tmp_path / "lp.txt")
    assert main(["list-pairs", "-i", sp, "-o", lp, "-V", "-d", "2"]) == 0
    pairs = [tuple(map(int, l.split())) for l in open(lp) if l.strip()]
    assert (0, 1) in pairs and (0, 2) in pairs and (0, 3) not in pairs


def test_change_origin(tmp_path):
    sp, _ = _setup(tmp_path)
    outdir = str(tmp_path / "local")
    sc0 = load_sfm_data(sp)
    assert main(["change-origin", "-i", sp, "-o", outdir, "-f"]) == 0
    sc = load_sfm_data(os.path.join(outdir, "sfm_data_local.bin"))
    origin = np.array([float(x) for x in
                       open(os.path.join(outdir,
                                         "local_frame_origin.txt")).read().split()])
    posed = [p for p in range(sc0.n_poses) if sc0.pose_valid[p]]
    np.testing.assert_allclose(origin, sc0.pose_C[posed[0]], atol=1e-12)
    np.testing.assert_allclose(sc.pose_C + origin, sc0.pose_C, atol=1e-6)


def test_matches_roundtrip_tools(tmp_path):
    sp, mp = _setup(tmp_path)
    txt = str(tmp_path / "m.txt")
    assert main(["convert-matches", "-i", mp, "-o", txt]) == 0
    back = load_matches(txt)
    orig = load_matches(mp)
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(orig[k]))

    tr = str(tmp_path / "tracks.txt")
    assert main(["matches2tracks", "-i", mp, "-o", tr]) == 0
    rows = [l.split() for l in open(tr) if l.strip()]
    assert len(rows) == 54  # 18 tracks x 3 obs

    sm = str(tmp_path / "split.bin")
    assert main(["split-matches", "-i", mp, "-o", sm]) == 0
    p0 = load_matches(str(tmp_path / "split_0.bin"))
    p1 = load_matches(str(tmp_path / "split_1.bin"))
    assert {(0, 1), (1, 2)} in (set(p0), set(p1))
    assert {(3, 4), (4, 5)} in (set(p0), set(p1))


def test_retrieval_quality(tmp_path, capsys):
    sp, mp = _setup(tmp_path)
    # putative pairs: 2 co-visible + 1 junk
    pf = str(tmp_path / "pairs.txt")
    open(pf, "w").write("0 1\n1 2\n0 5\n")
    assert main(["retrieval-quality", "-i", sp, "-p", pf]) == 0
    out = json.loads(capsys.readouterr().out)
    # ring scene: all view pairs co-observe points -> gt = 15 pairs
    assert out["gt_pairs"] == 15
    assert out["true_positive"] == 3 and out["false_positive"] == 0
    assert abs(out["recall"] - 3 / 15) < 1e-9 and out["precision"] == 1.0

    # GT from a matches file instead
    assert main(["retrieval-quality", "-p", pf, "-g", mp]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["gt_pairs"] == 4 and out["true_positive"] == 2


def test_refine_cli_single_and_distributed(tmp_path, capsys):
    sp, _ = _setup(tmp_path)
    out1 = str(tmp_path / "r1.json")
    assert main(["refine", "-i", sp, "-o", out1, "-n", "8"]) == 0
    out8 = str(tmp_path / "r8.json")
    assert main(["refine", "-i", sp, "-o", out8, "-d", "8", "-n", "8"]) == 0
    s1 = load_sfm_data(out1)
    s8 = load_sfm_data(out8)
    np.testing.assert_allclose(s1.pose_C, s8.pose_C, atol=1e-6)
    np.testing.assert_allclose(s1.X[s1.X_valid], s8.X[s8.X_valid], atol=1e-6)


def test_guided_matching_filter():
    """-r guided matching re-matches along the estimated F's epipolar
    lines and should recover at least the AC-RANSAC inlier count."""
    import jax.numpy as jnp

    from openmvg_tpu.sfm.geometric_filter import geometric_filter
    from openmvg_tpu.utils.synthetic import ring_scene
    from tests.test_incremental import scene_and_data

    rng = np.random.default_rng(0)
    s = ring_scene(n_views=4, n_points=80, seed=0)
    sc, feats, matches = scene_and_data(s)
    descs = []
    # descriptors: noisy copies so guided re-matching can align i<->i
    base = rng.integers(0, 255, (80, 128)).astype(np.uint8)
    for v in range(4):
        d = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape), 0,
                    255).astype(np.uint8)
        descs.append(d)
    # drop half the putative matches; guided matching should find them again
    sparse = {k: m[::2] for k, m in matches.items()}
    plain = geometric_filter(sc, feats, sparse, model="f", n_samples=512)
    guided = geometric_filter(sc, feats, sparse, model="f", n_samples=512,
                              guided=True, descs=descs)
    k = (0, 1)
    assert len(guided[k]) > len(plain[k])
    assert len(guided[k]) >= 60  # most of the 80 correspondences recovered


def test_adjacency_matrix_svg(tmp_path):
    from openmvg_tpu.utils.report import svg_adjacency_matrix

    matches = {(0, 1): np.ones((10, 2), np.int64),
               (1, 2): np.ones((40, 2), np.int64)}
    out = svg_adjacency_matrix(3, matches, str(tmp_path / "adj.svg"))
    svg = open(out).read()
    assert svg.startswith("<svg") and svg.count("<rect") == 1 + 4
    assert "(1,2): 40" in svg


def test_export_svg_visualizations(tmp_path):
    """export-keypoints / export-matches / export-tracks write one SVG per
    view / per pair (main_exportKeypoints/Matches/Tracks parity)."""
    from openmvg_tpu.io.features_io import save_descs, save_feats

    sp, mp = _setup(tmp_path)
    sc = load_sfm_data(sp)
    mdir = tmp_path / "m"
    mdir.mkdir()
    rng = np.random.default_rng(0)
    for v in range(sc.n_views):
        stem = os.path.splitext(os.path.basename(sc.view_filename[v]))[0]
        feats = np.concatenate([rng.uniform(0, 999, (20, 2)),
                                np.ones((20, 2))], 1)
        save_feats(str(mdir / f"{stem}.feat"), feats)
        save_descs(str(mdir / f"{stem}.desc"), np.zeros((20, 128), np.uint8))

    kdir = tmp_path / "keys"
    assert main(["export-keypoints", "-i", sp, "-d", str(mdir),
                 "-o", str(kdir)]) == 0
    svgs = [f for f in os.listdir(kdir) if f.endswith(".svg")]
    assert len(svgs) == sc.n_views
    assert "<svg" in open(kdir / svgs[0]).read()

    mdir_out = tmp_path / "msvg"
    assert main(["export-matches", "-i", sp, "-m", mp, "-d", str(mdir),
                 "-o", str(mdir_out)]) == 0
    assert len(os.listdir(mdir_out)) == 4  # one per matched pair

    tdir = tmp_path / "tsvg"
    assert main(["export-tracks", "-i", sp, "-m", mp, "-d", str(mdir),
                 "-o", str(tdir)]) == 0
    # identity matches on chained pairs fuse into tracks covering each pair
    assert len(os.listdir(tdir)) == 4
    assert "<line" in open(tdir / os.listdir(tdir)[0]).read()


def test_geo_register_cli(tmp_path):
    """geo-register with scene GPS priors: a known similarity between pose
    centers and priors is recovered and applied."""
    rng = np.random.default_rng(3)
    sp, _ = _setup(tmp_path)
    sc = load_sfm_data(sp)
    # synthesize priors = s R C + t of the current centers
    s_true = 2.5
    from openmvg_tpu.geometry.so3 import expmap
    R_true = np.asarray(expmap(np.array([0.1, -0.2, 0.3])))
    t_true = np.array([10.0, -5.0, 2.0])
    sc.prior_center = s_true * sc.pose_C @ R_true.T + t_true
    sc.prior_center_weight = np.ones((sc.n_views, 3))
    save_sfm_data(sc, sp)

    out = str(tmp_path / "geo.json")
    assert main(["geo-register", "-i", sp, "-o", out, "--use_priors"]) == 0
    reg = load_sfm_data(out)
    np.testing.assert_allclose(reg.pose_C, sc.prior_center, atol=1e-4)
