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


def test_export_openmvs_binary_roundtrip(tmp_path):
    """Parse back the MVSI stream written by export_openmvs and verify the
    platform/image/vertex structure (layout per export/InterfaceMVS.h)."""
    import struct

    s, sc = _scene()
    path = str(tmp_path / "scene.mvs")
    assert exporters.export_openmvs(sc, path)
    buf = open(path, "rb").read()
    off = 0

    def u32():
        nonlocal off
        v = struct.unpack_from("<I", buf, off)[0]
        off += 4
        return v

    def u64():
        nonlocal off
        v = struct.unpack_from("<Q", buf, off)[0]
        off += 8
        return v

    def dbl(n=1):
        nonlocal off
        v = struct.unpack_from("<%dd" % n, buf, off)
        off += 8 * n
        return np.array(v)

    def flt(n=1):
        nonlocal off
        v = struct.unpack_from("<%df" % n, buf, off)
        off += 4 * n
        return np.array(v)

    def rd_str():
        n = u64()
        nonlocal off
        sv = buf[off:off + n].decode()
        off += n
        return sv

    assert buf[:4] == b"MVSI"
    off = 4
    assert u32() == 6    # version
    u32()                # reserved
    n_plat = u64()
    assert n_plat == 1   # ring scene shares one intrinsic
    total_poses = 0
    for _ in range(n_plat):
        rd_str()                      # platform name
        n_cam = u64()
        assert n_cam == 1
        rd_str(); rd_str()            # camera name, band
        w, h = u32(), u32()
        K = dbl(9).reshape(3, 3)
        assert K[0, 0] > 0 and K[2, 2] == 1.0
        assert w > 0 and h > 0
        np.testing.assert_allclose(dbl(9).reshape(3, 3), np.eye(3))
        dbl(3)
        n_poses = u64()
        total_poses += n_poses
        for _ in range(n_poses):
            R = dbl(9).reshape(3, 3)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
            dbl(3)
    assert total_poses == 6
    n_img = u64()
    assert n_img == 6
    for i in range(n_img):
        name = rd_str()
        rd_str()
        plat, cam_id, pose_id, gid = u32(), u32(), u32(), u32()
        assert plat < n_plat and cam_id == 0 and gid == i
        assert name
    n_vert = u64()
    assert n_vert == 40
    for _ in range(n_vert):
        flt(3)
        nv = u64()
        assert nv >= 2
        for _ in range(nv):
            assert u32() < n_img
            flt(1)
    assert u64() == 0      # normals
    assert u64() == 0      # colors
    assert u64() == 0      # lines
    assert u64() == 0 and u64() == 0
    np.testing.assert_allclose(dbl(16).reshape(4, 4), np.eye(4))
    dbl(9); dbl(3); dbl(3)  # obb
    assert off == len(buf)


def test_export_agisoft_meshlab_mvstex_cmpmvs_frustums(tmp_path):
    s, sc = _scene()
    assert exporters.export_agisoft(sc, str(tmp_path / "agisoft"))
    xml = open(str(tmp_path / "agisoft/cameras.xml")).read()
    assert xml.count("<camera id=") == 6 and "<sensor id=" in xml

    assert exporters.export_meshlab(sc, str(tmp_path / "meshlab"), "scene.ply")
    mlp = open(str(tmp_path / "meshlab/sceneMeshlab.mlp")).read()
    assert mlp.count("<MLRaster") == 6 and "VCGCamera" in mlp

    assert exporters.export_mvstexturing(sc, str(tmp_path / "mvstex"))
    cams = [f for f in os.listdir(str(tmp_path / "mvstex")) if f.endswith(".cam")]
    assert len(cams) == 6
    body = open(str(tmp_path / "mvstex" / cams[0])).read().split("\n")
    assert len(body[0].split()) == 12 and len(body[1].split()) == 6

    assert exporters.export_cmpmvs(sc, str(tmp_path / "cmpmvs"))
    assert os.path.exists(str(tmp_path / "cmpmvs/00000_P.txt"))
    assert os.path.exists(str(tmp_path / "cmpmvs/01_mvs_firstRun.ini"))

    assert exporters.export_frustums_ply(sc, str(tmp_path / "frustums.ply"),
                                         colorize=True)
    ply = open(str(tmp_path / "frustums.ply")).read().split("\n")
    assert ply[0] == "ply"
    n_v = int([l for l in ply if l.startswith("element vertex")][0].split()[-1])
    n_f = int([l for l in ply if l.startswith("element face")][0].split()[-1])
    assert n_v == 6 * 5 and n_f == 6 * 6


def test_mvstexturing_projection_consistency(tmp_path):
    """The .cam extrinsics reproject scene points to the observed pixels."""
    s, sc = _scene()
    exporters.export_mvstexturing(sc, str(tmp_path))
    v = 0
    base = os.path.splitext(os.path.basename(sc.view_filename[v]))[0]
    rows = open(str(tmp_path / (base + ".cam"))).read().split("\n")
    vals = [float(x) for x in rows[0].split()]
    t, R = np.array(vals[:3]), np.array(vals[3:]).reshape(3, 3)
    fl, _, _, _, ppx, ppy = [float(x) for x in rows[1].split()]
    iid = int(sc.view_intrinsic[v])
    w, h = float(sc.cameras.width[iid]), float(sc.cameras.height[iid])
    sel = np.nonzero(sc.obs_valid & (sc.obs_view == v))[0][:5]
    for idx in sel:
        X = sc.X[sc.obs_landmark[idx]]
        xc = R @ X + t
        u = fl * max(w, h) * xc[0] / xc[2] + ppx * w
        vv = fl * max(w, h) * xc[1] / xc[2] + ppy * h
        np.testing.assert_allclose([u, vv], sc.obs_x[idx], atol=1e-6)


def test_export_webgl(tmp_path):
    s, sc = _scene()
    out = str(tmp_path / "viewer.html")
    assert exporters.export_webgl(sc, out)
    html = open(out).read()
    assert html.startswith("<!DOCTYPE html>")
    assert "webgl" in html and "drawArrays" in html
    # embedded buffers decode to the right sizes
    import base64
    import re

    pts = base64.b64decode(
        re.search(r'PTS = new Float32Array\(Uint8Array\.from\(atob\("([^"]*)"\)', html).group(1))
    n_pts = len(pts) // 12
    assert n_pts == int(np.asarray(sc.X_valid).sum())
    cam = base64.b64decode(
        re.search(r'CAM = new Float32Array\(Uint8Array\.from\(atob\("([^"]*)"\)', html).group(1))
    assert len(cam) // 12 == 16 * 6  # 8 line segments per camera, 6 cameras


def test_rerun_viewer_logging():
    """log_scene drives the rerun API shape correctly (fake SDK module)."""
    from openmvg_tpu.utils import rerun_viewer

    s, sc = _scene()
    calls = []

    class _Obj:
        def __init__(self, *a, **k):
            self.a, self.k = a, k

    class FakeRR:
        class ViewCoordinates:
            RDF = "RDF"
        Points3D = _Obj
        Transform3D = _Obj
        Pinhole = _Obj
        Quaternion = _Obj
        EncodedImage = _Obj

        @staticmethod
        def log(entity, *a, **k):
            calls.append((entity, a, k))

    n = rerun_viewer.log_scene(sc, FakeRR)
    ents = [c[0] for c in calls]
    assert "world/points" in ents
    assert sum(e.startswith("world/camera/") for e in ents) == 2 * 6
    pts = [c for c in calls if c[0] == "world/points"][0][1][0]
    assert len(pts.a[0]) == int(np.asarray(sc.X_valid).sum())
    # camera transform is cam-to-world: translation == camera center
    cam_calls = [c for c in calls if c[0].startswith("world/camera/")
                 and isinstance(c[1][0], _Obj) and "translation" in c[1][0].k]
    assert len(cam_calls) == 6


def test_harmonize_cli(tmp_path):
    """colorHarmonize parity through the CLI: image 1/2 are gain/offset
    distortions of image 0; after harmonize their pixels at matched
    keypoints agree with the reference image again."""
    from openmvg_tpu.cli import main
    from openmvg_tpu.io.features_io import save_descs, save_feats
    from openmvg_tpu.io.image import read_image, write_image
    from openmvg_tpu.io.matches_io import save_matches
    from openmvg_tpu.io.sfm_data import save_sfm_data
    from openmvg_tpu.sfm.scene import Scene

    rng = np.random.default_rng(0)
    size = 64
    base = rng.uniform(0.2, 0.8, size=(size, size, 3))
    true = [(1.0, 0.0), (1.25, -0.05), (0.8, 0.08)]
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    sc = Scene()
    sc.root_path = str(imgdir)
    n = 3
    sc.view_filename = [f"im{v}.png" for v in range(n)]
    sc.view_intrinsic = np.zeros(n, np.int32)
    sc.view_pose = np.arange(n, dtype=np.int32)
    sc.view_wh = np.tile([[size, size]], (n, 1)).astype(np.int32)
    from openmvg_tpu.models import cameras as cm
    sc.cameras = cm.make_pinhole(size, size, 100.0, size / 2, size / 2)
    for v, (g, o) in enumerate(true):
        write_image(str(imgdir / f"im{v}.png"), np.clip(g * base + o, 0, 1))
    save_sfm_data(sc, str(tmp_path / "sfm_data.json"))

    # features on a grid, identity matches (same pixel in every image)
    gx, gy = np.meshgrid(np.arange(4, size - 4, 3), np.arange(4, size - 4, 3))
    xy = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float64)
    feats = np.concatenate([xy, np.ones((len(xy), 2))], 1)
    mdir = tmp_path / "matches"
    mdir.mkdir()
    for v in range(n):
        save_feats(str(mdir / f"im{v}.feat"), feats)
        save_descs(str(mdir / f"im{v}.desc"),
                   np.zeros((len(xy), 128), np.uint8))
    ident = np.stack([np.arange(len(xy))] * 2, 1)
    save_matches({(0, 1): ident, (0, 2): ident, (1, 2): ident},
                 str(mdir / "matches.f.bin"))

    outdir = tmp_path / "harmonized"
    assert main(["harmonize", "-i", str(tmp_path / "sfm_data.json"),
                 "-m", str(mdir / "matches.f.bin"),
                 "-o", str(outdir), "-r", "0"]) == 0
    ref = np.asarray(read_image(str(outdir / "im0.png")), float)
    for v in (1, 2):
        out = np.asarray(read_image(str(outdir / f"im{v}.png")), float)
        before = np.asarray(read_image(str(imgdir / f"im{v}.png")), float)
        err_after = np.abs(out - ref).mean()
        err_before = np.abs(before - ref).mean()
        assert err_after < 0.25 * err_before, (v, err_after, err_before)
        assert err_after < 3.0  # /255 scale: within ~3 gray levels
