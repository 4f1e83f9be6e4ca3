"""GMS filter and additional GT loader tests."""

import os

import numpy as np

from openmvg_tpu.io import gt_loaders
from openmvg_tpu.ops.gms import gms_filter


def test_gms_keeps_coherent_rejects_random():
    rng = np.random.default_rng(0)
    n_good, n_bad = 400, 60
    xa_good = rng.uniform(50, 450, size=(n_good, 2))
    xb_good = xa_good + [30.0, 10.0]  # coherent motion
    xa_bad = rng.uniform(0, 500, size=(n_bad, 2))
    xb_bad = rng.uniform(0, 500, size=(n_bad, 2))
    xa = np.concatenate([xa_good, xa_bad])
    xb = np.concatenate([xb_good, xb_bad])
    keep = gms_filter(xa, xb, (500, 500), (500, 500))
    assert keep[:n_good].mean() > 0.8
    assert keep[n_good:].mean() < 0.25


def test_middlebury_loader(tmp_path):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    lines = ["2"]
    for name in ["a.png", "b.png"]:
        vals = list(K.reshape(-1)) + list(R.reshape(-1)) + list(t)
        lines.append(name + " " + " ".join(str(v) for v in vals))
    p = str(tmp_path / "gt.txt")
    open(p, "w").write("\n".join(lines))
    sc = gt_loaders.load_middlebury_gt(p)
    assert sc.n_views == 2
    np.testing.assert_allclose(sc.pose_C[0], -R.T @ t)
    np.testing.assert_allclose(sc.cameras.params[0, 0], 500.0)


def test_eth3d_loader(tmp_path):
    open(str(tmp_path / "cameras.txt"), "w").write(
        "# comment\n1 PINHOLE 640 480 500 500 320 240\n")
    open(str(tmp_path / "images.txt"), "w").write(
        "# comment\n1 1 0 0 0 0.5 0.5 1.0 1 img0.png\n")
    sc = gt_loaders.load_eth3d_gt(str(tmp_path))
    assert sc.n_views == 1
    np.testing.assert_allclose(sc.pose_R[0], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(sc.pose_C[0], [-0.5, -0.5, -1.0])


def test_kitti_loader(tmp_path):
    open(str(tmp_path / "00.txt"), "w").write(
        "1 0 0 0.5 0 1 0 0 0 0 1 2\n")
    open(str(tmp_path / "calib.txt"), "w").write(
        "P0: 700 0 600 0 0 700 180 0 0 0 1 0\n")
    sc = gt_loaders.load_kitti_gt(str(tmp_path))
    assert sc.n_views == 1
    np.testing.assert_allclose(sc.pose_C[0], [0.5, 0, 2])
    np.testing.assert_allclose(sc.cameras.params[0, 0], 700.0)
