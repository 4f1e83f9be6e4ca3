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


def _random_KRC(seed):
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
    aa = rng.normal(size=3) * 0.3
    th = np.linalg.norm(aa)
    k = aa / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    C = rng.normal(size=3)
    return K, R, C


def test_dtu_loader(tmp_path):
    K, R, C = _random_KRC(3)
    P = K @ np.concatenate([R, (-R @ C)[:, None]], axis=1)
    with open(str(tmp_path / "pos_017.txt"), "w") as f:
        for row in P:
            f.write(" ".join(str(x) for x in row) + "\n")
    sc = gt_loaders.load_dtu_gt(str(tmp_path))
    assert sc.n_views == 1
    np.testing.assert_allclose(sc.pose_C[0], C, atol=1e-8)
    np.testing.assert_allclose(sc.pose_R[0], R, atol=1e-8)
    np.testing.assert_allclose(sc.cameras.params[0, :3], [800, 320, 240],
                               atol=1e-6)


def test_blendedmvs_loader(tmp_path):
    K, R, C = _random_KRC(4)
    t = -R @ C
    E = np.eye(4)
    E[:3, :3], E[:3, 3] = R, t
    with open(str(tmp_path / "00000012_cam.txt"), "w") as f:
        f.write("extrinsic\n")
        for row in E:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("\nintrinsic\n")
        for row in K:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("\n425.0 2.5\n")
    sc = gt_loaders.load_blendedmvs_gt(str(tmp_path))
    assert sc.n_views == 1
    assert sc.view_filename[0] == "00000012.jpg"
    np.testing.assert_allclose(sc.pose_C[0], C, atol=1e-10)
    np.testing.assert_allclose(sc.pose_R[0], R, atol=1e-10)


def test_multiface_loader(tmp_path):
    K, R, C = _random_KRC(5)
    t = -R @ C
    with open(str(tmp_path / "KRT"), "w") as f:
        f.write("400002\n")
        for row in K:
            f.write(" ".join(str(x) for x in row) + "\n")
        f.write("0 0\n")
        for i in range(3):
            f.write(" ".join(str(x) for x in R[i]) + f" {t[i]}\n")
        f.write("\n")
    sc = gt_loaders.load_multiface_gt(str(tmp_path))
    assert sc.n_views == 1
    assert sc.view_filename[0] == "400002.png"
    np.testing.assert_allclose(sc.pose_C[0], C, atol=1e-10)
    np.testing.assert_allclose(sc.pose_R[0], R, atol=1e-10)
