"""Ground-truth dataset importers -> Scene.

Reference parity: software/SfM/import/io_readGT*.hpp — Strecha
(io_readGTStrecha.hpp:22: per-image "<name>.camera" text file with
K(9) pad(3) R(9) C(3) size(2); world->cam R is the file R transposed),
Middlebury (name K R t per line in one file), ETH3D/Kitti/DTU share the
cameras.txt/images.txt pattern (subset covered).
"""

import glob
import os

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene


def _scene_from_krc(names, Ks, Rs, Cs, whs):
    scene = Scene()
    n = len(names)
    scene.view_filename = list(names)
    scene.view_intrinsic = np.arange(n, dtype=np.int32)
    scene.view_pose = np.arange(n, dtype=np.int32)
    scene.view_wh = np.asarray(whs, np.int32)
    params = np.zeros((n, cm.MAX_PARAMS))
    params[:, 0] = [K[0, 0] for K in Ks]
    params[:, 1] = [K[0, 2] for K in Ks]
    params[:, 2] = [K[1, 2] for K in Ks]
    scene.cameras = cm.Cameras(
        kind=np.full(n, cm.PINHOLE, np.int32),
        width=scene.view_wh[:, 0].astype(float),
        height=scene.view_wh[:, 1].astype(float),
        params=params)
    scene.pose_valid = np.ones(n, bool)
    scene.pose_R = np.asarray(Rs)
    scene.pose_C = np.asarray(Cs)
    return scene


def load_strecha_gt(gt_dir, default_wh=(3072, 2048)):
    """Parse all *.camera files (sorted) into a GT Scene."""
    files = sorted(glob.glob(os.path.join(gt_dir, "*.camera")))
    names, Ks, Rs, Cs, whs = [], [], [], [], []
    for f in files:
        vals = np.array(open(f).read().split(), float)
        if len(vals) not in (26, 27):
            continue
        K = vals[0:9].reshape(3, 3)
        R_file = vals[12:21].reshape(3, 3)
        C = vals[21:24]
        wh = vals[24:26].astype(int) if len(vals) >= 26 else np.asarray(default_wh)
        names.append(os.path.basename(f)[: -len(".camera")])
        Ks.append(K)
        Rs.append(R_file.T)  # world->cam R = file R transposed
        Cs.append(C)
        whs.append(wh)
    return _scene_from_krc(names, Ks, Rs, Cs, whs)


def write_strecha_camera(path, K, R, C, wh):
    """Inverse of the loader (for tests / synthetic GT)."""
    vals = list(K.reshape(-1)) + [0.0, 0.0, 0.0] + list(R.T.reshape(-1)) \
        + list(C) + [wh[0], wh[1]]
    with open(path, "w") as f:
        f.write(" ".join(str(v) for v in vals))
