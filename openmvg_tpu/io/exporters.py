"""Scene exporters to third-party formats.

Reference parity: software/SfM/export/ —
  main_openMVG2NVM.cpp (VisualSFM NVM_V3),
  main_openMVG2Colmap.cpp (cameras.txt / images.txt / points3D.txt).
Further exporters (openMVS, MVE, PMVS, Agisoft, Meshlab) follow the same
Scene traversal pattern.
"""

import os

import numpy as np


def _quat_from_R(R):
    """Rotation matrix -> quaternion (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def export_nvm(scene, path, colors=None):
    """VisualSFM NVM_V3 (export/main_openMVG2NVM.cpp)."""
    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    view_slot = {v: i for i, v in enumerate(posed)}
    with open(path, "w") as f:
        f.write("NVM_V3\n\n")
        f.write(f"{len(posed)}\n")
        for v in posed:
            pid = scene.view_pose[v]
            iid = scene.view_intrinsic[v]
            focal = float(np.asarray(scene.cameras.params)[iid, 0])
            q = _quat_from_R(scene.pose_R[pid])
            C = scene.pose_C[pid]
            name = scene.view_filename[v]
            f.write(f"{name} {focal} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{C[0]} {C[1]} {C[2]} 0 0\n")
        # measurements per landmark
        ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
        by_lm = {}
        for idx in np.nonzero(ok)[0]:
            v = int(scene.obs_view[idx])
            if v in view_slot:
                by_lm.setdefault(int(scene.obs_landmark[idx]), []).append(idx)
        lms = [l for l in np.nonzero(scene.X_valid)[0] if by_lm.get(int(l))]
        f.write(f"{len(lms)}\n")
        if colors is None:
            colors = np.full((len(scene.X), 3), 255, int)
        for l in lms:
            X = scene.X[l]
            c = colors[l]
            obs = by_lm[int(l)]
            parts = [f"{X[0]} {X[1]} {X[2]} {int(c[0])} {int(c[1])} {int(c[2])} "
                     f"{len(obs)}"]
            for idx in obs:
                v = int(scene.obs_view[idx])
                iid = scene.view_intrinsic[v]
                pp = np.asarray(scene.cameras.params)[iid, 1:3]
                x = scene.obs_x[idx] - pp  # NVM stores pp-centered coords
                parts.append(f"{view_slot[v]} {int(scene.obs_feat[idx])} "
                             f"{x[0]} {x[1]}")
            f.write(" ".join(parts) + "\n")
        f.write("0\n")
    return True


def export_colmap(scene, outdir, colors=None):
    """COLMAP text model (export/main_openMVG2Colmap.cpp)."""
    os.makedirs(outdir, exist_ok=True)
    cams = scene.cameras
    with open(os.path.join(outdir, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        for i in range(scene.n_intrinsics):
            p = np.asarray(cams.params)[i]
            w = int(cams.width[i])
            h = int(cams.height[i])
            kind = int(np.asarray(cams.kind)[i])
            if kind == 3:  # radial k3 -> FULL_OPENCV would be closer; use RADIAL
                f.write(f"{i + 1} RADIAL {w} {h} {p[0]} {p[1]} {p[2]} "
                        f"{p[3]} {p[4]}\n")
            else:
                f.write(f"{i + 1} SIMPLE_PINHOLE {w} {h} {p[0]} {p[1]} {p[2]}\n")

    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    obs_by_view = {}
    obs_by_lm = {}
    for idx in np.nonzero(ok)[0]:
        obs_by_view.setdefault(int(scene.obs_view[idx]), []).append(idx)
        obs_by_lm.setdefault(int(scene.obs_landmark[idx]), []).append(idx)

    with open(os.path.join(outdir, "images.txt"), "w") as f:
        f.write("# IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME / POINTS2D\n")
        for v in range(scene.n_views):
            pid = scene.view_pose[v]
            if pid < 0 or not scene.pose_valid[pid]:
                continue
            R = scene.pose_R[pid]
            t = -R @ scene.pose_C[pid]
            q = _quat_from_R(R)
            f.write(f"{v + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} {int(scene.view_intrinsic[v]) + 1} "
                    f"{scene.view_filename[v]}\n")
            pts = []
            for idx in obs_by_view.get(v, []):
                x = scene.obs_x[idx]
                pts.append(f"{x[0]} {x[1]} {int(scene.obs_landmark[idx]) + 1}")
            f.write(" ".join(pts) + "\n")

    if colors is None:
        colors = np.full((len(scene.X), 3), 255, int)
    with open(os.path.join(outdir, "points3D.txt"), "w") as f:
        f.write("# POINT3D_ID X Y Z R G B ERROR TRACK[]\n")
        for l in np.nonzero(scene.X_valid)[0]:
            X = scene.X[l]
            c = colors[l]
            track = []
            for idx in obs_by_lm.get(int(l), []):
                track.append(f"{int(scene.obs_view[idx]) + 1} "
                             f"{int(scene.obs_feat[idx])}")
            f.write(f"{l + 1} {X[0]} {X[1]} {X[2]} {int(c[0])} {int(c[1])} "
                    f"{int(c[2])} 0 " + " ".join(track) + "\n")
    return True
