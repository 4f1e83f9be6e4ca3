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


def export_baf(scene, path):
    """ASCII Bundle Adjustment File (sfm_data_io_baf.hpp Save_BAF):
    header = #intrinsics #views #landmarks; intrinsic param rows; per-view
    pose rows [R col-major, C] (identity for missing poses); landmark rows
    [X #obs (id_intrinsic id_pose x y)*]; plus <path>_imgList.txt."""
    from openmvg_tpu.models import cameras as cm

    cams = scene.cameras
    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    obs_by_lm = {}
    for idx in np.nonzero(ok)[0]:
        obs_by_lm.setdefault(int(scene.obs_landmark[idx]), []).append(idx)
    lms = [l for l in np.nonzero(scene.X_valid)[0]]
    with open(path, "w") as f:
        f.write(f"{scene.n_intrinsics}\n{scene.n_views}\n{len(lms)}\n")
        for i in range(scene.n_intrinsics):
            kind = int(np.asarray(cams.kind)[i])
            n = cm.N_PARAMS[kind]
            f.write(" ".join(str(float(v))
                             for v in np.asarray(cams.params)[i, :n]) + " \n")
        for v in range(scene.n_views):
            pid = scene.view_pose[v]
            if pid < 0 or not scene.pose_valid[pid]:
                R = np.eye(3)
                C = np.zeros(3)
            else:
                R = scene.pose_R[pid]
                C = scene.pose_C[pid]
            vals = list(R.T.reshape(-1)) + list(C)  # column major
            f.write(" ".join(str(float(x)) for x in vals) + " \n")
        for l in lms:
            X = scene.X[l]
            obs = obs_by_lm.get(int(l), [])
            parts = [f"{X[0]} {X[1]} {X[2]}", str(len(obs))]
            for idx in obs:
                v = int(scene.obs_view[idx])
                parts.append(f"{int(scene.view_intrinsic[v])} "
                             f"{int(scene.view_pose[v])} "
                             f"{scene.obs_x[idx, 0]} {scene.obs_x[idx, 1]}")
            f.write(" ".join(parts) + "\n")
    with open(path + "_imgList.txt", "w") as f:
        for v in range(scene.n_views):
            f.write(f"{scene.view_filename[v]} {int(scene.view_intrinsic[v])} "
                    f"{int(scene.view_pose[v])}\n")
    return True


def export_bundler(scene, path, colors=None):
    """Bundler .out format (export/main_openMVG2Bundler-style): header,
    per-camera [f k1 k2 / R / t] (Bundler's -z convention), points."""
    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    slot = {v: i for i, v in enumerate(posed)}
    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    obs_by_lm = {}
    for idx in np.nonzero(ok)[0]:
        if int(scene.obs_view[idx]) in slot:
            obs_by_lm.setdefault(int(scene.obs_landmark[idx]), []).append(idx)
    lms = [l for l in np.nonzero(scene.X_valid)[0] if obs_by_lm.get(int(l))]
    D = np.diag([1.0, -1.0, -1.0])  # openMVG cam -> bundler cam
    if colors is None:
        colors = np.full((len(scene.X), 3), 255, int)
    with open(path, "w") as f:
        f.write("# Bundle file v0.3\n")
        f.write(f"{len(posed)} {len(lms)}\n")
        for v in posed:
            pid = scene.view_pose[v]
            iid = scene.view_intrinsic[v]
            focal = float(np.asarray(scene.cameras.params)[iid, 0])
            R = D @ scene.pose_R[pid]
            t = R @ (-scene.pose_C[pid])
            f.write(f"{focal} 0 0\n")
            for row in R:
                f.write(f"{row[0]} {row[1]} {row[2]}\n")
            f.write(f"{t[0]} {t[1]} {t[2]}\n")
        for l in lms:
            X = scene.X[l]
            c = colors[l]
            f.write(f"{X[0]} {X[1]} {X[2]}\n")
            f.write(f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
            obs = obs_by_lm[int(l)]
            parts = [str(len(obs))]
            for idx in obs:
                v = int(scene.obs_view[idx])
                iid = scene.view_intrinsic[v]
                pp = np.asarray(scene.cameras.params)[iid, 1:3]
                x = scene.obs_x[idx] - pp
                parts.append(f"{slot[v]} {int(scene.obs_feat[idx])} "
                             f"{x[0]} {-x[1]}")
            f.write(" ".join(parts) + "\n")
    return True


def export_pmvs(scene, outdir, image_provider=None):
    """PMVS working directory (export/main_openMVG2PMVS.cpp):
    txt/%08d.txt projection matrices, visualize/ images (if provider),
    pmvs_options.txt."""
    from openmvg_tpu.models.cameras import K_matrix
    import jax.numpy as jnp

    os.makedirs(os.path.join(outdir, "txt"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "visualize"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "models"), exist_ok=True)
    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    for i, v in enumerate(posed):
        pid = scene.view_pose[v]
        iid = scene.view_intrinsic[v]
        K = np.asarray(K_matrix(jnp.asarray(
            np.asarray(scene.cameras.params)[iid])))
        R = scene.pose_R[pid]
        t = -R @ scene.pose_C[pid]
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        with open(os.path.join(outdir, "txt", f"{i:08d}.txt"), "w") as f:
            f.write("CONTOUR\n")
            for row in P:
                f.write(f"{row[0]} {row[1]} {row[2]} {row[3]}\n")
    with open(os.path.join(outdir, "pmvs_options.txt"), "w") as f:
        f.write("level 1\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                f"CPU 8\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
                f"timages -1 0 {len(posed)}\noimages 0\n")
    return True


def export_mve(scene, outdir):
    """MVE scene directory (export/main_openMVG2MVE2.cpp): views/*.mve
    folders with meta.ini camera parameters."""
    views_dir = os.path.join(outdir, "views")
    os.makedirs(views_dir, exist_ok=True)
    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    for i, v in enumerate(posed):
        d = os.path.join(views_dir, f"view_{i:04d}.mve")
        os.makedirs(d, exist_ok=True)
        pid = scene.view_pose[v]
        iid = scene.view_intrinsic[v]
        p = np.asarray(scene.cameras.params)[iid]
        w = float(scene.cameras.width[iid])
        h = float(scene.cameras.height[iid])
        R = scene.pose_R[pid]
        t = -R @ scene.pose_C[pid]
        flen = p[0] / max(w, h)  # MVE normalized focal
        with open(os.path.join(d, "meta.ini"), "w") as f:
            f.write("[camera]\n")
            f.write(f"focal_length = {flen}\n")
            f.write("pixel_aspect = 1\n")
            f.write(f"principal_point = {p[1] / w} {p[2] / h}\n")
            f.write("rotation = " + " ".join(str(x) for x in R.reshape(-1)) + "\n")
            f.write("translation = " + " ".join(str(x) for x in t) + "\n")
            f.write("[view]\n")
            f.write(f"id = {i}\nname = {scene.view_filename[v]}\n")
    return True
