"""Final f64 polish of a reconstruction.

The production BA runs f32 on TPU (x64 is unavailable there); the
residual ~3x ATE gap vs the f64 CPU backend (round-4 dense e2e: 0.0025
vs 0.0009) is closed by a short double-precision LM tail on the host:
the native C++ implicit-Schur LM (native/native.cpp omt_ba_lm_step_k —
f64 throughout, OpenMP) refines poses+structure AND the shared pinhole
intrinsics jointly (the 3 intrinsic unknowns ride the Schur-reduced CG
system as one extra global block; an alternating intrinsic update
cannot traverse the focal<->depth correlated valley that the f32
engine rounds drift along).

Reference parity: ceres runs f64 throughout and refines intrinsics
jointly under ADJUST_ALL (sfm_data_BA_ceres.cpp); this is the cheapest
equivalent tail for a TPU-f32 pipeline.

Constraints: single shared plain-PINHOLE intrinsic (the standard
pipeline configuration); silently a no-op otherwise or when the native
library is unavailable.
"""

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.utils import deadline, hostmath


def f64_polish(scene, max_steps=48, cg_iters=30, lam=1e-6,
               function_tolerance=1e-12, refine_intrinsics=True):
    """In-place f64 pose+structure(+shared-intrinsic) LM tail.  Returns
    accepted step count (0 when skipped: non-pinhole / multi-intrinsic /
    no native lib)."""
    from openmvg_tpu import native

    if not native.available():
        return 0
    kinds = np.asarray(scene.cameras.kind)
    if len(kinds) != 1 or int(kinds[0]) != cm.PINHOLE:
        return 0
    info = scene.obs_arrays_for_ba()
    if len(info["obs_idx"]) == 0:
        return 0
    pose_ids = np.unique(info["pose_id"])
    point_ids = np.unique(info["landmark_id"])
    obs_pose = np.searchsorted(pose_ids, info["pose_id"]).astype(np.int32)
    obs_point = np.searchsorted(point_ids, info["landmark_id"]).astype(np.int32)
    obs_x = np.ascontiguousarray(info["x"], np.float64)

    R = scene.pose_R[pose_ids]
    rotvec = np.ascontiguousarray(hostmath.logmap_np(R), np.float64)
    t = np.ascontiguousarray(
        -np.einsum("nij,nj->ni", R, scene.pose_C[pose_ids]), np.float64)
    X = np.ascontiguousarray(scene.X[point_ids], np.float64)
    kp = np.ascontiguousarray(
        np.asarray(scene.cameras.params, np.float64)[0, 0:3])

    accepted = 0
    for _ in range(max_steps):
        r = native.ba_lm_step_k(obs_pose, obs_point, obs_x, rotvec, t,
                                X, kp, refine_k=refine_intrinsics,
                                lam=lam, cg_iters=cg_iters)
        if r is None:
            break
        ok, c0, c1 = r
        if ok:
            accepted += 1
            lam = max(lam * 0.5, 1e-12)
            if c0 - c1 <= function_tolerance * max(c0, 1e-30):
                break
        else:
            lam *= 4.0
            if lam > 1e8:
                break
        if deadline.past():
            break

    if accepted:
        Rn = hostmath.expmap_np(rotvec)
        scene.pose_R[pose_ids] = Rn
        scene.pose_C[pose_ids] = -np.einsum("nji,nj->ni", Rn, t)
        scene.X[point_ids] = X
        if refine_intrinsics:
            p = np.array(scene.cameras.params, np.float64)
            p[0, 0:3] = kp
            scene.cameras = scene.cameras._replace(params=p)
    return accepted
