"""Final f64 polish of a reconstruction.

The production BA runs f32 on TPU (x64 is unavailable there); the
residual ~3x ATE gap vs the f64 CPU backend (round-4 dense e2e: 0.0025
vs 0.0009) is closed by a short double-precision LM tail on the host:
the native C++ implicit-Schur LM (native/native.cpp
omt_bench_ba_lm_step — f64 throughout, OpenMP) refines poses+structure
with intrinsics held at their f32-converged values.

Reference parity: ceres runs f64 throughout (sfm_data_BA_ceres.cpp);
this is the cheapest equivalent tail for a TPU-f32 pipeline.

Constraints: single shared plain-PINHOLE intrinsic (the standard
pipeline configuration); silently a no-op otherwise or when the native
library is unavailable.
"""

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.utils import deadline, hostmath


def f64_polish(scene, max_steps=32, cg_iters=30, lam=1e-6,
               function_tolerance=1e-12):
    """In-place f64 pose+structure LM tail.  Returns accepted step count
    (0 when skipped: non-pinhole / multi-intrinsic / no native lib)."""
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
    params = np.asarray(scene.cameras.params, np.float64)[0]
    f, cx, cy = params[0], params[1], params[2]

    accepted = 0
    for _ in range(max_steps):
        r = native.bench_ba_lm_step(obs_pose, obs_point, obs_x, rotvec, t,
                                    X, f, cx, cy, lam=lam,
                                    cg_iters=cg_iters)
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
    return accepted
