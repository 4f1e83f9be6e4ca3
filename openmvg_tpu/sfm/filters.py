"""Scene outlier filters and stability erasure.

Reference parity: sfm/sfm_data_filters.cpp —
  RemoveOutliers_PixelResidualError(:41-73): drop observations with
    |residual| > threshold, then landmarks with < minTrackLength obs
  RemoveOutliers_AngleError(:76-...): drop landmarks whose maximum pairwise
    ray angle over observations is below a minimum (default 2 deg)
  eraseUnstablePoses / eraseObservationsWithMissingPoses /
  eraseUnstablePosesAndObservations(:77 header): iteratively drop poses
    supporting < min_points_per_pose obs and landmarks with
    < min_points_per_landmark obs.

All vectorized numpy over the flat observation table (host side: these run
between device BA calls and mutate the Scene masks in place).
"""

import numpy as np

from openmvg_tpu.sfm.scene import Scene, reprojection_residuals


def remove_outliers_pixel_residual(scene: Scene, threshold_px=4.0,
                                   min_track_length=2) -> int:
    r, info = reprojection_residuals(scene)
    if len(r) == 0:
        return 0
    bad = np.linalg.norm(r, axis=1) > threshold_px
    out_idx = info["obs_idx"][bad]
    scene.obs_valid[out_idx] = False
    _drop_short_tracks(scene, min_track_length)
    return int(bad.sum())


def _drop_short_tracks(scene: Scene, min_track_length):
    counts = np.bincount(scene.obs_landmark[scene.obs_valid],
                         minlength=len(scene.X_valid))
    short = counts < min_track_length
    scene.X_valid &= ~short
    scene.obs_valid &= ~short[scene.obs_landmark]


def remove_outliers_angle_error(scene: Scene, min_angle_deg=2.0) -> int:
    """Landmarks whose max pairwise observation-ray angle < min_angle.

    Max pairwise angle of unit rays == largest principal spread; computed
    exactly per landmark via the max over observation pairs using a
    grouped O(sum k_l^2) evaluation, vectorized with a segment trick:
    for moderate track lengths we use the bound via ray-centroid —
    the exact pairwise max is evaluated in blocks.
    """
    from openmvg_tpu.models import cameras as cm
    from openmvg_tpu.utils import hostmath

    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    pid = scene.view_pose[scene.obs_view]
    ok &= (pid >= 0) & scene.pose_valid[np.clip(pid, 0, max(scene.n_poses - 1, 0))]
    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return 0
    iid = scene.view_intrinsic[scene.obs_view[idx]]
    cams = scene.cameras
    b = hostmath.padded_apply(cm.bearing_jit, (
        np.asarray(cams.kind)[iid], np.asarray(cams.params)[iid],
        np.asarray(cams.width)[iid], np.asarray(cams.height)[iid],
        scene.obs_x[idx]))
    rays = np.einsum("nji,nj->ni", scene.pose_R[pid[idx]], b)  # world rays
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    rays = rays.astype(np.float32)

    # exact max-pairwise-angle test, vectorized: landmarks bucketed by
    # pow2 track length into (Lb, D) CSR row tables, pairwise Gram
    # (Lb, D, D) evaluated in bounded chunks (the former per-landmark
    # python loop was O(L) host work per round — minutes at 100k tracks)
    lm = scene.obs_landmark[idx]
    L = len(scene.X_valid)
    order = np.argsort(lm, kind="stable")
    lm_s = lm[order]
    counts = np.bincount(lm, minlength=L)
    starts = np.zeros(L + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    cos_min_angle = np.float32(np.cos(np.radians(min_angle_deg)))
    bad = np.zeros(L, bool)
    deg = counts
    done = deg < 2  # nothing to test
    Dcap = 64
    D = 2
    while D <= Dcap:
        sel = np.nonzero(~done & (deg <= D))[0]
        done[sel] = True
        if len(sel):
            col = np.arange(D)[None, :]
            rowid = starts[sel, None] + np.minimum(col, deg[sel, None] - 1)
            chunk = max(1, (1 << 22) // (D * D))
            for lo in range(0, len(sel), chunk):
                r = rays[order[rowid[lo:lo + chunk]]]      # (C, D, 3)
                G = np.einsum("cid,cjd->cij", r, r)
                bad[sel[lo:lo + chunk]] = G.min(axis=(1, 2)) > cos_min_angle
        D *= 2
    # rare very long tracks (> Dcap observations): exact small loop
    for l in np.nonzero(~done)[0]:
        s, e = starts[l], starts[l + 1]
        G = rays[order[s:e]] @ rays[order[s:e]].T
        bad[l] = G.min() > cos_min_angle
    bad &= scene.X_valid
    removed = int(bad.sum())
    if removed:
        scene.X_valid &= ~bad
        scene.obs_valid &= scene.X_valid[scene.obs_landmark]
    return removed


def erase_unstable_poses_and_observations(scene: Scene,
                                          min_points_per_pose=6,
                                          min_points_per_landmark=2) -> bool:
    """Iterate pose/observation erasure to a fixed point
    (sfm_data_filters.hpp:77 eraseUnstablePosesAndObservations)."""
    changed_any = False
    while True:
        changed = False
        # pose support counts
        ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
        pid = scene.view_pose[scene.obs_view]
        pid_ok = (pid >= 0) & scene.pose_valid[np.clip(pid, 0, max(scene.n_poses - 1, 0))]
        counts = np.bincount(pid[ok & pid_ok], minlength=scene.n_poses)
        weak = scene.pose_valid & (counts < min_points_per_pose)
        if weak.any():
            scene.pose_valid &= ~weak
            changed = True
        # observations referencing dropped poses
        pid_ok = (pid >= 0) & scene.pose_valid[np.clip(pid, 0, max(scene.n_poses - 1, 0))]
        drop = scene.obs_valid & ~pid_ok
        if drop.any():
            scene.obs_valid &= pid_ok
            changed = True
        # short landmarks
        before = scene.X_valid.copy()
        _drop_short_tracks(scene, min_points_per_landmark)
        if (before != scene.X_valid).any():
            changed = True
        changed_any |= changed
        if not changed:
            return changed_any


def bad_track_rejector(scene: Scene, precision_px=4.0, count_threshold=50,
                       min_angle_deg=2.0) -> bool:
    """sequential_SfM.cpp:1226 badTrackRejector: returns True if more than
    `count_threshold` outliers were removed (meaning BA should rerun)."""
    n1 = remove_outliers_pixel_residual(scene, precision_px, 2)
    n2 = remove_outliers_angle_error(scene, min_angle_deg)
    return (n1 + n2) > count_threshold


def depth_cleaning(scene: Scene, k_factor=5.2, min_points_per_pose=12,
                   min_track_length=2):
    """X84-style per-view depth outlier removal (sfm_data_filters.cpp:391-469
    DepthCleaning): drop observations whose camera depth exceeds
    k_factor x that view's median depth, then erase unstable poses/points.
    Returns the minimum median depth across views."""
    import numpy as np

    ok = scene.obs_valid & scene.X_valid[scene.obs_landmark]
    pid = scene.view_pose[scene.obs_view]
    ok &= (pid >= 0) & scene.pose_valid[np.clip(pid, 0, max(scene.n_poses - 1, 0))]
    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return float("inf")
    R = scene.pose_R[pid[idx]]
    C = scene.pose_C[pid[idx]]
    X = scene.X[scene.obs_landmark[idx]]
    depth = np.einsum("nj,nj->n", R[:, 2, :], X - C)
    views = scene.obs_view[idx]

    med = {}
    min_median = float("inf")
    for v in np.unique(views):
        dv = depth[(views == v) & (depth > 0)]
        if len(dv):
            m = float(np.median(dv))
            med[int(v)] = k_factor * m
            min_median = min(min_median, m)
    thr = np.array([med.get(int(v), -1.0) for v in views])
    keep = (depth > 0) & (thr > 0) & (depth < thr)
    scene.obs_valid[idx[~keep]] = False
    erase_unstable_poses_and_observations(
        scene, min_points_per_pose, min_track_length)
    return min_median
