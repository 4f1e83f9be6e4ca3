"""Structure estimation from known poses: guided epipolar matching +
robust triangulation.

Reference parity: sfm/pipelines/structure_from_known_poses/
structure_estimator.cpp (per-pair guided matching constrained to the
epipolar geometry implied by the known poses, track fusion, robust
N-view triangulation) and robust_estimation/guided_matching.hpp;
CLI main_ComputeStructureFromKnownPoses.cpp:96-108.
"""

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.ops import fundamental, matching
from openmvg_tpu.sfm.scene import Scene
from openmvg_tpu.sfm.scene_triangulation import triangulate_tracks
from openmvg_tpu.sfm.tracks import build_tracks


def _pair_F(scene, va, vb):
    """F between two posed views from K, R, C."""
    pa, pb = scene.view_pose[va], scene.view_pose[vb]
    ia, ib = scene.view_intrinsic[va], scene.view_intrinsic[vb]
    Ka = np.asarray(cm.K_matrix(jnp.asarray(np.asarray(scene.cameras.params)[ia])))
    Kb = np.asarray(cm.K_matrix(jnp.asarray(np.asarray(scene.cameras.params)[ib])))
    R = scene.pose_R[pb] @ scene.pose_R[pa].T
    t = scene.pose_R[pb] @ (scene.pose_C[pa] - scene.pose_C[pb])
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return np.linalg.inv(Kb).T @ E @ np.linalg.inv(Ka)


def guided_matching_pair(scene, va, vb, feats_a, feats_b, desc_a, desc_b,
                         epipolar_threshold_px=4.0, ratio=0.8, F=None):
    """Descriptor matching restricted to epipolar-consistent candidates
    (guided_matching.hpp: distance-to-line gating + NN ratio).  F defaults
    to the pose-derived fundamental; pass one explicitly to guide with a
    robustly-estimated model (GeometricFilter -r)."""
    if F is None:
        F = _pair_F(scene, va, vb)
    res = matching.match_brute_force(jnp.asarray(desc_a), jnp.asarray(desc_b),
                                     ratio=ratio)
    mask = np.asarray(res.mask)
    ia = np.nonzero(mask)[0]
    ib = np.asarray(res.idx_b)[ia]
    if len(ia) == 0:
        return np.zeros((0, 2), np.int64)
    err = np.asarray(fundamental.point_line_error_sq(
        jnp.asarray(F), jnp.asarray(feats_a[ia, :2]),
        jnp.asarray(feats_b[ib, :2])))
    keep = err <= epipolar_threshold_px**2
    return np.stack([ia[keep], ib[keep]], axis=1).astype(np.int64)


def structure_from_known_poses(scene: Scene, features: List[np.ndarray],
                               descs: List[np.ndarray],
                               pairs: List[Tuple[int, int]] = None,
                               epipolar_threshold_px=4.0,
                               triangulation_threshold_px=4.0,
                               min_angle_deg=2.0, ratio=0.8):
    """Estimate structure given poses; replaces scene structure in place."""
    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    if pairs is None:
        pairs = [(i, j) for ii, i in enumerate(posed) for j in posed[ii + 1:]]
    pw: Dict[Tuple[int, int], np.ndarray] = {}
    for (i, j) in pairs:
        m = guided_matching_pair(scene, i, j, features[i], features[j],
                                 descs[i], descs[j],
                                 epipolar_threshold_px, ratio)
        if len(m) >= 2:
            pw[(i, j)] = m
    tracks = build_tracks(pw, min_length=2)
    if tracks.n_tracks == 0:
        return scene
    obs_xy = np.zeros((len(tracks.track_id), 2))
    for v in posed:
        sel = tracks.view_id == v
        obs_xy[sel] = features[v][tracks.feat_id[sel], :2]
    X, ok = triangulate_tracks(scene, tracks.view_id, obs_xy, tracks.track_id,
                               tracks.n_tracks, min_angle_deg,
                               triangulation_threshold_px)
    good = np.nonzero(ok)[0]
    remap = np.full(tracks.n_tracks, -1, np.int64)
    remap[good] = np.arange(len(good))
    keep_obs = remap[tracks.track_id] >= 0
    scene.X = X[good]
    scene.X_valid = np.ones(len(good), bool)
    scene.obs_landmark = remap[tracks.track_id[keep_obs]].astype(np.int32)
    scene.obs_view = tracks.view_id[keep_obs]
    scene.obs_x = obs_xy[keep_obs]
    scene.obs_feat = tracks.feat_id[keep_obs]
    scene.obs_valid = np.ones(int(keep_obs.sum()), bool)
    return scene
