"""The Scene container — openMVG's SfM_Data as dense arrays.

Reference parity: sfm/sfm_data.hpp:35-76 —
  SfM_Data { views, intrinsics, poses, structure, control_points, root_path }
with View {path, id_view, id_intrinsic, id_pose, w, h} (sfm_view.hpp:20),
Landmark {X, obs: {view: (x, id_feat)}} (sfm_landmark.hpp:18-53).

Instead of id->object hash maps, a Scene is struct-of-arrays keyed by dense
ids with validity masks; observations are one flat table (the natural BA
Jacobian block list).  Host side it's numpy; device kernels receive the
arrays they need.  Metadata (paths) stays in python lists.
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.utils import hostmath

UNDEF = np.int32(-1)


@dataclasses.dataclass
class Scene:
    root_path: str = ""
    # views (dense by view id)
    view_filename: List[str] = dataclasses.field(default_factory=list)
    view_intrinsic: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    view_pose: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    view_wh: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 2), np.int32))
    # view priors (GPS): weight <= 0 means no prior (sfm_view_priors.hpp)
    prior_center: Optional[np.ndarray] = None       # (V, 3)
    prior_center_weight: Optional[np.ndarray] = None  # (V, 3)
    # intrinsics (dense by intrinsic id)
    cameras: cm.Cameras = dataclasses.field(
        default_factory=lambda: cm.Cameras(
            kind=np.zeros(0, np.int32), width=np.zeros(0), height=np.zeros(0),
            params=np.zeros((0, cm.MAX_PARAMS))))
    # poses (dense by pose id); world->cam x_c = R (X - C)
    pose_valid: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, bool))
    pose_R: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 3, 3)))
    pose_C: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 3)))
    # structure: landmarks + flat observation table
    X: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 3)))
    X_valid: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, bool))
    obs_landmark: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    obs_view: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    obs_x: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 2)))
    obs_feat: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    obs_valid: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, bool))
    # control points: same landmark layout, separate table (sfm_data.hpp control_points)
    cp_X: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 3)))
    cp_obs_landmark: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    cp_obs_view: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))
    cp_obs_x: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 2)))
    cp_obs_feat: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, np.int32))

    # ---- counts -----------------------------------------------------------
    @property
    def n_views(self):
        return len(self.view_intrinsic)

    @property
    def n_intrinsics(self):
        return len(self.cameras.kind)

    @property
    def n_poses(self):
        return len(self.pose_valid)

    @property
    def n_landmarks(self):
        return int(np.sum(self.X_valid))

    @property
    def n_observations(self):
        return int(np.sum(self.obs_valid))

    # ---- helpers ----------------------------------------------------------
    def valid_view_poses(self):
        """View ids whose pose is estimated (GetPoses ∩ views)."""
        pid = self.view_pose
        ok = (pid >= 0) & (pid < self.n_poses)
        out = np.zeros(self.n_views, bool)
        out[ok] = self.pose_valid[pid[ok]]
        return np.nonzero(out)[0]

    def obs_arrays_for_ba(self):
        """Gathered per-observation arrays (camera pose id, intrinsic id,
        landmark id, pixel) restricted to valid obs on valid poses/points."""
        ok = self.obs_valid.copy()
        pid = self.view_pose[self.obs_view]
        ok &= self.pose_valid[np.clip(pid, 0, max(self.n_poses - 1, 0))] & (pid >= 0)
        ok &= self.X_valid[self.obs_landmark]
        sel = np.nonzero(ok)[0]
        return dict(
            obs_idx=sel,
            pose_id=pid[sel],
            intr_id=self.view_intrinsic[self.obs_view[sel]],
            landmark_id=self.obs_landmark[sel],
            x=self.obs_x[sel],
        )

    def compact_structure(self):
        """Drop invalid landmarks/observations and renumber densely."""
        keep_l = np.nonzero(self.X_valid)[0]
        remap = np.full(len(self.X_valid), -1, np.int32)
        remap[keep_l] = np.arange(len(keep_l), dtype=np.int32)
        keep_o = self.obs_valid & (remap[self.obs_landmark] >= 0)
        self.X = self.X[keep_l]
        self.X_valid = np.ones(len(keep_l), bool)
        self.obs_landmark = remap[self.obs_landmark[keep_o]]
        self.obs_view = self.obs_view[keep_o]
        self.obs_x = self.obs_x[keep_o]
        self.obs_feat = self.obs_feat[keep_o]
        self.obs_valid = np.ones(int(keep_o.sum()), bool)
        return self


def group_shared_intrinsics(scene: Scene):
    """Merge identical intrinsics and remap views
    (sfm_data_utils.cpp GroupSharedIntrinsics)."""
    cams = scene.cameras
    keys = {}
    remap = np.zeros(scene.n_intrinsics, np.int32)
    kept = []
    for i in range(scene.n_intrinsics):
        key = (int(cams.kind[i]), float(cams.width[i]), float(cams.height[i]),
               tuple(np.round(np.asarray(cams.params)[i], 12)))
        if key not in keys:
            keys[key] = len(kept)
            kept.append(i)
        remap[i] = keys[key]
    if len(kept) == scene.n_intrinsics:
        return scene
    from openmvg_tpu.models import cameras as cm

    scene.cameras = cm.Cameras(
        kind=np.asarray(cams.kind)[kept],
        width=np.asarray(cams.width)[kept],
        height=np.asarray(cams.height)[kept],
        params=np.asarray(cams.params)[kept])
    ok = scene.view_intrinsic >= 0
    scene.view_intrinsic[ok] = remap[scene.view_intrinsic[ok]]
    return scene


def reprojection_residuals(scene: Scene):
    """All-valid-observation residuals (host convenience, numpy).

    Returns (residuals (M, 2), info dict from obs_arrays_for_ba).
    """
    info = scene.obs_arrays_for_ba()
    if len(info["obs_idx"]) == 0:
        return np.zeros((0, 2)), info
    R = scene.pose_R[info["pose_id"]]
    C = scene.pose_C[info["pose_id"]]
    Xc = np.einsum("nij,nj->ni", R, scene.X[info["landmark_id"]] - C)
    cams = scene.cameras
    k = np.asarray(cams.kind, np.int32)[info["intr_id"]]
    params = np.asarray(cams.params, np.float64)[info["intr_id"]]
    w = np.asarray(cams.width, np.float64)[info["intr_id"]]
    h = np.asarray(cams.height, np.float64)[info["intr_id"]]
    # host numpy twin: f64-exact (the engine-test metric needs it) and
    # cheaper than any device round-trip through the axon tunnel
    proj = hostmath.project_cam_np(k, params, w, h, Xc)
    return proj - info["x"], info


def rmse(scene: Scene):
    """Root-mean-square reprojection error over valid observations
    (the engine-test metric, sfm/pipelines tests)."""
    r, _ = reprojection_residuals(scene)
    if len(r) == 0:
        return float("inf")
    return float(np.sqrt(np.mean(np.sum(r * r, axis=1) / 1.0)))
