"""Fast native scene snapshots (checkpoint/resume).

Reference parity: SURVEY §5 — the reference's resumability is stage files
plus per-round PLY dumps; here a Scene snapshots to one compressed .npz in
milliseconds (poses, structure, observation table, camera params,
metadata), so engines can checkpoint per round and resume mid-run.  The
openMVG-format json/bin writers remain the interop path.
"""

import json

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene

_ARRAYS = [
    "view_intrinsic", "view_pose", "view_wh", "pose_valid", "pose_R",
    "pose_C", "X", "X_valid", "obs_landmark", "obs_view", "obs_x",
    "obs_feat", "obs_valid", "cp_X", "cp_obs_landmark", "cp_obs_view",
    "cp_obs_x", "cp_obs_feat",
]


def save_snapshot(scene: Scene, path: str):
    meta = dict(root_path=scene.root_path,
                view_filename=list(scene.view_filename),
                has_priors=scene.prior_center is not None)
    payload = {k: np.asarray(getattr(scene, k)) for k in _ARRAYS}
    payload["cam_kind"] = np.asarray(scene.cameras.kind)
    payload["cam_width"] = np.asarray(scene.cameras.width)
    payload["cam_height"] = np.asarray(scene.cameras.height)
    payload["cam_params"] = np.asarray(scene.cameras.params)
    if scene.prior_center is not None:
        payload["prior_center"] = scene.prior_center
        payload["prior_center_weight"] = scene.prior_center_weight
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)
    return True


def load_snapshot(path: str) -> Scene:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(z["meta_json"]).decode())
    scene = Scene(root_path=meta["root_path"])
    scene.view_filename = list(meta["view_filename"])
    for k in _ARRAYS:
        setattr(scene, k, z[k].copy())
    scene.cameras = cm.Cameras(kind=z["cam_kind"].copy(),
                               width=z["cam_width"].copy(),
                               height=z["cam_height"].copy(),
                               params=z["cam_params"].copy())
    if meta.get("has_priors"):
        scene.prior_center = z["prior_center"].copy()
        scene.prior_center_weight = z["prior_center_weight"].copy()
    return scene
