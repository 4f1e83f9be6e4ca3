"""openMVG-compatible scene IO: cereal-JSON `sfm_data.json` read/write.

Reference parity: sfm/sfm_data_io_cereal.cpp (Load_Cereal/Save_Cereal with
version "0.3"), sfm_view_io.hpp (local_path/filename/width/height/id_*),
cameras/*_io.hpp field names (focal_length, principal_point, disto_k1/k3,
disto_t2, fisheye), geometry/pose3_io.hpp (rotation 3x3 nested lists +
center), sfm_landmark_io.hpp (X + observations[{id_feat, x}]).

The cereal JSON polymorphic pointer encoding is reproduced:
  - first occurrence of a type: polymorphic_id = 0x80000001 | index,
    plus "polymorphic_name"
  - later occurrences: the plain registered index
  - non-polymorphic shared_ptr (plain View): polymorphic_id = 1073741824
  - ptr_wrapper ids: unique uint32 counters starting at 2147483649
Parts flags mirror ESfM_Data (sfm_data_io.hpp:22).
"""

import json
import os
from typing import Optional

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene

VIEWS = 1
INTRINSICS = 2
EXTRINSICS = 4
STRUCTURE = 8
CONTROL_POINTS = 16
ALL = VIEWS | INTRINSICS | EXTRINSICS | STRUCTURE | CONTROL_POINTS

_KIND_TO_NAME = dict(cm.KIND_NAMES)
_NAME_TO_KIND = dict(cm.KIND_FROM_NAME)

_DISTO_KEY = {
    cm.PINHOLE_RADIAL_K1: ("disto_k1", 1),
    cm.PINHOLE_RADIAL_K3: ("disto_k3", 3),
    cm.PINHOLE_BROWN: ("disto_t2", 5),
    cm.PINHOLE_FISHEYE: ("fisheye", 4),
}


# ---------------------------------------------------------------------------
# save
# ---------------------------------------------------------------------------

class _PtrIds:
    def __init__(self):
        self.next_ptr = 2147483649
        self.type_index = {}
        self.next_type = 0x80000001

    def ptr(self):
        v = self.next_ptr
        self.next_ptr += 1
        return v

    def poly(self, name):
        """(polymorphic_id, name_or_None) per cereal's first-use encoding:
        first use -> 0x80000000|index with the name; later uses -> index."""
        if name in self.type_index:
            return self.type_index[name], None
        idx = len(self.type_index) + 1
        self.type_index[name] = idx
        return 0x80000000 | idx, name


def save_sfm_data_json(scene: Scene, path: str, parts: int = ALL):
    doc = _doc_from_scene(scene, parts)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return True


def _doc_from_scene(scene: Scene, parts: int = ALL):
    ids = _PtrIds()
    doc = {
        "sfm_data_version": "0.3",
        "root_path": scene.root_path,
        "views": [],
        "intrinsics": [],
        "extrinsics": [],
        "structure": [],
        "control_points": [],
    }
    if parts & VIEWS:
        for v in range(scene.n_views):
            fname = scene.view_filename[v] if v < len(scene.view_filename) else f"view_{v}"
            data = {
                "local_path": "",
                "filename": fname,
                "width": int(scene.view_wh[v, 0]),
                "height": int(scene.view_wh[v, 1]),
                "id_view": int(v),
                "id_intrinsic": int(scene.view_intrinsic[v]),
                "id_pose": int(scene.view_pose[v]),
            }
            # GPS pose-center prior -> a ViewPriors node (sfm_view_priors_io.hpp)
            has_prior = (scene.prior_center is not None
                         and scene.prior_center_weight is not None
                         and np.any(scene.prior_center_weight[v] > 0))
            if has_prior:
                data["use_pose_center_prior"] = True
                data["center_weight"] = [
                    float(x) for x in scene.prior_center_weight[v]]
                data["center"] = [float(x) for x in scene.prior_center[v]]
                pid, pname = ids.poly("view_priors")
                value = {"polymorphic_id": pid}
                if pname is not None:
                    value["polymorphic_name"] = pname
                value["ptr_wrapper"] = {"id": ids.ptr(), "data": data}
            else:
                value = {
                    "polymorphic_id": 1073741824,
                    "ptr_wrapper": {"id": ids.ptr(), "data": data},
                }
            doc["views"].append({"key": int(v), "value": value})
    if parts & INTRINSICS:
        cams = scene.cameras
        for i in range(scene.n_intrinsics):
            kind = int(cams.kind[i])
            name = _KIND_TO_NAME[kind]
            data = {
                "width": int(cams.width[i]),
                "height": int(cams.height[i]),
            }
            if kind != cm.SPHERICAL:
                data["focal_length"] = float(cams.params[i, 0])
                data["principal_point"] = [float(cams.params[i, 1]),
                                           float(cams.params[i, 2])]
            if kind in _DISTO_KEY:
                key, n = _DISTO_KEY[kind]
                data[key] = [float(x) for x in cams.params[i, 3:3 + n]]
            pid, pname = ids.poly(name)
            value = {"polymorphic_id": pid}
            if pname is not None:
                value["polymorphic_name"] = pname
            value["ptr_wrapper"] = {"id": ids.ptr(), "data": data}
            doc["intrinsics"].append({"key": int(i), "value": value})
    if parts & EXTRINSICS:
        for p in range(scene.n_poses):
            if not scene.pose_valid[p]:
                continue
            doc["extrinsics"].append({
                "key": int(p),
                "value": {
                    "rotation": [[float(x) for x in row] for row in scene.pose_R[p]],
                    "center": [float(x) for x in scene.pose_C[p]],
                },
            })
    if parts & STRUCTURE:
        doc["structure"] = _landmarks_json(
            scene.X, scene.X_valid, scene.obs_landmark, scene.obs_view,
            scene.obs_x, scene.obs_feat, scene.obs_valid)
    if parts & CONTROL_POINTS and len(scene.cp_X):
        doc["control_points"] = _landmarks_json(
            scene.cp_X, np.ones(len(scene.cp_X), bool), scene.cp_obs_landmark,
            scene.cp_obs_view, scene.cp_obs_x, scene.cp_obs_feat,
            np.ones(len(scene.cp_obs_landmark), bool))
    return doc


def _landmarks_json(X, X_valid, ol, ov, ox, of, o_valid):
    order = np.argsort(ol, kind="stable")
    out = []
    obs_by_l = {}
    for idx in order:
        if not o_valid[idx]:
            continue
        obs_by_l.setdefault(int(ol[idx]), []).append(idx)
    for l in range(len(X)):
        if not X_valid[l]:
            continue
        obs = [
            {"key": int(ov[i]),
             "value": {"id_feat": int(of[i]),
                       "x": [float(ox[i, 0]), float(ox[i, 1])]}}
            for i in obs_by_l.get(l, [])
        ]
        out.append({"key": int(l),
                    "value": {"X": [float(x) for x in X[l]],
                              "observations": obs}})
    return out


# ---------------------------------------------------------------------------
# load
# ---------------------------------------------------------------------------

def load_sfm_data_json(path: str, parts: int = ALL) -> Scene:
    with open(path) as f:
        doc = json.load(f)
    return _scene_from_doc(doc, parts)


def _scene_from_doc(doc, parts: int = ALL) -> Scene:
    scene = Scene(root_path=doc.get("root_path", ""))

    if parts & VIEWS and doc.get("views"):
        entries = {int(e["key"]): e["value"] for e in doc["views"]}
        n = max(entries) + 1
        scene.view_filename = [""] * n
        scene.view_intrinsic = np.full(n, -1, np.int32)
        scene.view_pose = np.full(n, -1, np.int32)
        scene.view_wh = np.zeros((n, 2), np.int32)
        prior_c = np.zeros((n, 3))
        prior_w = np.zeros((n, 3))
        has_prior = False
        for k, val in entries.items():
            d = val["ptr_wrapper"]["data"]
            scene.view_filename[k] = os.path.join(
                d.get("local_path", ""), d["filename"]).lstrip("/") \
                if d.get("local_path") else d["filename"]
            scene.view_wh[k] = [d["width"], d["height"]]
            scene.view_intrinsic[k] = _undef(d["id_intrinsic"])
            scene.view_pose[k] = _undef(d["id_pose"])
            if d.get("use_pose_center_prior") or d.get("use_pose_center"):
                has_prior = True
                prior_c[k] = d.get("center", [0, 0, 0])
                w = d.get("center_weight", [1, 1, 1])
                prior_w[k] = w
        if has_prior:
            scene.prior_center = prior_c
            scene.prior_center_weight = prior_w

    if parts & INTRINSICS and doc.get("intrinsics"):
        entries = {int(e["key"]): e["value"] for e in doc["intrinsics"]}
        n = max(entries) + 1
        kind = np.zeros(n, np.int32)
        width = np.zeros(n)
        height = np.zeros(n)
        params = np.zeros((n, cm.MAX_PARAMS))
        name_by_poly = {}
        for k in sorted(entries):
            val = entries[k]
            pid = val.get("polymorphic_id", 0)
            if "polymorphic_name" in val:
                name = val["polymorphic_name"]
                name_by_poly[pid & 0x7FFFFFFF] = name
            else:
                name = name_by_poly.get(pid, "pinhole")
            d = val["ptr_wrapper"]["data"]
            kd = _NAME_TO_KIND.get(name, cm.PINHOLE)
            kind[k] = kd
            width[k] = d["width"]
            height[k] = d["height"]
            if kd != cm.SPHERICAL:
                params[k, 0] = d.get("focal_length", 1.0)
                pp = d.get("principal_point", [d["width"] / 2, d["height"] / 2])
                params[k, 1:3] = pp
            if kd in _DISTO_KEY:
                key, nn = _DISTO_KEY[kd]
                disto = d.get(key, [0.0] * nn)
                params[k, 3:3 + nn] = disto
        scene.cameras = cm.Cameras(kind=kind, width=width, height=height,
                                   params=params)

    # pose table always sized to cover view pose ids (a scene with no
    # extrinsics yet still needs writable pose slots for the engines)
    entries = ({int(e["key"]): e["value"] for e in doc.get("extrinsics", [])}
               if parts & EXTRINSICS else {})
    n = (max(entries) + 1) if entries else 0
    if scene.n_views and len(scene.view_pose):
        n = max(n, int(scene.view_pose.max()) + 1)
    scene.pose_valid = np.zeros(n, bool)
    scene.pose_R = np.tile(np.eye(3), (n, 1, 1))
    scene.pose_C = np.zeros((n, 3))
    for k, val in entries.items():
        scene.pose_valid[k] = True
        scene.pose_R[k] = np.asarray(val["rotation"], float)
        scene.pose_C[k] = np.asarray(val["center"], float)

    if parts & STRUCTURE and doc.get("structure"):
        _load_landmarks(doc["structure"], scene)

    if parts & CONTROL_POINTS and doc.get("control_points"):
        X, ol, ov, ox, of = _landmarks_arrays(doc["control_points"])
        scene.cp_X, scene.cp_obs_landmark, scene.cp_obs_view = X, ol, ov
        scene.cp_obs_x, scene.cp_obs_feat = ox, of
    return scene


def _undef(v):
    # openMVG UndefinedIndexT = 4294967295
    return np.int32(-1) if int(v) >= 2**31 else np.int32(v)


def _landmarks_arrays(entries):
    keys = [int(e["key"]) for e in entries]
    n = (max(keys) + 1) if keys else 0
    X = np.zeros((n, 3))
    ol, ov, ox, of = [], [], [], []
    for e in entries:
        k = int(e["key"])
        X[k] = e["value"]["X"]
        for o in e["value"]["observations"]:
            ol.append(k)
            ov.append(int(o["key"]))
            ox.append(o["value"]["x"])
            of.append(int(o["value"]["id_feat"]))
    return (X, np.asarray(ol, np.int32), np.asarray(ov, np.int32),
            np.asarray(ox, float).reshape(-1, 2), np.asarray(of, np.int32))


def _load_landmarks(entries, scene: Scene):
    keys = [int(e["key"]) for e in entries]
    X, ol, ov, ox, of = _landmarks_arrays(entries)
    scene.X = X
    scene.X_valid = np.zeros(len(X), bool)
    if keys:
        scene.X_valid[np.asarray(keys)] = True
    scene.obs_landmark, scene.obs_view = ol, ov
    scene.obs_x, scene.obs_feat = ox, of
    scene.obs_valid = np.ones(len(ol), bool)


def load_sfm_data(path: str, parts: int = ALL) -> Optional[Scene]:
    """Format dispatch mirroring sfm_data_io.cpp Load (json/bin)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return load_sfm_data_json(path, parts)
    if ext == ".xml":
        from openmvg_tpu.io.sfm_data_xml import load_sfm_data_xml

        return load_sfm_data_xml(path, parts)
    if ext == ".bin":
        from openmvg_tpu.io.sfm_data_bin import load_sfm_data_bin

        return load_sfm_data_bin(path, parts)
    raise ValueError(f"unsupported sfm_data extension: {ext}")


def save_sfm_data(scene: Scene, path: str, parts: int = ALL):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return save_sfm_data_json(scene, path, parts)
    if ext == ".xml":
        from openmvg_tpu.io.sfm_data_xml import save_sfm_data_xml

        return save_sfm_data_xml(scene, path, parts)
    if ext == ".bin":
        from openmvg_tpu.io.sfm_data_bin import save_sfm_data_bin

        return save_sfm_data_bin(scene, path, parts)
    raise ValueError(f"unsupported sfm_data extension: {ext}")
