"""Binary sfm_data.bin scene codec.

Reference parity: sfm_data_io_cereal.cpp with cereal PortableBinary —
same document structure as the JSON (version, root_path, views,
intrinsics, extrinsics, structure, control points) in a little-endian
binary layout: [u8 endian=1][string version][string root_path] then the
five sections, each [u64 count] of entries.  cereal string = [u64 size]
[bytes]; polymorphic intrinsics = [u32 poly_id(+name on first use)] then
the payload doubles.

NOTE: self-consistent round-trip format following cereal's documented
framing; byte-exactness against reference-generated .bin files is not yet
validated in this environment (no reference binaries) — JSON remains the
verified interop path, and the CLI defaults to JSON.
"""

import struct

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene
from openmvg_tpu.io.sfm_data import (ALL, VIEWS, INTRINSICS, EXTRINSICS,
                                     STRUCTURE, CONTROL_POINTS, _DISTO_KEY,
                                     _KIND_TO_NAME, _NAME_TO_KIND)


class _W:
    def __init__(self):
        self.parts = []

    def u8(self, v):
        self.parts.append(struct.pack("<B", v))

    def u32(self, v):
        self.parts.append(struct.pack("<I", int(v) & 0xFFFFFFFF))

    def u64(self, v):
        self.parts.append(struct.pack("<Q", v))

    def f64(self, v):
        self.parts.append(struct.pack("<d", float(v)))

    def f64s(self, arr):
        self.parts.append(np.asarray(arr, "<f8").tobytes())

    def s(self, text):
        b = text.encode()
        self.u64(len(b))
        self.parts.append(b)

    def bytes(self):
        return b"".join(self.parts)


class _R:
    def __init__(self, data):
        self.d = data
        self.pos = 0

    def u8(self):
        (v,) = struct.unpack_from("<B", self.d, self.pos)
        self.pos += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.d, self.pos)
        self.pos += 4
        return v

    def u64(self):
        (v,) = struct.unpack_from("<Q", self.d, self.pos)
        self.pos += 8
        return v

    def f64(self):
        (v,) = struct.unpack_from("<d", self.d, self.pos)
        self.pos += 8
        return v

    def f64s(self, n):
        out = np.frombuffer(self.d, "<f8", count=n, offset=self.pos)
        self.pos += 8 * n
        return out

    def s(self):
        n = self.u64()
        out = self.d[self.pos:self.pos + n].decode()
        self.pos += n
        return out


def save_sfm_data_bin(scene: Scene, path: str, parts: int = ALL):
    w = _W()
    w.u8(1)  # endian flag
    w.s("0.4")  # 0.4 adds a per-view GPS pose-center prior block
    w.s(scene.root_path)
    # views
    n_views = scene.n_views if parts & VIEWS else 0
    w.u64(n_views)
    for v in range(n_views):
        w.u32(v)
        w.s(scene.view_filename[v] if v < len(scene.view_filename) else "")
        w.u32(scene.view_wh[v, 0])
        w.u32(scene.view_wh[v, 1])
        w.u32(v)
        w.u32(scene.view_intrinsic[v])
        w.u32(scene.view_pose[v])
        has_prior = (scene.prior_center is not None
                     and scene.prior_center_weight is not None
                     and np.any(scene.prior_center_weight[v] > 0))
        w.u8(1 if has_prior else 0)
        if has_prior:
            w.f64s(scene.prior_center[v])
            w.f64s(scene.prior_center_weight[v])
    # intrinsics
    n_intr = scene.n_intrinsics if parts & INTRINSICS else 0
    w.u64(n_intr)
    cams = scene.cameras
    for i in range(n_intr):
        kind = int(cams.kind[i])
        w.u32(i)
        w.s(_KIND_TO_NAME[kind])
        w.u32(int(cams.width[i]))
        w.u32(int(cams.height[i]))
        nd = _DISTO_KEY.get(kind, (None, 0))[1]
        if kind != cm.SPHERICAL:
            w.f64s(cams.params[i, : 3 + nd])
        w.u8(3 + nd if kind != cm.SPHERICAL else 0)
    # extrinsics
    poses = np.nonzero(scene.pose_valid)[0] if parts & EXTRINSICS else []
    w.u64(len(poses))
    for p in poses:
        w.u32(p)
        w.f64s(scene.pose_R[p].reshape(-1))
        w.f64s(scene.pose_C[p])
    # structure
    _write_landmarks(w, scene, parts & STRUCTURE)
    # control points
    if parts & CONTROL_POINTS and len(scene.cp_X):
        w.u64(len(scene.cp_X))
        obs_by = {}
        for k in range(len(scene.cp_obs_landmark)):
            obs_by.setdefault(int(scene.cp_obs_landmark[k]), []).append(k)
        for l in range(len(scene.cp_X)):
            w.u32(l)
            w.f64s(scene.cp_X[l])
            obs = obs_by.get(l, [])
            w.u64(len(obs))
            for k in obs:
                w.u32(scene.cp_obs_view[k])
                w.u32(scene.cp_obs_feat[k])
                w.f64s(scene.cp_obs_x[k])
    else:
        w.u64(0)
    with open(path, "wb") as f:
        f.write(w.bytes())
    return True


def _write_landmarks(w, scene, enabled):
    lms = np.nonzero(scene.X_valid)[0] if enabled else []
    w.u64(len(lms))
    obs_by = {}
    for k in np.nonzero(scene.obs_valid)[0]:
        obs_by.setdefault(int(scene.obs_landmark[k]), []).append(k)
    for l in lms:
        w.u32(l)
        w.f64s(scene.X[l])
        obs = obs_by.get(int(l), [])
        w.u64(len(obs))
        for k in obs:
            w.u32(scene.obs_view[k])
            w.u32(scene.obs_feat[k])
            w.f64s(scene.obs_x[k])


def _version_tuple(version: str):
    """Numeric version compare ("0.10" > "0.4"; lexicographic would not)."""
    try:
        return tuple(int(x) for x in version.split("."))
    except ValueError:
        return (0,)


def load_sfm_data_bin(path: str, parts: int = ALL) -> Scene:
    with open(path, "rb") as f:
        r = _R(f.read())
    r.u8()
    version = r.s()
    scene = Scene(root_path=r.s())
    # views
    n = r.u64()
    if n:
        rows = []
        priors = []
        for _ in range(n):
            key = r.u32()
            rows.append((key, r.s(), r.u32(), r.u32(), r.u32(), r.u32(),
                         r.u32()))
            if _version_tuple(version) >= (0, 4) and r.u8():
                priors.append((key, r.f64s(3), r.f64s(3)))
        size = max(k for k, *_ in rows) + 1
        scene.view_filename = [""] * size
        scene.view_wh = np.zeros((size, 2), np.int32)
        scene.view_intrinsic = np.full(size, -1, np.int32)
        scene.view_pose = np.full(size, -1, np.int32)
        for (k, name, wdt, hgt, _vid, iid, pid) in rows:
            scene.view_filename[k] = name
            scene.view_wh[k] = [wdt, hgt]
            scene.view_intrinsic[k] = np.int32(iid if iid < 2**31 else -1)
            scene.view_pose[k] = np.int32(pid if pid < 2**31 else -1)
        if priors:
            scene.prior_center = np.zeros((size, 3))
            scene.prior_center_weight = np.zeros((size, 3))
            for (k, c, wgt) in priors:
                scene.prior_center[k] = c
                scene.prior_center_weight[k] = wgt
    # intrinsics
    n = r.u64()
    if n:
        size = n
        kind = np.zeros(n, np.int32)
        width = np.zeros(n)
        height = np.zeros(n)
        params = np.zeros((n, cm.MAX_PARAMS))
        for _ in range(n):
            k = r.u32()
            name = r.s()
            width[k] = r.u32()
            height[k] = r.u32()
            kd = _NAME_TO_KIND.get(name, cm.PINHOLE)
            kind[k] = kd
            # peek param count comes after values; read via kind table
            nd = _DISTO_KEY.get(kd, (None, 0))[1]
            np_ = 3 + nd if kd != cm.SPHERICAL else 0
            if np_:
                params[k, :np_] = r.f64s(np_)
            r.u8()  # stored count (redundant)
        scene.cameras = cm.Cameras(kind=kind, width=width, height=height,
                                   params=params)
    # extrinsics
    n = r.u64()
    rows = []
    for _ in range(n):
        k = r.u32()
        R = r.f64s(9).reshape(3, 3)
        C = r.f64s(3)
        rows.append((k, R, C))
    size = max([k for k, *_ in rows], default=-1) + 1
    if scene.n_views and len(scene.view_pose):
        size = max(size, int(scene.view_pose.max()) + 1)
    scene.pose_valid = np.zeros(size, bool)
    scene.pose_R = np.tile(np.eye(3), (size, 1, 1))
    scene.pose_C = np.zeros((size, 3))
    for (k, R, C) in rows:
        scene.pose_valid[k] = True
        scene.pose_R[k] = R
        scene.pose_C[k] = C
    # structure
    n = r.u64()
    if n:
        keys, ol, ov, of, ox = [], [], [], [], []
        Xs = {}
        for _ in range(n):
            k = r.u32()
            Xs[k] = r.f64s(3)
            m = r.u64()
            for _ in range(m):
                ov.append(r.u32())
                of.append(r.u32())
                ox.append(r.f64s(2))
                ol.append(k)
            keys.append(k)
        size = max(keys) + 1
        scene.X = np.zeros((size, 3))
        scene.X_valid = np.zeros(size, bool)
        for k, X in Xs.items():
            scene.X[k] = X
            scene.X_valid[k] = True
        scene.obs_landmark = np.asarray(ol, np.int32)
        scene.obs_view = np.asarray(ov, np.int32)
        scene.obs_feat = np.asarray(of, np.int32)
        scene.obs_x = np.asarray(ox).reshape(-1, 2)
        scene.obs_valid = np.ones(len(ol), bool)
    # control points
    n = r.u64()
    if n:
        ol, ov, of, ox = [], [], [], []
        Xs = np.zeros((n, 3))
        for _ in range(n):
            k = r.u32()
            Xs[k] = r.f64s(3)
            m = r.u64()
            for _ in range(m):
                ov.append(r.u32())
                of.append(r.u32())
                ox.append(r.f64s(2))
                ol.append(k)
        scene.cp_X = Xs
        scene.cp_obs_landmark = np.asarray(ol, np.int32)
        scene.cp_obs_view = np.asarray(ov, np.int32)
        scene.cp_obs_feat = np.asarray(of, np.int32)
        scene.cp_obs_x = np.asarray(ox).reshape(-1, 2) if ox else np.zeros((0, 2))
    return scene
