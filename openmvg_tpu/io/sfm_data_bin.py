"""Binary sfm_data.bin scene codec — cereal PortableBinary, byte-true.

Reference parity: sfm_data_io_cereal.cpp Save_Cereal/Load_Cereal with
cereal::PortableBinaryOutputArchive.  Encoding (little-endian throughout;
the reference's cereal submodule is vendored at
src/dependencies/cereal — framing below follows cereal 1.x
portable_binary.hpp + types/{map,vector,string,polymorphic,memory}.hpp):

  archive header   u8 0x01 (is_little_endian bool, written by the
                   PortableBinaryOutputArchive constructor)
  string           u64 size + bytes
  vector<T>        u64 size + elements (nested vectors carry their own tag)
  map<K,V>         u64 size + (key, value) pairs
  shared_ptr<Base> u32 polymorphic_id, then:
                     0          -> nullptr, nothing follows
                     0x40000000 -> dynamic type == static type, no name
                     msb set    -> first use of a registered derived type:
                                   u32 = 0x80000000|type_index (indices
                                   count from 1 per archive) + name string
                     else       -> type_index of an earlier name
                   then u32 ptr_id from a second per-archive counter
                   (0x80000000|n for a first-seen pointer, payload
                   follows; bare n for an aliased pointer, no payload)

Document layout (Save_Cereal, sfm_data_io_cereal.cpp:246-290): version
string "0.3", root_path, then views / intrinsics / extrinsics /
structure / control_points.  Field payloads:

  View           local_path, filename (strings), width u32, height u32,
                 id_view u32, id_intrinsic u32, id_pose u32
                 (sfm_view_io.hpp View::save)
  ViewPriors     View + bool u8(1) + center_weight vec3 + center vec3 —
                 written ONLY when b_use_pose_center_ (sfm_view_priors_io
                 .hpp; registered name "view_priors")
  IntrinsicBase  width u32, height u32 (Camera_Intrinsics_io.hpp)
  Pinhole*       + focal f64 + principal_point vector<double>(2)
                 + disto vector<double> per model (Camera_Pinhole_*_io.hpp;
                 names pinhole/pinhole_radial_k1/pinhole_radial_k3/
                 pinhole_brown_t2/fisheye; spherical = base only)
  Pose3          rotation vector<vector<double>> (3 rows, EACH with its
                 own u64 size tag) + center vector<double>(3)
                 (pose3_io.hpp)
  Landmark       X vector<double>(3) + obs map<view_id u32, Observation>;
                 Observation = id_feat u32 + x vector<double>(2)
                 (sfm_landmark_io.hpp)

The reference's std::unordered_map iteration order is unspecified, so
byte-equality of whole files is only defined for a CHOSEN order; this
writer emits ascending keys.  The reader accepts any entry order (keyed
rows), which is what the reference reader guarantees too.  Golden-bytes
fixtures: tests/test_cereal_golden.py pins both directions.
"""

import struct

import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene
from openmvg_tpu.io.sfm_data import (ALL, VIEWS, INTRINSICS, EXTRINSICS,
                                     STRUCTURE, CONTROL_POINTS, _DISTO_KEY,
                                     _KIND_TO_NAME, _NAME_TO_KIND, _PtrIds)

_MSB = 0x80000000
_MSB2 = 0x40000000  # cereal detail::msb2_32bit: dynamic type == static type


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

    def vec(self, arr):
        """std::vector<double>: u64 size tag + raw doubles."""
        a = np.asarray(arr, "<f8").reshape(-1)
        self.u64(len(a))
        self.parts.append(a.tobytes())

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

    def vec(self):
        return self.f64s(self.u64())

    def s(self):
        n = self.u64()
        out = self.d[self.pos:self.pos + n].decode()
        self.pos += n
        return out


def _write_poly_header(w, ids: _PtrIds, name):
    """shared_ptr polymorphic preamble; name=None -> static == dynamic."""
    if name is None:
        w.u32(_MSB2)
    else:
        pid, pname = ids.poly(name)
        w.u32(pid)
        if pname is not None:
            w.s(pname)
    w.u32(ids.ptr())  # unique pointer -> msb set, payload follows


def save_sfm_data_bin(scene: Scene, path: str, parts: int = ALL):
    w = _W()
    ids = _PtrIds()
    w.u8(1)  # PortableBinaryOutputArchive endianness bool
    w.s("0.3")
    w.s(scene.root_path)
    # views
    n_views = scene.n_views if parts & VIEWS else 0
    w.u64(n_views)
    for v in range(n_views):
        has_prior = (scene.prior_center is not None
                     and scene.prior_center_weight is not None
                     and np.any(scene.prior_center_weight[v] > 0))
        w.u32(v)
        _write_poly_header(w, ids, "view_priors" if has_prior else None)
        w.s("")  # local_path (filenames are root-relative)
        w.s(scene.view_filename[v] if v < len(scene.view_filename) else "")
        w.u32(scene.view_wh[v, 0])
        w.u32(scene.view_wh[v, 1])
        w.u32(v)
        w.u32(scene.view_intrinsic[v])
        w.u32(scene.view_pose[v])
        if has_prior:
            w.u8(1)  # b_use_pose_center_
            w.vec(scene.prior_center_weight[v])
            w.vec(scene.prior_center[v])
    # intrinsics
    n_intr = scene.n_intrinsics if parts & INTRINSICS else 0
    w.u64(n_intr)
    cams = scene.cameras
    for i in range(n_intr):
        kind = int(cams.kind[i])
        w.u32(i)
        _write_poly_header(w, ids, _KIND_TO_NAME[kind])
        w.u32(int(cams.width[i]))
        w.u32(int(cams.height[i]))
        if kind != cm.SPHERICAL:
            w.f64(cams.params[i, 0])          # focal_length
            w.vec(cams.params[i, 1:3])        # principal_point
            nd = _DISTO_KEY.get(kind, (None, 0))[1]
            if nd:
                w.vec(cams.params[i, 3:3 + nd])
    # extrinsics
    poses = np.nonzero(scene.pose_valid)[0] if parts & EXTRINSICS else []
    w.u64(len(poses))
    for p in poses:
        w.u32(p)
        w.u64(3)  # rotation: vector of 3 row-vectors
        for row in scene.pose_R[p]:
            w.vec(row)
        w.vec(scene.pose_C[p])
    # structure
    _write_landmarks(
        w, scene.X, scene.X_valid, scene.obs_landmark, scene.obs_view,
        scene.obs_feat, scene.obs_x, scene.obs_valid,
        enabled=bool(parts & STRUCTURE))
    # control points
    _write_landmarks(
        w, scene.cp_X, np.ones(len(scene.cp_X), bool), scene.cp_obs_landmark,
        scene.cp_obs_view, scene.cp_obs_feat, scene.cp_obs_x,
        np.ones(len(scene.cp_obs_landmark), bool),
        enabled=bool(parts & CONTROL_POINTS) and len(scene.cp_X) > 0)
    with open(path, "wb") as f:
        f.write(w.bytes())
    return True


def _write_landmarks(w, X, X_valid, obs_landmark, obs_view, obs_feat, obs_x,
                     obs_valid, enabled):
    lms = np.nonzero(X_valid)[0] if enabled else []
    w.u64(len(lms))
    obs_by = {}
    for k in np.nonzero(obs_valid)[0]:
        obs_by.setdefault(int(obs_landmark[k]), []).append(k)
    for l in lms:
        w.u32(l)
        w.vec(X[l])
        obs = obs_by.get(int(l), [])
        w.u64(len(obs))
        for k in obs:
            w.u32(obs_view[k])     # Observations map key = view id
            w.u32(obs_feat[k])     # Observation payload: id_feat ...
            w.vec(obs_x[k])        # ... then x
    return w


class _PolyReader:
    """Per-archive polymorphic-id and pointer-id bookkeeping (load side)."""

    def __init__(self, r: _R):
        self.r = r
        self.names = {}  # type_index -> registered name

    def header(self):
        """Returns the registered type name, or None for static==dynamic.
        Raises on nullptr / aliased shared pointers (the reference never
        emits either for SfM_Data containers)."""
        pid = self.r.u32()
        if pid == 0:
            raise ValueError("nullptr shared_ptr in sfm_data.bin")
        if pid == _MSB2:
            name = None
        elif pid & _MSB:
            idx = pid & ~_MSB
            name = self.r.s()
            self.names[idx] = name
        else:
            name = self.names[pid]
        ptr_id = self.r.u32()
        if not ptr_id & _MSB:
            raise ValueError("aliased shared_ptr in sfm_data.bin")
        return name


def load_sfm_data_bin(path: str, parts: int = ALL) -> Scene:
    with open(path, "rb") as f:
        r = _R(f.read())
    if r.u8() != 1:
        raise ValueError("big-endian sfm_data.bin not supported")
    version = r.s()
    if version < "0.3":
        raise ValueError(f"sfm_data.bin version {version} predates "
                         "polymorphic views (openMVG < 1.1); re-export it")
    scene = Scene(root_path=r.s())
    poly = _PolyReader(r)
    # views
    n = r.u64()
    if n:
        rows = []
        priors = []
        for _ in range(n):
            key = r.u32()
            name = poly.header()
            local = r.s()
            fname = r.s()
            rows.append((key, (local + "/" + fname) if local else fname,
                         r.u32(), r.u32(), r.u32(), r.u32(), r.u32()))
            if name == "view_priors":
                if r.u8():  # b_use_pose_center_
                    wgt = r.vec()
                    ctr = r.vec()
                    priors.append((key, ctr, wgt))
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
    if not (parts & VIEWS):
        scene.view_filename = []
        scene.view_wh = np.zeros((0, 2), np.int32)
        scene.view_intrinsic = np.zeros(0, np.int32)
        scene.view_pose = np.zeros(0, np.int32)
    # intrinsics
    n = r.u64()
    if n:
        kind = np.zeros(n, np.int32)
        width = np.zeros(n)
        height = np.zeros(n)
        params = np.zeros((n, cm.MAX_PARAMS))
        for _ in range(n):
            k = r.u32()
            name = poly.header()
            kd = _NAME_TO_KIND.get(name, cm.PINHOLE)
            kind[k] = kd
            width[k] = r.u32()
            height[k] = r.u32()
            if kd != cm.SPHERICAL:
                params[k, 0] = r.f64()
                params[k, 1:3] = r.vec()
                nd = _DISTO_KEY.get(kd, (None, 0))[1]
                if nd:
                    params[k, 3:3 + nd] = r.vec()
        if parts & INTRINSICS:
            scene.cameras = cm.Cameras(kind=kind, width=width, height=height,
                                       params=params)
    # extrinsics
    n = r.u64()
    rows = []
    for _ in range(n):
        k = r.u32()
        if r.u64() != 3:
            raise ValueError("malformed Pose3 rotation")
        R = np.stack([r.vec() for _ in range(3)])
        C = r.vec()
        rows.append((k, R, C))
    if not (parts & EXTRINSICS):
        rows = []
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
    keys, Xs, ol, ov, of, ox = _read_landmarks(r)
    if keys and parts & STRUCTURE:
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
    keys, Xs, ol, ov, of, ox = _read_landmarks(r)
    if keys and parts & CONTROL_POINTS:
        size = max(keys) + 1
        scene.cp_X = np.zeros((size, 3))
        for k, X in Xs.items():
            scene.cp_X[k] = X
        scene.cp_obs_landmark = np.asarray(ol, np.int32)
        scene.cp_obs_view = np.asarray(ov, np.int32)
        scene.cp_obs_feat = np.asarray(of, np.int32)
        scene.cp_obs_x = (np.asarray(ox).reshape(-1, 2) if ox
                          else np.zeros((0, 2)))
    return scene


def _read_landmarks(r: _R):
    n = r.u64()
    keys, ol, ov, of, ox = [], [], [], [], []
    Xs = {}
    for _ in range(n):
        k = r.u32()
        Xs[k] = r.vec()
        m = r.u64()
        for _ in range(m):
            ov.append(r.u32())
            of.append(r.u32())
            ox.append(r.vec())
            ol.append(k)
        keys.append(k)
    return keys, Xs, ol, ov, of, ox
