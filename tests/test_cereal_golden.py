"""Golden-bytes fixtures for the cereal PortableBinary codecs.

The reference writes sfm_data.bin / matches.bin through
cereal::PortableBinaryOutputArchive (sfm_data_io_cereal.cpp,
matching/indMatch_utils.cpp:116).  Its vendored cereal submodule is empty
in this environment, so the expected byte streams below are HANDCRAFTED
from the cereal 1.x spec (portable_binary.hpp + types/{map,vector,string,
polymorphic,memory}.hpp) independently of the production writer:

  * archive header: one bool byte 0x01 (little-endian flag)
  * string / vector / map: u64 size tag + payload
  * polymorphic shared_ptr: u32 polymorphic_id
      (0x40000000 when dynamic==static; 0x80000000|type_index + name
      string on a type's first use, bare index after), then u32
      pointer id 0x80000000|n (per-archive counter from 1), then payload
  * field orders per sfm_view_io.hpp / sfm_view_priors_io.hpp /
    Camera_*_io.hpp / pose3_io.hpp / sfm_landmark_io.hpp

Both directions are pinned: writer output == golden bytes, and the
reader parses the golden bytes back to the same scene.  Entry order:
std::unordered_map iteration order is unspecified in the reference, so
the golden stream uses ascending keys (what our writer emits); the
reader is additionally checked on a permuted-order stream, which the
reference can legally produce.
"""

import struct

import numpy as np

from openmvg_tpu.io.matches_io import load_matches, save_matches
from openmvg_tpu.io.sfm_data_bin import load_sfm_data_bin, save_sfm_data_bin
from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.scene import Scene


def u8(v):
    return struct.pack("<B", v)


def u32(v):
    return struct.pack("<I", v & 0xFFFFFFFF)


def u64(v):
    return struct.pack("<Q", v)


def f64(*vs):
    return b"".join(struct.pack("<d", float(v)) for v in vs)


def s(text):
    b = text.encode()
    return u64(len(b)) + b


def vec(*vs):
    return u64(len(vs)) + f64(*vs)


def tiny_scene():
    sc = Scene(root_path="/data")
    sc.view_filename = ["img0.jpg", "img1.jpg"]
    sc.view_wh = np.asarray([[640, 480], [640, 480]], np.int32)
    sc.view_intrinsic = np.asarray([0, 1], np.int32)
    sc.view_pose = np.asarray([0, -1], np.int32)
    sc.prior_center = np.zeros((2, 3))
    sc.prior_center_weight = np.zeros((2, 3))
    sc.prior_center[1] = [1.0, 2.0, 3.0]
    sc.prior_center_weight[1] = [1.0, 1.0, 1.0]
    params = np.zeros((2, cm.MAX_PARAMS))
    params[0, :3] = [500.0, 320.0, 240.0]
    params[1, :6] = [520.0, 321.0, 241.0, 0.1, -0.05, 0.01]
    sc.cameras = cm.Cameras(
        kind=np.asarray([cm.PINHOLE, cm.PINHOLE_RADIAL_K3], np.int32),
        width=np.asarray([640.0, 640.0]), height=np.asarray([480.0, 480.0]),
        params=params)
    sc.pose_valid = np.asarray([True])
    sc.pose_R = np.eye(3)[None]
    sc.pose_C = np.asarray([[0.5, -0.25, 2.0]])
    sc.X = np.zeros((8, 3))
    sc.X_valid = np.zeros(8, bool)
    sc.X[7] = [1.0, 2.0, 3.0]
    sc.X_valid[7] = True
    sc.obs_landmark = np.asarray([7, 7], np.int32)
    sc.obs_view = np.asarray([0, 1], np.int32)
    sc.obs_feat = np.asarray([4, 9], np.int32)
    sc.obs_x = np.asarray([[10.5, 20.25], [30.0, 40.0]])
    sc.obs_valid = np.ones(2, bool)
    return sc


def golden_sfm_bytes():
    MSB, MSB2 = 0x80000000, 0x40000000
    view0 = (u32(0)                       # map key
             + u32(MSB2)                  # plain View: dynamic == static
             + u32(MSB | 1)               # first-seen pointer
             + s("") + s("img0.jpg")      # local_path, filename
             + u32(640) + u32(480)        # width, height
             + u32(0) + u32(0) + u32(0))  # id_view, id_intrinsic, id_pose
    view1 = (u32(1)
             + u32(MSB | 1) + s("view_priors")  # type index 1, first use
             + u32(MSB | 2)
             + s("") + s("img1.jpg")
             + u32(640) + u32(480)
             + u32(1) + u32(1) + u32(0xFFFFFFFF)  # UndefinedIndexT pose
             + u8(1)                       # b_use_pose_center_
             + vec(1.0, 1.0, 1.0)          # center_weight
             + vec(1.0, 2.0, 3.0))         # center
    intr0 = (u32(0)
             + u32(MSB | 2) + s("pinhole")  # type index 2
             + u32(MSB | 3)
             + u32(640) + u32(480)
             + f64(500.0) + vec(320.0, 240.0))
    intr1 = (u32(1)
             + u32(MSB | 3) + s("pinhole_radial_k3")
             + u32(MSB | 4)
             + u32(640) + u32(480)
             + f64(520.0) + vec(321.0, 241.0)
             + vec(0.1, -0.05, 0.01))
    pose0 = (u32(0)
             + u64(3) + vec(1.0, 0.0, 0.0) + vec(0.0, 1.0, 0.0)
             + vec(0.0, 0.0, 1.0)          # rotation rows, each size-tagged
             + vec(0.5, -0.25, 2.0))       # center
    lm7 = (u32(7)
           + vec(1.0, 2.0, 3.0)            # X
           + u64(2)                        # obs map
           + u32(0) + u32(4) + vec(10.5, 20.25)   # view 0: id_feat, x
           + u32(1) + u32(9) + vec(30.0, 40.0))   # view 1
    return (u8(1)                          # PortableBinary endian bool
            + s("0.3") + s("/data")
            + u64(2) + view0 + view1       # views
            + u64(2) + intr0 + intr1       # intrinsics
            + u64(1) + pose0               # extrinsics
            + u64(1) + lm7                 # structure
            + u64(0))                      # control_points


def test_sfm_data_bin_writer_matches_golden(tmp_path):
    path = str(tmp_path / "sfm_data.bin")
    save_sfm_data_bin(tiny_scene(), path)
    got = open(path, "rb").read()
    want = golden_sfm_bytes()
    assert got == want, (
        f"first mismatch at byte {next(i for i, (a, b) in enumerate(zip(got, want)) if a != b) if got != want and min(len(got), len(want)) else 0}; "
        f"lengths {len(got)} vs {len(want)}")


def test_sfm_data_bin_reader_parses_golden(tmp_path):
    path = str(tmp_path / "sfm_data.bin")
    with open(path, "wb") as f:
        f.write(golden_sfm_bytes())
    sc = load_sfm_data_bin(path)
    ref = tiny_scene()
    assert sc.root_path == "/data"
    assert sc.view_filename == ref.view_filename
    assert np.array_equal(sc.view_intrinsic, ref.view_intrinsic)
    assert np.array_equal(sc.view_pose, ref.view_pose)
    np.testing.assert_array_equal(sc.prior_center[1], [1.0, 2.0, 3.0])
    assert np.all(sc.prior_center_weight[0] == 0)
    assert list(sc.cameras.kind) == [cm.PINHOLE, cm.PINHOLE_RADIAL_K3]
    np.testing.assert_array_equal(sc.cameras.params[1, :6],
                                  [520.0, 321.0, 241.0, 0.1, -0.05, 0.01])
    np.testing.assert_array_equal(sc.pose_R[0], np.eye(3))
    np.testing.assert_array_equal(sc.pose_C[0], [0.5, -0.25, 2.0])
    assert sc.X_valid[7] and not sc.X_valid[:7].any()
    np.testing.assert_array_equal(sc.X[7], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.sort(sc.obs_feat), [4, 9])


def test_sfm_data_bin_reader_accepts_permuted_order(tmp_path):
    """The reference's unordered_map may emit entries in ANY order; the
    name-table indices then bind to whichever entry came first."""
    MSB, MSB2 = 0x80000000, 0x40000000
    view1_first = (u32(1)
                   + u32(MSB | 1) + s("view_priors")
                   + u32(MSB | 1)
                   + s("") + s("img1.jpg")
                   + u32(640) + u32(480)
                   + u32(1) + u32(1) + u32(0xFFFFFFFF)
                   + u8(1) + vec(1.0, 1.0, 1.0) + vec(1.0, 2.0, 3.0))
    view0 = (u32(0) + u32(MSB2) + u32(MSB | 2)
             + s("") + s("img0.jpg") + u32(640) + u32(480)
             + u32(0) + u32(0) + u32(0))
    # intrinsic 1 first: its name takes type index 2
    intr1 = (u32(1) + u32(MSB | 2) + s("pinhole_radial_k3") + u32(MSB | 3)
             + u32(640) + u32(480) + f64(520.0) + vec(321.0, 241.0)
             + vec(0.1, -0.05, 0.01))
    intr0 = (u32(0) + u32(MSB | 3) + s("pinhole") + u32(MSB | 4)
             + u32(640) + u32(480) + f64(500.0) + vec(320.0, 240.0))
    data = (u8(1) + s("0.3") + s("/data")
            + u64(2) + view1_first + view0
            + u64(2) + intr1 + intr0
            + u64(0) + u64(0) + u64(0))
    path = str(tmp_path / "sfm_data.bin")
    with open(path, "wb") as f:
        f.write(data)
    sc = load_sfm_data_bin(path)
    assert sc.view_filename == ["img0.jpg", "img1.jpg"]
    assert list(sc.cameras.kind) == [cm.PINHOLE, cm.PINHOLE_RADIAL_K3]
    np.testing.assert_array_equal(sc.prior_center[1], [1.0, 2.0, 3.0])


def test_sfm_data_bin_repeated_type_uses_bare_index(tmp_path):
    """Second pinhole intrinsic must reference type index WITHOUT the msb
    and WITHOUT a name string (cereal registerPolymorphicType)."""
    sc = tiny_scene()
    params = np.zeros((2, cm.MAX_PARAMS))
    params[:, :3] = [[500.0, 320.0, 240.0], [520.0, 321.0, 241.0]]
    sc.cameras = cm.Cameras(
        kind=np.asarray([cm.PINHOLE, cm.PINHOLE], np.int32),
        width=np.asarray([640.0, 640.0]), height=np.asarray([480.0, 480.0]),
        params=params)
    path = str(tmp_path / "sfm_data.bin")
    save_sfm_data_bin(sc, path)
    raw = open(path, "rb").read()
    # exactly one "pinhole" name string in the whole stream
    assert raw.count(s("pinhole")) == 1
    back = load_sfm_data_bin(path)
    assert list(back.cameras.kind) == [cm.PINHOLE, cm.PINHOLE]
    np.testing.assert_array_equal(back.cameras.params[1, :3],
                                  [520.0, 321.0, 241.0])


def golden_matches_bytes():
    # std::map<Pair, std::vector<IndMatch>>: ordered by key
    return (u8(1)
            + u64(2)
            + u32(0) + u32(1) + u64(2)
            + u32(0) + u32(0) + u32(1) + u32(2)
            + u32(2) + u32(3) + u64(1)
            + u32(5) + u32(6))


def test_matches_bin_golden(tmp_path):
    m = {(0, 1): np.asarray([[0, 0], [1, 2]]),
         (2, 3): np.asarray([[5, 6]])}
    path = str(tmp_path / "matches.bin")
    save_matches(m, path)
    assert open(path, "rb").read() == golden_matches_bytes()
    back = load_matches(path)
    assert set(back) == {(0, 1), (2, 3)}
    np.testing.assert_array_equal(back[(0, 1)], [[0, 0], [1, 2]])
    np.testing.assert_array_equal(back[(2, 3)], [[5, 6]])
