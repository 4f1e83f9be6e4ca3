"""ctypes loader for the native C++ runtime components.

Builds openmvg_tpu/native/libomt_native.so on first use (g++, see
Makefile); every entry point has a pure-python fallback, so the package
works without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libomt_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.omt_connected_components.restype = i64
    lib.omt_connected_components.argtypes = [p_i64, p_i64, i64, i64, p_i32]
    lib.omt_build_tracks.restype = i64
    lib.omt_build_tracks.argtypes = [p_i64, p_i64, i64, p_i32, p_i32, i64,
                                     ctypes.c_int32, p_i32, p_i32, p_i32]
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.omt_tbmr.restype = i64
    lib.omt_tbmr.argtypes = [p_u8, i64, i64, ctypes.c_int32, i64,
                             ctypes.c_double, p_f64, i64]
    lib.omt_bench_match_2nn.restype = i64
    lib.omt_bench_match_2nn.argtypes = [p_u8, i64, p_u8, i64, i64,
                                        ctypes.c_double, p_i32, p_i32]
    lib.omt_bench_ba_lm_step.restype = i64
    lib.omt_bench_ba_lm_step.argtypes = [
        p_i32, p_i32, p_f64, p_f64, p_f64, p_f64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        i64, i64, i64, ctypes.c_double, ctypes.c_int32, ctypes.c_double,
        p_f64]
    lib.omt_ba_lm_step_k.restype = i64
    lib.omt_ba_lm_step_k.argtypes = [
        p_i32, p_i32, p_f64, p_f64, p_f64, p_f64, p_f64, ctypes.c_int32,
        i64, i64, i64, ctypes.c_double, ctypes.c_int32, ctypes.c_double,
        p_f64]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def connected_components(a, b, n_nodes):
    """Component labels (int32, contiguous) for edges (a, b) over n_nodes."""
    lib = _load()
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    if lib is None:
        from scipy import sparse
        from scipy.sparse import csgraph

        g = sparse.coo_matrix((np.ones(len(a), np.int8), (a, b)),
                              shape=(n_nodes, n_nodes))
        _, labels = csgraph.connected_components(g, directed=False)
        return labels.astype(np.int32)
    out = np.empty(n_nodes, np.int32)
    lib.omt_connected_components(a, b, len(a), n_nodes, out)
    return out


def build_tracks_native(edge_a, edge_b, node_view, node_feat, min_length=2):
    """C++ track fusion; returns (track_id, view_id, feat_id) arrays or
    None when the library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    edge_a = np.ascontiguousarray(edge_a, np.int64)
    edge_b = np.ascontiguousarray(edge_b, np.int64)
    node_view = np.ascontiguousarray(node_view, np.int32)
    node_feat = np.ascontiguousarray(node_feat, np.int32)
    n = len(node_view)
    out_t = np.empty(n, np.int32)
    out_v = np.empty(n, np.int32)
    out_f = np.empty(n, np.int32)
    m = lib.omt_build_tracks(edge_a, edge_b, len(edge_a), node_view,
                             node_feat, n, min_length, out_t, out_v, out_f)
    if m < 0:
        return None
    return out_t[:m], out_v[:m], out_f[:m]


def tbmr_native(img_u8, invert, min_size, max_rel_size, max_out=8192):
    """Native TBMR extraction; returns (N, 6) rows (x, y, a, b, c, area)
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape
    out = np.empty((max_out, 6), np.float64)
    m = lib.omt_tbmr(img_u8.ravel(), w, h, 1 if invert else 0,
                     int(min_size), float(max_rel_size), out.ravel(), max_out)
    if m < 0:
        return None
    return out[:m]


def bench_match_2nn(desc_a, desc_b, ratio=0.8):
    """CPU AVX2+OpenMP brute-force 2-NN + ratio matcher (the openMVG-CPU
    baseline for bench.py; matching/metric_simd.hpp:33 is the design it
    mirrors).  Returns (idx, keep) int32 arrays or None without the lib."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(desc_a, np.uint8)
    b = np.ascontiguousarray(desc_b, np.uint8)
    idx = np.empty(len(a), np.int32)
    keep = np.empty(len(a), np.int32)
    r = lib.omt_bench_match_2nn(a, len(a), b, len(b), a.shape[1],
                                float(ratio), idx, keep)
    if r < 0:
        return None
    return idx, keep


def bench_ba_lm_step(obs_pose, obs_point, obs_x, rotvec, t, X, f, cx, cy,
                     lam=1e-4, cg_iters=20, huber_a=16.0):
    """One CPU implicit-Schur LM step (the ceres-class baseline for
    bench.py ba_lm_obs_per_s).  Updates rotvec/t/X IN PLACE on accept.
    Returns (accepted, cost_before, cost_after) or None if the library
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    obs_pose = np.ascontiguousarray(obs_pose, np.int32)
    obs_point = np.ascontiguousarray(obs_point, np.int32)
    obs_x = np.ascontiguousarray(obs_x, np.float64)
    assert rotvec.dtype == np.float64 and rotvec.flags.c_contiguous
    assert t.dtype == np.float64 and t.flags.c_contiguous
    assert X.dtype == np.float64 and X.flags.c_contiguous
    out2 = np.zeros(2, np.float64)
    rc = lib.omt_bench_ba_lm_step(
        obs_pose, obs_point, obs_x.ravel(), rotvec.ravel(), t.ravel(),
        X.ravel(), float(f), float(cx), float(cy), len(obs_pose),
        len(rotvec), len(X), float(lam), int(cg_iters), float(huber_a),
        out2)
    if rc < 0:
        return None
    return bool(rc), float(out2[0]), float(out2[1])


def ba_lm_step_k(obs_pose, obs_point, obs_x, rotvec, t, X, kparams,
                 refine_k=True, lam=1e-4, cg_iters=20, huber_a=16.0):
    """One CPU implicit-Schur LM step with the shared pinhole intrinsics
    [f, cx, cy] as three extra global unknowns in the reduced system
    (joint refinement — the alternating update cannot traverse the
    focal<->depth correlated valley).  Updates rotvec/t/X and kparams
    IN PLACE on accept.  Returns (accepted, cost_before, cost_after)
    or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    obs_pose = np.ascontiguousarray(obs_pose, np.int32)
    obs_point = np.ascontiguousarray(obs_point, np.int32)
    obs_x = np.ascontiguousarray(obs_x, np.float64)
    assert rotvec.dtype == np.float64 and rotvec.flags.c_contiguous
    assert t.dtype == np.float64 and t.flags.c_contiguous
    assert X.dtype == np.float64 and X.flags.c_contiguous
    assert kparams.dtype == np.float64 and kparams.flags.c_contiguous \
        and kparams.size == 3
    out2 = np.zeros(2, np.float64)
    rc = lib.omt_ba_lm_step_k(
        obs_pose, obs_point, obs_x.ravel(), rotvec.ravel(), t.ravel(),
        X.ravel(), kparams, int(bool(refine_k)), len(obs_pose),
        len(rotvec), len(X), float(lam), int(cg_iters), float(huber_a),
        out2)
    if rc < 0:
        return None
    return bool(rc), float(out2[0]), float(out2[1])
