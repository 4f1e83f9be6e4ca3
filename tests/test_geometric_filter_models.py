"""Geometric filter model coverage: batched pair filtering with the
f|e|h|a|u|o dispatch (main_GeometricFilter.cpp:165-368 parity) — in
particular the upright ('u', 3-pt gravity-aligned essential) and
orthographic ('o') models newly wired into the collection filter."""

import numpy as np
import pytest

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.sfm.geometric_filter import geometric_filter
from openmvg_tpu.sfm.scene import Scene


def _roty(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _two_view_scene(f=800.0, wh=1000):
    sc = Scene()
    sc.view_filename = ["a.jpg", "b.jpg"]
    sc.view_intrinsic = np.zeros(2, np.int32)
    sc.view_pose = np.arange(2, dtype=np.int32)
    sc.view_wh = np.tile([[wh, wh]], (2, 1)).astype(np.int32)
    sc.cameras = cm.make_pinhole(wh, wh, f, wh / 2, wh / 2)
    sc.pose_valid = np.zeros(2, bool)
    sc.pose_R = np.tile(np.eye(3), (2, 1, 1))
    sc.pose_C = np.zeros((2, 3))
    return sc


def _mk_matches(n, n_out, rng):
    m = np.stack([np.arange(n + n_out)] * 2, axis=1)
    return {(0, 1): m}


@pytest.mark.parametrize("model", ["f", "e", "h", "a", "u"])
def test_filter_models_keep_inliers_reject_outliers(model):
    """An upright two-view geometry satisfies every epipolar model and the
    planarity of h is handled by using a plane of points for h."""
    rng = np.random.default_rng(3)
    n, n_out = 120, 30
    f, wh = 800.0, 1000
    sc = _two_view_scene(f, wh)
    # upright motion: rotation about y, translation in the xz plane
    R = _roty(np.radians(8.0))
    C = np.array([0.6, 0.0, 0.1])
    if model == "h":
        X = np.concatenate(
            [rng.uniform(-1, 1, (n, 2)), np.zeros((n, 1))], axis=1)
        X[:, 2] = 0.2 * X[:, 0] + 5.0  # a slanted plane
    else:
        X = rng.uniform(-1, 1, (n, 3)) + [0, 0, 5.0]

    def proj(Rw, Cw, X):
        Xc = (X - Cw) @ Rw.T
        return Xc[:, :2] / Xc[:, 2:] * f + wh / 2

    xa = proj(np.eye(3), np.zeros(3), X)
    xb = proj(R, C, X)
    xa = np.concatenate([xa, rng.uniform(100, 900, (n_out, 2))])
    xb = np.concatenate([xb, rng.uniform(100, 900, (n_out, 2))])
    feats = [xa, xb]
    out = geometric_filter(sc, feats, _mk_matches(n, n_out, rng),
                           model=model, n_samples=512, seed=0)
    assert (0, 1) in out, f"model {model} rejected the pair"
    kept = out[(0, 1)][:, 0]
    n_true = np.sum(kept < n)
    n_false = np.sum(kept >= n)
    assert n_true > 0.85 * n, f"model {model}: only {n_true}/{n} inliers"
    assert n_false <= 0.1 * n_out + 2, \
        f"model {model}: kept {n_false} outliers"


def test_filter_ortho_model():
    """Orthographic projections: x = (R X + t)_{xy} in camera-plane units,
    mapped to pixels through the pinhole f/pp so the filter's
    pixel->camera-plane conversion round-trips (Eo_Robust.hpp geometry)."""
    rng = np.random.default_rng(5)
    n, n_out = 100, 25
    f, wh = 800.0, 1000
    sc = _two_view_scene(f, wh)
    R = _roty(np.radians(10.0)) @ np.array(
        [[np.cos(0.1), -np.sin(0.1), 0], [np.sin(0.1), np.cos(0.1), 0],
         [0, 0, 1.0]])
    t = np.array([0.05, -0.02, 0.0])
    X = rng.uniform(-0.3, 0.3, (n, 3))
    ca = X[:, :2]
    cb = (X @ R.T + t)[:, :2]
    xa = ca * f + wh / 2
    xb = cb * f + wh / 2
    xa = np.concatenate([xa, rng.uniform(300, 700, (n_out, 2))])
    xb = np.concatenate([xb, rng.uniform(300, 700, (n_out, 2))])
    out = geometric_filter(sc, [xa, xb], _mk_matches(n, n_out, rng),
                           model="o", threshold_px=2.0, n_samples=512,
                           seed=0)
    assert (0, 1) in out, "ortho model rejected the pair"
    kept = out[(0, 1)][:, 0]
    n_true = np.sum(kept < n)
    n_false = np.sum(kept >= n)
    assert n_true > 0.8 * n, f"only {n_true}/{n} ortho inliers"
    assert n_false <= 0.15 * n_out + 2, f"kept {n_false} ortho outliers"


def test_filter_many_pairs_batched():
    """Bucketed batching returns every admissible pair with consistent
    per-pair inlier sets (multiple pow2 buckets + chunk padding)."""
    rng = np.random.default_rng(7)
    f, wh = 800.0, 1000
    V = 6
    sc = Scene()
    sc.view_filename = [f"v{i}.jpg" for i in range(V)]
    sc.view_intrinsic = np.zeros(V, np.int32)
    sc.view_pose = np.arange(V, dtype=np.int32)
    sc.view_wh = np.tile([[wh, wh]], (V, 1)).astype(np.int32)
    sc.cameras = cm.make_pinhole(wh, wh, f, wh / 2, wh / 2)
    sc.pose_valid = np.zeros(V, bool)
    sc.pose_R = np.tile(np.eye(3), (V, 1, 1))
    sc.pose_C = np.zeros((V, 3))

    X = rng.uniform(-1, 1, (200, 3)) + [0, 0, 6.0]
    feats = []
    for v in range(V):
        R = _roty(np.radians(4.0 * v))
        C = np.array([0.4 * v, 0.0, 0.0])
        Xc = (X - C) @ R.T
        feats.append(Xc[:, :2] / Xc[:, 2:] * f + wh / 2)
    matches = {}
    sizes = [200, 150, 90, 60, 40, 200, 110]
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 2), (1, 3)]
    for (a, b), s in zip(pairs, sizes):
        sel = rng.permutation(200)[:s]
        matches[(a, b)] = np.stack([sel, sel], axis=1)
    out = geometric_filter(sc, feats, matches, model="f", n_samples=512,
                           seed=1)
    assert set(out) == set(pairs)
    for p in pairs:
        assert len(out[p]) > 0.8 * len(matches[p])
