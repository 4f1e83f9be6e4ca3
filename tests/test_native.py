"""Native C++ runtime parity tests: the compiled union-find/track builder
must agree with the pure scipy/numpy path."""

import numpy as np
import pytest

from openmvg_tpu import native
from openmvg_tpu.sfm import tracks as T


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libomt_native.so failed"


def test_native_cc_parity():
    rng = np.random.default_rng(0)
    n = 500
    a = rng.integers(0, n, 800)
    b = rng.integers(0, n, 800)
    lab_nat = native.connected_components(a, b, n)
    from scipy import sparse
    from scipy.sparse import csgraph

    g = sparse.coo_matrix((np.ones(len(a)), (a, b)), shape=(n, n))
    n_ref, lab_ref = csgraph.connected_components(g, directed=False)
    assert lab_nat.max() + 1 == n_ref
    # same partition (up to label permutation)
    import collections

    mapping = {}
    for x, y in zip(lab_nat, lab_ref):
        assert mapping.setdefault(int(x), int(y)) == int(y)


def _python_tracks(matches, min_length):
    """Run the scipy fallback path directly."""
    import openmvg_tpu.native as nat

    saved = nat.build_tracks_native
    nat.build_tracks_native = lambda *a, **k: None
    try:
        return T.build_tracks(matches, min_length)
    finally:
        nat.build_tracks_native = saved


def test_native_tracks_parity():
    rng = np.random.default_rng(1)
    matches = {}
    n_views, n_feats = 8, 60
    for i in range(n_views):
        for j in range(i + 1, min(i + 3, n_views)):
            k = rng.integers(10, 40)
            fa = rng.choice(n_feats, k, replace=False)
            fb = rng.choice(n_feats, k, replace=False)
            matches[(i, j)] = np.stack([fa, fb], 1)
    t_nat = T.build_tracks(matches, min_length=2)
    t_py = _python_tracks(matches, min_length=2)
    assert native.available()
    assert t_nat.n_tracks == t_py.n_tracks
    np.testing.assert_array_equal(np.sort(t_nat.lengths()),
                                  np.sort(t_py.lengths()))
    # identical (view, feat) membership per track partition
    def canon(t):
        groups = {}
        for tid, v, f in zip(t.track_id, t.view_id, t.feat_id):
            groups.setdefault(int(tid), set()).add((int(v), int(f)))
        return sorted(frozenset(g) for g in groups.values())

    assert canon(t_nat) == canon(t_py)
