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


def test_native_ba_lm_step_matches_jax_cost():
    """The C++ implicit-Schur LM baseline (bench.py's ceres-class CPU
    comparison) must agree with sfm/ba.py on the cost function and
    reduce it on the same problem."""
    import jax.numpy as jnp

    from openmvg_tpu import native
    from openmvg_tpu.geometry import so3
    from openmvg_tpu.sfm import ba
    from openmvg_tpu.utils.synthetic import ring_scene

    if not native.available():
        pytest.skip("native lib unavailable")

    sc = ring_scene(n_views=8, n_points=200, jitter=0.5, seed=3)
    v, p = np.nonzero(sc.visible)
    rng = np.random.default_rng(4)
    rotvec = np.asarray(so3.logmap(jnp.asarray(sc.R)), np.float64).copy()
    t = np.asarray(sc.t, np.float64).copy()
    X = (sc.X + rng.normal(scale=0.01, size=sc.X.shape)).astype(np.float64)
    obs_x = sc.x[v, p].astype(np.float64)
    f, cx, cy = float(sc.K[0, 0, 0]), float(sc.K[0, 0, 2]), float(sc.K[0, 1, 2])

    prob = ba.BAProblem(
        obs_pose=jnp.asarray(v, jnp.int32),
        obs_intr=jnp.zeros(len(v), jnp.int32),
        obs_point=jnp.asarray(p, jnp.int32),
        obs_x=jnp.asarray(obs_x, jnp.float64),
        obs_w=jnp.ones(len(v), jnp.float64),
        rotvec=jnp.asarray(rotvec), t=jnp.asarray(t),
        intr_kind=jnp.asarray([1], jnp.int32),
        intr_wh=jnp.asarray([[1000.0, 1000.0]], jnp.float64),
        intr_params=jnp.asarray([[f, cx, cy, 0, 0, 0, 0, 0]], jnp.float64),
        X=jnp.asarray(X),
        mask_pose=jnp.ones((8, 6), jnp.float64),
        mask_intr=jnp.zeros((1, 8), jnp.float64),
        mask_X=jnp.ones(len(X), jnp.float64),
        prior_C=jnp.zeros((8, 3), jnp.float64),
        prior_w=jnp.zeros((8, 3), jnp.float64))
    cost_jax = float(ba.robust_cost(prob, ba.BAConfig()))

    out = native.bench_ba_lm_step(v.astype(np.int32), p.astype(np.int32),
                                  obs_x, rotvec, t, X, f, cx, cy)
    assert out is not None
    accepted, cost0, cost1 = out
    # identical cost definition (0.5 * sum rho_huber(|r|^2))
    np.testing.assert_allclose(cost0, cost_jax, rtol=1e-9)
    assert accepted
    assert cost1 < 0.9 * cost0
