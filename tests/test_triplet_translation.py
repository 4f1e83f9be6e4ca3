"""Triplet translations + structure from known rotations
(translations_Triplet_Solver / Estimate_T_triplet analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.ops import triplet_translation as tt

pytestmark = pytest.mark.slow  # heavy vmapped null-space solves


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _triplet_scene(n_tracks=60, seed=0):
    rng = np.random.default_rng(seed)
    Rs, ts = [], []
    for k, ang in enumerate([-0.2, 0.0, 0.2]):
        C = np.array([np.sin(ang) * 5, 0.1 * k, -np.cos(ang) * 5])
        R = _rot_y(ang)
        Rs.append(R)
        ts.append(-R @ C)
    Rs, ts = np.stack(Rs), np.stack(ts)
    X = rng.normal(size=(n_tracks, 3)) * np.array([1.5, 1.0, 0.8])
    xs = []
    for v in range(3):
        p = (Rs[v] @ X.T).T + ts[v]
        xs.append(p[:, :2] / p[:, 2:3])
    return Rs, ts, np.stack(xs)


def _gauge_fixed(ts_gt, Rs):
    """Ground truth in the solver's gauge: t_0 = 0, unit norm."""
    d = Rs[0].T @ ts_gt[0]
    tg = np.stack([ts_gt[i] - Rs[i] @ d for i in range(3)])
    return tg / np.linalg.norm(tg)


def _aligned_err(ts, tg):
    ts = np.array(ts)
    ts = ts / np.linalg.norm(ts)
    if np.dot(ts.ravel(), tg.ravel()) < 0:
        ts = -ts
    return np.abs(ts - tg).max()


def test_minimal_solver_exact():
    Rs, ts_gt, xs = _triplet_scene()
    ts, X = tt.solve_translations_known_rotations(
        jnp.asarray(xs[:, :4]), jnp.asarray(Rs))
    assert _aligned_err(ts, _gauge_fixed(ts_gt, Rs)) < 1e-10


def test_overdetermined_solve_with_mask():
    Rs, ts_gt, xs = _triplet_scene(n_tracks=50)
    valid = np.ones(50)
    valid[40:] = 0.0  # masked tracks must not perturb the solution
    xs = xs.copy()
    xs[:, 40:] = 7.7  # garbage in the masked region
    ts, X = tt.solve_translations_known_rotations(
        jnp.asarray(xs), jnp.asarray(Rs), valid=jnp.asarray(valid))
    assert _aligned_err(ts, _gauge_fixed(ts_gt, Rs)) < 1e-8


def test_acransac_with_outliers():
    Rs, ts_gt, xs = _triplet_scene()
    rng = np.random.default_rng(1)
    xs = xs + rng.normal(size=xs.shape) * 5e-4
    out = rng.random(xs.shape[1]) < 0.3
    xs[:, out] = rng.normal(size=xs[:, out].shape) * 0.3
    res = tt.triplet_translation_acransac(
        jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(Rs),
        jnp.ones(xs.shape[1], bool), n_samples=256, precision_norm=0.01)
    inl = np.array(res.inliers)
    assert bool(res.found)
    assert not (inl & out).any()
    assert inl.sum() >= (~out).sum() - 2
    assert _aligned_err(res.ts, _gauge_fixed(ts_gt, Rs)) < 5e-3


def test_acransac_rejects_garbage():
    rng = np.random.default_rng(2)
    Rs, _, _ = _triplet_scene()
    xs = rng.normal(size=(3, 40, 2)) * 0.3
    res = tt.triplet_translation_acransac(
        jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(Rs),
        jnp.ones(40, bool), n_samples=128, precision_norm=0.005)
    assert not bool(res.found)
    assert int(np.array(res.inliers).sum()) == 0


def test_grouped_scale_translation_averaging():
    """Triplet-style grouped scales recover a consistent global solution."""
    from openmvg_tpu.ops import translation_averaging as ta

    rng = np.random.default_rng(3)
    N = 6
    C = rng.normal(size=(N, 3))
    R = np.stack([_rot_y(a) for a in rng.uniform(-0.3, 0.3, N)])
    t = -np.einsum("nij,nj->ni", R, C)
    edges, groups, Rr, tr = [], [], [], []
    g = 0
    for (i, j, k) in [(0, 1, 2), (1, 2, 3), (2, 3, 4), (3, 4, 5), (0, 2, 4)]:
        scale = rng.uniform(0.5, 2.0)  # one unknown scale per triplet
        for a, b in ((i, j), (j, k), (i, k)):
            Rab = R[b] @ R[a].T
            tab = t[b] - Rab @ t[a]
            edges.append((a, b))
            groups.append(g)
            Rr.append(Rab)
            tr.append(tab / scale)
        g += 1
    ei = np.asarray([e[0] for e in edges])
    ej = np.asarray([e[1] for e in edges])
    t_est, s = ta.solve_translation_averaging(
        N, ei, ej, np.stack(Rr), np.stack(tr), method=ta.SOFTL1,
        scale_group=np.asarray(groups))
    assert s.shape == (5,)
    # compare camera centers up to similarity (gauge: t_0 = 0 + scale)
    C_est = -np.einsum("nij,nj->ni", np.transpose(R, (0, 2, 1)), t_est)
    A = np.stack([C[i] - C[0] for i in range(1, N)])
    B = np.stack([C_est[i] - C_est[0] for i in range(1, N)])
    scale = (A * B).sum() / (B * B).sum()
    assert np.abs(A - scale * B).max() < 1e-6
