"""Rotation / translation averaging tests (rotation_averaging_test.cpp
analogue: synthetic global rotations -> relative measurements -> recover)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.geometry import so3
from openmvg_tpu.ops import rotation_averaging as ra
from openmvg_tpu.ops import translation_averaging as ta
from openmvg_tpu.utils.synthetic import ring_scene


def make_rel(n=12, noise=0.0, seed=0, outliers=0):
    s = ring_scene(n_views=n, n_points=10, seed=seed)
    rng = np.random.default_rng(seed + 1)
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if (j - i) <= 3 or (i == 0 and j == n - 1)]
    ei = np.array([e[0] for e in edges])
    ej = np.array([e[1] for e in edges])
    R_rel = np.einsum("eij,ekj->eik", s.R[ej], s.R[ei])  # R_j R_i^T
    if noise > 0:
        pert = np.asarray(so3.expmap(jnp.asarray(
            rng.normal(scale=noise, size=(len(edges), 3)))))
        R_rel = np.einsum("eij,ejk->eik", pert, R_rel)
    # spread outlier edges so no single node is outlier-dominated
    for k in range(outliers):
        R_rel[(k * 7 + 5) % len(edges)] = np.asarray(
            so3.expmap(jnp.asarray(rng.normal(size=3))))
    return s, ei, ej, R_rel


def angular_err_deg(Ra, Rb_ref, R0a, R0b):
    """Compare rotations up to global gauge: angle(Ra R0a^T, Rb R0b^T)."""
    A = Ra @ R0a.T
    B = Rb_ref @ R0b.T
    return np.asarray(so3.relative_rotation_angle_deg(jnp.asarray(A), jnp.asarray(B)))


def test_l2_rotation_averaging_exact():
    s, ei, ej, R_rel = make_rel()
    R = np.asarray(ra.l2_rotation_averaging(
        s.n_views, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(R_rel)))
    errs = angular_err_deg(R, s.R, R[0], s.R[0])
    assert errs.max() < 1e-4


def test_l2_rotation_averaging_noisy():
    s, ei, ej, R_rel = make_rel(noise=0.02, seed=3)
    R = np.asarray(ra.l2_rotation_averaging(
        s.n_views, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(R_rel)))
    errs = angular_err_deg(R, s.R, R[0], s.R[0])
    assert errs.max() < 2.0


def test_l1_rotation_averaging_with_outliers():
    s, ei, ej, R_rel = make_rel(noise=0.01, seed=4, outliers=3)
    R = np.asarray(ra.l1_rotation_averaging(
        s.n_views, ei, ej, jnp.asarray(R_rel)))
    errs = angular_err_deg(R, s.R, R[0], s.R[0])
    assert errs.max() < 2.0, errs


def test_spanning_tree_init():
    s, ei, ej, R_rel = make_rel()
    R = ra.spanning_tree_rotations(s.n_views, ei, ej, R_rel)
    errs = angular_err_deg(R, s.R, R[0], s.R[0])
    assert errs.max() < 1e-4


def test_triplet_rejection():
    s, ei, ej, R_rel = make_rel()
    pairs = list(zip(ei.tolist(), ej.tolist()))
    rel_map = {(int(a), int(b)): R_rel[k] for k, (a, b) in enumerate(pairs)}
    # corrupt one edge that belongs to triplets
    bad_edge = pairs[1]
    rel_map[bad_edge] = np.asarray(so3.expmap(jnp.asarray([1.0, 0.5, 0.2])))
    kept, triplets = ra.triplet_rotation_rejection(pairs, rel_map, max_angle_deg=3.0)
    assert bad_edge not in kept
    assert len(kept) > len(pairs) * 0.5


@pytest.mark.parametrize("method", [ta.SOFTL1, ta.L2])
def test_translation_averaging(method):
    s, ei, ej, R_rel = make_rel(n=10, seed=5)
    t_gt = np.asarray([-R @ C for R, C in zip(s.R, s.C)])
    # relative translations with per-edge unknown positive scale
    t_rel = t_gt[ej] - np.einsum("eij,ej->ei", R_rel, t_gt[ei])
    t_rel /= np.linalg.norm(t_rel, axis=1, keepdims=True)
    t, scales = ta.solve_translation_averaging(
        s.n_views, ei, ej, R_rel, t_rel, method=method, n_iterations=40)
    # compare centers up to global similarity (t_0 = 0, unknown scale)
    C_est = -np.einsum("nji,nj->ni", s.R, t)
    from openmvg_tpu.geometry.similarity import find_rts

    sim = find_rts(jnp.asarray(C_est[None]), jnp.asarray(s.C[None]))
    aligned = np.asarray(sim.apply(jnp.asarray(C_est[None])))[0]
    err = np.linalg.norm(aligned - s.C, axis=1).max()
    assert err < 1e-3, err


def test_lad_admm_regression():
    """LAD-ADMM fits the true line through 30% gross outliers (where L2
    does not)."""
    from openmvg_tpu.ops.l1_admm import solve_lad

    rng = np.random.default_rng(0)
    M = 200
    A = np.stack([rng.uniform(-1, 1, M), np.ones(M)], 1)
    x_true = np.array([2.0, -0.5])
    b = A @ x_true + rng.normal(0, 0.01, M)
    out = rng.choice(M, M // 3, replace=False)
    b[out] += rng.uniform(3, 10, len(out)) * rng.choice([-1, 1], len(out))
    x_l1 = np.asarray(solve_lad(jnp.asarray(A), jnp.asarray(b), iters=400))
    x_l2 = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.linalg.norm(x_l1 - x_true) < 0.02
    assert np.linalg.norm(x_l2 - x_true) > 0.2


def test_l1_rotation_averaging_admm_matches_irls():
    from openmvg_tpu.ops import rotation_averaging as ra
    from openmvg_tpu.utils.synthetic import ring_scene

    s = ring_scene(n_views=8, n_points=40, seed=0)
    ei, ej, Rr = [], [], []
    rng = np.random.default_rng(1)
    for i in range(8):
        for j in range(i + 1, min(i + 3, 8)):
            ei.append(i)
            ej.append(j)
            R = s.R[j] @ s.R[i].T
            Rr.append(R)
    # corrupt one edge
    Rr[0] = Rr[0] @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    for solver in ("irls", "admm"):
        R = np.asarray(ra.l1_rotation_averaging(
            8, np.asarray(ei), np.asarray(ej), np.asarray(Rr), solver=solver))
        # compare relative rotations to GT (global gauge removed)
        errs = []
        for k in range(1, len(ei)):
            R_est = R[ej[k]] @ R[ei[k]].T
            R_gt = s.R[ej[k]] @ s.R[ei[k]].T
            cos = (np.trace(R_est @ R_gt.T) - 1) / 2
            errs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        assert np.median(errs) < 1.0, (solver, errs)
