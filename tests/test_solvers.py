"""Minimal-solver unit tests on exact synthetic data.

Mirrors the reference's solver test strategy (e.g.
multiview/solver_essential_five_point_test.cpp, solver_fundamental_kernel_test)
— known geometry, assert the solver recovers it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.geometry import so3
from openmvg_tpu.ops import essential, fundamental, homography, polynomial, resection, triangulation
from openmvg_tpu.utils.synthetic import ring_scene, bearings_of


def two_view_setup(n=30, seed=0):
    s = ring_scene(n_views=2, n_points=n, seed=seed)
    vis = s.visible[0] & s.visible[1]
    idx = np.nonzero(vis)[0]
    return s, idx


def true_F(s):
    """F from K, R, t: F = K2^-T [t_rel]x R_rel K1^-1."""
    R_rel = s.R[1] @ s.R[0].T
    t_rel = s.t[1] - R_rel @ s.t[0]
    tx = np.array([
        [0, -t_rel[2], t_rel[1]],
        [t_rel[2], 0, -t_rel[0]],
        [-t_rel[1], t_rel[0], 0],
    ])
    E = tx @ R_rel
    F = np.linalg.inv(s.K[1]).T @ E @ np.linalg.inv(s.K[0])
    return F / np.linalg.norm(F), E / np.linalg.norm(E)


def test_polynomial_roots():
    # (x-1)(x+2)(x-3) = x^3 -2x^2 -5x + 6
    c = jnp.array([6.0, -5.0, -2.0, 1.0])
    roots, valid = polynomial.real_roots(c, max_roots=3)
    r = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(r, [-2.0, 1.0, 3.0], atol=1e-10)


def test_8pt_fundamental():
    s, idx = two_view_setup()
    x1 = jnp.asarray(s.x[0][idx])
    x2 = jnp.asarray(s.x[1][idx])
    # normalize for conditioning
    from openmvg_tpu.ops.conditioning import preconditioner_from_points, apply_transform

    T1 = preconditioner_from_points(x1)
    T2 = preconditioner_from_points(x2)
    Fn = fundamental.solve_8pt(apply_transform(T1, x1), apply_transform(T2, x2))
    F = T2.T @ Fn @ T1
    F = F / jnp.linalg.norm(F)
    err = fundamental.sampson_error_sq(F, x1, x2)
    assert float(jnp.max(err)) < 1e-8


def test_7pt_fundamental():
    s, idx = two_view_setup()
    x1 = jnp.asarray(s.x[0][idx[:7]])
    x2 = jnp.asarray(s.x[1][idx[:7]])
    from openmvg_tpu.ops.conditioning import preconditioner_from_points, apply_transform

    T1 = preconditioner_from_points(x1)
    T2 = preconditioner_from_points(x2)
    Fs, valid = fundamental.solve_7pt(apply_transform(T1, x1), apply_transform(T2, x2))
    assert bool(jnp.any(valid))
    # at least one solution fits all correspondences of the full set
    x1f = jnp.asarray(s.x[0][idx])
    x2f = jnp.asarray(s.x[1][idx])
    best = np.inf
    for i in range(3):
        if not bool(valid[i]):
            continue
        F = T2.T @ Fs[i] @ T1
        err = float(jnp.max(fundamental.sampson_error_sq(F, x1f, x2f)))
        best = min(best, err)
    assert best < 1e-8


def test_homography():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.1, 0.05, 10.0], [-0.02, 0.97, -5.0], [1e-4, -2e-4, 1.0]])
    x1 = rng.uniform(0, 500, size=(20, 2))
    xh = (np.concatenate([x1, np.ones((20, 1))], 1) @ H_true.T)
    x2 = xh[:, :2] / xh[:, 2:3]
    from openmvg_tpu.ops.conditioning import preconditioner_from_points, apply_transform

    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
    T1 = preconditioner_from_points(x1j[:4])
    T2 = preconditioner_from_points(x2j[:4])
    Hn = homography.solve_homography(apply_transform(T1, x1j[:4]), apply_transform(T2, x2j[:4]))
    H = jnp.linalg.inv(T2) @ Hn @ T1
    err = homography.asymmetric_error_sq(H, x1j, x2j)
    assert float(jnp.max(err)) < 1e-10


def test_essential_8pt():
    s, idx = two_view_setup()
    b1 = jnp.asarray(bearings_of(s, 0, idx))
    b2 = jnp.asarray(bearings_of(s, 1, idx))
    E = essential.solve_essential_8pt(b1, b2)
    _, E_true = true_F(s)
    Ej = np.asarray(E / jnp.linalg.norm(E))
    err = min(np.abs(Ej - E_true).max(), np.abs(Ej + E_true).max())
    assert err < 1e-8


def test_essential_5pt():
    s, idx = two_view_setup()
    b1 = jnp.asarray(bearings_of(s, 0, idx[:5]))
    b2 = jnp.asarray(bearings_of(s, 1, idx[:5]))
    Es, valid = essential.solve_essential_5pt(b1, b2)
    assert bool(jnp.any(valid))
    b1f = jnp.asarray(bearings_of(s, 0, idx))
    b2f = jnp.asarray(bearings_of(s, 1, idx))
    best = np.inf
    for i in range(10):
        if not bool(valid[i]):
            continue
        err = float(jnp.max(essential.essential_error_sq(Es[i], b1f, b2f)))
        best = min(best, err)
    assert best < 1e-10


def test_relative_pose_from_essential():
    s, idx = two_view_setup()
    b1 = jnp.asarray(bearings_of(s, 0, idx))
    b2 = jnp.asarray(bearings_of(s, 1, idx))
    _, E_true = true_F(s)
    R, t, n_good = essential.relative_pose_from_essential(jnp.asarray(E_true), b1, b2)
    R_rel = s.R[1] @ s.R[0].T
    t_rel = s.t[1] - R_rel @ s.t[0]
    t_rel /= np.linalg.norm(t_rel)
    assert int(n_good) == len(idx)
    np.testing.assert_allclose(np.asarray(R), R_rel, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), t_rel, atol=1e-6)


@pytest.mark.parametrize("method", [0, 1, 2, 3])
def test_triangulation_2view(method):
    s, idx = two_view_setup()
    b1 = jnp.asarray(bearings_of(s, 0, idx))
    b2 = jnp.asarray(bearings_of(s, 1, idx))
    R0 = jnp.broadcast_to(jnp.asarray(s.R[0]), (len(idx), 3, 3))
    t0 = jnp.broadcast_to(jnp.asarray(s.t[0]), (len(idx), 3))
    R1 = jnp.broadcast_to(jnp.asarray(s.R[1]), (len(idx), 3, 3))
    t1 = jnp.broadcast_to(jnp.asarray(s.t[1]), (len(idx), 3))
    X, ok = triangulation.triangulate_2view(R0, t0, b1, R1, t1, b2, method=method)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(X), s.X[idx], atol=1e-6)


def test_triangulation_nview():
    s = ring_scene(n_views=6, n_points=40, seed=1)
    vis = s.visible.all(axis=0)
    idx = np.nonzero(vis)[0]
    bearings = np.stack([bearings_of(s, v, idx) for v in range(6)], axis=1)  # (P, V, 3)
    Rs = jnp.broadcast_to(jnp.asarray(s.R), (len(idx), 6, 3, 3))
    ts = jnp.broadcast_to(jnp.asarray(s.t), (len(idx), 6, 3))
    X, ok = triangulation.triangulate_nview(Rs, ts, jnp.asarray(bearings))
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(X), s.X[idx], atol=1e-6)


def test_p3p():
    s, _ = two_view_setup(n=60)
    vis = np.nonzero(s.visible[0])[0][:3]
    b = jnp.asarray(bearings_of(s, 0, vis))[None]
    Xw = jnp.asarray(s.X[vis])[None]
    R, t, valid = resection.solve_p3p(b, Xw)
    assert bool(jnp.any(valid[0]))
    errs = []
    for i in range(4):
        if bool(valid[0, i]):
            errs.append(
                max(np.abs(np.asarray(R[0, i]) - s.R[0]).max(),
                    np.abs(np.asarray(t[0, i]) - s.t[0]).max()))
    assert min(errs) < 1e-6


def test_dlt6():
    s, _ = two_view_setup(n=60)
    vis = np.nonzero(s.visible[0])[0]
    x = jnp.asarray(s.x[0][vis])
    Xw = jnp.asarray(s.X[vis])
    P = resection.solve_dlt6(x, Xw)
    err = resection.projection_error_sq(P, x, Xw)
    assert float(jnp.max(err)) < 1e-10
    K, R, t = resection.krt_from_P(P)
    Kn = np.asarray(K / K[2, 2])
    np.testing.assert_allclose(Kn, s.K[0] / np.linalg.norm([1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), s.R[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t) / np.linalg.norm(np.asarray(t)),
                               s.t[0] / np.linalg.norm(s.t[0]), atol=1e-6)


def test_upright_3pt_essential():
    """Planar upright motion: R about y, t in the xz plane."""
    from openmvg_tpu.ops.essential import (essential_error_sq,
                                           solve_essential_upright_3pt)

    rng = np.random.default_rng(11)
    th = 0.4
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.8, 0.0, 0.3])
    X = rng.normal(size=(8, 3)) + np.array([0, 0, 5.0])
    b1 = X / np.linalg.norm(X, axis=-1, keepdims=True)
    Xc2 = X @ R.T + t
    b2 = Xc2 / np.linalg.norm(Xc2, axis=-1, keepdims=True)
    E = np.asarray(solve_essential_upright_3pt(
        jnp.asarray(b1[:3]), jnp.asarray(b2[:3])))
    err = np.asarray(essential_error_sq(jnp.asarray(E), jnp.asarray(b1),
                                        jnp.asarray(b2)))
    assert np.max(err) < 1e-12


def test_ortho_3pt_essential():
    """Orthographic projection pair; one candidate satisfies all epipolar
    constraints."""
    from openmvg_tpu.ops.essential import (ortho_essential_error_sq,
                                           solve_essential_ortho_3pt)

    rng = np.random.default_rng(3)
    aa = rng.normal(size=3) * 0.4
    thn = np.linalg.norm(aa)
    k = aa / thn
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(thn) * Kx + (1 - np.cos(thn)) * Kx @ Kx
    t = rng.normal(size=3)
    X = rng.normal(size=(6, 3))
    x1 = X[:, :2]                      # ortho projection in view 1
    x2 = (X @ R.T + t)[:, :2]          # ortho projection in view 2
    E2, ok = solve_essential_ortho_3pt(jnp.asarray(x1[:3]), jnp.asarray(x2[:3]))
    E2, ok = np.asarray(E2), np.asarray(ok)
    errs = [np.max(np.asarray(ortho_essential_error_sq(
        jnp.asarray(E2[c]), jnp.asarray(x1), jnp.asarray(x2))))
        for c in range(2) if ok[c]]
    assert len(errs) >= 1 and min(errs) < 1e-10


def test_up2p_resection():
    from openmvg_tpu.ops.resection import solve_up2p

    rng = np.random.default_rng(7)
    th = -0.7
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = rng.normal(size=3)
    X = rng.normal(size=(2, 3)) + np.array([0, 0, 4.0])
    Xc = X @ R.T + t
    b = Xc / np.linalg.norm(Xc, axis=-1, keepdims=True)
    Rs, ts, ok = (np.asarray(a) for a in
                  solve_up2p(jnp.asarray(b), jnp.asarray(X)))
    best = min((np.linalg.norm(Rs[c] - R) + np.linalg.norm(ts[c] - t))
               for c in range(2) if ok[c])
    assert best < 1e-8


def test_up2p_batched():
    from openmvg_tpu.ops.resection import solve_up2p

    rng = np.random.default_rng(9)
    S = 16
    ths = rng.uniform(-1, 1, S)
    Rs = np.stack([np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                             [-np.sin(a), 0, np.cos(a)]]) for a in ths])
    ts = rng.normal(size=(S, 3))
    X = rng.normal(size=(S, 2, 3)) + np.array([0, 0, 5.0])
    Xc = np.einsum("sij,snj->sni", Rs, X) + ts[:, None]
    b = Xc / np.linalg.norm(Xc, axis=-1, keepdims=True)
    Ro, to, ok = (np.asarray(a) for a in
                  solve_up2p(jnp.asarray(b), jnp.asarray(X)))
    for s in range(S):
        best = min((np.linalg.norm(Ro[s, c] - Rs[s])
                    + np.linalg.norm(to[s, c] - ts[s]))
                   for c in range(2) if ok[s, c])
        assert best < 1e-6
