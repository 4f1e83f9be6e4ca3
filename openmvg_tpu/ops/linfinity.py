"""L-infinity multiview formulations (lInfinityCV) as first-order solvers.

Reference parity: linearProgramming/lInfinityCV/{triangulation,resection}
.cpp — the Kahl-Hartley quasi-convex problems ("Multiple-View Geometry
under the L_inf Norm", PAMI 2008, §5.1 triangulation / §5.4 resection):
bisection on the residual bound gamma with, at each step, a feasibility
test of the linear constraint set

  triangulation (X in R^3, EncodeTriangulation, triangulation.cpp:33):
    (R1 - u R3) X - gamma R3 X <= -t1 + u t3 + gamma t3
   -(R1 - u R3) X - gamma R3 X <=  t1 - u t3 + gamma t3   (same for v/R2)
    -R3 X <= t3                                 (cheirality depth > 0)

  resection (p in R^11, P row-major with p34 = 1, EncodeResection,
  resection.cpp:44): same pattern with the roles of X and P swapped,
  plus cheirality  -p3x . X <= 1.

The reference tests feasibility with an OSI/CLP simplex inside
bisectionLP.hpp; TPU-first recast: the feasibility program
min_x sum relu(Ax - c)^2 is solved by a fixed-iteration damped
Gauss-Newton (the unknown is 3- or 11-dimensional, so each step is one
tiny normal-equation solve), feasible iff the max violation ~ 0.  The
whole bisection is a lax.fori_loop, jittable and vmappable over tracks.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _feasible_point(A, c, x0, n_inner=25, lam=1e-8):
    """Approximately solve find x: A x <= c from x0 by damped Gauss-Newton
    on sum relu(Ax - c)^2.  Returns (x, max_violation)."""
    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def body(_, x):
        r = A @ x - c
        w = (r > 0).astype(x.dtype)
        Aw = A * w[:, None]
        H = Aw.T @ A + lam * eye
        g = Aw.T @ jnp.maximum(r, 0.0)
        return x - jnp.linalg.solve(H, g)

    x = jax.lax.fori_loop(0, n_inner, body, x0)
    viol = jnp.max(A @ x - c)
    return x, viol


def _bisect(encode, x0, gamma_hi, n_bisect=16, n_inner=25, tol=1e-6):
    """Bisection on gamma: encode(gamma) -> (A, c)."""
    def body(_, carry):
        lo, hi, x_best, g_best = carry
        mid = 0.5 * (lo + hi)
        A, c = encode(mid)
        x, viol = _feasible_point(A, c, x_best, n_inner=n_inner)
        ok = viol <= tol
        lo = jnp.where(ok, lo, mid)
        hi = jnp.where(ok, mid, hi)
        x_best = jnp.where(ok, x, x_best)
        g_best = jnp.where(ok, mid, g_best)
        return lo, hi, x_best, g_best

    zero = jnp.zeros((), x0.dtype)
    lo, hi, x, g = jax.lax.fori_loop(
        0, n_bisect, body, (zero, gamma_hi, x0, gamma_hi))
    return x, g


def _encode_triangulation(P, x, valid, gamma):
    """EncodeTriangulation rows for all views at once.  P (V, 3, 4),
    x (V, 2), valid (V,) -> A (5V, 3), c (5V,); invalid views become
    0 <= 1 rows."""
    R = P[:, :, :3]
    t = P[:, :, 3]
    u = x[:, 0:1]
    v = x[:, 1:2]
    r1, r2, r3 = R[:, 0], R[:, 1], R[:, 2]
    t1, t2, t3 = t[:, 0], t[:, 1], t[:, 2]
    rows = jnp.stack([
        r1 - u * r3 - gamma * r3,
        r2 - v * r3 - gamma * r3,
        -r3,
        -r1 + u * r3 - gamma * r3,
        -r2 + v * r3 - gamma * r3,
    ], axis=1)                                  # (V, 5, 3)
    rhs = jnp.stack([
        -t1 + u[:, 0] * t3 + gamma * t3,
        -t2 + v[:, 0] * t3 + gamma * t3,
        t3,
        t1 - u[:, 0] * t3 + gamma * t3,
        t2 - v[:, 0] * t3 + gamma * t3,
    ], axis=1)                                  # (V, 5)
    if valid is not None:
        keep = valid[:, None]
        rows = jnp.where(keep[..., None], rows, 0.0)
        rhs = jnp.where(keep, rhs, 1.0)
    return rows.reshape(-1, 3), rhs.reshape(-1)


@partial(jax.jit, static_argnames=("n_bisect", "n_inner"))
def triangulate_linf(P, x, valid=None, X_init=None, n_bisect=16, n_inner=25):
    """L-infinity triangulation of one track.

    P (V, 3, 4) projection matrices (pixel or normalized units — gamma is
    in the same units as x), x (V, 2) observations, valid (V,) mask.
    Returns (X (3,), gamma) with gamma the certified residual bound.
    vmap over tracks for batches.
    """
    dt = P.dtype
    if X_init is None:
        # algebraic DLT init (also sets the bisection upper bound)
        rows = jnp.concatenate([
            x[:, 0:1] * P[:, 2] - P[:, 0],
            x[:, 1:2] * P[:, 2] - P[:, 1],
        ], axis=0) if valid is None else jnp.concatenate([
            jnp.where(valid[:, None], x[:, 0:1] * P[:, 2] - P[:, 0], 0.0),
            jnp.where(valid[:, None], x[:, 1:2] * P[:, 2] - P[:, 1], 0.0),
        ], axis=0)
        _, _, vt = jnp.linalg.svd(rows, full_matrices=False)
        Xh = vt[-1]
        X_init = Xh[:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])

    # residuals of the init -> upper bound
    Xc = jnp.einsum("vij,j->vi", P, jnp.concatenate([X_init, jnp.ones(1, dt)]))
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
    res = jnp.abs(Xc[:, :2] / z[:, None] - x)
    if valid is not None:
        res = jnp.where(valid[:, None], res, 0.0)
    gamma_hi = 2.0 * jnp.max(res) + 1e-3

    encode = lambda g: _encode_triangulation(P, x, valid, g)
    return _bisect(encode, X_init, gamma_hi, n_bisect, n_inner)


def _encode_resection(x2d, X3d, valid, gamma):
    """EncodeResection rows (resection.cpp:44): unknown p (11,) = P rows
    [p11..p14, p21..p24, p31..p33] with p34 = 1."""
    n = x2d.shape[0]
    dt = x2d.dtype
    Xh = jnp.concatenate([X3d, jnp.ones((n, 1), dt)], axis=1)   # (N, 4)
    u = x2d[:, 0:1]
    v = x2d[:, 1:2]
    zeros4 = jnp.zeros((n, 4), dt)
    X3 = X3d                                                    # (N, 3)
    # row templates over p = [P1(4), P2(4), P3x(3)]
    # depth = p3x . X + 1
    d_p = jnp.concatenate([zeros4, zeros4, X3], axis=1)         # (N, 11)
    r1_p = jnp.concatenate([Xh, zeros4, jnp.zeros((n, 3), dt)], axis=1)
    r2_p = jnp.concatenate([zeros4, Xh, jnp.zeros((n, 3), dt)], axis=1)
    rows = jnp.stack([
        r1_p - (u + gamma) * d_p,
        r2_p - (v + gamma) * d_p,
        -d_p,
        -r1_p + (u - gamma) * d_p,
        -r2_p + (v - gamma) * d_p,
    ], axis=1)                                                  # (N, 5, 11)
    rhs = jnp.stack([
        (u[:, 0] + gamma),
        (v[:, 0] + gamma),
        jnp.ones((n,), dt),
        -(u[:, 0] - gamma),
        -(v[:, 0] - gamma),
    ], axis=1)                                                  # (N, 5)
    if valid is not None:
        keep = valid[:, None]
        rows = jnp.where(keep[..., None], rows, 0.0)
        rhs = jnp.where(keep, rhs, 1.0)
    return rows.reshape(-1, 11), rhs.reshape(-1)


@partial(jax.jit, static_argnames=("n_bisect", "n_inner"))
def resection_linf(x2d, X3d, valid=None, n_bisect=16, n_inner=30):
    """L-infinity projective resection (>= 6 points).

    x2d (N, 2), X3d (N, 3).  Returns (P (3, 4) with P[2,3] = 1, gamma).
    """
    dt = x2d.dtype
    n = x2d.shape[0]
    # DLT init for the 11 parameters (fix p34 = 1)
    Xh = jnp.concatenate([X3d, jnp.ones((n, 1), dt)], axis=1)
    z = jnp.zeros((n, 4), dt)
    rows = jnp.concatenate([
        jnp.concatenate([Xh, z, -x2d[:, 0:1] * X3d], axis=1),
        jnp.concatenate([z, Xh, -x2d[:, 1:2] * X3d], axis=1),
    ], axis=0)
    rhs = jnp.concatenate([x2d[:, 0], x2d[:, 1]], axis=0)
    if valid is not None:
        w = jnp.concatenate([valid, valid]).astype(dt)
        rows = rows * w[:, None]
        rhs = rhs * w
    p0, *_ = jnp.linalg.lstsq(rows, rhs, rcond=None)

    def P_of(p):
        return jnp.concatenate([p, jnp.ones((1,), dt)]).reshape(3, 4)

    # init residuals -> gamma upper bound
    Xc = Xh @ P_of(p0).T
    zz = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
    res = jnp.abs(Xc[:, :2] / zz[:, None] - x2d)
    if valid is not None:
        res = jnp.where(valid[:, None], res, 0.0)
    gamma_hi = 2.0 * jnp.max(res) + 1e-3

    encode = lambda g: _encode_resection(x2d, X3d, valid, g)
    p, gamma = _bisect(encode, p0, gamma_hi, n_bisect, n_inner)
    return P_of(p), gamma
