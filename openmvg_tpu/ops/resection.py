"""Batched camera resection: 6-point DLT and P3P.

Reference parity: multiview/solver_resection_kernel.cpp (DLT-6pt),
solver_resection_p3p_* (Kneip/Ke/Nordberg/Ding variants — here one closed
form based on the Grunert distance system, eliminated to a quartic via a
2x2-quadratic resultant; same solution set, quartic solved with the shared
bisection root finder, so no eigensolver needed on TPU), and
solver_resection_metrics.hpp (squared pixel reprojection error).

Conventions: world->camera x_cam = R X + t; bearings unit 3-vectors.
"""

import jax.numpy as jnp

from openmvg_tpu.ops import polynomial
from openmvg_tpu.ops.fundamental import nullspace

_EPS = 1e-30


# ---------------------------------------------------------------------------
# DLT 6-point (projection matrix)
# ---------------------------------------------------------------------------

def solve_dlt6(x2d, X3d, weights=None):
    """(..., N>=6, 2) pixels + (..., N, 3) world points -> P (..., 3, 4).

    HZ 7.1 DLT: rows from x ~ P X; nullspace of (2N, 12).
    """
    u, v = x2d[..., 0], x2d[..., 1]
    Xh = jnp.concatenate([X3d, jnp.ones_like(X3d[..., :1])], axis=-1)  # (..., N, 4)
    z = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, z, -u[..., None] * Xh], axis=-1)
    r2 = jnp.concatenate([z, Xh, -v[..., None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 12)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        A = A * w2[..., None]
    p = nullspace(A, 1)[..., 0, :]
    P = p.reshape(p.shape[:-1] + (3, 4))
    # normalize sign so that det(M) > 0 (points in front possible)
    detM = jnp.linalg.det(P[..., :3])
    P = P * jnp.sign(detM)[..., None, None]
    return P


def projection_error_sq(P, x2d, X3d):
    """Squared pixel reprojection error through a 3x4 P."""
    Xh = jnp.concatenate([X3d, jnp.ones_like(X3d[..., :1])], axis=-1)
    y = jnp.einsum("...ij,...nj->...ni", P, Xh)
    w = jnp.where(jnp.abs(y[..., 2]) < _EPS, _EPS, y[..., 2])
    proj = y[..., :2] / w[..., None]
    d = proj - x2d
    return jnp.sum(d * d, axis=-1)


def krt_from_P(P):
    """Decompose P = K [R | t] with K upper-triangular, positive diagonal.

    RQ decomposition of M = P[:, :3] via QR of flipped/transposed M.
    """
    M = P[..., :3]
    # RQ(M): let J = antidiag flip. QR(J M^T J)... use the standard trick:
    Mf = M[..., ::-1, :]  # flip rows
    Q, R = jnp.linalg.qr(jnp.swapaxes(Mf, -1, -2))
    K = jnp.swapaxes(R, -1, -2)[..., ::-1, :][..., :, ::-1]
    Rot = jnp.swapaxes(Q, -1, -2)[..., ::-1, :]
    # fix signs: K diagonal positive
    sgn = jnp.sign(jnp.stack([K[..., 0, 0], K[..., 1, 1], K[..., 2, 2]], axis=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    K = K * sgn[..., None, :]
    Rot = Rot * sgn[..., :, None]
    # det(R) must be +1
    d = jnp.linalg.det(Rot)
    Rot = Rot * d[..., None, None]
    t = jnp.linalg.solve(K, P[..., 3]) * d[..., None]
    K = K / K[..., 2:3, 2:3]
    return K, Rot, t


# ---------------------------------------------------------------------------
# P3P (Grunert system -> quartic resultant)
# ---------------------------------------------------------------------------

def solve_p3p(bearings, X3d):
    """(..., 3, 3) unit bearings + (..., 3, 3) world points ->
    (R (..., 4, 3, 3), t (..., 4, 3), valid (..., 4)).

    Distance system (Grunert 1841):
        s_i^2 + s_j^2 - 2 s_i s_j cos_ij = d_ij^2
    with u = s2/s1, v = s3/s1 reduces to two quadratics in u with
    v-dependent coefficients; their resultant is a quartic in v.
    """
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    P1, P2, P3 = X3d[..., 0, :], X3d[..., 1, :], X3d[..., 2, :]
    a2 = jnp.sum((P2 - P3) ** 2, -1)
    b2 = jnp.sum((P1 - P3) ** 2, -1)
    c2 = jnp.sum((P1 - P2) ** 2, -1)
    ca = jnp.sum(f2 * f3, -1)  # cos alpha (rays 2,3)
    cb = jnp.sum(f1 * f3, -1)  # cos beta (rays 1,3)
    cg = jnp.sum(f1 * f2, -1)  # cos gamma (rays 1,2)
    ra = a2 / jnp.maximum(c2, _EPS)
    rb = b2 / jnp.maximum(c2, _EPS)

    zero = jnp.zeros_like(ra)
    one = jnp.ones_like(ra)
    # E1 = A2 u^2 + A1(v) u + A0(v);  E2 = B2 u^2 + B1 u + B0(v)
    A2 = jnp.stack([1.0 - ra], -1)
    A1 = jnp.stack([2 * ra * cg, -2 * ca], -1)
    A0 = jnp.stack([-ra, zero, one], -1)
    B2 = jnp.stack([-rb], -1)
    B1 = jnp.stack([2 * rb * cg], -1)
    B0 = jnp.stack([1.0 - rb, -2 * cb, one], -1)

    pm = polynomial.polymul
    t1 = pm(A2, B0, 3) - pm(A0, B2, 3)    # quadratic in v
    t2 = pm(A2, B1, 2) - pm(A1, B2, 2)    # linear in v
    t3 = pm(A1, B0, 4) - pm(A0, B1, 4)    # cubic in v
    res = pm(t1, t1, 5) - pm(t2, t3, 5)   # quartic (5 coeffs)

    v, valid = polynomial.real_roots(res, max_roots=4)
    # u from the linear combination A2*E2 - B2*E1 (degree-1 in u)
    t2v = polynomial.polyval(t2[..., None, :], v)
    t1v = polynomial.polyval(t1[..., None, :], v)
    u = -t1v / jnp.where(jnp.abs(t2v) < _EPS, _EPS, t2v)

    denom = 1.0 + u * u - 2.0 * u * cg[..., None]
    s1 = jnp.sqrt(jnp.maximum(c2[..., None], 0.0) / jnp.maximum(denom, 1e-12))
    s2 = u * s1
    s3 = v * s1
    valid = valid & (s1 > 0) & (s2 > 0) & (s3 > 0) & (denom > 1e-12)

    # camera-frame points, then exact rigid alignment (Kabsch on 3 points)
    Q = jnp.stack(
        [s1[..., None] * f1[..., None, :],
         s2[..., None] * f2[..., None, :],
         s3[..., None] * f3[..., None, :]], axis=-2
    )  # (..., 4, 3points, 3)
    Pw = jnp.broadcast_to(X3d[..., None, :, :], Q.shape)
    R, t = kabsch(Pw, Q)
    valid = valid & jnp.all(jnp.isfinite(R.reshape(R.shape[:-2] + (9,))), axis=-1)
    return R, t, valid


def kabsch(P, Q):
    """Rigid (R, t) minimizing |Q - (R P + t)|^2 over point rows (..., N, 3)."""
    Pc = P - jnp.mean(P, axis=-2, keepdims=True)
    Qc = Q - jnp.mean(Q, axis=-2, keepdims=True)
    H = jnp.einsum("...ni,...nj->...ij", Pc, Qc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1)
    R = jnp.swapaxes(Vt, -1, -2) @ (D[..., :, None] * jnp.swapaxes(U, -1, -2))
    t = jnp.mean(Q, axis=-2) - jnp.einsum("...ij,...j->...i", R, jnp.mean(P, axis=-2))
    return R, t


def bearing_angular_error(R, t, bearings, X3d):
    """Squared angular error between bearing and R X + t (resection metric
    ANGULAR_ERROR, solver_resection_metrics.hpp)."""
    Xc = jnp.einsum("...ij,...nj->...ni", R, X3d) + t[..., None, :]
    Xc = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=-1, keepdims=True), _EPS)
    cos_t = jnp.clip(jnp.sum(Xc * bearings, -1), -1.0, 1.0)
    return jnp.arccos(cos_t) ** 2


def solve_up2p(bearings, X3d):
    """Upright 2-point absolute pose (solver_resection_up2p_kukelova.cpp,
    a PoseLib port): with gravity-aligned cameras the rotation is about y,
    parameterized by the half-angle tangent q; two points give a 4x4 linear
    system whose elimination leaves a quadratic in q.

    bearings: (..., 2, 3), X3d: (..., 2, 3).
    Returns R (..., 2, 3, 3), t (..., 2, 3), valid (..., 2) — two candidate
    poses (world->cam x = R X + t).
    """
    x0, x1 = bearings[..., 0, :], bearings[..., 1, :]
    X0, X1 = X3d[..., 0, :], X3d[..., 1, :]
    zero = jnp.zeros_like(x0[..., 0])

    def rows(x, X):
        r0 = jnp.stack([-x[..., 2], zero, x[..., 0],
                        X[..., 0] * x[..., 2] - X[..., 2] * x[..., 0]], axis=-1)
        r1 = jnp.stack([zero, -x[..., 2], x[..., 1],
                        -X[..., 1] * x[..., 2] - X[..., 2] * x[..., 1]], axis=-1)
        b0 = jnp.stack([-2 * X[..., 0] * x[..., 0] - 2 * X[..., 2] * x[..., 2],
                        X[..., 2] * x[..., 0] - X[..., 0] * x[..., 2]], axis=-1)
        b1 = jnp.stack([-2 * X[..., 0] * x[..., 1],
                        X[..., 2] * x[..., 1] - X[..., 1] * x[..., 2]], axis=-1)
        return r0, r1, b0, b1

    a0, a1, c0, c1 = rows(x0, X0)
    a2, a3, c2, c3 = rows(x1, X1)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)          # (..., 4, 4)
    b = jnp.stack([c0, c1, c2, c3], axis=-2)          # (..., 4, 2)
    sol = jnp.linalg.solve(A, b)                       # (..., 4, 2)

    c2q = sol[..., 3, 0]
    c3q = sol[..., 3, 1]
    disc = c2q * c2q - 4.0 * c3q
    valid = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # stable quadratic roots (PoseLib solve_quadratic_real)
    q0 = jnp.where(c2q > 0, 2 * c3q / (-c2q - sq), 2 * c3q / (-c2q + sq))
    q1 = c3q / jnp.where(jnp.abs(q0) < 1e-30, 1.0, q0)
    qs = jnp.stack([q0, q1], axis=-1)                  # (..., 2)

    q2 = qs * qs
    inv_norm = 1.0 / (1.0 + q2)
    cq = (1.0 - q2) * inv_norm
    sq_ = 2.0 * qs * inv_norm
    one = jnp.ones_like(cq)
    zero2 = jnp.zeros_like(cq)
    R = jnp.stack([
        jnp.stack([cq, zero2, sq_], axis=-1),
        jnp.stack([zero2, one, zero2], axis=-1),
        jnp.stack([-sq_, zero2, cq], axis=-1),
    ], axis=-2)                                        # (..., 2, 3, 3)
    t = -(sol[..., :3, 0][..., None, :] * qs[..., :, None]
          + sol[..., :3, 1][..., None, :]) * inv_norm[..., :, None]
    return R, t, valid[..., None] & jnp.ones_like(qs, bool)
