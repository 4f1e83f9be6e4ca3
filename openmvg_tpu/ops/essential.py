"""Batched essential-matrix estimation: 8-point, 5-point (Nister), pose recovery.

Reference parity: multiview/solver_essential_five_point.cpp (Nister's 5-point:
4-dim nullspace, det + trace cubic constraints, elimination to a degree-10
polynomial), solver_essential_eight_point.cpp, essential.cpp decomposition and
motion_from_essential.cpp cheirality-tested pose recovery.

TPU-first design notes:
  * The classic implementation finds the degree-10 roots via companion-matrix
    eigenvalues; TPUs have no nonsymmetric eigensolver, so we do Nister's
    Gauss-Jordan reduction to a 3x3 polynomial system B(z)[x,y,1]^T = 0 and
    find real roots of det B(z) with the shared fixed-shape bisection root
    finder (ops/polynomial.py).
  * Polynomial expansion of the 10 cubic constraints uses dense monomial
    coefficient vectors with constant product tables built at import time —
    no symbolic code, fully vmappable.

Convention: constraint b2^T E b1 = 0 on unit bearings (..., N, 3).
"""

import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import polynomial
from openmvg_tpu.ops.fundamental import nullspace

# ---------------------------------------------------------------------------
# monomial tables (built once, numpy)
# ---------------------------------------------------------------------------

_LIN = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]  # x, y, z, 1
_QUAD = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
# degree-3 basis, ordered so that the first 10 ("HIGH") are the monomials we
# eliminate (x/y-degree >= 2) and the last 10 ("REST") factor as
# x*(z^2,z,1), y*(z^2,z,1), (z^3,z^2,z,1)
_HIGH = [
    (3, 0, 0), (2, 1, 0), (1, 2, 0), (0, 3, 0), (2, 0, 1),
    (1, 1, 1), (0, 2, 1), (2, 0, 0), (1, 1, 0), (0, 2, 0),
]
_REST = [
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]
_CUB = _HIGH + _REST


def _table(b1, b2, out):
    T = np.zeros((len(b1), len(b2), len(out)))
    index = {m: i for i, m in enumerate(out)}
    for i, ma in enumerate(b1):
        for j, mb in enumerate(b2):
            s = tuple(a + b for a, b in zip(ma, mb))
            if s in index:
                T[i, j, index[s]] = 1.0
    return T


_T_LL = _table(_LIN, _LIN, _QUAD)    # lin x lin -> quad
_T_QL = _table(_QUAD, _LIN, _CUB)    # quad x lin -> cubic


def _mul_ll(a, b):
    return jnp.einsum("abm,...a,...b->...m", jnp.asarray(_T_LL, a.dtype), a, b)


def _mul_ql(q, l):
    return jnp.einsum("qbm,...q,...b->...m", jnp.asarray(_T_QL, q.dtype), q, l)


# ---------------------------------------------------------------------------
# design / errors on bearings
# ---------------------------------------------------------------------------

def epipolar_design_bearings(b1, b2):
    """(..., N, 3) bearings -> (..., N, 9) rows of b2^T E b1 = 0 (E row-major)."""
    return (b2[..., :, None] * b1[..., None, :]).reshape(b1.shape[:-1] + (9,))


def solve_essential_8pt(b1, b2, weights=None):
    """8-point E from bearings; rank-2 + equal-singular-value projection."""
    A = epipolar_design_bearings(b1, b2)
    if weights is not None:
        A = A * weights[..., None]
    e = nullspace(A, 1)[..., 0, :]
    E = e.reshape(e.shape[:-1] + (3, 3))
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    S2 = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return (U * S2[..., None, :]) @ Vt


def essential_error_sq(E, b1, b2):
    """Squared epipolar distance of normalized-plane points to the epipolar
    line (same residual as the reference's 5-pt AC kernel: bearings are
    hnormalized to the camera plane, point-to-line distance)."""
    x1 = b1[..., :2] / b1[..., 2:3]
    x2 = b2[..., :2] / b2[..., 2:3]
    from openmvg_tpu.ops.fundamental import point_line_error_sq

    return point_line_error_sq(E, x1, x2)


def angular_error(E, b1, b2):
    """| b2 . (E b1) | normalized — the angular epipolar residual used by the
    spherical AC kernel (AngularRadianErrorKernel): asin of point-to-plane
    angle, squared."""
    Eb1 = jnp.einsum("...ij,...nj->...ni", E, b1)
    num = jnp.abs(jnp.sum(b2 * Eb1, axis=-1))
    den = jnp.linalg.norm(Eb1, axis=-1) * jnp.linalg.norm(b2, axis=-1)
    sin_t = jnp.clip(num / jnp.maximum(den, 1e-30), 0.0, 1.0)
    # NOTE: reference uses asin(d) on the normalized algebraic distance; for
    # small residuals these agree.  Squared to match the squared-error protocol.
    return jnp.arcsin(sin_t) ** 2


# ---------------------------------------------------------------------------
# 5-point (Nister)
# ---------------------------------------------------------------------------

def _constraint_matrix(Ebasis):
    """Ebasis (..., 4, 3, 3) nullspace (E = x E0 + y E1 + z E2 + E3)
    -> (..., 10, 20) cubic-constraint coefficient matrix over _CUB."""
    # E entries as linear polys over [x, y, z, 1]: (..., 3, 3, 4)
    Elin = jnp.moveaxis(Ebasis, -3, -1)

    def ll(i, j, k, l):
        return _mul_ll(Elin[..., i, j, :], Elin[..., k, l, :])

    # det(E) cubic
    c1 = ll(1, 1, 2, 2) - ll(1, 2, 2, 1)
    c2 = ll(1, 0, 2, 2) - ll(1, 2, 2, 0)
    c3 = ll(1, 0, 2, 1) - ll(1, 1, 2, 0)
    det = (
        _mul_ql(c1, Elin[..., 0, 0, :])
        - _mul_ql(c2, Elin[..., 0, 1, :])
        + _mul_ql(c3, Elin[..., 0, 2, :])
    )

    # P = E E^T (quad entries), tr(P)
    P = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(3):
            acc = 0.0
            for j in range(3):
                acc = acc + ll(i, j, k, j)
            P[i][k] = acc
    tr = P[0][0] + P[1][1] + P[2][2]

    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = 0.0
            for k in range(3):
                acc = acc + _mul_ql(P[i][k], Elin[..., k, j, :])
            rows.append(acc - 0.5 * _mul_ql(tr, Elin[..., i, j, :]))
    return jnp.stack(rows, axis=-2)  # (..., 10, 20)


def solve_essential_5pt(b1, b2):
    """Nister 5-point on bearings (..., 5, 3).

    Returns (E (..., 10, 3, 3), valid (..., 10)) — up to 10 real solutions.
    """
    A = epipolar_design_bearings(b1, b2)  # (..., 5, 9)
    ns = nullspace(A, 4)  # (..., 4, 9), rows = 4 smallest
    Ebasis = ns.reshape(ns.shape[:-2] + (4, 3, 3))
    M = _constraint_matrix(Ebasis)
    Ahigh, Brest = M[..., :10], M[..., 10:]
    R = jnp.linalg.solve(Ahigh, Brest)  # (..., 10, 10) reduced rows

    # rows (by HIGH index): 7 = x^2, 8 = xy, 9 = y^2, 4 = x^2 z, 5 = xyz, 6 = y^2 z
    def parts(row):
        # REST layout: [xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1]
        p = jnp.stack([row[..., 2], row[..., 1], row[..., 0]], axis=-1)  # x-part, deg 2
        q = jnp.stack([row[..., 5], row[..., 4], row[..., 3]], axis=-1)  # y-part
        r = jnp.stack([row[..., 9], row[..., 8], row[..., 7], row[..., 6]], axis=-1)  # const, deg 3
        return p, q, r

    def shift(c, n=1):
        """Multiply a poly (lowest-first) by z^n."""
        pad = jnp.zeros(c.shape[:-1] + (n,), c.dtype)
        return jnp.concatenate([pad, c], axis=-1)

    Bp, Bq, Br = [], [], []
    for a, d in ((7, 4), (8, 5), (9, 6)):
        pa, qa, ra = parts(R[..., a, :])
        pd, qd, rd = parts(R[..., d, :])
        # z * row_a - row_d  (both equal the HIGH monomial content)
        Bp.append(shift(pa) - jnp.pad(pd, [(0, 0)] * (pd.ndim - 1) + [(0, 1)]))
        Bq.append(shift(qa) - jnp.pad(qd, [(0, 0)] * (qd.ndim - 1) + [(0, 1)]))
        Br.append(shift(ra) - jnp.pad(rd, [(0, 0)] * (rd.ndim - 1) + [(0, 1)]))

    # det of [[Bp0,Bq0,Br0],[Bp1,Bq1,Br1],[Bp2,Bq2,Br2]] -> degree-10 poly (11)
    pm = polynomial.polymul
    m01 = pm(Bp[1], Bq[2]) - pm(Bp[2], Bq[1])  # deg 6 (7)
    m02 = pm(Bp[0], Bq[2]) - pm(Bp[2], Bq[0])
    m03 = pm(Bp[0], Bq[1]) - pm(Bp[1], Bq[0])
    det = pm(Br[0], m01, 11) - pm(Br[1], m02, 11) + pm(Br[2], m03, 11)

    finite = jnp.all(jnp.isfinite(det), axis=-1)
    det = jnp.where(finite[..., None], det, jnp.zeros_like(det))
    z, valid = polynomial.real_roots(det, max_roots=10)
    valid = valid & finite[..., None]

    # back-substitute x, y for each z: 3 eqs [p(z) q(z)] [x y]^T = -r(z)
    def evalp(c, z):
        return polynomial.polyval(c[..., None, :], z)

    Pz = jnp.stack([evalp(p, z) for p in Bp], axis=-1)  # (..., 10, 3)
    Qz = jnp.stack([evalp(q, z) for q in Bq], axis=-1)
    Rz = jnp.stack([evalp(r, z) for r in Br], axis=-1)
    # least squares 3x2
    a11 = jnp.sum(Pz * Pz, -1)
    a12 = jnp.sum(Pz * Qz, -1)
    a22 = jnp.sum(Qz * Qz, -1)
    bx = -jnp.sum(Pz * Rz, -1)
    by = -jnp.sum(Qz * Rz, -1)
    dn = a11 * a22 - a12 * a12
    dn = jnp.where(jnp.abs(dn) < 1e-30, 1e-30, dn)
    x = (bx * a22 - by * a12) / dn
    y = (by * a11 - bx * a12) / dn

    E = (
        x[..., None, None] * Ebasis[..., None, 0, :, :]
        + y[..., None, None] * Ebasis[..., None, 1, :, :]
        + z[..., None, None] * Ebasis[..., None, 2, :, :]
        + Ebasis[..., None, 3, :, :]
    )
    nrm = jnp.linalg.norm(E.reshape(E.shape[:-2] + (9,)), axis=-1)
    E = E / jnp.maximum(nrm[..., None, None], 1e-30)
    # zeroed/non-finite slots are not models (the TPU f32 SVD/solve path
    # can emit them with the root flags still set)
    valid = valid & (nrm > 1e-20) & jnp.all(
        jnp.isfinite(E.reshape(E.shape[:-2] + (9,))), axis=-1)
    return E, valid


# ---------------------------------------------------------------------------
# pose from E
# ---------------------------------------------------------------------------

def motions_from_essential(E):
    """4 candidate (R, t) from E (HZ 9.6.2; essential.cpp
    MotionFromEssential).  Returns R (..., 4, 3, 3), t (..., 4, 3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce rotation determinants
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(dU), jnp.ones_like(dU), dU], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(dV), jnp.ones_like(dV), dV], -1)[..., :, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)
    return R4, t4


def relative_pose_from_essential(E, b1, b2, weights=None):
    """Cheirality-tested (R, t) with |t| = 1 from E and inlier bearings.

    Parity: motion_from_essential.cpp RelativePoseFromEssential — picks the
    candidate maximizing front-of-both-cameras support via midpoint depths.
    Returns (R (..., 3, 3), t (..., 3), n_good (...,)).
    """
    R4, t4 = motions_from_essential(E)
    if weights is None:
        weights = jnp.ones(b1.shape[:-1], E.dtype)

    # depths via the two-ray closed form (triangulation.cpp Compute3DPoint):
    # rays t + lam0*m0 and lam1*m1 in camera-1 frame, z = m1 x m0,
    # lam0 = z.(t x m1)/|z|^2, lam1 = z.(t x m0)/|z|^2
    m0 = jnp.einsum("...cij,...nj->...cni", R4, b1)  # bearing0 in cam1 frame
    m1 = jnp.broadcast_to(b2[..., None, :, :], m0.shape)
    t = jnp.broadcast_to(t4[..., None, :], m0.shape)
    z = jnp.cross(m1, m0)
    denom = jnp.sum(z * z, axis=-1)
    lam0 = jnp.sum(z * jnp.cross(t, m1), axis=-1) / jnp.maximum(denom, 1e-30)
    lam1 = jnp.sum(z * jnp.cross(t, m0), axis=-1) / jnp.maximum(denom, 1e-30)
    good = (lam0 > 0) & (lam1 > 0) & (denom > 1e-20)
    score = jnp.sum(good * weights[..., None, :], axis=-1)  # (..., 4)
    best = jnp.argmax(score, axis=-1)
    R = jnp.take_along_axis(R4, best[..., None, None, None], axis=-3).squeeze(-3)
    tt = jnp.take_along_axis(t4, best[..., None, None], axis=-2).squeeze(-2)
    n_good = jnp.take_along_axis(score, best[..., None], axis=-1).squeeze(-1)
    return R, tt, n_good


# ---------------------------------------------------------------------------
# upright (gravity-aligned) 3-point and orthographic 3-point solvers
# ---------------------------------------------------------------------------

def solve_essential_upright_3pt(b1, b2):
    """Upright-relative-pose 3-point solver
    (solver_essential_three_point.cpp ThreePointUprightRelativePoseSolver:
    action-matrix nullspace of (6,7) in the paper).  For cameras rotating
    about the gravity (y) axis and translating in the horizontal plane, the
    essential matrix has only 4 free entries E01, E10, E12, E21; the epipolar
    constraints are linear in those, so 3 bearings give a 3x4 nullspace
    problem solved by the smallest eigenvector of AᵀA.

    b1, b2: (..., 3, 3) unit bearings.  Returns (..., 3, 3) E.
    """
    ax, ay, az = b1[..., 0], b1[..., 1], b1[..., 2]
    bx, by, bz = b2[..., 0], b2[..., 1], b2[..., 2]
    A = jnp.stack([ax * by, -az * by, -bx * ay, -bz * ay], axis=-1)  # (...,3,4)
    n = nullspace(A)[..., 0, :]                                      # (...,4)
    zero = jnp.zeros_like(n[..., 0])
    E = jnp.stack([
        jnp.stack([zero, n[..., 2], zero], axis=-1),
        jnp.stack([-n[..., 0], zero, n[..., 1]], axis=-1),
        jnp.stack([zero, n[..., 3], zero], axis=-1),
    ], axis=-2)
    return E


def solve_essential_ortho_3pt(x1, x2):
    """Orthographic two-view 3-point solver (Magnus Oskarsson, JMIV 2017;
    solver_essential_three_point.cpp ThreePointsRelativePose).  Closed form:
    a quartic in d² reduced to a quadratic; two E candidates of the
    orthographic form [[0,0,a],[0,0,b],[c,d,e]].

    x1, x2: (..., 3, 2) image points.  Returns (..., 2, 3, 3) E candidates
    and a (..., 2) validity mask (False when the discriminant is negative).
    """
    xd1 = x1[..., 1, :] - x1[..., 0, :]
    yd1 = x1[..., 2, :] - x1[..., 0, :]
    xd2 = x2[..., 1, :] - x2[..., 0, :]
    yd2 = x2[..., 2, :] - x2[..., 0, :]
    denom = xd1[..., 0] * yd1[..., 1] - xd1[..., 1] * yd1[..., 0]
    safe = jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
    aac = (xd1[..., 1] * yd2[..., 0] - xd2[..., 0] * yd1[..., 1]) / safe
    aad = (xd1[..., 1] * yd2[..., 1] - xd2[..., 1] * yd1[..., 1]) / safe
    bbc = (xd2[..., 0] * yd1[..., 0] - xd1[..., 0] * yd2[..., 0]) / safe
    bbd = (xd2[..., 1] * yd1[..., 0] - xd1[..., 0] * yd2[..., 1]) / safe

    aac_sq = aac * aac
    dd_2 = -aac_sq + aad * aad - bbc * bbc + bbd * bbd
    dd_1c = 2.0 * aac * aad + 2.0 * bbc * bbd
    dd_0 = aac_sq + bbc * bbc - 1.0
    d4_4 = dd_1c * dd_1c + dd_2 * dd_2
    d4_2 = -dd_1c * dd_1c + 2.0 * dd_0 * dd_2
    d4_0 = dd_0 * dd_0
    disc = d4_2 * d4_2 - 4.0 * d4_4 * d4_0
    ok_disc = disc >= 0
    tmp = jnp.sqrt(jnp.maximum(disc, 0.0))

    def build(root):
        ratio = -root / jnp.where(d4_4 == 0, 1.0, d4_4) / 2.0
        ok = ok_disc & (ratio >= 0) & (d4_4 != 0)
        dsol = jnp.sqrt(jnp.maximum(ratio, 0.0))
        den = 2.0 * aac * aad * dsol + 2.0 * bbc * bbd * dsol
        csol = -(dd_2 * dsol * dsol + aac_sq + bbc * bbc - 1.0) / \
            jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
        asol = aac * csol + aad * dsol
        bsol = bbc * csol + bbd * dsol
        esol = (-asol * x1[..., 0, 0] - bsol * x1[..., 0, 1]
                - csol * x2[..., 0, 0] - dsol * x2[..., 0, 1])
        zero = jnp.zeros_like(asol)
        E = jnp.stack([
            jnp.stack([zero, zero, asol], axis=-1),
            jnp.stack([zero, zero, bsol], axis=-1),
            jnp.stack([csol, dsol, esol], axis=-1),
        ], axis=-2)
        return E, ok

    E_a, ok_a = build(d4_2 + tmp)
    E_b, ok_b = build(d4_2 - tmp)
    return (jnp.stack([E_a, E_b], axis=-3),
            jnp.stack([ok_a, ok_b], axis=-1))


def ortho_essential_error_sq(E, x1, x2):
    """Algebraic epipolar error for orthographic E on 2D points.

    Note the solver's convention is x1h^T E x2h = 0 (the reference builds
    esol = -a·x1 - b·x1 - c·x2 - d·x2 with a,b in E's third column and c,d in
    its third row — solver_essential_three_point.cpp:66-79)."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    x1h = jnp.concatenate([x1, ones], axis=-1)
    x2h = jnp.concatenate([x2, ones], axis=-1)
    val = jnp.einsum("...ni,...ij,...nj->...n", x1h, E, x2h)
    return val * val
