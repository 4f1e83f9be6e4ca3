"""Batched triangulation: the four 2-view methods + N-view algebraic.

Reference parity: multiview/triangulation.cpp (DLT HZ 12.2, L1-angular,
L-infinity-angular, inverse-depth-weighted midpoint — all from Lee & Civera;
method enum triangulation_method.hpp:15-21, default IDW midpoint) and
triangulation_nview.cpp (algebraic N-view DLT).

All functions take world->camera poses as (R, t) with x_cam = R X + t and
unit (or at least scale-free) bearing vectors; they broadcast over leading
batch dims.  Each returns (X, ok) where ok is the method's cheirality test.
"""

import jax.numpy as jnp

# method ids, parity with ETriangulationMethod (triangulation_method.hpp)
DIRECT_LINEAR_TRANSFORM = 0
L1_ANGULAR = 1
LINFINITY_ANGULAR = 2
INVERSE_DEPTH_WEIGHTED_MIDPOINT = 3  # reference default

_EPS = 1e-30


def _relative(R0, t0, R1, t1, b0):
    """Relative motion cam0->cam1 and bearing0 in cam1 frame."""
    R = R1 @ jnp.swapaxes(R0, -1, -2)
    t = t1 - jnp.einsum("...ij,...j->...i", R, t0)
    Rb0 = jnp.einsum("...ij,...j->...i", R, b0)
    return R, t, Rb0


def _point_from_depths(m0, m1, t, R1, t1):
    """triangulation.cpp Compute3DPoint: z = m1 x m0, lambdas, world point."""
    z = jnp.cross(m1, m0)
    zz = jnp.sum(z * z, axis=-1)
    lam0 = jnp.sum(z * jnp.cross(t, m1), axis=-1) / jnp.maximum(zz, _EPS)
    lam1 = jnp.sum(z * jnp.cross(t, m0), axis=-1) / jnp.maximum(zz, _EPS)
    xprime1 = t + lam0[..., None] * m0
    X = jnp.einsum("...ji,...j->...i", R1, xprime1 - t1)
    return X, (lam0 > 0) & (lam1 > 0)


def triangulate_dlt(R0, t0, b0, R1, t1, b1):
    """HZ 12.2 DLT from two projection matrices [R|t]."""
    P0 = jnp.concatenate([R0, t0[..., None]], axis=-1)
    P1 = jnp.concatenate([R1, t1[..., None]], axis=-1)
    rows = [
        b0[..., 0, None] * P0[..., 2, :] - b0[..., 2, None] * P0[..., 0, :],
        b0[..., 1, None] * P0[..., 2, :] - b0[..., 2, None] * P0[..., 1, :],
        b1[..., 0, None] * P1[..., 2, :] - b1[..., 2, None] * P1[..., 0, :],
        b1[..., 1, None] * P1[..., 2, :] - b1[..., 2, None] * P1[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    _, V = jnp.linalg.eigh(jnp.einsum("...ni,...nj->...ij", A, A))
    Xh = V[..., 0]
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < _EPS, _EPS, w)[..., None]
    d0 = jnp.einsum("...ij,...j->...i", R0, X)[..., 2] + t0[..., 2]
    d1 = jnp.einsum("...ij,...j->...i", R1, X)[..., 2] + t1[..., 2]
    return X, (d0 > 0) & (d1 > 0)


def triangulate_l1_angular(R0, t0, b0, R1, t1, b1):
    """Lee & Civera L1-angular: project the worse ray onto the epipolar
    plane of the better one (triangulation.cpp:117-146)."""
    _, t, m0 = _relative(R0, t0, R1, t1, b0)
    m1 = b1
    m0n = m0 / jnp.linalg.norm(m0, axis=-1, keepdims=True)
    m1n = m1 / jnp.linalg.norm(m1, axis=-1, keepdims=True)
    use0 = jnp.sum(jnp.cross(m0n, t) ** 2, -1) <= jnp.sum(jnp.cross(m1n, t) ** 2, -1)
    n1 = jnp.cross(m1, t)
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), _EPS)
    mp0 = m0 - jnp.sum(m0 * n1, -1, keepdims=True) * n1
    n0 = jnp.cross(m0, t)
    n0 = n0 / jnp.maximum(jnp.linalg.norm(n0, axis=-1, keepdims=True), _EPS)
    mp1 = m1 - jnp.sum(m1 * n0, -1, keepdims=True) * n0
    am0 = jnp.where(use0[..., None], mp0, m0)
    am1 = jnp.where(use0[..., None], m1, mp1)
    return _point_from_depths(am0, am1, t, R1, t1)


def triangulate_linf_angular(R0, t0, b0, R1, t1, b1):
    """Lee & Civera L-infinity-angular (triangulation.cpp:148-177)."""
    _, t, m0 = _relative(R0, t0, R1, t1, b0)
    m1 = b1
    m0n = m0 / jnp.linalg.norm(m0, axis=-1, keepdims=True)
    m1n = m1 / jnp.linalg.norm(m1, axis=-1, keepdims=True)
    na = jnp.cross(m0n + m1n, t)
    nb = jnp.cross(m0n - m1n, t)
    pick_a = jnp.sum(na * na, -1) >= jnp.sum(nb * nb, -1)
    nprime = jnp.where(pick_a[..., None], na, nb)
    nprime = nprime / jnp.maximum(jnp.linalg.norm(nprime, axis=-1, keepdims=True), _EPS)
    mp0 = m0 - jnp.sum(m0 * nprime, -1, keepdims=True) * nprime
    mp1 = m1 - jnp.sum(m1 * nprime, -1, keepdims=True) * nprime
    return _point_from_depths(mp0, mp1, t, R1, t1)


def triangulate_idw_midpoint(R0, t0, b0, R1, t1, b1):
    """Inverse-depth-weighted midpoint (triangulation.cpp:179-216), the
    reference's default method."""
    _, t, Rb0 = _relative(R0, t0, R1, t1, b0)
    p_norm = jnp.linalg.norm(jnp.cross(Rb0, b1), axis=-1)
    q_norm = jnp.linalg.norm(jnp.cross(Rb0, t), axis=-1)
    r_norm = jnp.linalg.norm(jnp.cross(b1, t), axis=-1)
    denom = jnp.maximum(q_norm + r_norm, _EPS)
    pn = jnp.maximum(p_norm, _EPS)
    xprime1 = (q_norm / denom)[..., None] * (t + (r_norm / pn)[..., None] * (Rb0 + b1))
    X = jnp.einsum("...ji,...j->...i", R1, xprime1 - t1)
    lam0_Rb0 = (r_norm / pn)[..., None] * Rb0
    lam1_b1 = (q_norm / pn)[..., None] * b1
    base = jnp.sum((t + lam0_Rb0 - lam1_b1) ** 2, -1)
    alt = jnp.minimum(
        jnp.minimum(
            jnp.sum((t + lam0_Rb0 + lam1_b1) ** 2, -1),
            jnp.sum((t - lam0_Rb0 - lam1_b1) ** 2, -1),
        ),
        jnp.sum((t - lam0_Rb0 + lam1_b1) ** 2, -1),
    )
    return X, base < alt


_METHODS = {
    DIRECT_LINEAR_TRANSFORM: triangulate_dlt,
    L1_ANGULAR: triangulate_l1_angular,
    LINFINITY_ANGULAR: triangulate_linf_angular,
    INVERSE_DEPTH_WEIGHTED_MIDPOINT: triangulate_idw_midpoint,
}


def triangulate_2view(R0, t0, b0, R1, t1, b1, method=INVERSE_DEPTH_WEIGHTED_MIDPOINT):
    """Dispatch matching Triangulate2View (triangulation.cpp:219-252).
    `method` is a static python int."""
    return _METHODS[int(method)](R0, t0, b0, R1, t1, b1)


def triangulate_nview(Rs, ts, bearings, weights=None):
    """Algebraic N-view triangulation (triangulation_nview.cpp:22-32).

    Rs (..., V, 3, 3), ts (..., V, 3), bearings (..., V, 3); weights (..., V)
    masks invalid views.  Minimizes sum of squared cross products
    |b_i x (R_i X + t_i)|^2 — a 3x3/4x4 eigen problem.

    Returns (X (..., 3), ok) with ok = all-weighted-views positive depth.
    """
    if weights is None:
        weights = jnp.ones(bearings.shape[:-1], bearings.dtype)
    P = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # (..., V, 3, 4)
    # rows: [b]_x P  -> 3 rows each, weight-masked
    from openmvg_tpu.geometry.so3 import skew

    BX = skew(bearings)  # (..., V, 3, 3)
    A = jnp.einsum("...vij,...vjk->...vik", BX, P)  # (..., V, 3, 4)
    A = A * weights[..., None, None]
    A = A.reshape(A.shape[:-3] + (-1, 4))
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Xh = V[..., 0]
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < _EPS, _EPS, w)[..., None]
    depth = jnp.einsum("...vij,...j->...vi", Rs, X)[..., 2] + ts[..., 2]
    ok = jnp.all((depth > 0) | (weights <= 0), axis=-1)
    return X, ok
