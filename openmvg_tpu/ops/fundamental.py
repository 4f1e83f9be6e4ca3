"""Batched fundamental-matrix solvers and epipolar errors.

Reference parity: multiview/solver_fundamental_kernel.{hpp,cpp} —
7-point (nullspace-2 + cubic det constraint) and 8-point (nullspace + rank-2
projection) solvers, Sampson / symmetric-epipolar / point-line errors.

Convention: x2^T F x1 = 0 with pixel (or normalized) inhomogeneous points
x1, x2 of shape (..., N, 2).  F is (..., 3, 3).

TPU design: nullspaces via eigh of A^T A (symmetric eigensolver exists on
TPU; SVD of tall-thin per-sample matrices does not batch as well), cubic
roots via evaluation + interpolation + the shared bisection root finder.
"""

import jax.numpy as jnp

from openmvg_tpu.ops import polynomial


def epipolar_design(x1, x2):
    """(..., N, 2) x2^T F x1 = 0 design rows (..., N, 9), F row-major."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    o = jnp.ones_like(u1)
    return jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )


def nullspace(A, k=1):
    """Last k right-singular vectors of (..., N, M) via eigh(A^T A).

    Returns (..., k, M), smallest singular value's vector last.
    """
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    return jnp.swapaxes(V[..., :k], -1, -2)  # row i = i-th smallest eigvec


def solve_8pt(x1, x2, weights=None):
    """Normalized 8-point (HZ 11.2): (..., N>=8, 2) pairs -> (..., 3, 3) F
    with rank-2 enforced.  `weights` masks padded rows."""
    A = epipolar_design(x1, x2)
    if weights is not None:
        A = A * weights[..., None]
    f = nullspace(A, 1)[..., 0, :]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(F)
    S2 = S.at[..., 2].set(0.0)
    return (U * S2[..., None, :]) @ Vt


def solve_7pt(x1, x2):
    """7-point solver: up to 3 real F.  (..., 7, 2) -> (F (..., 3, 3, 3),
    valid (..., 3)).

    F = F1 + a F2 over the 2-dim nullspace; det(F1 + a F2) = 0 is a cubic
    whose coefficients we recover by evaluating the det at 4 points
    (exact interpolation; avoids symbolic expansion).
    """
    A = epipolar_design(x1, x2)
    ns = nullspace(A, 2)  # (..., 2, 9) nullspace basis
    F1 = ns[..., 0, :].reshape(ns.shape[:-2] + (3, 3))
    F2 = ns[..., 1, :].reshape(ns.shape[:-2] + (3, 3))
    ts = jnp.asarray([-1.0, 0.0, 1.0, 2.0], A.dtype)
    dets = jnp.stack(
        [jnp.linalg.det(F1 + t * F2) for t in ts], axis=-1
    )  # (..., 4)
    # Vandermonde inverse for nodes (-1, 0, 1, 2), lowest-degree first
    V = jnp.linalg.inv(jnp.vander(ts, 4, increasing=True))
    coeffs = jnp.einsum("ij,...j->...i", V.astype(A.dtype), dets)  # c0..c3
    roots, valid = polynomial.real_roots(coeffs, max_roots=3)
    F = F1[..., None, :, :] + roots[..., :, None, None] * F2[..., None, :, :]
    return F, valid


# ---------------------------------------------------------------------------
# errors (squared, matching the reference's squared-residual convention)
# ---------------------------------------------------------------------------

def _epi_lines(F, x1):
    """l2 = F @ x1_h: (..., 3, 3) x (..., N, 2) -> (..., N, 3)."""
    return (
        jnp.einsum("...ij,...nj->...ni", F[..., :, :2], x1) + F[..., None, :, 2]
    )


def point_line_error_sq(F, x1, x2):
    """Squared distance of x2 to epipolar line F x1 (the AC-RANSAC
    point-to-line residual, fundamental/F_ACRobust).

    F is normalized to unit Frobenius norm first: the distance is
    invariant to the scale of F, but an un-normalized tiny-scale F (the
    5-pt/7-pt null vectors can come out ~1e-20 in f32) underflows the
    squared line norm to zero and every residual collapses to 0 —
    observed on the TPU f32 path."""
    norm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    F = F / jnp.maximum(norm, 1e-30)
    l = _epi_lines(F, x1)
    num = l[..., 0] * x2[..., 0] + l[..., 1] * x2[..., 1] + l[..., 2]
    den = l[..., 0] ** 2 + l[..., 1] ** 2
    err = num * num / jnp.maximum(den, 1e-30)
    # a (near-)zero F is not a model: every point would get error 0 and
    # AC-RANSAC would accept it (observed on the TPU f32 path when a
    # solver emits zeroed slots); make it lose instead
    return jnp.where(norm[..., 0] > 1e-20, err, jnp.inf)


def symmetric_epipolar_error_sq(F, x1, x2):
    """Sum of squared distances to both epipolar lines
    (kernel::SymmetricEpipolarDistanceError)."""
    Ft = jnp.swapaxes(F, -1, -2)
    return point_line_error_sq(F, x1, x2) + point_line_error_sq(Ft, x2, x1)


def sampson_error_sq(F, x1, x2):
    """First-order geometric (Sampson) squared error (kernel::SampsonError)."""
    l2 = _epi_lines(F, x1)
    l1 = _epi_lines(jnp.swapaxes(F, -1, -2), x2)
    num = l2[..., 0] * x2[..., 0] + l2[..., 1] * x2[..., 1] + l2[..., 2]
    den = l2[..., 0] ** 2 + l2[..., 1] ** 2 + l1[..., 0] ** 2 + l1[..., 1] ** 2
    return num * num / jnp.maximum(den, 1e-30)
