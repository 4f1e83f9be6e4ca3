"""LAD-ADMM: min ||Ax - b||_1 by the alternating direction method of
multipliers (Boyd et al. 2012, the least-absolute-deviations instance).

Reference parity: numeric/l1_solver_admm.hpp L1Solver — used by
rotation_averaging_l1.cpp and the stellar engine's relative-scale solving.
Identical update scheme (x-solve against the cached AtA factorization,
over-relaxation alpha, soft-thresholding z-update, dual u-update); the
convergence test is replaced by a fixed lax.scan iteration count so the
whole solve is one compiled program (jit-friendly, no data-dependent
control flow).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _shrinkage(v, kappa):
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)


@partial(jax.jit, static_argnames=("iters",))
def solve_lad(A, b, x0=None, rho=1.0, alpha=1.0, iters=300, ridge=1e-9):
    """Least absolute deviations: argmin_x ||A x - b||_1.

    A (M, N) dense, b (M,).  Returns x (N,).  The AtA Cholesky is computed
    once (the ADMM speed trick in the reference, l1_solver_admm.hpp:69).
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    N = A.shape[1]
    AtA = A.T @ A + ridge * jnp.eye(N, dtype=A.dtype)
    chol = jax.scipy.linalg.cho_factor(AtA)
    x = jnp.zeros(N, A.dtype) if x0 is None else jnp.asarray(x0)
    z = jnp.zeros(A.shape[0], A.dtype)
    u = jnp.zeros(A.shape[0], A.dtype)

    def body(carry, _):
        x, z, u = carry
        x = jax.scipy.linalg.cho_solve(chol, A.T @ (b + z - u))
        Ax = A @ x
        ax_hat = alpha * Ax + (1.0 - alpha) * (z + b)
        z = _shrinkage(ax_hat - b + u, 1.0 / rho)
        u = u + ax_hat - z - b
        return (x, z, u), None

    (x, _, _), _ = jax.lax.scan(body, (x, z, u), None, length=iters)
    return x
