"""Fixed-shape real-root finding for low-degree polynomials.

The minimal solvers need real roots of polynomials: cubic (7-pt F),
quartic (P3P), degree-10 (5-pt E, Nister elimination).  TPUs have no
nonsymmetric eigensolver, so companion-matrix eigenvalues (the CPU
classic, and what openMVG does inside solver_essential_five_point.cpp)
are out.  Instead: bracket every sign change of p on a compact
reparameterized grid and polish with fixed-iteration bisection — fully
batched, static shapes, works identically on CPU and TPU.

Even-multiplicity roots don't flip sign and are skipped; in the RANSAC
context that loses only measure-zero tangential configurations.
"""

import jax.numpy as jnp
from jax import lax


def polyval(coeffs, x):
    """Evaluate sum_i coeffs[..., i] * x^i (lowest degree first) via Horner.

    coeffs: (..., D+1) broadcastable against x (...,).
    """
    n = coeffs.shape[-1]
    acc = coeffs[..., n - 1]
    for i in range(n - 2, -1, -1):
        acc = acc * x + coeffs[..., i]
    return acc


def cauchy_bound(coeffs, eps=1e-12):
    """Upper bound on |roots|: 1 + max |a_i / a_d| over the leading term.

    Uses the highest near-nonzero coefficient as the effective leader so a
    degenerate (lower-degree) polynomial still gets a finite bound.
    """
    n = coeffs.shape[-1]
    mags = jnp.abs(coeffs)
    scale = jnp.max(mags, axis=-1, keepdims=True)
    sig = mags > eps * jnp.maximum(scale, 1e-300)
    # index of highest significant coefficient
    idx = jnp.arange(n)
    lead_idx = jnp.max(jnp.where(sig, idx, -1), axis=-1)
    lead = jnp.take_along_axis(mags, lead_idx[..., None], axis=-1)[..., 0]
    bound = 1.0 + jnp.max(mags, axis=-1) / jnp.maximum(lead, 1e-300)
    return jnp.where(lead_idx <= 0, 1.0, bound)


def real_roots(coeffs, max_roots, n_grid=256, n_bisect=64):
    """All odd-multiplicity real roots of p (coeffs lowest-first, (..., D+1)).

    Returns (roots (..., max_roots), valid (..., max_roots) bool).
    Roots are found by sampling p on a tan-warped grid covering
    [-bound, bound] (denser near 0, reaching the Cauchy bound at the ends)
    and bisecting each sign-change bracket a fixed n_bisect times.
    """
    bound = cauchy_bound(coeffs)[..., None]
    # tan warp: t in (-1, 1) -> x in (-bound*tan(pi/2*0.99)/..., ...): use
    # x = bound * tan(t * atan(1)) / 1 with t in [-1, 1] mapping ends to ±bound.
    t = jnp.linspace(-1.0, 1.0, n_grid, dtype=coeffs.dtype)
    warp = jnp.tan(t * (jnp.pi / 4)) / jnp.tan(jnp.asarray(jnp.pi / 4, coeffs.dtype))
    xs = bound * warp  # (..., n_grid)
    vals = polyval(coeffs[..., None, :], xs)
    sign = jnp.sign(vals)
    # treat exact zeros as negative side so the bracket containing them survives
    sign = jnp.where(sign == 0, -1.0, sign)
    flips = sign[..., :-1] * sign[..., 1:] < 0  # (..., n_grid-1)

    # keep the first max_roots brackets: rank flips by cumulative count and
    # gather endpoints with a one-hot contraction (TPU-friendly scatter)
    order = jnp.cumsum(flips.astype(jnp.int32), axis=-1) - 1  # slot per flip
    slot = jnp.where(flips, order, max_roots)  # non-flip -> out of range
    onehot = (slot[..., None] == jnp.arange(max_roots)).astype(coeffs.dtype)
    lo = jnp.einsum("...gm,...g->...m", onehot, xs[..., :-1])
    hi = jnp.einsum("...gm,...g->...m", onehot, xs[..., 1:])
    valid = jnp.sum(flips, axis=-1, keepdims=True) > jnp.arange(max_roots)

    f_lo = polyval(coeffs[..., None, :], lo)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = polyval(coeffs[..., None, :], mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo)
        new_lo = jnp.where(same, mid, lo)
        new_hi = jnp.where(same, hi, mid)
        new_flo = jnp.where(same, f_mid, f_lo)
        return new_lo, new_hi, new_flo

    lo, hi, _ = lax.fori_loop(0, n_bisect, body, (lo, hi, f_lo))
    roots = 0.5 * (lo + hi)
    return jnp.where(valid, roots, 0.0), valid


def polymul(a, b, out_len=None):
    """Multiply polynomials given as coeff vectors (lowest first)."""
    la, lb = a.shape[-1], b.shape[-1]
    n = la + lb - 1 if out_len is None else out_len
    out = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (n,), a.dtype)
    for i in range(la):
        for j in range(lb):
            if i + j < n:
                out = out.at[..., i + j].add(a[..., i] * b[..., j])
    return out
