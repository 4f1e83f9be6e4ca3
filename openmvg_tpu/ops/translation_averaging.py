"""Global translation averaging.

Reference parity: multiview/translation_averaging_solver_softl1.cpp —
minimize over per-pose translations {t_i} (x_c = R x + t convention) and
per-relative-motion scales {s_e}:
    r_e = t_j - R_ij t_i - s_e * t_ij           (SoftL1 loss, tau = 0.01)
plus a one-sided pull s_e >= 1 (SmallScaleError) and gauge t_0 = 0;
translation_averaging_solver_l2_chordal.cpp is the same residual with a
plain L2 loss; the L1/LP variant (global_translations_fromTij.cpp via
OSI-CLP) is covered by IRLS-L1 weights in the same normal equations
(documented deviation: first-order instead of simplex — same minimizer
family, no LP dependency).

Solved with a dedicated Gauss-Newton/LM: analytic edge Jacobians,
edge-Laplacian normal equations built dense over (3N + E) unknowns for
the few-hundred-camera regime, jnp.linalg.solve (Cholesky) — one device
call per iteration.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SOFTL1 = "softl1"
L2 = "l2"
L1 = "l1"


def _loss_sqrt_weight(r_norm2, method, tau=0.01):
    if method == L2:
        return jnp.ones_like(r_norm2)
    if method == SOFTL1:
        b = tau * tau
        return (1.0 + r_norm2 / b) ** -0.25  # sqrt of rho' = 1/sqrt(1+s/b)
    # L1 IRLS
    return jnp.maximum(jnp.sqrt(r_norm2), 1e-6) ** -0.5


def solve_translation_averaging(n_views, edges_i, edges_j, R_rel, t_rel,
                                method=SOFTL1, n_iterations=60, tau=0.01,
                                scale_pull=1.0, dtype=jnp.float64,
                                scale_group=None):
    """Returns translations t (n_views, 3) with t_0 = 0 gauge.

    R_rel (E,3,3) = R_j R_i^T, t_rel (E,3) unit relative translations
    (x_j = R_rel x_i + s * t_rel for some positive scale s).

    scale_group: optional (E,) int array mapping each edge to a shared
    scale variable — the reference assigns ONE scale per relative-motion
    group (a triplet's 3 edges share their scale,
    translation_averaging_solver_softl1.cpp:118-173).  Default: one scale
    per edge (the two-view-motion case).
    """
    ei = jnp.asarray(edges_i)
    ej = jnp.asarray(edges_j)
    Rr = jnp.asarray(R_rel, dtype)
    tr = jnp.asarray(t_rel, dtype)
    E = len(edges_i)
    N = n_views
    if scale_group is None:
        scale_group = np.arange(E)
    sg = jnp.asarray(scale_group)
    n_scales = int(np.asarray(scale_group).max()) + 1 if E else 0

    t0 = jnp.ones((N, 3), dtype)
    s0 = jnp.ones((n_scales,), dtype)

    def resid(t, s):
        return t[ej] - jnp.einsum("eij,ej->ei", Rr, t[ei]) - s[sg][:, None] * tr

    @jax.jit
    def gn_step(t, s, lam):
        r = resid(t, s)  # (E, 3)
        w = _loss_sqrt_weight(jnp.sum(r * r, -1), method, tau)  # (E,)
        # unknown layout: [t (3N), s (n_scales)]
        # J blocks per edge: d r/d t_j = I, d r/d t_i = -R_ij, d r/d s = -t_ij
        dim = 3 * N + n_scales
        H = jnp.zeros((dim, dim), dtype)
        g = jnp.zeros((dim,), dtype)
        w2 = w * w
        eye = jnp.eye(3, dtype=dtype)

        rows_j = (3 * ej)[:, None, None] + jnp.arange(3)[None, :, None]
        cols_j = (3 * ej)[:, None, None] + jnp.arange(3)[None, None, :]
        rows_i = (3 * ei)[:, None, None] + jnp.arange(3)[None, :, None]
        cols_i = (3 * ei)[:, None, None] + jnp.arange(3)[None, None, :]

        # H_tt
        H = H.at[rows_j, cols_j].add(w2[:, None, None] * eye)
        RtR = jnp.einsum("eki,ekj->eij", Rr, Rr)  # = I, but keep general
        H = H.at[rows_i, cols_i].add(w2[:, None, None] * RtR)
        H = H.at[rows_j, cols_i].add(-w2[:, None, None] * Rr)
        H = H.at[rows_i, cols_j].add(-w2[:, None, None] * jnp.swapaxes(Rr, -1, -2))
        # H_ts, H_ss (duplicate scol indices accumulate via .add)
        scol = 3 * N + sg
        Jt_s_j = -tr  # dr/ds projected: (I)^T (-t_ij)
        Jt_s_i = jnp.einsum("eij,ej->ei", jnp.swapaxes(Rr, -1, -2), tr)  # (-R)^T(-t)
        H = H.at[rows_j[..., 0], scol[:, None]].add(w2[:, None] * Jt_s_j)
        H = H.at[scol[:, None], cols_j[:, 0, :]].add(w2[:, None] * Jt_s_j)
        H = H.at[rows_i[..., 0], scol[:, None]].add(w2[:, None] * Jt_s_i)
        H = H.at[scol[:, None], cols_i[:, 0, :]].add(w2[:, None] * Jt_s_i)
        H = H.at[scol, scol].add(w2 * jnp.sum(tr * tr, -1))
        # gradient -J^T W r
        g = g.at[rows_j[..., 0].reshape(-1)].add((-w2[:, None] * r).reshape(-1))
        g = g.at[rows_i[..., 0].reshape(-1)].add(
            (w2[:, None] * jnp.einsum("eij,ei->ej", Rr, r)).reshape(-1))
        g = g.at[scol].add(w2 * jnp.sum(tr * r, -1))

        # scale pull: residual max(0, 1 - s), J = -1 when s < 1 (per scale)
        svar = 3 * N + jnp.arange(n_scales)
        active = (s < 1.0).astype(dtype) * scale_pull
        H = H.at[svar, svar].add(active)
        g = g.at[svar].add(active * (1.0 - s))

        # gauge t_0 = 0
        idx0 = jnp.arange(3)
        H = H.at[idx0, idx0].add(1e8)

        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-9))
        d = jnp.linalg.solve(H, g)
        t_new = t + d[: 3 * N].reshape(N, 3)
        s_new = s + d[3 * N:]
        return t_new, s_new, r

    t, s = t0.at[0].set(0.0), s0
    lam = jnp.asarray(1e-6, dtype)
    for _ in range(n_iterations):
        t, s, r = gn_step(t, s, lam)
    return np.asarray(t), np.asarray(s)
