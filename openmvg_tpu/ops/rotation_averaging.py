"""Global rotation averaging: L2 spectral and L1 (MST init + IRLS).

Reference parity: multiview/rotation_averaging_l2.{hpp,cpp} —
L2RotationAveraging builds the relative-rotation graph Laplacian
L_ii += w I, L_jj += w I, L_ij -= w R_ij^T, L_ji -= w R_ij, takes the 3
smallest eigenvectors and projects each 3x3 block to SO(3) (the spectra
sparse eigensolver becomes a dense symmetric eigh — scenes have at most a
few thousand cameras, and eigh lives on TPU); rotation_averaging_l1.cpp
GlobalRotationsRobust — spanning-tree initialization + IRLS with L1
weights (Chatterjee-Govindu style).

Convention: R_ij = R_j R_i^T (world->cam x_j = R_ij x_i), matching
openMVG's RelativeRotation (rotation_averaging_common.hpp).
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry import so3


def l2_rotation_averaging(n_views, edges_i, edges_j, R_rel, weights=None):
    """Spectral L2 averaging.

    edges_i/j (E,) int arrays (global pose indices 0..n_views-1),
    R_rel (E, 3, 3) with R_rel = R_j R_i^T.  Returns (n_views, 3, 3).
    """
    E = len(edges_i)
    if weights is None:
        weights = jnp.ones(E, R_rel.dtype)
    L = jnp.zeros((3 * n_views, 3 * n_views), R_rel.dtype)
    eye = jnp.eye(3, dtype=R_rel.dtype)
    wI = weights[:, None, None] * eye
    # scatter-add the four blocks per edge
    rows_i = (3 * edges_i)[:, None, None] + jnp.arange(3)[None, :, None]
    cols_i = (3 * edges_i)[:, None, None] + jnp.arange(3)[None, None, :]
    rows_j = (3 * edges_j)[:, None, None] + jnp.arange(3)[None, :, None]
    cols_j = (3 * edges_j)[:, None, None] + jnp.arange(3)[None, None, :]
    L = L.at[rows_i, cols_i].add(wI)
    L = L.at[rows_j, cols_j].add(wI)
    Rw = weights[:, None, None] * R_rel
    L = L.at[rows_i, cols_j].add(-jnp.swapaxes(Rw, -1, -2))
    L = L.at[rows_j, cols_i].add(-Rw)

    _, V = jnp.linalg.eigh(L)
    X = V[:, :3].reshape(n_views, 3, 3)  # each block ~ R_i^T Q... (see below)
    # Each 3-row block of the eigenvector matrix satisfies X_j ~ R_ij X_i,
    # so X_i = R_i * Q for a common 3x3 Q.  Fix gauge with view 0:
    Q_inv = jnp.linalg.inv(X[0] + 1e-12 * jnp.eye(3, dtype=X.dtype))
    R = X @ Q_inv
    R = so3.project_to_so3(R)
    # align sign: det(X @ Q_inv) could be -1 globally if Q has det < 0
    return R


def spanning_tree_rotations(n_views, edges_i, edges_j, R_rel, weights=None):
    """Initialize global rotations by composing along a max-weight spanning
    tree (host side; l1 averaging init)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import minimum_spanning_tree, breadth_first_order

    ei = np.asarray(edges_i)
    ej = np.asarray(edges_j)
    Rr = np.asarray(R_rel)
    w = np.ones(len(ei)) if weights is None else np.asarray(weights)
    g = coo_matrix((1.0 / (w + 1e-9), (ei, ej)), shape=(n_views, n_views))
    mst = minimum_spanning_tree(g).tocoo()
    adj = {}
    lookup = {}
    for a, b, R in zip(ei, ej, Rr):
        lookup[(int(a), int(b))] = R
        lookup[(int(b), int(a))] = R.T
    for a, b in zip(mst.row, mst.col):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    R_glob = np.tile(np.eye(3), (n_views, 1, 1))
    root = int(ei[0])
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        for v in adj.get(u, []):
            if v in seen:
                continue
            seen.add(v)
            # R_uv = R_v R_u^T  =>  R_v = R_uv R_u
            R_glob[v] = lookup[(u, v)] @ R_glob[u]
            stack.append(v)
    return R_glob


def l1_rotation_averaging(n_views, edges_i, edges_j, R_rel, weights=None,
                          n_irls=16, init=None, solver="irls"):
    """L1 refinement of an initialization (rotation_averaging_l1.cpp
    GlobalRotationsRobust).

    Linearized residual per edge: r_e + R_ij^T d_j - d_i with
    r_e = log(R_ij^T R_j R_i^T); gauge d_0 = 0; solved densely (3N) per
    outer round.  solver="irls" re-weights the normal equations by
    1/max(|r|, eps); solver="admm" solves the linearized
    min sum ||r + J d||_1 exactly per round with the LAD-ADMM solver
    (the reference's inner solver, numeric/l1_solver_admm.hpp).
    """
    if init is None:
        # L2 spectral solution as initialization: global (no single corrupted
        # tree edge can poison it) and cheap; the IRLS then de-weights
        # outlier edges.  (The reference's MST init remains available via
        # init=spanning_tree_rotations(...).)
        init = l2_rotation_averaging(n_views, jnp.asarray(edges_i),
                                     jnp.asarray(edges_j), jnp.asarray(R_rel),
                                     weights)
    R = jnp.asarray(init)
    ei = jnp.asarray(edges_i)
    ej = jnp.asarray(edges_j)
    Rr = jnp.asarray(R_rel)
    base_w = jnp.ones(len(edges_i), R.dtype) if weights is None else jnp.asarray(weights)

    def residuals(R):
        return so3.logmap(jnp.swapaxes(Rr, -1, -2) @ R[ej] @ jnp.swapaxes(R[ei], -1, -2))

    def admm_round(R, _):
        # build the dense (3E, 3N) linearized system J d = -r and solve the
        # LAD problem exactly (small/medium scenes; IRLS covers the rest)
        from openmvg_tpu.ops.l1_admm import solve_lad

        r = residuals(R)
        N = R.shape[0]
        E = r.shape[0]
        J = jnp.zeros((3 * E, 3 * N), R.dtype)
        rows = (3 * jnp.arange(E))[:, None, None] \
            + jnp.arange(3)[None, :, None]
        cols_i = (3 * ei)[:, None, None] + jnp.arange(3)[None, None, :]
        cols_j = (3 * ej)[:, None, None] + jnp.arange(3)[None, None, :]
        eye = jnp.eye(3, dtype=R.dtype)
        wcol = base_w[:, None, None]
        J = J.at[rows, cols_i].add(-eye * wcol)
        J = J.at[rows, cols_j].add(jnp.swapaxes(Rr, -1, -2) * wcol)
        # pin the gauge by dropping view-0 columns (d_0 = 0)
        J = J.at[:, :3].set(0.0)
        d = solve_lad(J, (-(base_w[:, None] * r)).reshape(-1), iters=200)
        d = d.reshape(N, 3).at[0].set(0.0)
        R_new = so3.expmap(d) @ R
        return R_new, jnp.sum(jnp.linalg.norm(residuals(R_new), axis=-1))

    def irls_round(R, _):
        r = residuals(R)  # (E, 3)
        w = base_w / jnp.maximum(jnp.linalg.norm(r, axis=-1), 1e-3)
        # left-perturbation linearization R_k <- exp(d_k) R_k:
        #   r_new ~= r + R_ij^T d_j - d_i
        # normal equations are a 3N x 3N block Laplacian with rotation
        # off-diagonal blocks (J_j = R_ij^T, J_i = -I)
        N = R.shape[0]
        Rij = Rr
        L = jnp.zeros((3 * N, 3 * N), R.dtype)
        eye = jnp.eye(3, dtype=R.dtype)
        wI = w[:, None, None] * eye
        rows_i = (3 * ei)[:, None, None] + jnp.arange(3)[None, :, None]
        cols_i = (3 * ei)[:, None, None] + jnp.arange(3)[None, None, :]
        rows_j = (3 * ej)[:, None, None] + jnp.arange(3)[None, :, None]
        cols_j = (3 * ej)[:, None, None] + jnp.arange(3)[None, None, :]
        L = L.at[rows_i, cols_i].add(wI)
        L = L.at[rows_j, cols_j].add(wI)  # R_ij R_ij^T = I
        wR = w[:, None, None] * Rij
        # (i, j) block: J_i^T J_j = -R_ij^T ; (j, i): -R_ij
        L = L.at[rows_i, cols_j].add(-jnp.swapaxes(wR, -1, -2))
        L = L.at[rows_j, cols_i].add(-wR)
        # gradient -J^T W r: at i: +w r ; at j: -R_ij w r
        b = jnp.zeros((3 * N,), R.dtype)
        b = b.at[rows_i[..., 0].reshape(-1)].add((w[:, None] * r).reshape(-1))
        b = b.at[rows_j[..., 0].reshape(-1)].add(
            (-jnp.einsum("eij,ej->ei", wR, r)).reshape(-1))
        # gauge: pin view 0
        idx0 = jnp.arange(3)
        L = L.at[idx0, idx0].add(1e6)
        L = L + 1e-9 * jnp.eye(3 * N, dtype=R.dtype)
        d = jnp.linalg.solve(L, b).reshape(N, 3)
        R_new = so3.expmap(d) @ R
        return R_new, jnp.sum(jnp.linalg.norm(residuals(R_new), axis=-1))

    round_fn = admm_round if solver == "admm" else irls_round
    R, _ = jax.lax.scan(round_fn, R, None, length=n_irls)
    return R


def triplet_rotation_rejection(pairs: List[Tuple[int, int]], R_rel_map,
                               max_angle_deg=5.0):
    """TripletRotationRejection (GlobalSfM_rotation_averaging.hpp:26):
    keep pairs supported by at least one triplet whose composed rotation
    R_ki R_jk R_ij is within max_angle of identity.

    pairs: list of (i, j); R_rel_map: {(i, j): R_ij = R_j R_i^T}.
    Returns (kept_pairs set, valid_triplets list).
    """
    from openmvg_tpu.utils.graph import list_triplets

    triplets = list_triplets(pairs)
    if not triplets:
        return set(), []

    def rel(a, b):
        if (a, b) in R_rel_map:
            return R_rel_map[(a, b)]
        return R_rel_map[(b, a)].T

    Rijs = np.stack([rel(i, j) for (i, j, k) in triplets])
    Rjks = np.stack([rel(j, k) for (i, j, k) in triplets])
    Rkis = np.stack([rel(k, i) for (i, j, k) in triplets])
    comp = jnp.asarray(Rkis) @ jnp.asarray(Rjks) @ jnp.asarray(Rijs)
    ang = np.asarray(so3.rotation_angle_deg(comp))
    good = ang < max_angle_deg
    valid_triplets = [t for t, g in zip(triplets, good) if g]
    kept = set()
    for (i, j, k) in valid_triplets:
        kept.add((i, j) if (i, j) in R_rel_map else (j, i))
        kept.add((j, k) if (j, k) in R_rel_map else (k, j))
        kept.add((i, k) if (i, k) in R_rel_map else (k, i))
    return kept, valid_triplets
