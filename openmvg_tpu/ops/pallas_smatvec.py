"""Fused Pallas S-matvec for the Schur-CG bundle-adjustment inner loop.

The reduced camera system's matvec S v = (B + lam D) v - E Hpp^-1 E^T v
is the hot op of BA (sfm/ba.py schur_cg_solve; ceres' ITERATIVE_SCHUR
analogue, sfm_data_BA_ceres.cpp:165-560).  The XLA path runs it as ~6
separate HBM-bound stages (pose gather, J products, point reshape-sums,
3x3 solves, expansion, camera segment sums) measured at 11.2 ms per CG
iteration at 1M observations (docs/performance.md) — ~4% of the HBM
roofline.

This module fuses the pipeline into TWO Pallas kernels around one tiny
XLA middle step (the per-point 3x3 apply cannot fuse across tiles when
hub points span tile boundaries):

  kernel A (obs tiles):  u = Jc @ (expand v)      [one-hot MXU expand]
                         w_rows = rowsum(Jx^T u)  [point-major reshape]
  XLA middle:            w = fold(w_rows); y = Hpp_inv @ w; y_row gather
  kernel B (obs tiles):  e = u - Jx @ y_row       [u recomputed in-VMEM]
                         sp += OH_pose^T (Jp e)   [one-hot MXU reduce]
                         si += OH_intr^T (Ji e)

All per-slot inputs (Jp 12, Ji 16, Jx 6, pose id, intr id) ride ONE
packed (O, 36) f32 array built once per Schur solve: five separate
narrow-lane inputs each pad to 128 VMEM lanes and blow the 16 MB VMEM
budget (observed 20 MB scoped alloc at 1.6M slots); one packed buffer
stages as a single 128-lane tile.  Per-point vectors (row sums, y) run
transposed (3, L1) for the same reason.  u is recomputed in kernel B
instead of round-tripping through HBM (MXU headroom is free here).

HBM traffic per iteration ~= 2 reads of the packed array (144 B/slot)
+ row_sums/y_row — ~470 MB at 1.6M slots -> ~0.6 ms at 819 GB/s, vs
11.2 ms unfused.

Constraints (the sfm/ba.py gate falls back to the unfused path
otherwise): f32, point-major layout (pt_obs.rows is None), pose and
intrinsic counts <= _MAX_SEGMENTS, a tile width that divides the row
count.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MAX_SEGMENTS = 1024
# one-hot tile elems: every (T, k<=128) temporary in kernel B pads to 128
# lanes, and there are ~10 of them live — T*128 must stay ~1 MB
_OH_BUDGET = 1 << 18
PACK_F = 36                   # [jp 0:12 | ji 12:28 | jx 28:34 | ids 34:36]


def pack_slots(jp, ji, jx, pose_ids, intr_ids):
    """Build the (O, 36) packed per-slot array (once per Schur solve)."""
    return jnp.concatenate([
        jp, ji, jx,
        pose_ids.astype(jnp.float32)[:, None],
        intr_ids.astype(jnp.float32)[:, None],
    ], axis=1)


def _expand_u(pk, npose, nintr, vp_ref, vi_ref):
    """u (T, 2) = Jp @ vp[pose] + Ji @ vi[intr], one-hot MXU expands.
    Returns (u0, u1, oh_p, oh_i)."""
    T = pk.shape[0]
    pose_ids = pk[:, 34:35].astype(jnp.int32)
    intr_ids = pk[:, 35:36].astype(jnp.int32)
    seg_p = jax.lax.broadcasted_iota(jnp.int32, (T, npose), 1)
    oh_p = (pose_ids == seg_p).astype(jnp.float32)
    vpe = jax.lax.dot_general(                       # (T, 6)
        oh_p, vp_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (T, nintr), 1)
    oh_i = (intr_ids == seg_i).astype(jnp.float32)
    vie = jax.lax.dot_general(                       # (T, 8)
        oh_i, vi_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    u0 = (jnp.sum(pk[:, 0:6] * vpe, axis=1)
          + jnp.sum(pk[:, 12:20] * vie, axis=1))
    u1 = (jnp.sum(pk[:, 6:12] * vpe, axis=1)
          + jnp.sum(pk[:, 20:28] * vie, axis=1))
    return u0, u1, oh_p, oh_i


def _kernel_a(pk_ref, vp_ref, vi_ref, rows_ref, *, npose, nintr, R):
    pk = pk_ref[:]
    u0, u1, _, _ = _expand_u(pk, npose, nintr, vp_ref, vi_ref)
    w = pk[:, 28:31] * u0[:, None] + pk[:, 31:34] * u1[:, None]  # (T, 3)
    T = w.shape[0]
    rows_ref[:] = jnp.sum(w.reshape(T // R, R, 3), axis=1).T


def _kernel_b(pk_ref, vp_ref, vi_ref, yrow_ref, sp_ref, si_ref, *,
              npose, nintr, R):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sp_ref[:] = jnp.zeros_like(sp_ref)
        si_ref[:] = jnp.zeros_like(si_ref)

    pk = pk_ref[:]
    u0, u1, oh_p, oh_i = _expand_u(pk, npose, nintr, vp_ref, vi_ref)
    T = u0.shape[0]
    # zz = Jx @ y, with y broadcast across each point-row's R slots
    y = yrow_ref[:].T                                # (T // R, 3)
    yb = jnp.broadcast_to(y[:, None, :], (T // R, R, 3)).reshape(T, 3)
    e0 = u0 - jnp.sum(pk[:, 28:31] * yb, axis=1)
    e1 = u1 - jnp.sum(pk[:, 31:34] * yb, axis=1)
    pe = pk[:, 0:6] * e0[:, None] + pk[:, 6:12] * e1[:, None]    # (T, 6)
    ie = pk[:, 12:20] * e0[:, None] + pk[:, 20:28] * e1[:, None]  # (T, 8)
    sp_ref[:] += jax.lax.dot_general(
        oh_p, pe, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    si_ref[:] += jax.lax.dot_general(
        oh_i, ie, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tiling(O, R, npose):
    """Rows per tile: pow2, one-hot tile within budget, divides L1."""
    L1 = O // R
    rows = 256
    while rows * R * max(npose, 128) > _OH_BUDGET and rows > 1:
        rows //= 2
    while rows > 1 and L1 % rows:
        rows //= 2
    return rows


def plan(O, R, n_pose, n_intr, dtype):
    """Static feasibility check; returns the tile rows or None."""
    if pl is None or dtype != jnp.float32:
        return None
    if n_pose > _MAX_SEGMENTS or n_intr > _MAX_SEGMENTS:
        return None
    if O % R:
        return None
    npose = max(128, -(-n_pose // 128) * 128)
    rows = _tiling(O, R, npose)   # rows always divides L1 on return
    if rows < 8 or (rows * R) % 8:
        return None
    return rows


@functools.partial(jax.jit, static_argnames=("R", "rows", "interpret"))
def s_matvec_halves(packed, vp, vi, hpp_inv, row_point, groups, R, rows,
                    interpret=False):
    """The fused S-matvec core: returns (sp (P,6), si (I,8)) =
    Jc^T (u - Jx Hpp^-1 Jx^T u) with u = Jc v — everything EXCEPT the
    +lam*D v and prior terms, which the caller adds (they are O(P)).

    packed (O, 36) from pack_slots, in point-major layout; vp (P, 6),
    vi (I, 8), hpp_inv (L, 3, 3), row_point (L1,) int32, groups (L, M)
    int32 level-2 fold table (sentinel index = first zero row).
    """
    O = packed.shape[0]
    L1 = O // R
    n_pose, n_intr = vp.shape[0], vi.shape[0]
    npose = max(128, -(-n_pose // 128) * 128)
    nintr = max(128, -(-n_intr // 128) * 128)
    vp_p = jnp.pad(vp, ((0, npose - n_pose), (0, 0)))
    vi_p = jnp.pad(vi, ((0, nintr - n_intr), (0, 0)))
    T = rows * R
    grid = (O // T,)

    common_in = [
        pl.BlockSpec((T, PACK_F), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((npose, 6), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nintr, 8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    row_sums_t = pl.pallas_call(
        functools.partial(_kernel_a, npose=npose, nintr=nintr, R=R),
        grid=grid,
        in_specs=common_in,
        out_specs=pl.BlockSpec((3, rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, L1), jnp.float32),
        interpret=interpret,
    )(packed, vp_p, vi_p)
    row_sums = row_sums_t.T

    # middle: level-2 fold -> per-point 3x3 apply -> back to rows
    L = hpp_inv.shape[0]
    z1 = jnp.zeros((1, 3), row_sums.dtype)
    rs = jnp.concatenate([row_sums, z1], axis=0)
    w = jnp.sum(rs[groups], axis=1)                  # (L, 3)
    y = jnp.einsum("lij,lj->li", hpp_inv, w)
    rp = jnp.minimum(row_point, L - 1)
    y_row_t = y[rp].T                                # (3, L1)

    sp, si = pl.pallas_call(
        functools.partial(_kernel_b, npose=npose, nintr=nintr, R=R),
        grid=grid,
        in_specs=common_in + [
            pl.BlockSpec((3, rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((npose, 6), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nintr, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npose, 6), jnp.float32),
            jax.ShapeDtypeStruct((nintr, 8), jnp.float32),
        ],
        interpret=interpret,
    )(packed, vp_p, vi_p, y_row_t)
    return sp[:n_pose], si[:n_intr]


try:  # pragma: no cover - import side effect
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def available():
    if pl is None:
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
