"""Pallas TPU kernel: segment sum as an on-the-fly one-hot matmul.

The BA camera-side reductions (J^T r, J^T J block outers) are segment sums
into a few hundred pose/intrinsic slots.  On TPU:

  * scatter-add lowers to row-serial stores (~49 ms / 1M rows, round 3);
  * an XLA one-hot matmul materializes the (O, num) one-hot in HBM —
    512 MB at 1M obs x 128 poses, ~9.6 ms measured (round 4), and the
    footprint scales with num;
  * this kernel generates each (TILE, num) one-hot tile in VMEM from an
    iota==ids compare and feeds the MXU directly: HBM traffic is just
    ids (4 B/row) + payload (4k B/row) + the (num, k) accumulator, the
    speed-of-light for this reduction.

Grid is sequential on TPU, so the output block is revisited and
accumulated across steps (standard reduction pattern).  Intended for
num <= 1024 segments; larger segment counts (point blocks) use the
point-major reshape layout in sfm/ba.py instead.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 1024


def _kernel(ids_ref, vals_ref, out_ref, *, nump):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]                                      # (TILE, 1)
    seg = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], nump), 1)
    oh = (ids == seg).astype(vals_ref.dtype)              # (TILE, nump)
    out_ref[:] += jax.lax.dot_general(
        oh, vals_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num", "tile"))
def seg_sum_mxu(vals, ids, num, tile=_TILE):
    """out[s] = sum over rows i with ids[i] == s of vals[i].

    vals (O, k) float, ids (O,) int32, num = segment count (static,
    <= ~1024).  Rows with ids outside [0, num) contribute nothing (pad
    rows with num).  Returns (num, k) in vals.dtype."""
    from jax.experimental import pallas as pl  # noqa: F401 (device-only)

    O, k = vals.shape
    Opad = -(-O // tile) * tile
    if Opad != O:
        vals = jnp.pad(vals, ((0, Opad - O), (0, 0)))
        ids = jnp.pad(ids, (0, Opad - O), constant_values=num)
    # lane-pad num so the one-hot's trailing dim is MXU-friendly
    nump = max(128, -(-num // 128) * 128)
    ids2 = ids.astype(jnp.int32)[:, None]

    out = pl.pallas_call(
        functools.partial(_kernel, nump=nump),
        grid=(Opad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nump, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nump, k), vals.dtype),
    )(ids2, vals)
    return out[:num]


# pallas imports resolved lazily so CPU-only environments can import the
# module (the kernel itself only runs behind the TPU gate in sfm/ba.py)
try:  # pragma: no cover - import side effect
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def available():
    """True when the current default device can run the kernel."""
    if pl is None:
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
