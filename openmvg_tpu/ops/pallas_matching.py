"""Pallas TPU kernel: fused descriptor-distance + running 2-NN.

The XLA path (ops/matching.py) materializes the (N, M) distance matrix in
HBM and reduces it; this kernel tiles B columns at a time through VMEM,
computes the partial distance block on the MXU and folds it into running
(best, second-best, argbest) accumulators — the distance matrix never
touches HBM.  Grid iterates over column tiles; row tiles ride the second
grid axis.

Parity: same contract as ops/matching.two_nn over l2_distance_matrix
(bit-exact indices).  Measured on one v5e chip, 4096x4096x128 u8:
  unbatched:  XLA ~110 pairs/s, fused kernel ~279 pairs/s (2.5x — no HBM
              distance matrix, no separate reduction pass)
  16-pair vmap batches: XLA ~25k pairs/s beats the kernel (~15k) because
              XLA pipelines matmul tiles across lanes better than the
              kernel's sequential column loop.
So: ops/matching.match_pair_batch (XLA) stays the collection default;
this kernel is the single-pair / low-latency path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256   # rows per program
TILE_M = 512   # columns per step


def _kernel(a_ref, b_ref, bn_ref, d1_ref, d2_ref, i1_ref):
    j = pl.program_id(1)

    a = a_ref[:]                      # (TILE_N, D) f32
    b = b_ref[:]                      # (TILE_M, D) f32
    bn = bn_ref[:]                    # (1, TILE_M) squared norms of b tile
    # partial squared distances: |a|^2 omitted (constant per row — does not
    # change the argmin ordering; added back by the caller)
    cross = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d = bn - 2.0 * cross              # (TILE_N, TILE_M)

    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * TILE_M

    # tile-local best and second best
    loc1 = jnp.min(d, axis=1)
    arg1 = jnp.argmin(d, axis=1).astype(jnp.int32)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    masked = jnp.where(cols == arg1[:, None] + j * TILE_M, big, d)
    loc2 = jnp.min(masked, axis=1)
    gidx = arg1 + j * TILE_M

    @pl.when(j == 0)
    def _():
        d1_ref[:, 0] = loc1
        d2_ref[:, 0] = loc2
        i1_ref[:, 0] = gidx

    @pl.when(j > 0)
    def _():
        c1 = d1_ref[:, 0]
        c2 = d2_ref[:, 0]
        ci = i1_ref[:, 0]
        # merge (c1, c2) with (loc1, loc2)
        new1 = jnp.minimum(c1, loc1)
        take_new = loc1 < c1
        new_i = jnp.where(take_new, gidx, ci)
        new2 = jnp.minimum(jnp.maximum(c1, loc1), jnp.minimum(c2, loc2))
        d1_ref[:, 0] = new1
        d2_ref[:, 0] = new2
        i1_ref[:, 0] = new_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_fused(a, b, interpret=False):
    """(N, D), (M, D) -> (d1, d2, idx1) exact squared-L2 2-NN.

    N, M padded internally to tile multiples (pad columns get +inf).
    """
    N, D = a.shape
    M = b.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Mp = -(-M // TILE_M) * TILE_M
    a32 = jnp.zeros((Np, D), jnp.float32).at[:N].set(a.astype(jnp.float32))
    b32 = jnp.zeros((Mp, D), jnp.float32).at[:M].set(b.astype(jnp.float32))
    bn = jnp.sum(b32 * b32, axis=1)
    bn = jnp.where(jnp.arange(Mp) < M, bn, jnp.finfo(jnp.float32).max / 4)

    grid = (Np // TILE_N, Mp // TILE_M)
    d1, d2, i1 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a32, b32, bn.reshape(1, Mp))

    an = jnp.sum(a.astype(jnp.float32) ** 2, axis=1)
    d1 = d1[:N, 0] + an
    d2 = d2[:N, 0] + an
    return jnp.maximum(d1, 0.0), jnp.maximum(d2, 0.0), i1[:N, 0]
