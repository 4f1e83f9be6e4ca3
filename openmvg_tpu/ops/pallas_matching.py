"""Pallas TPU kernel: fused descriptor-distance + running 2-NN.

The XLA path (ops/matching.py) materializes the (N, M) distance matrix in
HBM and reduces it in separate passes; this kernel tiles column blocks
through VMEM, computes the partial distance block on the MXU and folds it
into running (best, second-best, argbest) accumulators — the distance
matrix never touches HBM.  Grid iterates over column tiles; row tiles
ride the first grid axis.

uint8 descriptors ride the double-rate bf16 MXU path (u8 values and the
f32 accumulator are exact in bf16xbf16->f32, matching ops/matching.py's
u8_exact_bf16 route bit-for-bit); float descriptors use f32.

Parity: same contract as ops/matching.two_nn over l2_distance_matrix
(bit-exact indices, same first-min tie-breaking).  Measured on one v5e
chip, 4096x4096x128 u8, 16-pair batches, readback-synced timing (the
tunnel's block_until_ready does not actually block — earlier numbers
that said XLA wins at batch were dispatch-time artifacts):
  XLA match_pair_batch:      ~7.9 ms/batch  (~2.0k pairs/s)
  fused f32 kernel:          ~2.5 ms/batch  (~6.5k pairs/s)
  fused bf16 kernel:         see bench.py   (matmul 4x faster than f32)
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

    a = a_ref[:]                      # (TILE_N, D) bf16 | f32
    b = b_ref[:]                      # (TILE_M, D) bf16 | f32
    bn = bn_ref[:]                    # (1, TILE_M) f32 |b|^2 (+inf at pads)
    # partial squared distances: |a|^2 omitted (constant per row — does not
    # change the argmin ordering; added back by the caller)
    cross = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d = bn - 2.0 * cross              # (TILE_N, TILE_M) f32

    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    # tile-local best and second best
    loc1 = jnp.min(d, axis=1)
    arg1 = jnp.argmin(d, axis=1).astype(jnp.int32)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    masked = jnp.where(cols == arg1[:, None], big, d)
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
        # merge (c1, c2) with (loc1, loc2); earlier tile wins ties (=
        # global first-min argmin semantics)
        take_new = loc1 < c1
        new1 = jnp.minimum(c1, loc1)
        new_i = jnp.where(take_new, gidx, ci)
        new2 = jnp.minimum(jnp.maximum(c1, loc1), jnp.minimum(c2, loc2))
        d1_ref[:, 0] = new1
        d2_ref[:, 0] = new2
        i1_ref[:, 0] = new_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_fused(a, b, valid_b=None, interpret=False):
    """(N, D), (M, D) -> (d1, d2, idx1) exact squared-L2 2-NN.

    N, M padded internally to tile multiples; pad columns (and columns
    masked off by valid_b) get +inf so they never win.  uint8 inputs use
    the bf16 MXU path (bit-exact for u8), floats stay f32.
    """
    N, D = a.shape
    M = b.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Mp = -(-M // TILE_M) * TILE_M
    mm_dtype = jnp.bfloat16 if a.dtype == jnp.uint8 and b.dtype == jnp.uint8 \
        else jnp.float32
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    am = jnp.zeros((Np, D), mm_dtype).at[:N].set(af.astype(mm_dtype))
    bm = jnp.zeros((Mp, D), mm_dtype).at[:M].set(bf.astype(mm_dtype))
    bn = jnp.zeros((Mp,), jnp.float32).at[:M].set(jnp.sum(bf * bf, axis=1))
    col_ok = jnp.arange(Mp) < M
    if valid_b is not None:
        col_ok = col_ok & jnp.pad(valid_b, (0, Mp - M))
    bn = jnp.where(col_ok, bn, jnp.finfo(jnp.float32).max / 4)

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
    )(am, bm, bn.reshape(1, Mp))

    an = jnp.sum(af * af, axis=1)
    d1 = d1[:N, 0] + an
    d2 = d2[:N, 0] + an
    return jnp.maximum(d1, 0.0), jnp.maximum(d2, 0.0), i1[:N, 0]
