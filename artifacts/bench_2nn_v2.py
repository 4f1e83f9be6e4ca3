"""A/B experiment: current fused 2-NN kernel vs v2 (packed-key reduction +
MXU/VPU software pipelining).  Runs correctness + timing on the real TPU.

v2 ideas (roofline notes in ops/pallas_matching.py after merge):
  * TILE_B=256 so (d * 256 + row) packs distance+argmin into ONE int32 key:
    the 2-NN reduction needs 4 VPU passes (key, min, mask, min) instead of
    the ~7 of the open-coded argmin.
  * grid is one step longer; step j computes cross_j into ping-pong VMEM
    scratch and reduces cross_{j-1}, so the MXU matmul and the VPU
    reduction of the PREVIOUS tile are data-independent and can overlap.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 512
TILE_B = 256           # 8 bits of row index packed into the key
PAD_BN = np.int32(2**31 - 1024)   # pad-row key ~2^31: beats any real key
                                  # (|real key| <= 2^29 + 2^30 + 255)


def _kernel_v2(nj, b_ref, a_ref, bn_ref, d1_ref, d2_ref, i1_ref, sc_ref):
    j = pl.program_id(1)

    @pl.when(j < nj)
    def _():
        sc_ref[j % 2] = jax.lax.dot_general(
            b_ref[...], a_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)

    @pl.when(j > 0)
    def _():
        cross = sc_ref[(j - 1) % 2]
        rows = jax.lax.broadcasted_iota(jnp.int32, cross.shape, 0)
        # key = (bn - 2*cross) * 256 + row   (bn_ref holds 256*|b|^2)
        key = bn_ref[...] - cross * 512 + rows
        k1 = jnp.min(key, axis=0)
        masked = jnp.where(key == k1[None, :], jnp.int32(2**31 - 1), key)
        k2 = jnp.min(masked, axis=0)
        loc1 = jax.lax.shift_right_arithmetic(k1, 8)
        loc2 = jax.lax.shift_right_arithmetic(k2, 8)
        arg1 = jnp.bitwise_and(k1, 255) + (j - 1) * TILE_B

        def bcast(v):
            return jnp.broadcast_to(v[None, :], (8, v.shape[0]))

        @pl.when(j == 1)
        def _():
            d1_ref[...] = bcast(loc1)
            d2_ref[...] = bcast(loc2)
            i1_ref[...] = bcast(arg1)

        @pl.when(j > 1)
        def _():
            c1 = d1_ref[0, :]
            c2 = d2_ref[0, :]
            ci = i1_ref[0, :]
            take_new = loc1 < c1
            d1_ref[...] = bcast(jnp.minimum(c1, loc1))
            d2_ref[...] = bcast(jnp.minimum(jnp.maximum(c1, loc1),
                                            jnp.minimum(c2, loc2)))
            i1_ref[...] = bcast(jnp.where(take_new, arg1, ci))


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_fused_v2(a, b, valid_b=None, interpret=False):
    N, D = a.shape
    M = b.shape[0]
    Np = -(-N // TILE_A) * TILE_A
    Mp = -(-M // TILE_B) * TILE_B
    assert a.dtype == jnp.uint8 and b.dtype == jnp.uint8

    ac = (a.astype(jnp.int32) - 128).astype(jnp.int8)
    bc = (b.astype(jnp.int32) - 128).astype(jnp.int8)
    row_ok = jnp.arange(M) < M
    if valid_b is not None:
        row_ok = row_ok & valid_b
    # invalid rows are ZEROED so their cross term is exactly 0 and the
    # padded key PAD_BN + row cannot overflow
    bc = jnp.where(row_ok[:, None], bc, 0)
    am = jnp.zeros((Np, D), jnp.int8).at[:N].set(ac)
    bm = jnp.zeros((Mp, D), jnp.int8).at[:M].set(bc)
    bi = bc.astype(jnp.int32)
    bn = jnp.sum(bi * bi, axis=1) * 256
    bn = jnp.where(row_ok, bn, PAD_BN)
    bn = jnp.full((Mp,), PAD_BN, jnp.int32).at[:M].set(bn)

    nj = Mp // TILE_B
    grid = (Np // TILE_A, nj + 1)
    d1, d2, i1 = pl.pallas_call(
        functools.partial(_kernel_v2, nj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, D), lambda i, j: (jnp.minimum(j, nj - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i, j: (jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_A), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_A), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_A), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np // TILE_A * 8, TILE_A), jnp.int32),
            jax.ShapeDtypeStruct((Np // TILE_A * 8, TILE_A), jnp.int32),
            jax.ShapeDtypeStruct((Np // TILE_A * 8, TILE_A), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2, TILE_B, TILE_A), jnp.int32)],
        interpret=interpret,
    )(bm, am, bn.reshape(Mp, 1))

    def unpad(x):
        return x.reshape(Np // TILE_A, 8, TILE_A)[:, 0, :].reshape(Np)[:N]

    ai = a.astype(jnp.int32) - 128
    an = jnp.sum(ai * ai, axis=1)
    d1 = (unpad(d1) + an).astype(jnp.float32)
    d2 = (unpad(d2) + an).astype(jnp.float32)
    i1 = unpad(i1)
    return jnp.maximum(d1, 0.0), jnp.maximum(d2, 0.0), i1


def main():
    from openmvg_tpu.ops.pallas_matching import two_nn_fused
    from bench import scan_time, N_FEATS, DIM, PAIR_BATCH, V5E_INT8_PEAK

    rng = np.random.default_rng(0)

    # --- correctness: exact match vs current kernel (both exact int math)
    a = jnp.asarray(rng.integers(0, 256, (1000, 128)), jnp.uint8)
    b = jnp.asarray(rng.integers(0, 256, (3000, 128)), jnp.uint8)
    vb = jnp.asarray(rng.random(3000) > 0.3)
    t0 = time.time()
    r0 = [np.asarray(x) for x in two_nn_fused(a, b, vb)]
    print(f"v1 correctness run done ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    r2 = [np.asarray(x) for x in two_nn_fused_v2(a, b, vb)]
    print(f"v2 correctness run done ({time.time()-t0:.0f}s)", flush=True)
    for x, y, name in zip(r0, r2, ("d1", "d2", "i1")):
        assert np.array_equal(x, y), (name, np.abs(x - y).max())
    print("correctness OK", flush=True)

    # --- timing: 16-pair batch at 4096x4096x128 (bench.py configuration)
    descs = jnp.asarray(rng.integers(
        0, 256, (PAIR_BATCH + 1, N_FEATS, DIM)), jnp.uint8)

    def run(fn):
        def f(d):
            return jax.vmap(lambda i: fn(d[0], d[1 + i]))(
                jnp.arange(PAIR_BATCH))
        return scan_time(f, descs)

    for name, fn in (("v1", two_nn_fused), ("v2", two_nn_fused_v2)):
        t0 = time.time()
        dt = run(fn)
        ops = 2.0 * PAIR_BATCH * N_FEATS * N_FEATS * DIM
        print(f"{name}: {PAIR_BATCH/dt:9.1f} pairs/s  mfu_int8="
              f"{ops/dt/V5E_INT8_PEAK:.4f}  (compile+run {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
