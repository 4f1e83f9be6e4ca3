"""Where do the 45 us/pair between the raw 2-NN kernel (43 us/pair,
25.3% MFU) and match_pair_batch (88.7 us/pair, 12.3% MFU) go?

Measures, all vmapped over the bench.py 16-pair batch:
  kernel        two_nn_fused only
  +ratio        ... + ratio filter
  +dedupe_sort  ... + the production lex-sort dedupe
  +dedupe_scat  ... + a scatter-min dedupe variant
  pair_batch    the full production match_pair_batch
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from openmvg_tpu.ops import matching
from openmvg_tpu.ops.pallas_matching import two_nn_fused
from bench import scan_time, N_FEATS, DIM, PAIR_BATCH

rng = np.random.default_rng(0)
descs = jnp.asarray(rng.integers(
    0, 256, (PAIR_BATCH + 1, N_FEATS, DIM)), jnp.uint8)
counts = jnp.full((PAIR_BATCH + 1,), N_FEATS, jnp.int32)
pairs = jnp.asarray([[0, 1 + i] for i in range(PAIR_BATCH)], jnp.int32)


def dedupe_scatter(idx1, keep, d1, n_cols):
    big = jnp.asarray(jnp.finfo(d1.dtype).max, d1.dtype)
    dm = jnp.where(keep, d1, big)
    colmin = jnp.full((n_cols,), big, d1.dtype).at[idx1].min(dm)
    at_min = keep & (dm <= colmin[idx1])
    rows = jnp.arange(idx1.shape[0], dtype=jnp.int32)
    bigi = jnp.int32(2**31 - 1)
    rowwin = jnp.full((n_cols,), bigi, jnp.int32).at[idx1].min(
        jnp.where(at_min, rows, bigi))
    return at_min & (rows == rowwin[idx1])


def v_kernel(d):
    return jax.vmap(lambda i: two_nn_fused(d[0], d[1 + i]))(
        jnp.arange(PAIR_BATCH))


def v_ratio(d):
    def one(i):
        d1, d2, idx1 = two_nn_fused(d[0], d[1 + i])
        return matching.ratio_filter(d1, d2, 0.8), idx1, d1
    return jax.vmap(one)(jnp.arange(PAIR_BATCH))


def v_sort(d):
    def one(i):
        d1, d2, idx1 = two_nn_fused(d[0], d[1 + i])
        keep = matching.ratio_filter(d1, d2, 0.8)
        keep = matching.dedupe_right(idx1, keep, d1, N_FEATS)
        return keep, idx1, d1
    return jax.vmap(one)(jnp.arange(PAIR_BATCH))


def v_scat(d):
    def one(i):
        d1, d2, idx1 = two_nn_fused(d[0], d[1 + i])
        keep = matching.ratio_filter(d1, d2, 0.8)
        keep = dedupe_scatter(idx1, keep, d1, N_FEATS)
        return keep, idx1, d1
    return jax.vmap(one)(jnp.arange(PAIR_BATCH))


def v_full(d):
    return matching.match_pair_batch(d, counts, pairs)


# correctness of the scatter variant vs the sort variant
ks, _, _ = jax.tree_util.tree_map(np.asarray, v_sort(descs))
kc, _, _ = jax.tree_util.tree_map(np.asarray, v_scat(descs))
assert np.array_equal(ks, kc), "scatter dedupe != sort dedupe"
print("dedupe variants agree", flush=True)

for name, fn in (("kernel", v_kernel), ("+ratio", v_ratio),
                 ("+dedupe_sort", v_sort), ("+dedupe_scat", v_scat),
                 ("pair_batch", v_full)):
    t0 = time.time()
    dt = scan_time(fn, descs)
    print(f"{name:13s} {dt/PAIR_BATCH*1e6:8.1f} us/pair  "
          f"({PAIR_BATCH/dt:8.1f} pairs/s)  (wall {time.time()-t0:.0f}s)",
          flush=True)
