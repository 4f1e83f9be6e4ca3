"""Decompose match_brute_force_fused cost on the real TPU: kernel vs
ratio vs dedupe-sort vs scatter-back.  Loop-slope timing (see bench.py).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from openmvg_tpu.ops import matching
from openmvg_tpu.ops.pallas_matching import two_nn_fused
from bench import scan_time

N = 4096
B = 16
rng = np.random.default_rng(0)
descs = jnp.asarray(rng.integers(0, 256, size=(B + 1, N, 128)).astype(np.uint8))


def kernel_only(d):
    return jax.vmap(lambda i: two_nn_fused(d[0], d[1 + i]))(jnp.arange(B))


def plus_ratio(d):
    d1, d2, i1 = kernel_only(d)
    return matching.ratio_filter(d1, d2, 0.8), i1, d1


def plus_sort(d):
    keep, i1, d1 = plus_ratio(d)

    def sort_one(i1, keep, d1):
        big = jnp.asarray(jnp.finfo(d1.dtype).max, d1.dtype)
        dm = jnp.where(keep, d1, big)
        rows = jnp.arange(i1.shape[0], dtype=jnp.int32)
        si, sd, sr = jax.lax.sort((i1.astype(jnp.int32), dm, rows), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
        return si, sd, sr, first & (sd < big)

    return jax.vmap(sort_one)(i1, keep, d1)


def full(d):
    def one(i):
        return matching.match_brute_force_fused(d[0], d[1 + i]).mask
    return jax.vmap(one)(jnp.arange(B))


for name, fn in [("kernel", kernel_only), ("ratio", plus_ratio),
                 ("sort", plus_sort), ("full", full)]:
    t0 = time.time()
    dt = scan_time(fn, descs, n_scan=9, trials=3)
    print(f"{name:8s} {dt/B*1e6:9.1f} us/pair  ({B/dt:8.0f} pairs/s)"
          f"  (wall incl compile {time.time()-t0:.0f}s)", flush=True)
