"""Round-3 consolidated TPU measurement: restructured SIFT (single +
batch) and the trimmed-dedupe matcher."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from openmvg_tpu.ops import matching, sift
from bench import scan_time, N_FEATS, DIM, PAIR_BATCH, V5E_INT8_PEAK

rng = np.random.default_rng(1)

img = jnp.asarray(rng.random((1024, 1024)).astype(np.float32))
t0 = time.time()
dt = scan_time(lambda im: sift.extract(im), img, n_scan=4, trials=3)
print(f"sift single : {1.0/dt:6.2f} img/s ({dt*1e3:.0f} ms) "
      f"(wall {time.time()-t0:.0f}s)", flush=True)

imgs = jnp.asarray(rng.random((4, 1024, 1024)).astype(np.float32))
t0 = time.time()
dt = scan_time(lambda im: sift.extract_batch(im), imgs, n_scan=4, trials=3)
print(f"sift batch4 : {4.0/dt:6.2f} img/s ({dt*1e3:.0f} ms/batch) "
      f"(wall {time.time()-t0:.0f}s)", flush=True)

descs = jnp.asarray(rng.integers(
    0, 256, (PAIR_BATCH + 1, N_FEATS, DIM)), jnp.uint8)
counts = jnp.full((descs.shape[0],), N_FEATS, jnp.int32)
pairs = jnp.asarray([[0, 1 + i] for i in range(PAIR_BATCH)], jnp.int32)
t0 = time.time()
dt = scan_time(lambda d: matching.match_pair_batch(d, counts, pairs), descs)
ops = 2.0 * PAIR_BATCH * N_FEATS * N_FEATS * DIM
print(f"matcher     : {PAIR_BATCH/dt:8.1f} pairs/s  "
      f"mfu={ops/dt/V5E_INT8_PEAK:.4f} (wall {time.time()-t0:.0f}s)",
      flush=True)
