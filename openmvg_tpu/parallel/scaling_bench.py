"""Scaling-efficiency benchmark harness (BASELINE north-star #3: >=80%
scaling at 4 hosts for sharded matching + distributed Schur-CG BA).

The reference has no distributed anything (SURVEY §2.8); this harness is
the measurement machinery the TPU build adds: run the same workload on
mesh prefixes of increasing size and report throughput + efficiency
relative to linear scaling.  On real hardware the mesh axes ride ICI; in
CI it runs on the virtual CPU mesh (numbers are then only a smoke check
of the harness itself, not a perf claim).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh_of(n):
    return Mesh(np.array(jax.devices()[:n]), ("hosts",))


def measure_ba_scaling(problem, cfg, mesh_sizes=(1, 2, 4, 8), reps=3,
                       point_sharded=True):
    """Wall-clock one distributed LM step at each mesh size.

    Returns {size: {"seconds": s, "throughput": obs/s, "efficiency": e}}
    with efficiency = throughput(n) / (n * throughput(1)).
    """
    from openmvg_tpu.parallel import dist_ba

    results = {}
    base = None
    for n in mesh_sizes:
        if n > len(jax.devices()):
            continue
        mesh = _mesh_of(n)
        if point_sharded:
            p, _ = dist_ba.partition_by_point(problem, n)
            step = dist_ba.make_point_sharded_lm_step(mesh, cfg)
        else:
            p = dist_ba.pad_problem(problem, n)
            step = dist_ba.make_distributed_lm_step(mesh, cfg)
        lam = jnp.asarray(cfg.lam_init, p.X.dtype)
        out = step(p, lam)          # compile + warm
        jax.block_until_ready(out[2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(p, lam)
        jax.block_until_ready(out[2])
        dt = (time.perf_counter() - t0) / reps
        n_obs = int(np.sum(np.asarray(problem.obs_w) > 0))
        thr = n_obs / dt
        if base is None:
            base = thr / n
        results[n] = {"seconds": dt, "throughput_obs_per_s": thr,
                      "efficiency": thr / (n * base)}
    return results


def measure_matching_scaling(n_views=8, n_feats=1024, mesh_sizes=(1, 2, 4, 8),
                             reps=3):
    """Pair-sharded collection matching throughput at each mesh size."""
    from openmvg_tpu.ops import matching

    rng = np.random.default_rng(0)
    descs = jnp.asarray(
        rng.integers(0, 255, (n_views, n_feats, 128)).astype(np.float32))
    counts = jnp.full((n_views,), n_feats, jnp.int32)
    all_pairs = np.asarray([(i, j) for i in range(n_views)
                            for j in range(i + 1, n_views)])
    results = {}
    base = None
    for n in mesh_sizes:
        if n > len(jax.devices()):
            continue
        mesh = _mesh_of(n)
        k = len(all_pairs) // n * n
        pairs = jax.device_put(jnp.asarray(all_pairs[:k], jnp.int32),
                               NamedSharding(mesh, P("hosts")))
        repl = NamedSharding(mesh, P())
        d = jax.device_put(descs, repl)
        c = jax.device_put(counts, repl)
        res = matching.match_pair_batch(d, c, pairs)   # warm
        jax.block_until_ready(res.mask)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = matching.match_pair_batch(d, c, pairs)
        jax.block_until_ready(res.mask)
        dt = (time.perf_counter() - t0) / reps
        thr = k / dt
        if base is None:
            base = thr / n
        results[n] = {"seconds": dt, "pairs_per_s": thr,
                      "efficiency": thr / (n * base)}
    return results
