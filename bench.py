"""Benchmark: flagship TPU compute paths vs a measured CPU baseline.

Headline metric (SURVEY §6 / BASELINE "matched pairs/s per chip"):
brute-force 2-NN ratio matching of 128-d uint8 SIFT descriptors, 4096
features per image, as `ops/matching.match_pair_batch` runs it on the
MXU (fused int8 Pallas 2-NN kernel, ops/pallas_matching.py).

Baseline = the same computation by a C++ AVX2 + OpenMP matcher
(openmvg_tpu/native/native.cpp omt_bench_match_2nn) mirroring the
reference's production configuration — matching/metric_simd.hpp:33 AVX2
uint8 L2 + Matcher_Regions.cpp OpenMP parallel-for — measured on this
host.  (The reference binaries themselves cannot be built here: the
cereal/osi_clp git submodules are empty and the environment has no
network; see PARITY.md §interop.)

`extra` carries secondary recorded metrics:
  mfu_int8           kernel throughput / 394.7 TOPS v5e int8 peak
  sift_images_per_s  ops/sift.extract, 1024x1024 NORMAL preset
  ba_lm_obs_per_s    sfm/ba.lm_step observations/s (64 cams, 8k points)
  cpu_baseline_pairs_per_s, host_cpus

Timing methodology: the axon tunnel's block_until_ready does NOT block on
device completion, so device work is iterated inside a lax.scan with an
optimization_barrier-carried dependency and timed by the n=1 vs n=NSCAN
slope after a device->host readback — pure device throughput, no
dispatch/RTT artifacts.  Best of several trials (the tunnel is shared).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import functools
import json
import os
import time

import numpy as np

N_FEATS = 4096
DIM = 128
PAIR_BATCH = 16
N_SCAN = 9
V5E_INT8_PEAK = 394.7e12


def scan_time(fn, *args, n_scan=N_SCAN, trials=4):
    """Device time per fn(*args) via the loop-slope method (see module
    docstring).  The iteration count is a traced fori_loop bound so both
    measurement lengths share ONE compiled executable (compiles through
    the tunnel cost minutes per program)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *a):
        def body(_, carry):
            a, acc = carry
            r = fn(*a)
            acc = acc + jax.tree_util.tree_reduce(
                lambda s, x: s + jnp.sum(x).astype(jnp.float32), r,
                jnp.float32(0))
            return jax.lax.optimization_barrier((a, acc))
        _, acc = jax.lax.fori_loop(0, n, body, (args, jnp.float32(0)))
        return acc

    for n in (1, n_scan):
        np.asarray(run(n, *args))
    t = {1: 1e9, n_scan: 1e9}
    for _ in range(trials):
        for n in (1, n_scan):
            t0 = time.perf_counter()
            np.asarray(run(n, *args))
            t[n] = min(t[n], time.perf_counter() - t0)
    return (t[n_scan] - t[1]) / (n_scan - 1)


def cpu_baseline_pairs_per_s(descs_np, n_pairs=3):
    """C++ AVX2+OpenMP brute-force matcher (openMVG-CPU stand-in)."""
    from openmvg_tpu import native

    if not native.available():
        return None
    a = descs_np[0]
    native.bench_match_2nn(a, descs_np[1])  # warm (page-in, thread pool)
    t0 = time.perf_counter()
    for p in range(n_pairs):
        native.bench_match_2nn(a, descs_np[1 + p])
    return n_pairs / (time.perf_counter() - t0)


def bench_matching(descs_np):
    import jax
    import jax.numpy as jnp
    from openmvg_tpu.ops import matching

    descs = jnp.asarray(descs_np)
    counts = jnp.full((descs.shape[0],), N_FEATS, jnp.int32)
    pairs = jnp.asarray([[0, 1 + i] for i in range(PAIR_BATCH)], jnp.int32)

    dt = scan_time(lambda d: matching.match_pair_batch(d, counts, pairs),
                   descs)
    pairs_per_s = PAIR_BATCH / dt
    ops = 2.0 * PAIR_BATCH * N_FEATS * N_FEATS * DIM
    mfu = ops / dt / V5E_INT8_PEAK
    return pairs_per_s, mfu


def bench_sift():
    import jax.numpy as jnp
    from openmvg_tpu.ops import sift

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1024, 1024)).astype(np.float32))
    dt = scan_time(lambda im: sift.extract(im), img, n_scan=4, trials=3)
    return 1.0 / dt


def bench_ba():
    import jax.numpy as jnp
    from openmvg_tpu.sfm import ba
    from openmvg_tpu.geometry import so3
    from openmvg_tpu.utils.synthetic import ring_scene

    sc = ring_scene(n_views=64, n_points=8192, jitter=0.5, seed=3)
    v, p = np.nonzero(sc.visible)
    O = len(v)
    dt_ = jnp.float32
    rotvec = np.asarray(so3.logmap(jnp.asarray(sc.R)))
    prob = ba.BAProblem(
        obs_pose=jnp.asarray(v, jnp.int32),
        obs_intr=jnp.zeros(O, jnp.int32),
        obs_point=jnp.asarray(p, jnp.int32),
        obs_x=jnp.asarray(sc.x[v, p], dt_),
        obs_w=jnp.ones(O, dt_),
        rotvec=jnp.asarray(rotvec, dt_),
        t=jnp.asarray(sc.t, dt_),
        intr_kind=jnp.asarray([1], jnp.int32),
        intr_wh=jnp.asarray([[1000, 1000]], dt_),
        intr_params=jnp.asarray([[1000.0, 500.0, 500.0, 0, 0, 0, 0, 0]], dt_),
        X=jnp.asarray(sc.X + np.random.default_rng(4).normal(
            scale=0.01, size=sc.X.shape), dt_),
        mask_pose=jnp.ones((64, 6), dt_),
        mask_intr=jnp.zeros((1, 8), dt_),
        mask_X=jnp.ones(sc.X.shape[0], dt_),
        prior_C=jnp.zeros((64, 3), dt_),
        prior_w=jnp.zeros((64, 3), dt_),
    )
    cfg = ba.BAConfig(cg_iterations=20)
    lam = jnp.asarray(1e-4, dt_)

    def step(prob, lam):
        p2, lam2, cost, _ = ba.lm_step_impl(prob, lam, cfg)
        return p2, lam2, cost

    dt = scan_time(step, prob, lam, n_scan=4, trials=3)
    return O / dt


def main():
    rng = np.random.default_rng(0)
    descs_np = rng.integers(
        0, 256, size=(PAIR_BATCH + 1, N_FEATS, DIM)).astype(np.uint8)

    baseline = cpu_baseline_pairs_per_s(descs_np)
    pairs_per_s, mfu = bench_matching(descs_np)
    sift_ips = bench_sift()
    ba_obs = bench_ba()

    extra = {
        "mfu_int8": round(mfu, 4),
        "sift_images_per_s_1024": round(sift_ips, 3),
        "ba_lm_obs_per_s": round(ba_obs, 1),
        "cpu_baseline_pairs_per_s": round(baseline, 3) if baseline else None,
        "host_cpus": os.cpu_count(),
    }
    print(json.dumps({
        "metric": "bruteforce_sift_matching_4096x4096",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 2) if baseline else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
