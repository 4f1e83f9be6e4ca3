"""Benchmark: descriptor matching throughput on the TPU chip.

Measures the headline kernel (SURVEY §6 / BASELINE "matched pairs/s per
chip"): brute-force 2-NN ratio matching of 128-d uint8 SIFT descriptors,
4096 features per image, as `ops/matching.match_pair_batch` runs it on the
MXU (fused Pallas 2-NN kernel on TPU).  Baseline = the same computation on
this host's CPU via numpy/BLAS (stand-in for openMVG's AVX2 matcher, which
the reference does not publish numbers for — BASELINE.md: baselines must
be measured).

Timing methodology: the axon tunnel's block_until_ready does NOT block on
device completion, so the batch is iterated inside a lax.scan with an
optimization_barrier-carried dependency and timed by the n=1 vs n=NSCAN
slope after a device->host readback of the scalar checksum — pure device
throughput, no dispatch/RTT artifacts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import numpy as np

N_FEATS = 4096
DIM = 128
PAIR_BATCH = 16
N_SCAN = 9


def cpu_pairs_per_s(descs, n_pairs=2):
    a = descs[0].astype(np.float32)
    t0 = time.perf_counter()
    for p in range(n_pairs):
        b = descs[1 + p].astype(np.float32)
        d = (
            (a * a).sum(1)[:, None]
            + (b * b).sum(1)[None, :]
            - 2.0 * a @ b.T
        )
        idx = np.argpartition(d, 2, axis=1)[:, :2]
        part = np.take_along_axis(d, idx, axis=1)
        order = np.argsort(part, axis=1)
        d2 = np.take_along_axis(part, order, axis=1)
        keep = d2[:, 0] < 0.64 * d2[:, 1]
        _ = keep.sum()
    return n_pairs / (time.perf_counter() - t0)


def main():
    rng = np.random.default_rng(0)
    V = PAIR_BATCH + 1
    descs_np = rng.integers(0, 256, size=(V, N_FEATS, DIM)).astype(np.uint8)

    baseline = cpu_pairs_per_s(descs_np)

    import jax
    import jax.numpy as jnp
    from openmvg_tpu.ops import matching

    descs = jnp.asarray(descs_np)
    counts = jnp.full((V,), N_FEATS, jnp.int32)
    pairs = jnp.asarray([[0, 1 + i] for i in range(PAIR_BATCH)], jnp.int32)

    @functools.partial(jax.jit, static_argnames="n")
    def run(descs, counts, pairs, n):
        def body(carry, _):
            d, acc = carry
            r = matching.match_pair_batch(d, counts, pairs)
            acc = acc + r.mask.sum() + r.idx_b.sum()
            # the barrier forces every scan iteration to execute (without
            # it XLA hoists the loop-invariant body out of the scan)
            d, acc = jax.lax.optimization_barrier((d, acc))
            return (d, acc), ()
        (_, acc), _ = jax.lax.scan(body, (descs, jnp.int32(0)), None,
                                   length=n)
        return acc

    for n in (1, N_SCAN):  # compile both lengths
        np.asarray(run(descs, counts, pairs, n))

    # best of several trials: the TPU is reached through a shared tunnel
    # whose throughput varies with external load; min time is the honest
    # capability number.  np.asarray forces a real device round-trip.
    t = {1: 1e9, N_SCAN: 1e9}
    for _ in range(4):
        for n in (1, N_SCAN):
            t0 = time.perf_counter()
            np.asarray(run(descs, counts, pairs, n))
            t[n] = min(t[n], time.perf_counter() - t0)
    per_batch = (t[N_SCAN] - t[1]) / (N_SCAN - 1)
    pairs_per_s = PAIR_BATCH / per_batch

    print(json.dumps({
        "metric": "bruteforce_sift_matching_4096x4096",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
