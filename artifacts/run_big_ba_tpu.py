"""One 4.2M-observation LM step on the real TPU chip (BASELINE config-5
scale; complements the cpu-x64-ci record in big_scene_timings.json).

Run with the default (axon) backend: `python artifacts/run_big_ba_tpu.py`.
Timed with the loop-slope method (bench.py) because the tunnel's
block_until_ready does not block on device completion; the first
cost/accept readback verifies the step itself.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

from openmvg_tpu.sfm import ba
from test_big_scene import _big_ba_problem, _record
from bench import scan_time

prob, O = _big_ba_problem()
cfg = ba.BAConfig(cg_iterations=10)
lam = jnp.asarray(1e-4, jnp.float32)

cost0 = float(ba.robust_cost(prob, cfg))
t0 = time.time()
p2, lam2, cost1, accept = ba.lm_step(prob, lam, cfg)
cost1 = float(cost1)
print(f"cost {cost0:.1f} -> {cost1:.1f} accept={bool(accept)} "
      f"(first step wall {time.time()-t0:.1f}s incl compile)", flush=True)
assert bool(accept) and cost1 < cost0


def step(prob, lam):
    p2, lam2, cost, _ = ba.lm_step_impl(prob, lam, cfg)
    return p2, lam2, cost


dt = scan_time(step, prob, lam, n_scan=3, trials=3)
print(f"lm_step device time: {dt:.3f}s  ({O/dt/1e6:.2f} M obs/s)", flush=True)
_record("ba_4m_obs_tpu", dict(n_obs=int(O), n_points=300_000,
                              cost0=round(cost0, 1), cost1=round(cost1, 1),
                              lm_step_device_s=round(dt, 3),
                              obs_per_s=round(O / dt, 1),
                              backend=jax.devices()[0].device_kind))
