"""Worker for tests/test_multiprocess.py — runs in a REAL separate OS
process with a clean environment (no axon plugin), 2 local CPU devices,
and joins a 2-process jax.distributed cluster (Gloo CPU collectives).

Checks, on a 4-device GLOBAL mesh:
  1. observation-sharded distributed BA == single-device ba.adjust
  2. pair-sharded match_pair_batch == single-device result
Prints "MP_OK <process_id>" on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmvg_tpu.parallel import dist_ba, runtime  # noqa: E402
from openmvg_tpu.sfm import ba  # noqa: E402
from openmvg_tpu.geometry import so3  # noqa: E402
from openmvg_tpu.utils.synthetic import ring_scene  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def make_problem():
    sc = ring_scene(n_views=6, n_points=64, jitter=0.5, seed=2)
    v, p = np.nonzero(sc.visible)
    O = len(v)
    dt = jnp.float64
    rotvec = np.asarray(so3.logmap(jnp.asarray(sc.R)))
    rng = np.random.default_rng(3)
    return ba.BAProblem(
        obs_pose=jnp.asarray(v, jnp.int32),
        obs_intr=jnp.zeros(O, jnp.int32),
        obs_point=jnp.asarray(p, jnp.int32),
        obs_x=jnp.asarray(sc.x[v, p], dt),
        obs_w=jnp.ones(O, dt),
        rotvec=jnp.asarray(rotvec, dt),
        t=jnp.asarray(sc.t, dt),
        intr_kind=jnp.asarray([1], jnp.int32),
        intr_wh=jnp.asarray([[1000, 1000]], dt),
        intr_params=jnp.asarray([[1000.0, 500.0, 500.0, 0, 0, 0, 0, 0]], dt),
        X=jnp.asarray(sc.X + rng.normal(scale=0.02, size=sc.X.shape), dt),
        mask_pose=jnp.ones((6, 6), dt),
        mask_intr=jnp.zeros((1, 8), dt),
        mask_X=jnp.ones(sc.X.shape[0], dt),
        prior_C=jnp.zeros((6, 3), dt),
        prior_w=jnp.zeros((6, 3), dt),
    )


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.config.update("jax_enable_x64", True)
    runtime.initialize(coordinator=f"127.0.0.1:{port}", num_processes=2,
                       process_id=pid)
    assert jax.device_count() == 4, jax.device_count()
    mesh = runtime.global_mesh()

    cfg = ba.BAConfig(max_iterations=6, cg_iterations=30)

    # single-device reference (identical data on every process)
    prob = make_problem()
    p_ref, cost_ref, _ = ba.adjust(prob, cfg)

    # distributed: pad + shard the observation table over the global mesh
    p_pad = dist_ba.pad_problem(make_problem(), 4)
    obs_spec = ba.BAProblem(
        obs_pose=P("hosts"), obs_intr=P("hosts"), obs_point=P("hosts"),
        obs_x=P("hosts"), obs_w=P("hosts"),
        rotvec=P(), t=P(), intr_kind=P(), intr_wh=P(), intr_params=P(),
        X=P(), mask_pose=P(), mask_intr=P(), mask_X=P(),
        prior_C=P(), prior_w=P())
    p_glob = jax.tree_util.tree_map(
        lambda a, s: runtime.replicate_to_global(a, mesh, s), p_pad, obs_spec)
    step = dist_ba.make_distributed_lm_step(mesh, cfg)
    lam = runtime.replicate_to_global(
        jnp.asarray(cfg.lam_init, jnp.float64), mesh)
    p2, cost2 = p_glob, None
    for _ in range(cfg.max_iterations):
        p2, lam, cost2, _ = step(p2, lam)
    cost2 = float(np.asarray(jax.device_get(cost2)))
    assert abs(cost2 - cost_ref) / max(cost_ref, 1e-12) < 1e-6, \
        (cost2, cost_ref)
    rot2 = np.asarray(jax.device_get(p2.rotvec))
    np.testing.assert_allclose(rot2, np.asarray(p_ref.rotvec), atol=1e-8)

    # pair-sharded matching over the global mesh
    from openmvg_tpu.ops import matching
    rng = np.random.default_rng(0)
    V, Nmax = 6, 128
    descs = rng.normal(size=(V, Nmax, 128)).astype(np.float32)
    counts = np.full(V, Nmax)
    pairs = np.asarray([(i, j) for i in range(V)
                        for j in range(i + 1, V)])[:8]
    ref = matching.match_pair_batch(jnp.asarray(descs), jnp.asarray(counts),
                                    jnp.asarray(pairs))
    out = matching.match_pair_batch(
        runtime.replicate_to_global(descs, mesh),
        runtime.replicate_to_global(counts, mesh),
        runtime.replicate_to_global(pairs, mesh, P("hosts")))
    from jax.experimental import multihost_utils
    out_idx = np.asarray(multihost_utils.process_allgather(out.idx_b,
                                                           tiled=True))
    out_mask = np.asarray(multihost_utils.process_allgather(out.mask,
                                                            tiled=True))
    np.testing.assert_array_equal(np.asarray(jax.device_get(ref.idx_b)),
                                  out_idx)
    np.testing.assert_array_equal(np.asarray(jax.device_get(ref.mask)),
                                  out_mask)

    print(f"MP_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
