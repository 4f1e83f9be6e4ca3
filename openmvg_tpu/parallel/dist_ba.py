"""Distributed bundle adjustment: observation-sharded LM step over a mesh.

The reference's ceres runs one node (SURVEY §2.8); this is the TPU-native
replacement's scaling path: the flat observation table (the only O(obs)
state) is partitioned across the 'hosts' mesh axis with shard_map; camera,
intrinsic and point parameter blocks are replicated and every normal-
equation reduction is a single psum over ICI (ba.py lm_step_impl with
axis=...).  CG state lives replicated, so iterations add one psum per
matvec and nothing else.

obs counts must be padded to a multiple of the mesh size (obs_w = 0 pads).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from openmvg_tpu.sfm import ba


def make_distributed_lm_step(mesh, cfg: ba.BAConfig, axis="hosts"):
    """Returns a jitted lm_step with the observation table sharded over
    `axis` and parameters replicated."""
    obs_spec = ba.BAProblem(
        obs_pose=P(axis), obs_intr=P(axis), obs_point=P(axis),
        obs_x=P(axis), obs_w=P(axis),
        rotvec=P(), t=P(), intr_kind=P(), intr_wh=P(), intr_params=P(),
        X=P(), mask_pose=P(), mask_intr=P(), mask_X=P(),
        prior_C=P(), prior_w=P())

    def step(p, lam):
        return ba.lm_step_impl(p, lam, cfg, axis=axis)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(obs_spec, P()),
        out_specs=(obs_spec, P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def pad_problem(p: ba.BAProblem, n_shards: int) -> ba.BAProblem:
    """Pad the observation table to a multiple of the mesh size."""
    O = p.obs_pose.shape[0]
    k = (O + n_shards - 1) // n_shards * n_shards
    if k == O:
        return p
    pad = k - O

    def padded(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    return p._replace(
        obs_pose=padded(p.obs_pose), obs_intr=padded(p.obs_intr),
        obs_point=padded(p.obs_point), obs_x=padded(p.obs_x),
        obs_w=padded(p.obs_w))


def adjust_distributed(p: ba.BAProblem, mesh, cfg: ba.BAConfig = ba.BAConfig(),
                       axis="hosts"):
    """Distributed analogue of ba.adjust."""
    p = pad_problem(p, mesh.devices.size)
    step = make_distributed_lm_step(mesh, cfg, axis)
    lam = jnp.asarray(cfg.lam_init, p.X.dtype)
    cost = None
    for _ in range(cfg.max_iterations):
        p, lam, cost, _ = step(p, lam)
        if float(lam) > 1e10:
            break
    return p, float(cost)
