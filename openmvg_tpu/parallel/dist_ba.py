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
        return p._replace(pt_obs=None)
    pad = k - O

    def padded(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

    # pt_obs indexes the global obs table — invalid once obs rows are
    # sharded; the sharded paths use the scatter+psum reductions
    return p._replace(
        obs_pose=padded(p.obs_pose), obs_intr=padded(p.obs_intr),
        obs_point=padded(p.obs_point), obs_x=padded(p.obs_x),
        obs_w=padded(p.obs_w), pt_obs=None)


def adjust_distributed(p: ba.BAProblem, mesh, cfg: ba.BAConfig = ba.BAConfig(),
                       axis="hosts"):
    """Distributed analogue of ba.adjust."""
    p = pad_problem(p, mesh.devices.size)
    step = make_distributed_lm_step(mesh, cfg, axis)
    lam = jnp.asarray(cfg.lam_init, p.X.dtype)
    cost = None
    for _ in range(cfg.max_iterations):
        p, lam, new_cost, accept = step(p, lam)
        converged = bool(accept) and cost is not None and (
            cost - float(new_cost)
            <= cfg.function_tolerance * max(cost, 1e-30))
        cost = float(new_cost)
        if converged or float(lam) > 1e10:
            break
    return p, float(cost)


# ---------------------------------------------------------------------------
# point-block-sharded mode: X / Hpp / d_X live only on their owner shard
# ---------------------------------------------------------------------------

def partition_by_point(p: ba.BAProblem, n_shards: int):
    """Re-layout a BAProblem so shard k owns the contiguous point block
    [k*n_local, (k+1)*n_local) and ALL observations of those points.

    Returns (problem, meta).  obs_point ids become shard-local; per-shard
    observation counts are padded to the max with obs_w = 0 rows.  Camera
    (pose/intrinsic) blocks stay replicated — SURVEY §2.8's honest split:
    O(landmarks) >> O(cameras) is what outgrows one chip's HBM.
    """
    L = int(p.X.shape[0])
    n_local = max((L + n_shards - 1) // n_shards, 1)
    Lp = n_local * n_shards

    def pad_rows(a, n, fill=0):
        if a.shape[0] >= n:
            return a[:n]
        return jnp.concatenate(
            [a, jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)], 0)

    X = pad_rows(p.X, Lp)
    mask_X = pad_rows(p.mask_X, Lp)

    obs_point = np.asarray(p.obs_point)
    shard = obs_point // n_local
    order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard, minlength=n_shards)
    O_local = int(counts.max()) if len(counts) else 1

    def regroup(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_shards * O_local,) + a.shape[1:], fill, a.dtype)
        pos = 0
        for k in range(n_shards):
            c = counts[k]
            sel = order[pos:pos + c]
            out[k * O_local:k * O_local + c] = a[sel]
            pos += c
        return jnp.asarray(out)

    local_point = (obs_point - shard * n_local).astype(np.int32)
    p_new = p._replace(
        X=X, mask_X=mask_X, pt_obs=None,
        obs_pose=regroup(p.obs_pose),
        obs_intr=regroup(p.obs_intr),
        obs_point=regroup(local_point),
        obs_x=regroup(p.obs_x),
        obs_w=regroup(p.obs_w),
    )
    meta = dict(n_local=n_local, n_shards=n_shards, L=L, O_local=O_local)
    return p_new, meta


def unpartition_X(X_sharded, meta):
    """Recover the dense (L, 3) point array (contiguous blocks, just a
    truncation of the padded layout)."""
    return np.asarray(X_sharded)[: meta["L"]]


def make_point_sharded_lm_step(mesh, cfg: ba.BAConfig, axis="hosts"):
    """lm_step with observations AND point blocks sharded over `axis`;
    camera reductions ride one psum per matvec, point state stays local."""
    spec = ba.BAProblem(
        obs_pose=P(axis), obs_intr=P(axis), obs_point=P(axis),
        obs_x=P(axis), obs_w=P(axis),
        rotvec=P(), t=P(), intr_kind=P(), intr_wh=P(), intr_params=P(),
        X=P(axis), mask_pose=P(), mask_intr=P(), mask_X=P(axis),
        prior_C=P(), prior_w=P())

    def step(p, lam):
        return ba.lm_step_impl(p, lam, cfg, axis=axis, point_axis=None)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def adjust_point_sharded(p: ba.BAProblem, mesh,
                         cfg: ba.BAConfig = ba.BAConfig(), axis="hosts"):
    """Distributed adjust with camera+point block sharding.  Returns
    (problem_with_original_layout_X, final_cost)."""
    n = mesh.devices.size
    ps, meta = partition_by_point(p, n)
    step = make_point_sharded_lm_step(mesh, cfg, axis)
    lam = jnp.asarray(cfg.lam_init, ps.X.dtype)
    cost = None
    for _ in range(cfg.max_iterations):
        ps, lam, new_cost, accept = step(ps, lam)
        converged = bool(accept) and cost is not None and (
            cost - float(new_cost)
            <= cfg.function_tolerance * max(cost, 1e-30))
        cost = float(new_cost)
        if converged or float(lam) > 1e10:
            break
    X = unpartition_X(ps.X, meta)
    p_out = p._replace(X=jnp.asarray(X), rotvec=ps.rotvec, t=ps.t,
                       intr_params=ps.intr_params)
    return p_out, float(cost)
