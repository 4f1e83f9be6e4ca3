"""Component timing of the BA LM step at 1M observations on the TPU.

Finds where the 2.7 s/step (cg=20) goes: jacobians, Hpp build, the
(N,3,3) linalg.solve, one S_matvec, the full CG scan.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from openmvg_tpu.sfm import ba
from openmvg_tpu.utils.synthetic import big_ba_problem
from bench import scan_time

prob, O = big_ba_problem(n_poses=128, n_points=100_000, obs_per_point=10,
                         seed=3)
cfg = ba.BAConfig(cg_iterations=20)
lam = jnp.asarray(1e-4, jnp.float32)
print(f"O={O}", flush=True)


def stage_jac(p, lam):
    r, Jp6, Ji8, Jx3 = ba.jacobians(p, cfg)
    return jnp.sum(r), jnp.sum(Jp6), jnp.sum(Jx3)


def stage_hpp(p, lam):
    r, Jp6, Ji8, Jx3 = ba.jacobians(p, cfg)
    Hpp = ba._block_outer_seg(Jx3, p.obs_point, p.X.shape[0], None)
    return jnp.sum(Hpp)


def stage_hpp_solve(p, lam):
    r, Jp6, Ji8, Jx3 = ba.jacobians(p, cfg)
    n_pts = p.X.shape[0]
    Hpp = ba._block_outer_seg(Jx3, p.obs_point, n_pts, None)
    dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp = Hpp + lam * jnp.maximum(dpp, 1e-12)[..., None] * jnp.eye(3)
    gx = ba._seg_sum(ba._brmatvec(Jx3, -r), p.obs_point, n_pts, None)
    y = ba._solve_sym3(Hpp, gx)
    return jnp.sum(y)


def stage_matvec1(p, lam):
    """jac + Hpp + ONE S_matvec-equivalent sweep."""
    r, Jp6, Ji8, Jx3 = ba.jacobians(p, cfg)
    n_pts = p.X.shape[0]
    n_pose = p.rotvec.shape[0]
    n_intr = p.intr_params.shape[0]
    Hpp = ba._block_outer_seg(Jx3, p.obs_point, n_pts, None)
    vp = jnp.ones((n_pose, 6), jnp.float32)
    vi = jnp.ones((n_intr, 8), jnp.float32)
    u = ba._camera_matvec(vp, vi, p, Jp6, Ji8)
    w = ba._seg_sum(ba._brmatvec(Jx3, u), p.obs_point, n_pts, None)
    y = ba._solve_sym3(Hpp, w)
    zz = ba._bmatvec(Jx3, y[p.obs_point])
    sp, si = ba._camera_rmatvec(u - zz, p, Jp6, Ji8, n_pose, n_intr, None)
    return jnp.sum(sp) + jnp.sum(si)


def stage_full(p, lam):
    p2, lam2, cost, _ = ba.lm_step_impl(p, lam, cfg)
    return cost


for name, fn in [("jacobians", stage_jac), ("hpp", stage_hpp),
                 ("hpp_solve", stage_hpp_solve), ("matvec1", stage_matvec1),
                 ("full_cg20", stage_full)]:
    t0 = time.time()
    dt = scan_time(fn, prob, lam, n_scan=3, trials=2)
    print(f"{name:10s} {dt*1e3:9.1f} ms  (wall incl compile {time.time()-t0:.0f}s)",
          flush=True)
