"""Stage-level timing of ops/sift.extract on the real TPU.

Uses the loop-slope method from bench.py (the axon tunnel's
block_until_ready does not block on device completion).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from openmvg_tpu.ops import sift
from bench import scan_time

cfg = sift.SiftConfig()
rng = np.random.default_rng(1)
img = jnp.asarray(rng.random((1024, 1024)).astype(np.float32))


def stage_scale_space(im):
    octs, _ = sift.build_scale_space(im, cfg)
    return [o.sum() for o in octs]


def stage_detect(im):
    octs, _ = sift.build_scale_space(im, cfg)
    outs = []
    for o, stack in enumerate(octs):
        kp = sift._detect_octave(stack, cfg, o)
        outs.append(kp["x"].sum() + kp["value"].sum())
    return outs


def stage_extrema(im):
    # detection minus the refine loop: 26-neighbor + top_k only
    octs, _ = sift.build_scale_space(im, cfg)
    outs = []
    for o, stack in enumerate(octs):
        dog = stack[1:] - stack[:-1]
        D = dog.shape[0]
        H, W = dog.shape[-2:]
        c = dog[1:D-1, 1:H-1, 1:W-1]
        is_max = jnp.ones_like(c, bool)
        is_min = jnp.ones_like(c, bool)
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == dy == dx == 0:
                        continue
                    n = dog[1+ds:D-1+ds, 1+dy:H-1+dy, 1+dx:W-1+dx]
                    is_max &= c > n
                    is_min &= c < n
        cand = (is_max | is_min) & (jnp.abs(c) > 0.8 * cfg.peak_threshold / 3)
        score = jnp.where(cand, jnp.abs(c), 0.0).reshape(-1)
        val, flat = jax.lax.top_k(score, min(cfg.max_per_octave, score.shape[0]))
        outs.append(val.sum() + flat.sum())
    return outs


def stage_ori(im):
    octs, _ = sift.build_scale_space(im, cfg)
    outs = []
    for o, stack in enumerate(octs):
        kp = sift._detect_octave(stack, cfg, o)
        gy, gx = jnp.gradient(stack, axis=(-2, -1))
        g = jnp.stack([gx, gy], axis=0)
        th, ok = sift._orientations(g, kp, cfg)
        outs.append(th.sum())
    return outs


def stage_full(im):
    f = sift.extract(im, cfg)
    return f.desc.sum(), f.xy.sum()


import jax
for name, fn in [("scale_space", stage_scale_space),
                 ("extrema_topk", stage_extrema),
                 ("detect", stage_detect),
                 ("ori", stage_ori),
                 ("full", stage_full)]:
    t0 = time.time()
    dt = scan_time(fn, img, n_scan=4, trials=2)
    print(f"{name:12s} {dt*1e3:9.2f} ms   (wall incl compile {time.time()-t0:.0f}s)",
          flush=True)
