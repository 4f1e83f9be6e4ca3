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


def stage_ori(im):
    octs, _ = sift.build_scale_space(im, cfg)
    outs = []
    for o, stack in enumerate(octs):
        kp = sift._detect_octave(stack, cfg, o)
        gy, gx = jnp.gradient(stack, axis=(-2, -1))
        th, ok = sift._orientations(gx, gy, kp, cfg)
        outs.append(th.sum())
    return outs


def stage_full(im):
    f = sift.extract(im, cfg)
    return f.desc.sum(), f.xy.sum()


for name, fn in [("scale_space", stage_scale_space),
                 ("detect", stage_detect),
                 ("ori", stage_ori),
                 ("full", stage_full)]:
    t0 = time.time()
    dt = scan_time(fn, img, n_scan=4, trials=2)
    print(f"{name:12s} {dt*1e3:9.2f} ms   (wall incl compile {time.time()-t0:.0f}s)",
          flush=True)
