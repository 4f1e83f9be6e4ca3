"""Scale-space blur variants on the real TPU: 1-channel conv (current)
vs im2col-matmul formulations.  The 1-channel separable convs cannot use
the MXU (C_in = 1) and measured 34 ms for 4 octaves at 1024^2."""
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

cum = [0.0] + [float(sift.SIGMA_MIN * np.sqrt(2.0 ** (2.0 * s / 3) - 1.0))
               for s in range(1, sift.N_LEVELS)]


def current(im):
    octs, _ = sift.build_scale_space(im, cfg)
    return [o.sum() for o in octs]


def _kernels(dtype):
    L = len(cum)
    R = max(1, int(np.ceil(4.0 * max(cum[1:]))))
    ks = np.zeros((2 * R + 1, L), np.float32)
    ks[R, 0] = 1.0
    for s in range(1, L):
        r = max(1, int(np.ceil(4.0 * cum[s])))
        ks[R - r:R + r + 1, s] = sift._gauss_kernel1d(cum[s], r)
    return jnp.asarray(ks, dtype), R


def blur_im2col(im):
    """h pass: (H, W, T) stack @ (T, L); v pass: einsum over shifted
    (H, W, T, L) broadcast (XLA should fuse the reduce)."""
    k, R = _kernels(im.dtype)
    T = k.shape[0]
    H, W = im.shape
    p = jnp.pad(im, ((R, R), (R, R)), mode="edge")
    cols = jnp.stack([p[:, t:t + W] for t in range(T)], -1)  # (H+2R, W, T)
    h = cols @ k                                             # (H+2R, W, L)
    rows = jnp.stack([h[t:t + H] for t in range(T)], 2)      # (H, W, T, L)
    return jnp.einsum("hwtl,tl->lhw", rows, k)


def octaves_im2col(im):
    outs = []
    for o in range(cfg.n_octaves):
        st = blur_im2col(im)
        outs.append(st.sum())
        im = st[3, ::2, ::2]
    return outs


for name, fn in [("current", current), ("im2col", octaves_im2col)]:
    t0 = time.time()
    dt = scan_time(fn, img, n_scan=4, trials=2)
    print(f"{name:10s} {dt*1e3:8.2f} ms  (wall incl compile {time.time()-t0:.0f}s)",
          flush=True)

# correctness check (CPU-precision tolerant)
a = sift.build_scale_space(img, cfg)[0][0]
b = blur_im2col(img)
print("max abs diff octave0:", float(jnp.max(jnp.abs(a - b))), flush=True)
