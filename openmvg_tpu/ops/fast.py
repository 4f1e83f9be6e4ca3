"""FAST corner detector + pyramidal KLT tracking.

Reference parity: features/fast/fast_detector.hpp (FAST-9/16 segment test
over the 16-pixel Bresenham circle, vendored third_party/fast) used by the
VO sample; the KLT tracker mirrors software/VO's tracker interface
(Tracker_fast_dipole / KLT).

TPU design: the segment test evaluates all 16 circle offsets as shifted
image slices (pure vectorized compare/reduce); KLT is batched
Lucas-Kanade with fixed window gathers per tracked point.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops.sift import _bilinear, _blur

# 16-point Bresenham circle of radius 3, (dy, dx), clockwise from top
# (fast_detector.hpp offsets)
_CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
])


@partial(jax.jit, static_argnames=("threshold", "arc", "max_corners"))
def fast_detect(img, threshold=0.08, arc=9, max_corners=2048):
    """FAST-9 corners on (H, W) float [0,1].

    Returns (xy (K, 2), score (K,), valid (K,)).
    """
    H, W = img.shape
    pad = 3
    c = img[pad:H - pad, pad:W - pad]
    brighter = []
    darker = []
    for dy, dx in _CIRCLE:
        n = img[pad + dy:H - pad + dy, pad + dx:W - pad + dx]
        brighter.append(n > c + threshold)
        darker.append(n < c - threshold)
    B = jnp.stack(brighter)   # (16, h, w)
    D = jnp.stack(darker)
    # contiguous arc of length >= arc (circular): check all 16 rotations
    Bc = jnp.concatenate([B, B[:arc - 1]], axis=0)
    Dc = jnp.concatenate([D, D[:arc - 1]], axis=0)
    run_b = jnp.zeros_like(B[0], bool)
    run_d = jnp.zeros_like(D[0], bool)
    for s in range(16):
        run_b |= jnp.all(Bc[s:s + arc], axis=0)
        run_d |= jnp.all(Dc[s:s + arc], axis=0)
    corner = run_b | run_d
    # score: sum of absolute differences over the circle
    diffs = jnp.stack([jnp.abs(
        img[pad + dy:H - pad + dy, pad + dx:W - pad + dx] - c)
        for dy, dx in _CIRCLE])
    score = jnp.where(corner, jnp.sum(diffs, axis=0), 0.0)
    # 3x3 non-max suppression
    sp = jnp.pad(score, 1)
    nms = jnp.ones_like(score, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            nms &= score >= sp[1 + dy:1 + dy + score.shape[0],
                               1 + dx:1 + dx + score.shape[1]]
    score = jnp.where(nms, score, 0.0)
    vals, flat = jax.lax.top_k(score.reshape(-1), max_corners)
    ys = flat // score.shape[1] + pad
    xs = flat % score.shape[1] + pad
    return jnp.stack([xs, ys], -1).astype(jnp.float32), vals, vals > 0


@partial(jax.jit, static_argnames=("window", "n_iter", "n_levels"))
def klt_track(img0, img1, pts, window=7, n_iter=10, n_levels=3):
    """Pyramidal Lucas-Kanade: track pts (N, 2) from img0 to img1.

    Returns (new_pts (N, 2), ok (N,)).
    """
    pyr0, pyr1 = [img0], [img1]
    for _ in range(n_levels - 1):
        pyr0.append(_blur(pyr0[-1], 1.0)[::2, ::2])
        pyr1.append(_blur(pyr1[-1], 1.0)[::2, ::2])

    half = window // 2
    off = jnp.arange(-half, half + 1, dtype=jnp.float32)
    OY, OX = jnp.meshgrid(off, off, indexing="ij")
    oy = OY.reshape(-1)
    ox = OX.reshape(-1)

    def track_level(I0, I1, p0, d):
        gy, gx = jnp.gradient(I0)

        def one(pt, disp):
            sy = pt[1] + oy
            sx = pt[0] + ox
            t = _bilinear(I0, sy, sx)
            Ix = _bilinear(gx, sy, sx)
            Iy = _bilinear(gy, sy, sx)
            G = jnp.array([[jnp.sum(Ix * Ix), jnp.sum(Ix * Iy)],
                           [jnp.sum(Ix * Iy), jnp.sum(Iy * Iy)]])
            detG = jnp.linalg.det(G)

            def body(_, dloc):
                w = _bilinear(I1, sy + dloc[1], sx + dloc[0])
                e = t - w
                b = jnp.array([jnp.sum(e * Ix), jnp.sum(e * Iy)])
                step = jnp.linalg.solve(G + 1e-6 * jnp.eye(2, dtype=G.dtype), b)
                return (dloc + step).astype(dloc.dtype)

            dnew = jax.lax.fori_loop(0, n_iter, body, disp)
            ok = detG > 1e-7
            return jnp.where(ok, dnew, disp), ok

        return jax.vmap(one)(p0, d)

    d = jnp.zeros_like(pts)
    ok_all = jnp.ones(pts.shape[0], bool)
    for lv in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lv
        d, ok = track_level(pyr0[lv], pyr1[lv], pts / scale, d)
        ok_all &= ok
        if lv > 0:
            d = d * 2.0
    new_pts = pts + d
    H, W = img1.shape
    inside = ((new_pts[:, 0] >= half) & (new_pts[:, 0] < W - half)
              & (new_pts[:, 1] >= half) & (new_pts[:, 1] < H - half))
    return new_pts, ok_all & inside
