"""AKAZE features on TPU: FED nonlinear scale space, Hessian detector,
MSURF float descriptor (AKAZE_FLOAT) and MLDB binary descriptor
(AKAZE_MLDB).

Reference parity: features/akaze/AKAZE.cpp:110-283 (nonlinear scale space
via Fast Explicit Diffusion with Perona-Malik g2 conductivity, contrast
factor k = 70th percentile of gradient magnitude, 4 octaves x 4 sublevels,
scale-normalized Hessian determinant detector with threshold 0.001),
msurf_descriptor.hpp (4x4 subregions of Gaussian-weighted rotated
gradient sums (dx, dy, |dx|, |dy|) -> 64-d float, L2 normalized),
mldb_descriptor.hpp (binary comparisons of channel means over a 3-level
grid; here the full-patch variant), image/image_diffusion.hpp (FED tau
series).

Deviations (documented): orientation uses a 36-bin gradient histogram peak
(SIFT-style) instead of SURF's sliding sector maximum — same invariance
class; MLDB uses mean-intensity/gradient comparisons on a fixed grid.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops.sift import _bilinear, _blur

N_SUBLEVELS = 4
SIGMA0 = 1.6
DET_THRESHOLD = 0.001
PM_K_PERCENTILE = 0.7


class AkazeConfig(NamedTuple):
    n_octaves: int = 4
    threshold: float = DET_THRESHOLD
    max_per_octave: int = 512
    descriptor: str = "MSURF"  # or "MLDB"
    upright: bool = False      # -u: keep descriptors in the image frame


def _fed_tau_series(T, tau_max=0.25):
    """FED cycle step sizes covering diffusion time T (image_diffusion.hpp)."""
    n = int(np.ceil(np.sqrt(3.0 * T / tau_max + 0.25) - 0.5 - 1e-8)) + 1
    c = 1.0 / (4.0 * n + 2.0)
    taus = [tau_max / (2.0 * np.cos(np.pi * (2 * j + 1) * c) ** 2)
            for j in range(n)]
    scale = T / sum(taus)
    return [t * scale for t in taus]


def _diffuse_step(L, g, tau):
    """One explicit diffusion step with conductivity g (3x3 stencil)."""
    gp = jnp.pad(g, 1, mode="edge")
    Lp = jnp.pad(L, 1, mode="edge")

    def nb(dy, dx, arr):
        H, W = L.shape
        return arr[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    flow = 0.0
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        gn = 0.5 * (g + nb(dy, dx, gp))
        flow = flow + gn * (nb(dy, dx, Lp) - L)
    return L + tau * flow


def _conductivity(L, k):
    """Perona-Malik g2: 1 / (1 + |grad|^2 / k^2)."""
    gy, gx = jnp.gradient(_blur(L, 1.0))
    return 1.0 / (1.0 + (gx * gx + gy * gy) / (k * k))


def _contrast_k(L):
    gy, gx = jnp.gradient(_blur(L, 1.0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.maximum(jnp.percentile(mag, PM_K_PERCENTILE * 100.0), 1e-6)


def build_nonlinear_scale_space(image, cfg: AkazeConfig):
    """Returns per-octave stacks [(N_SUBLEVELS, H_o, W_o)] and sigma tables."""
    L = _blur(image, SIGMA0)
    k = _contrast_k(L)
    octaves, sigma_tab = [], []
    for o in range(cfg.n_octaves):
        levels = []
        sigmas = []
        for s in range(N_SUBLEVELS):
            sigma = SIGMA0 * 2.0 ** (o + s / N_SUBLEVELS)
            sigmas.append(sigma)
            if s == 0:
                levels.append(L)
                continue
            sig_prev = SIGMA0 * 2.0 ** (o + (s - 1) / N_SUBLEVELS)
            # diffusion times in the octave's pixel units
            delta = 2.0 ** o
            T = 0.5 * ((sigma / delta) ** 2 - (sig_prev / delta) ** 2)
            g = _conductivity(levels[-1], k)
            Lc = levels[-1]
            for tau in _fed_tau_series(T):
                Lc = _diffuse_step(Lc, g, float(tau))
            levels.append(Lc)
        octaves.append(jnp.stack(levels))
        sigma_tab.append(np.asarray(sigmas))
        L = levels[-1][::2, ::2]
    return octaves, sigma_tab


def _hessian_response(stack, sigmas, delta):
    """Scale-normalized det(Hessian) per level."""
    out = []
    for s in range(stack.shape[0]):
        L = stack[s]
        gy, gx = jnp.gradient(L)
        gyy, gyx = jnp.gradient(gy)
        _, gxx = jnp.gradient(gx)
        sn = (sigmas[s] / delta) ** 2
        out.append(sn * sn * (gxx * gyy - gyx * gyx))
    return jnp.stack(out)


def _detect_octave(stack, sigmas, delta, cfg: AkazeConfig):
    det = _hessian_response(stack, sigmas, delta)
    D, H, W = det.shape
    c = det[:, 1:H - 1, 1:W - 1]
    is_max = jnp.ones_like(c, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            is_max &= c >= det[:, 1 + dy:H - 1 + dy, 1 + dx:W - 1 + dx]
    cand = is_max & (c > cfg.threshold)
    score = jnp.where(cand, c, 0.0).reshape(-1)
    K = cfg.max_per_octave
    val, flat = jax.lax.top_k(score, K)
    valid = val > 0
    s0 = flat // ((H - 2) * (W - 2))
    rem = flat % ((H - 2) * (W - 2))
    y0 = rem // (W - 2) + 1
    x0 = rem % (W - 2) + 1

    # 2D subpixel refinement on the response map
    def refine(s, y, x):
        g = lambda dy, dx: det[s, y + dy, x + dx]
        dx_ = 0.5 * (g(0, 1) - g(0, -1))
        dy_ = 0.5 * (g(1, 0) - g(-1, 0))
        dxx = g(0, 1) + g(0, -1) - 2 * g(0, 0)
        dyy = g(1, 0) + g(-1, 0) - 2 * g(0, 0)
        dxy = 0.25 * (g(1, 1) - g(1, -1) - g(-1, 1) + g(-1, -1))
        det2 = dxx * dyy - dxy * dxy
        ox = jnp.where(jnp.abs(det2) > 1e-12,
                       -(dyy * dx_ - dxy * dy_) / jnp.where(det2 == 0, 1e-12, det2), 0.0)
        oy = jnp.where(jnp.abs(det2) > 1e-12,
                       -(dxx * dy_ - dxy * dx_) / jnp.where(det2 == 0, 1e-12, det2), 0.0)
        ox = jnp.clip(ox, -1.0, 1.0)
        oy = jnp.clip(oy, -1.0, 1.0)
        return x + ox, y + oy

    xr, yr = jax.vmap(refine)(s0, y0, x0)
    return dict(level=s0, y=yr, x=xr, value=val, valid=valid)


def _orientation(gx, gy, level, y, x, sigma_pix, grid=13):
    lin = jnp.linspace(-1.0, 1.0, grid)
    U, V = jnp.meshgrid(lin, lin)
    rad = 6.0

    def one(lv, yy, xx, sg):
        sy = yy + V.reshape(-1) * rad * sg
        sx = xx + U.reshape(-1) * rad * sg
        gxs = _bilinear(gx[lv], sy, sx)
        gys = _bilinear(gy[lv], sy, sx)
        w = jnp.exp(-0.5 * (U.reshape(-1) ** 2 + V.reshape(-1) ** 2) * 4.0)
        mag = jnp.hypot(gxs, gys) * w
        ang = jnp.arctan2(gys, gxs) % (2 * jnp.pi)
        b = jnp.floor(ang / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist = jax.ops.segment_sum(mag, b, num_segments=36)
        for _ in range(3):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        pk = jnp.argmax(hist)
        return (pk.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi

    return jax.vmap(one)(level, y, x, sigma_pix)


def _msurf_descriptor(gx, gy, level, y, x, sigma_pix, theta, grid=24):
    """4x4 subregions x (sum dx, sum dy, sum |dx|, sum |dy|) = 64-d."""
    lin = (jnp.arange(grid) + 0.5) / grid * 2.0 - 1.0  # (-1, 1)
    U, V = jnp.meshgrid(lin, lin)
    Uf, Vf = U.reshape(-1), V.reshape(-1)
    R = 12.0  # pattern half-width in sigmas (MSURF 24x24 samples)

    def one(lv, yy, xx, sg, th):
        ct, st = jnp.cos(th), jnp.sin(th)
        du = Uf * R * sg
        dv = Vf * R * sg
        sx = xx + ct * du - st * dv
        sy = yy + st * du + ct * dv
        gxs = _bilinear(gx[lv], sy, sx)
        gys = _bilinear(gy[lv], sy, sx)
        # rotate gradients into the keypoint frame
        rx = ct * gxs + st * gys
        ry = -st * gxs + ct * gys
        w = jnp.exp(-0.5 * (Uf**2 + Vf**2) * (R / 6.0) ** 2)
        rx = rx * w
        ry = ry * w
        # 4x4 subregion assignment
        ub = jnp.clip(((Uf + 1.0) * 0.5 * 4).astype(jnp.int32), 0, 3)
        vb = jnp.clip(((Vf + 1.0) * 0.5 * 4).astype(jnp.int32), 0, 3)
        cell = vb * 4 + ub
        f = jnp.stack([rx, ry, jnp.abs(rx), jnp.abs(ry)], axis=-1)  # (S, 4)
        acc = jax.ops.segment_sum(f, cell, num_segments=16)  # (16, 4)
        d = acc.reshape(-1)
        return d / jnp.maximum(jnp.linalg.norm(d), 1e-12)

    return jax.vmap(one)(level, y, x, sigma_pix, theta)


def _mldb_descriptor(stack, gx, gy, level, y, x, sigma_pix, theta, grid=10):
    """Binary comparisons of (intensity, dx, dy) cell means over a grid
    (full-patch M-LDB variant) -> 486-bit packed as 61 bytes... here 480
    bits in 60 uint8 for simplicity of packing."""
    lin = (jnp.arange(grid) + 0.5) / grid * 2.0 - 1.0
    U, V = jnp.meshgrid(lin, lin)
    Uf, Vf = U.reshape(-1), V.reshape(-1)
    R = 10.0

    def one(lv, yy, xx, sg, th):
        ct, st = jnp.cos(th), jnp.sin(th)
        du = Uf * R * sg
        dv = Vf * R * sg
        sx = xx + ct * du - st * dv
        sy = yy + st * du + ct * dv
        li = _bilinear(stack[lv], sy, sx)
        gxs = _bilinear(gx[lv], sy, sx)
        gys = _bilinear(gy[lv], sy, sx)
        rx = ct * gxs + st * gys
        ry = -st * gxs + ct * gys
        ub = jnp.clip(((Uf + 1.0) * 0.5 * 4).astype(jnp.int32), 0, 3)
        vb = jnp.clip(((Vf + 1.0) * 0.5 * 4).astype(jnp.int32), 0, 3)
        cell = vb * 4 + ub
        cnt = jax.ops.segment_sum(jnp.ones_like(li), cell, num_segments=16)
        means = jnp.stack([
            jax.ops.segment_sum(li, cell, 16),
            jax.ops.segment_sum(rx, cell, 16),
            jax.ops.segment_sum(ry, cell, 16)], -1) / jnp.maximum(cnt[:, None], 1)
        # all 16*15/2 = 120 pairwise comparisons x 3 channels = 360 bits
        iu, ju = jnp.triu_indices(16, k=1)
        bits = (means[iu] > means[ju]).astype(jnp.uint8)  # (120, 3)
        bits = bits.T.reshape(-1)  # (360,)
        pad = jnp.zeros(480 - 360, jnp.uint8)
        bits = jnp.concatenate([bits, pad])
        return _packbits(bits)

    return jax.vmap(one)(level, y, x, sigma_pix, theta)


def _packbits(bits):
    b = bits.reshape(-1, 8)
    weights = (2 ** jnp.arange(8)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("cfg",))
def extract(image, cfg: AkazeConfig = AkazeConfig()):
    octaves, sigma_tab = build_nonlinear_scale_space(
        jnp.asarray(image, jnp.float32), cfg)
    outs = []
    for o, stack in enumerate(octaves):
        delta = 2.0 ** o
        kp = _detect_octave(stack, sigma_tab[o], delta, cfg)
        gy, gx = jnp.gradient(stack, axis=(-2, -1))
        sigma_pix = jnp.asarray(sigma_tab[o], jnp.float32)[kp["level"]] / delta
        theta = (jnp.zeros_like(kp["x"]) if cfg.upright else
                 _orientation(gx, gy, kp["level"], kp["y"], kp["x"], sigma_pix))
        if cfg.descriptor == "MSURF":
            desc = _msurf_descriptor(gx, gy, kp["level"], kp["y"], kp["x"],
                                     sigma_pix, theta)
        else:
            desc = _mldb_descriptor(stack, gx, gy, kp["level"], kp["y"],
                                    kp["x"], sigma_pix, theta)
        outs.append(dict(
            xy=jnp.stack([kp["x"] * delta, kp["y"] * delta], -1),
            scale=sigma_pix * delta,
            orientation=theta,
            desc=desc,
            mask=kp["valid"],
            response=kp["value"]))
    return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}


def extract_to_numpy(image, method="AKAZE_FLOAT", max_features=8192,
                     cfg: AkazeConfig = None, upright=False):
    if cfg is None:
        cfg = AkazeConfig(descriptor="MLDB" if "MLDB" in method else "MSURF",
                          upright=upright)
    f = extract(jnp.asarray(image, jnp.float32), cfg)
    mask = np.asarray(f["mask"])
    idx = np.nonzero(mask)[0]
    order = idx[np.argsort(-np.asarray(f["response"])[idx], kind="stable")]
    order = order[:max_features]
    feats = np.concatenate([
        np.asarray(f["xy"])[order],
        np.asarray(f["scale"])[order][:, None],
        np.asarray(f["orientation"])[order][:, None]], axis=1)
    return feats, np.asarray(f["desc"])[order]
