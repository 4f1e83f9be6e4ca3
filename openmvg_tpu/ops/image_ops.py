"""General image processing ops — the image-layer toolbox.

Reference parity: openMVG/image/ —
  image_convolution.hpp:178-297 separable convolution,
  image_filtering.hpp:279 Gaussian filter, :81-276 Sobel/Scharr
  derivatives, image_resampling.hpp:27 half-sampling & 2x upsampling,
  image_diffusion.hpp FED diffusion (lives in ops/akaze.py),
  integral-image, generic warping (sampler), RGB<->gray
  (image_converter.hpp).

All ops take (..., H, W) float arrays, run as XLA convolutions/gathers,
and batch over leading dims.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops.sift import _blur as gaussian_filter  # noqa: F401
from openmvg_tpu.ops.sift import _bilinear


def _conv2(img, kernel):
    """'Same' correlation with edge padding; img (..., H, W), kernel (kh, kw)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(ph, ph), (pw, pw)]
    p = jnp.pad(img, pad, mode="edge")
    lead = p.shape[:-2]
    x = p.reshape((-1, 1) + p.shape[-2:])
    k = jnp.asarray(kernel, x.dtype).reshape(1, 1, kh, kw)
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return y.reshape(lead + y.shape[-2:])


def separable_convolution(img, kx, ky):
    """conv rows with kx then cols with ky (image_convolution.hpp)."""
    out = _conv2(img, np.asarray(kx, np.float64).reshape(1, -1))
    return _conv2(out, np.asarray(ky, np.float64).reshape(-1, 1))


def sobel_x(img):
    return _conv2(img, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0)


def sobel_y(img):
    return _conv2(img, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]]) / 8.0)


def scharr_x(img):
    return _conv2(img, np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0)


def scharr_y(img):
    return _conv2(img, np.array([[-3, -10, -3], [0, 0, 0], [3, 10, 3]]) / 32.0)


def half_sample(img):
    """2x decimation after a light anti-alias blur (ImageHalfSample)."""
    return gaussian_filter(img, 0.8)[..., ::2, ::2]


def double_sample(img):
    """2x bilinear upsampling (ImageDoubleSize)."""
    H, W = img.shape[-2:]
    ys = (jnp.arange(2 * H) + 0.5) / 2.0 - 0.5
    xs = (jnp.arange(2 * W) + 0.5) / 2.0 - 0.5
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")

    def one(im):
        return _bilinear(im, Y.reshape(-1), X.reshape(-1)).reshape(2 * H, 2 * W)

    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(one)(flat).reshape(img.shape[:-2] + (2 * H, 2 * W))


def integral_image(img):
    """Summed-area table (image_integral.hpp)."""
    return jnp.cumsum(jnp.cumsum(img, axis=-1), axis=-2)


def box_sum(ii, y0, x0, y1, x1):
    """Rectangle sums from an integral image (exclusive upper bounds)."""
    def g(y, x):
        valid = (y >= 0) & (x >= 0)
        yy = jnp.clip(y, 0, ii.shape[-2] - 1)
        xx = jnp.clip(x, 0, ii.shape[-1] - 1)
        return jnp.where(valid, ii[..., yy, xx], 0.0)

    return g(y1 - 1, x1 - 1) - g(y0 - 1, x1 - 1) - g(y1 - 1, x0 - 1) \
        + g(y0 - 1, x0 - 1)


def warp_homography(img, H, out_shape=None):
    """Inverse-warp by 3x3 homography (generic sampler / image_warping)."""
    Hh, Ww = img.shape[-2:] if out_shape is None else out_shape
    ys, xs = jnp.meshgrid(jnp.arange(Hh, dtype=jnp.float64),
                          jnp.arange(Ww, dtype=jnp.float64), indexing="ij")
    Hinv = jnp.linalg.inv(jnp.asarray(H))
    sx = Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]
    sy = Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]
    sw = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    sx = sx / sw
    sy = sy / sw

    def one(im):
        v = _bilinear(im, sy.reshape(-1), sx.reshape(-1)).reshape(Hh, Ww)
        inside = ((sx >= 0) & (sx <= im.shape[1] - 1)
                  & (sy >= 0) & (sy <= im.shape[0] - 1))
        return jnp.where(inside, v, 0.0)

    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(one)(flat).reshape(img.shape[:-2] + (Hh, Ww))


def rgb_to_gray(rgb):
    """Rec.601 weights (image_converter.hpp Rgb2Gray)."""
    w = jnp.asarray([0.299, 0.587, 0.114], rgb.dtype
                    if jnp.issubdtype(rgb.dtype, jnp.floating) else jnp.float32)
    return jnp.tensordot(rgb.astype(w.dtype), w, axes=([-1], [0]))


def undistort_image(img, kind, params, width, height):
    """Resample to the undistorted frame (Camera_undistort_image.hpp):
    out(p) = in(add_disto(p)) through cam2ima/ima2cam."""
    from openmvg_tpu.models import cameras as cm

    H, W = img.shape[-2:]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float64),
                          jnp.arange(W, dtype=jnp.float64), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    k = jnp.asarray(kind, jnp.int32)
    cam = cm.ima2cam(k, params, width, height, pix)
    dist = cm.add_disto(k, params, cam)
    src = cm.cam2ima(k, params, width, height, dist)

    def one(im):
        return _bilinear(im, src[:, 1], src[:, 0]).reshape(H, W)

    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(one)(flat).reshape(img.shape)
