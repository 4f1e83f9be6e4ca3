"""Tests: KVLD photometric/geometric match verification."""

import numpy as np
from scipy import ndimage

from openmvg_tpu.ops import kvld as K


def _pair(shift=(7, 13), seed=0):
    rng = np.random.default_rng(seed)
    base = ndimage.gaussian_filter(rng.uniform(0, 255, (200, 260)), 2.0)
    img2 = np.roll(base, shift, axis=(0, 1))
    gy, gx = np.mgrid[40:160:20, 40:200:20]
    xy1 = np.stack([gx.ravel(), gy.ravel()], 1).astype(float)
    xy2 = xy1 + np.array([shift[1], shift[0]])
    n = len(xy1)
    f1 = dict(xy=xy1, scale=np.full(n, 2.0), orientation=np.zeros(n))
    f2 = dict(xy=xy2, scale=np.full(n, 2.0), orientation=np.zeros(n))
    return base, img2, f1, f2, n


def test_kvld_keeps_true_kills_false():
    base, img2, f1, f2, n = _pair()
    good = np.stack([np.arange(n), np.arange(n)], 1)
    bad_i = np.arange(0, n, 7)
    bad_j = (bad_i + n // 2 + 3) % n
    matches = np.concatenate([good, np.stack([bad_i, bad_j], 1)])
    _, scores, valid = K.kvld_filter(base, img2, f1, f2, matches)
    assert valid[:n].sum() >= 0.8 * n
    assert valid[n:].sum() == 0


def test_vld_identical_segments_have_zero_difference():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = ndimage.gaussian_filter(rng.uniform(0, 255, (128, 128)), 2.0)
    pyr = K.build_image_scale(img)
    p1 = jnp.asarray([[30.0, 40.0]])
    p2 = jnp.asarray([[90.0, 70.0]])
    d = np.asarray(K._vld_pair_diff(pyr, pyr, p1, p2, p1, p2))
    assert abs(d[0]) < 1e-6


def test_vld_contrast_gate():
    """Flat image -> zero gradient -> contrast 0 -> difference 128."""
    import jax.numpy as jnp

    img = np.full((96, 96), 128.0)
    pyr = K.build_image_scale(img)
    p1 = jnp.asarray([[20.0, 20.0]])
    p2 = jnp.asarray([[70.0, 60.0]])
    d = np.asarray(K._vld_pair_diff(pyr, pyr, p1, p2, p1, p2))
    assert d[0] == 128.0
