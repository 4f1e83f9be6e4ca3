import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import image_ops as im


def test_gaussian_preserves_mean():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(64, 64)))
    out = im.gaussian_filter(img, 2.0)
    assert abs(float(out.mean()) - float(img.mean())) < 1e-3
    assert float(out.std()) < float(img.std())


def test_sobel_on_ramp():
    xs = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float64), (32, 32))
    gx = im.sobel_x(xs)
    gy = im.sobel_y(xs)
    np.testing.assert_allclose(np.asarray(gx[8:-8, 8:-8]), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(gy[8:-8, 8:-8]), 0.0, atol=1e-9)


def test_half_double_sample():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(64, 64)))
    h = im.half_sample(img)
    assert h.shape == (32, 32)
    d = im.double_sample(h)
    assert d.shape == (64, 64)
    # low-frequency content survives the round trip
    assert abs(float(d.mean()) - float(img.mean())) < 5e-3


def test_integral_and_box_sum():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(20, 20))
    ii = im.integral_image(jnp.asarray(a))
    s = im.box_sum(ii, 3, 4, 10, 12)
    np.testing.assert_allclose(float(s), a[3:10, 4:12].sum(), rtol=1e-10)
    s0 = im.box_sum(ii, 0, 0, 20, 20)
    np.testing.assert_allclose(float(s0), a.sum(), rtol=1e-10)


def test_warp_homography_identity_and_shift():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(32, 32)))
    out = im.warp_homography(img, np.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-12)
    # translation by (3, 2): out(x) = in(x - shift) pulled via H
    H = np.eye(3)
    H[0, 2] = 3.0
    H[1, 2] = 2.0
    out = im.warp_homography(img, H)
    np.testing.assert_allclose(np.asarray(out[5:, 5:]),
                               np.asarray(img[3:-2, 2:-3]), atol=1e-9)


def test_rgb_to_gray():
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[..., 1] = 1.0
    g = im.rgb_to_gray(jnp.asarray(rgb))
    np.testing.assert_allclose(np.asarray(g), 0.587, rtol=1e-6)


def test_undistort_image_roundtrip():
    """Undistorting a pinhole (no disto) image is the identity."""
    from openmvg_tpu.models import cameras as cm

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(40, 40)))
    c = cm.make_pinhole(40, 40, 50.0)
    out = im.undistort_image(img, int(c.kind[0]), jnp.asarray(c.params[0]),
                             40.0, 40.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-9)
