"""Tests: TBMR detector, LIOP and DIPOLE descriptors."""

import numpy as np
from scipy import ndimage

from openmvg_tpu import native
from openmvg_tpu.ops.dipole import dipole_describe
from openmvg_tpu.ops.liop import liop_describe
from openmvg_tpu.ops.tbmr import _tbmr_python, detect_tbmr


def _two_blob_image():
    img = np.zeros((96, 96), np.uint8)
    yy, xx = np.mgrid[:96, :96]
    for cx, cy in ((30, 30), (66, 66)):
        r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        img = np.maximum(img, np.clip(220 - 10 * r, 0, 255).astype(np.uint8))
    return img


def test_tbmr_detects_blobs():
    img = _two_blob_image()
    regs = detect_tbmr(img, max_rel_size=0.75)
    bright = [r for r in regs if not r.dark]
    assert len(bright) == 2
    centers = sorted((round(r.x), round(r.y)) for r in bright)
    assert centers == [(30, 30), (66, 66)]
    for r in bright:
        assert r.l1 >= 1.5 and r.l2 >= r.l1
        # isotropic blob -> near-circular ellipse
        assert r.l2 / r.l1 < 1.3


def test_tbmr_native_matches_python_fallback():
    img = _two_blob_image()
    nat = native.tbmr_native(img, 0, 30, 0.75)
    if nat is None:
        return  # no toolchain; fallback is the implementation under test
    py = _tbmr_python(img, 0, 30, 0.75)
    assert nat.shape == py.shape
    np.testing.assert_allclose(np.sort(nat, axis=0), np.sort(py, axis=0),
                               atol=1e-9)


def _smooth_random_image(seed=0, size=128):
    rng = np.random.default_rng(seed)
    return ndimage.gaussian_filter(
        rng.uniform(0, 255, (size, size)), 3.0).astype(np.float32)


def test_liop_shape_norm_and_rotation_invariance():
    img = _smooth_random_image()
    xy = np.array([[64.0, 64.0], [40.0, 80.0], [90.0, 30.0]])
    sc = np.array([2.0, 1.5, 1.0])
    d = np.asarray(liop_describe(img, xy, sc))
    assert d.shape == (3, 144)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # LIOP is rotation invariant by construction: rotate by 90 deg
    img_r = np.rot90(img, k=-1).copy()
    W = img.shape[1]
    xy_r = np.stack([W - 1 - xy[:, 1], xy[:, 0]], axis=1)
    d_r = np.asarray(liop_describe(img_r, xy_r, sc))
    assert np.all(np.sum(d * d_r, axis=1) > 0.95)


def test_liop_border_keypoint_is_finite():
    img = _smooth_random_image(1)
    d = np.asarray(liop_describe(img, np.array([[2.0, 2.0]]), np.array([3.0])))
    assert np.all(np.isfinite(d))


def test_dipole_shape_and_luminance_invariance():
    img = _smooth_random_image(2)
    xy = np.array([[64.0, 64.0], [30.0, 70.0]])
    sc = np.array([3.0, 2.0])
    d = np.asarray(dipole_describe(img, xy, sc))
    assert d.shape == (2, 20)
    # affine luminance change a*I+b leaves the descriptor unchanged
    d2 = np.asarray(dipole_describe(1.7 * img + 25.0, xy, sc))
    np.testing.assert_allclose(d, d2, atol=1e-4)
    # both blocks unit-norm
    np.testing.assert_allclose(np.linalg.norm(d[:, :8], axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d[:, 8:], axis=1), 1.0,
                               atol=1e-5)


def test_dipole_orientation_steers():
    """Rotating image and orientation together keeps the descriptor."""
    img = _smooth_random_image(3)
    xy = np.array([[64.0, 64.0]])
    sc = np.array([2.5])
    d0 = np.asarray(dipole_describe(img, xy, sc,
                                    orientation=np.array([0.0])))
    img_r = np.rot90(img, k=-1).copy()  # rotation by +90 deg in (x,y)
    W = img.shape[1]
    xy_r = np.array([[W - 1 - xy[0, 1], xy[0, 0]]])
    d1 = np.asarray(dipole_describe(img_r, xy_r, sc,
                                    orientation=np.array([np.pi / 2])))
    np.testing.assert_allclose(d0, d1, atol=5e-2)
