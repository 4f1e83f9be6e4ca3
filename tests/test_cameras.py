import jax.numpy as jnp
import numpy as np
import pytest

from openmvg_tpu.models import cameras as cm


def _cam(kind, disto=()):
    return cm.make_pinhole(1000, 800, 1200.0, 510.0, 390.0, kind=kind, disto=disto)


MODELS = [
    (cm.PINHOLE, ()),
    (cm.PINHOLE_RADIAL_K1, (0.1,)),
    (cm.PINHOLE_RADIAL_K3, (-0.2, 0.01, 0.001)),
    (cm.PINHOLE_BROWN, (-0.05, 0.01, 0.001, 0.002, -0.001)),
    (cm.PINHOLE_FISHEYE, (-0.05, 0.01, -0.01, 0.005)),
]


@pytest.mark.parametrize("kind,disto", MODELS)
def test_disto_roundtrip(kind, disto):
    """Parity test: cameras/*_test.cpp round-trip add/remove disto."""
    c = _cam(kind, disto)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-0.4, 0.4, size=(500, 2)))
    k = jnp.full((), kind, jnp.int32)
    d = cm.add_disto(k, c.params[0], p)
    u = cm.remove_disto(k, c.params[0], d)
    np.testing.assert_allclose(np.asarray(u), np.asarray(p), atol=1e-6)


@pytest.mark.parametrize("kind,disto", MODELS)
def test_cam2ima_roundtrip(kind, disto):
    c = _cam(kind, disto)
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.uniform(0, [1000, 800], size=(100, 2)))
    k = jnp.full((), kind, jnp.int32)
    back = cm.cam2ima(k, c.params[0], c.width[0], c.height[0],
                      cm.ima2cam(k, c.params[0], c.width[0], c.height[0], pix))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-9)


@pytest.mark.parametrize("kind,disto", MODELS)
def test_project_bearing_consistency(kind, disto):
    """bearing(project(X)) must align with X/|X| for points in front."""
    c = _cam(kind, disto)
    rng = np.random.default_rng(2)
    X = rng.uniform(-0.5, 0.5, size=(200, 3))
    X[:, 2] = rng.uniform(2.0, 10.0, size=200)
    X = jnp.asarray(X)
    k = jnp.full((), kind, jnp.int32)
    pix = cm.project_cam(k, c.params[0], c.width[0], c.height[0], X)
    b = cm.bearing(k, c.params[0], c.width[0], c.height[0], pix)
    Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(Xn), atol=1e-6)


def test_spherical_project_bearing():
    c = cm.make_pinhole(2000, 1000, 0.0, kind=cm.SPHERICAL)
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(300, 3)) * 5.0)
    k = jnp.full((), cm.SPHERICAL, jnp.int32)
    pix = cm.project_cam(k, c.params[0], c.width[0], c.height[0], X)
    b = cm.bearing(k, c.params[0], c.width[0], c.height[0], pix)
    Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(Xn), atol=1e-9)


def test_spherical_center_pixel():
    """Optical axis (+Z) maps to the image center (Camera_Spherical.hpp:141)."""
    c = cm.make_pinhole(2000, 1000, 0.0, kind=cm.SPHERICAL)
    k = jnp.full((), cm.SPHERICAL, jnp.int32)
    pix = cm.project_cam(k, c.params[0], c.width[0], c.height[0], jnp.array([0.0, 0.0, 4.0]))
    np.testing.assert_allclose(np.asarray(pix), [1000.0, 500.0], atol=1e-9)


def test_batched_mixed_kinds():
    """Different camera kinds in one vmapped batch (the Scene path)."""
    import jax

    cams = cm.stack_cameras([_cam(k, d) for k, d in MODELS])
    X = jnp.tile(jnp.array([0.2, -0.1, 4.0]), (len(MODELS), 1))
    pix = jax.vmap(cm.project_cam, in_axes=(0, 0, 0, 0, 0))(
        jnp.asarray(cams.kind), jnp.asarray(cams.params), jnp.asarray(cams.width),
        jnp.asarray(cams.height), X)
    assert pix.shape == (len(MODELS), 2)
    assert np.all(np.isfinite(np.asarray(pix)))
    # pinhole row must equal the analytic projection
    f, ppx, ppy = 1200.0, 510.0, 390.0
    np.testing.assert_allclose(
        np.asarray(pix[0]), [f * 0.05 + ppx, f * (-0.025) + ppy], atol=1e-9)


def test_project_cam_np_matches_device():
    """hostmath.project_cam_np is the f64 numpy twin of project_cam —
    keep them bit-comparable across all six models (incl. spherical)."""
    import jax
    from openmvg_tpu.utils import hostmath

    all_models = MODELS + [(cm.SPHERICAL, ())]
    cams = cm.stack_cameras([_cam(k, d) for k, d in all_models])
    rng = np.random.default_rng(3)
    n = len(all_models)
    X = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 6.0], size=(n, 3))
    dev = jax.vmap(cm.project_cam, in_axes=(0, 0, 0, 0, 0))(
        jnp.asarray(cams.kind), jnp.asarray(cams.params),
        jnp.asarray(cams.width), jnp.asarray(cams.height), jnp.asarray(X))
    host = hostmath.project_cam_np(cams.kind, cams.params, cams.width,
                                   cams.height, X)
    np.testing.assert_allclose(host, np.asarray(dev), rtol=1e-12, atol=1e-10)
