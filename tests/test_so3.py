import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.geometry import so3


def random_rotvecs(n, seed=0, scale=np.pi * 0.9):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mag = rng.uniform(1e-8, scale, size=(n, 1))
    return v * mag


def test_expmap_orthonormal():
    w = jnp.asarray(random_rotvecs(64))
    R = so3.expmap(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


def test_exp_log_roundtrip():
    w = jnp.asarray(random_rotvecs(256))
    w2 = so3.logmap(so3.expmap(w))
    np.testing.assert_allclose(w2, w, atol=1e-6)


def test_log_near_zero_and_pi():
    for mag in [1e-10, 1e-6, 1e-3, np.pi - 1e-4]:
        w = jnp.array([[0.26726124, 0.53452248, 0.80178373]]) * mag
        R = so3.expmap(w)
        w2 = so3.logmap(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-4 if mag > 3 else 1e-8)


def test_expmap_gradient_finite_at_zero():
    g = jax.grad(lambda w: jnp.sum(so3.expmap(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_project_to_so3():
    rng = np.random.default_rng(3)
    R = so3.expmap(jnp.asarray(random_rotvecs(8)))
    noisy = R + 0.05 * jnp.asarray(rng.normal(size=R.shape))
    P = so3.project_to_so3(noisy)
    eye = jnp.broadcast_to(jnp.eye(3), P.shape)
    np.testing.assert_allclose(P @ jnp.swapaxes(P, -1, -2), eye, atol=1e-10)
    np.testing.assert_allclose(jnp.linalg.det(P), 1.0, atol=1e-10)
    assert float(jnp.max(jnp.abs(P - R))) < 0.15


def test_rotation_angle():
    w = jnp.array([[0.3, 0.0, 0.0]])
    R = so3.expmap(w)
    np.testing.assert_allclose(so3.rotation_angle_deg(R), np.degrees(0.3), atol=1e-9)
