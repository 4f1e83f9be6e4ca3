"""L-infinity triangulation / resection (lInfinityCV parity —
triangulation_test.cpp / resection_test.cpp analogues on the synthetic
ring scene)."""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops.linfinity import resection_linf, triangulate_linf
from openmvg_tpu.utils.synthetic import ring_scene


def _proj_matrices(s):
    P = np.einsum("vij,vjk->vik", s.K,
                  np.concatenate([s.R, s.t[:, :, None]], axis=2))
    return P


def test_triangulation_linf_exact():
    s = ring_scene(n_views=6, n_points=12, seed=0)
    P = jnp.asarray(_proj_matrices(s))
    for p in range(6):
        assert s.visible[:, p].all()
        X, gamma = triangulate_linf(P, jnp.asarray(s.x[:, p]))
        np.testing.assert_allclose(np.asarray(X), s.X[p], atol=1e-4)
        assert float(gamma) < 1e-2


def test_triangulation_linf_bounds_max_residual():
    """The returned gamma certifies the max reprojection residual, and
    under noise the L-inf point beats the DLT point on that metric."""
    s = ring_scene(n_views=8, n_points=6, seed=1, jitter=1.0)
    P = jnp.asarray(_proj_matrices(s))
    for p in range(6):
        x_obs = jnp.asarray(s.x[:, p])
        X, gamma = triangulate_linf(P, x_obs)
        Xh = np.concatenate([np.asarray(X), [1.0]])
        proj = np.einsum("vij,j->vi", np.asarray(P), Xh)
        res = np.abs(proj[:, :2] / proj[:, 2:3] - s.x[:, p]).max()
        assert res <= float(gamma) * 1.05 + 1e-6, (res, float(gamma))
        assert res < 3.0   # ~noise level


def test_triangulation_linf_vmapped():
    s = ring_scene(n_views=6, n_points=32, seed=2)
    P = jnp.asarray(_proj_matrices(s))
    X, gamma = jax.vmap(lambda x: triangulate_linf(P, x))(
        jnp.asarray(np.transpose(s.x, (1, 0, 2))))
    np.testing.assert_allclose(np.asarray(X), s.X, atol=1e-3)


def test_resection_linf():
    s = ring_scene(n_views=3, n_points=40, seed=3)
    v = 1
    x2d = jnp.asarray(s.x[v])
    X3d = jnp.asarray(s.X)
    P, gamma = resection_linf(x2d, X3d)
    P = np.asarray(P)
    # gamma certifies the max residual
    Xh = np.concatenate([s.X, np.ones((40, 1))], axis=1)
    proj = Xh @ P.T
    res = np.abs(proj[:, :2] / proj[:, 2:3] - s.x[v]).max()
    assert res <= float(gamma) * 1.05 + 1e-6
    assert res < 1e-2
    # recovered P equals the GT projection matrix up to its own scale
    P_gt = _proj_matrices(s)[v]
    P_gt = P_gt / P_gt[2, 3]
    np.testing.assert_allclose(P, P_gt, atol=1e-3)
