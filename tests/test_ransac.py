"""AC-RANSAC tests: synthetic line fitting (the reference's
robust_estimator_lineKernel_test pattern) + two-view robust estimation
with outliers."""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import ransac
from openmvg_tpu.sfm import robust
from openmvg_tpu.utils.synthetic import ring_scene, bearings_of


def test_line_fitting_with_outliers():
    """Fit y = a x + b: minimal sample 2 points; 30% outliers."""
    rng = np.random.default_rng(0)
    n = 200
    x = rng.uniform(0, 100, n)
    y = 2.0 * x + 10.0 + rng.normal(scale=0.05, size=n)
    n_out = 60
    y[:n_out] = rng.uniform(0, 300, n_out)
    pts = jnp.asarray(np.stack([x, y], 1))

    def fit(sub):
        p = sub
        dx = p[1, 0] - p[0, 0]
        a = (p[1, 1] - p[0, 1]) / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
        b = p[0, 1] - a * p[0, 0]
        return jnp.stack([a, b])[None], jnp.ones((1,), bool)

    def err(m, p):
        a, b = m[0], m[1]
        d = (a * p[:, 0] - p[:, 1] + b)
        return d * d / (a * a + 1.0)

    res = ransac.ac_ransac(
        jax.random.PRNGKey(0), fit, err, pts, jnp.ones(n, bool),
        min_samples=2, logalpha0=ransac.logalpha0_point_to_line(300, 300),
        mult_error=0.5, n_samples=256)
    assert bool(res.found)
    inl = np.asarray(res.inliers)
    # all true inliers found, few false positives
    assert inl[n_out:].sum() >= 0.93 * (n - n_out)
    assert inl[:n_out].sum() <= 5


def _two_view_with_outliers(outlier_frac=0.3, seed=0, n_points=200):
    s = ring_scene(n_views=2, n_points=n_points, seed=seed)
    vis = np.nonzero(s.visible[0] & s.visible[1])[0]
    x1 = s.x[0][vis].copy()
    x2 = s.x[1][vis].copy()
    rng = np.random.default_rng(seed + 1)
    n_out = int(len(vis) * outlier_frac)
    x2[:n_out] = rng.uniform(0, 1000, size=(n_out, 2))
    return s, x1, x2, n_out


def test_robust_fundamental():
    s, x1, x2, n_out = _two_view_with_outliers()
    res = robust.robust_fundamental(
        jax.random.PRNGKey(1), jnp.asarray(x1), jnp.asarray(x2),
        jnp.ones(len(x1), bool), 1000, 1000, 1000, 1000, n_samples=512)
    assert bool(res.found)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.1
    assert float(res.threshold_sq) < 4.0  # tight threshold on clean data


def test_robust_relative_pose():
    s, x1, x2, n_out = _two_view_with_outliers()
    K = s.K[0]

    def bear(x):
        p = (x - K[:2, 2]) / K[0, 0]
        b = np.concatenate([p, np.ones((len(p), 1))], 1)
        return b / np.linalg.norm(b, axis=1, keepdims=True)

    info = robust.robust_relative_pose(
        jax.random.PRNGKey(2), jnp.asarray(bear(x1)), jnp.asarray(bear(x2)),
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(K), jnp.asarray(K),
        jnp.ones(len(x1), bool), 1000, 1000, n_samples=512)
    assert bool(info.found)
    R_rel = s.R[1] @ s.R[0].T
    t_rel = s.t[1] - R_rel @ s.t[0]
    t_rel /= np.linalg.norm(t_rel)
    np.testing.assert_allclose(np.asarray(info.R), R_rel, atol=1e-3)
    np.testing.assert_allclose(np.asarray(info.t), t_rel, atol=1e-3)


def test_robust_resection():
    s = ring_scene(n_views=2, n_points=150, seed=3)
    vis = np.nonzero(s.visible[0])[0]
    x2d = s.x[0][vis].copy()
    X3d = s.X[vis]
    rng = np.random.default_rng(4)
    n_out = 40
    x2d[:n_out] = rng.uniform(0, 1000, size=(n_out, 2))
    b = bearings_of(s, 0, vis)
    # recompute bearings from corrupted pixels
    K = s.K[0]
    p = (x2d - K[:2, 2]) / K[0, 0]
    b = np.concatenate([p, np.ones((len(p), 1))], 1)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    res = robust.robust_resection_p3p(
        jax.random.PRNGKey(5), jnp.asarray(b), jnp.asarray(x2d),
        jnp.asarray(X3d), jnp.asarray(K), jnp.ones(len(vis), bool),
        1000, 1000, n_samples=512)
    assert bool(res.found)
    R, t = res.model
    np.testing.assert_allclose(np.asarray(R), s.R[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), s.t[0], atol=1e-3)


def test_lmeds_line():
    rng = np.random.default_rng(7)
    n = 100
    x = rng.uniform(0, 10, n)
    y = -1.5 * x + 4.0
    y[:30] += rng.uniform(5, 50, 30)
    pts = jnp.asarray(np.stack([x, y], 1))

    def fit(sub):
        p = sub
        dx = p[1, 0] - p[0, 0]
        a = (p[1, 1] - p[0, 1]) / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
        b = p[0, 1] - a * p[0, 0]
        return jnp.stack([a, b])[None], jnp.ones((1,), bool)

    def err(m, p):
        d = (m[0] * p[:, 0] - p[:, 1] + m[1])
        return d * d / (m[0] ** 2 + 1.0)

    model, med = ransac.lmeds(jax.random.PRNGKey(0), fit, err, pts,
                              jnp.ones(n, bool), 2, n_samples=256)
    np.testing.assert_allclose(np.asarray(model), [-1.5, 4.0], atol=1e-6)
