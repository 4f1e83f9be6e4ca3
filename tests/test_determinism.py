"""Bitwise determinism of the stochastic paths (SURVEY §5: deterministic
seeds replace the reference's TSan/race concerns — JAX is functional, so
same seed must mean bit-identical results across runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import matching, ransac
from openmvg_tpu.sfm import robust
from openmvg_tpu.utils.synthetic import ring_scene


def _rerun(fn):
    a = fn()
    b = fn()
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_matching_deterministic():
    rng = np.random.default_rng(3)
    descs = jnp.asarray(rng.integers(0, 256, size=(3, 512, 128), dtype=np.uint8))
    counts = jnp.full((3,), 512, jnp.int32)
    pairs = jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32)
    _rerun(lambda: matching.match_pair_batch(descs, counts, pairs))


def test_ac_ransac_deterministic():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 100, 150)
    y = 1.5 * x - 4.0 + rng.normal(scale=0.1, size=150)
    y[:40] = rng.uniform(0, 200, 40)
    pts = jnp.asarray(np.stack([x, y], 1))

    def fit(sub):
        dx = sub[1, 0] - sub[0, 0]
        a = (sub[1, 1] - sub[0, 1]) / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
        return jnp.stack([a, sub[0, 1] - a * sub[0, 0]])[None], jnp.ones((1,), bool)

    def err(m, p):
        d = m[0] * p[:, 0] - p[:, 1] + m[1]
        return d * d / (m[0] * m[0] + 1.0)

    def run():
        res = ransac.ac_ransac(
            jax.random.PRNGKey(7), fit, err, pts, jnp.ones(150, bool),
            min_samples=2, logalpha0=ransac.logalpha0_point_to_line(200, 200),
            mult_error=0.5, n_samples=128)
        return res.model, res.inliers, res.threshold_sq

    _rerun(run)


def test_robust_relative_pose_deterministic():
    from openmvg_tpu.utils.synthetic import bearings_of

    s = ring_scene(n_views=2, n_points=120, seed=2)
    vis = np.nonzero(s.visible[0] & s.visible[1])[0]
    x1, x2 = s.x[0][vis], s.x[1][vis]
    b1 = jnp.asarray(bearings_of(s, 0, vis))
    b2 = jnp.asarray(bearings_of(s, 1, vis))
    K = jnp.asarray(s.K[0])

    def run():
        res = robust.robust_relative_pose(
            jax.random.PRNGKey(0), b1, b2,
            jnp.asarray(x1), jnp.asarray(x2), K, K,
            jnp.ones(len(vis), bool), 1000, 1000, n_samples=256)
        return res.R, res.t, res.inliers

    _rerun(run)
