"""Convex hull + robust plane estimation (reference geometry/convex_hull_test.cpp,
plane_estimation_kernel_test.cpp analogues)."""

import jax
import numpy as np

from openmvg_tpu.geometry import convex_hull as ch
from openmvg_tpu.geometry import plane as planelib


def test_empty():
    hull = ch.compute_convex_hull(np.zeros((0, 2)))
    assert hull.shape[0] == 0


def test_line_is_not_a_polygon():
    pts = np.array([[0.0, 0.0], [0.0, 2.0]])
    assert not ch.is_in(pts[0], pts)
    assert not ch.is_in(pts[1], pts)


def test_one_point():
    pts = np.array([[0.0, 0.0]])
    assert ch.convex_polygon_area(pts) == 0.0
    hull = ch.compute_convex_hull(pts)
    assert hull.shape[0] == 1
    assert ch.convex_polygon_area(hull) == 0.0


def test_random_points_inside_hull():
    rng = np.random.default_rng(5489)
    for _ in range(10):
        pts = np.column_stack([
            rng.uniform(100, 200, size=5),
            rng.uniform(300, 400, size=5),
        ])
        hull = ch.compute_convex_hull(pts)
        assert hull.shape[0] >= 4  # at least triangle + closing point
        # CCW closed polygon with positive area
        assert np.allclose(hull[0], hull[-1])
        assert ch.convex_polygon_area(hull) > 0
        for p in pts:
            assert ch.is_in(p, hull)
        # a point far outside is rejected
        assert not ch.is_in(np.array([0.0, 0.0]), hull)


def test_square_hull_area():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]],
                   dtype=np.float64)
    hull = ch.compute_convex_hull(pts)
    assert hull.shape[0] == 5  # 4 corners + closure
    assert abs(ch.convex_polygon_area(hull) - 1.0) < 1e-12


def test_plane_from_3_points():
    pts = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], dtype=np.float64)
    plane, ok = planelib.plane_from_3_points(pts)
    assert bool(ok)
    assert abs(abs(float(plane.normal[2])) - 1.0) < 1e-12
    assert float(planelib.abs_distance(plane, np.array([5.0, -3.0, 1.0]))) < 1e-12
    assert abs(float(planelib.abs_distance(plane, np.array([0.0, 0.0, 3.0]))) - 2.0) < 1e-12
    # collinear sample is flagged invalid
    _, bad = planelib.plane_from_3_points(
        np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], dtype=np.float64))
    assert not bool(bad)


def test_robust_plane_fit_with_outliers():
    rng = np.random.default_rng(0)
    n_in, n_out = 80, 20
    # inliers on z = 2 + small noise
    xy = rng.uniform(-1, 1, size=(n_in, 2))
    inliers = np.column_stack([xy, 2.0 + rng.normal(0, 1e-3, n_in)])
    outliers = rng.uniform(-5, 5, size=(n_out, 3))
    pts = np.concatenate([inliers, outliers])

    plane, mask, score = planelib.fit_plane_max_consensus(
        jax.random.PRNGKey(0), pts, threshold=0.01)
    assert int(score) >= n_in * 0.9
    # recovered normal ~ +-z, offset ~ -+2
    nz = float(np.abs(np.asarray(plane.normal)[2]))
    assert nz > 0.999
    assert abs(abs(float(plane.d)) - 2.0) < 0.01
    # angular variant runs and prefers the same plane support
    plane_a, _, score_a = planelib.fit_plane_max_consensus(
        jax.random.PRNGKey(1), pts, threshold=0.02, angular=True)
    assert float(np.abs(np.asarray(plane_a.normal)[2])) > 0.99
