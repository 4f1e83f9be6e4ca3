"""FAST detector, KLT tracking and monocular VO tests."""

import numpy as np

from openmvg_tpu.ops import fast
from tests.test_sift import blob_image
import pytest

pytestmark = pytest.mark.slow  # VO sequence e2e


def test_fast_detects_small_blobs():
    """Small bright blobs: the whole 16-pixel circle is darker than the
    center -> a 16-long arc, the canonical FAST response."""
    import jax.numpy as jnp

    centers = [(20.0, 30.0), (50.0, 70.0), (80.0, 40.0)]
    img = blob_image(96, 96, blobs=[(cy, cx, 1.3) for (cy, cx) in centers])
    xy, score, ok = fast.fast_detect(jnp.asarray(img), threshold=0.15,
                                     max_corners=64)
    xy = np.asarray(xy)[np.asarray(ok)]
    assert len(xy) >= 3
    for (cy, cx) in centers:
        d = np.linalg.norm(xy - [cx, cy], axis=1)
        assert d.min() < 1.5, (cx, cy)


def test_klt_tracks_translation():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    blobs = [(float(rng.uniform(20, 70)), float(rng.uniform(20, 70)),
              float(rng.uniform(2, 4))) for _ in range(10)]
    img0 = blob_image(96, 96, blobs=blobs, noise=0.005, seed=1)
    shift = np.array([3.0, 2.0])
    blobs2 = [(y + shift[1], x + shift[0], s) for (y, x, s) in blobs]
    img1 = blob_image(96, 96, blobs=blobs2, noise=0.005, seed=2)
    pts = np.array([[x, y] for (y, x, s) in blobs], np.float32)
    new_pts, ok = fast.klt_track(jnp.asarray(img0), jnp.asarray(img1),
                                 jnp.asarray(pts))
    new_pts = np.asarray(new_pts)[np.asarray(ok)]
    pts = pts[np.asarray(ok)]
    assert len(pts) >= 8
    d = new_pts - pts
    np.testing.assert_allclose(d, np.tile(shift, (len(d), 1)), atol=0.35)


def test_monocular_vo_straight_motion():
    """Synthetic forward-sideways motion: VO trajectory direction matches."""
    from openmvg_tpu.sfm.vo import MonocularVO

    rng = np.random.default_rng(3)
    n_pts = 250
    X = rng.uniform(-2, 2, size=(n_pts, 3))
    X[:, 2] = rng.uniform(4, 10, n_pts)
    focal, size = 120.0, 128
    K = np.array([[focal, 0, size / 2], [0, focal, size / 2], [0, 0, 1.0]])
    intens = rng.uniform(0.4, 1.0, n_pts)

    def render(C):
        Xc = X - C
        uv = Xc[:, :2] / Xc[:, 2:3] * focal + size / 2
        img = np.zeros((size, size), np.float32)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        for p in range(n_pts):
            u, v = uv[p]
            if -3 < u < size + 3 and -3 < v < size + 3:
                img += intens[p] * np.exp(
                    -((yy - v) ** 2 + (xx - u) ** 2) / (2 * 1.8 ** 2))
        return np.clip(img, 0, 1)

    vo = MonocularVO(K, min_tracks=150, fast_threshold=0.04)
    Cs = [np.array([0.08 * i, 0.0, 0.0]) for i in range(4)]
    for C in Cs:
        vo.process(render(C))
    traj = np.stack(vo.trajectory)
    assert len(traj) >= 3
    # monotone motion along +x (up to scale), small drift in y/z
    steps = np.diff(traj, axis=0)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    assert (steps[:, 0] > 0.9).all(), steps
