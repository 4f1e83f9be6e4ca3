"""Synthetic multi-view test scenes — the NViewDataSet analogue.

Reference parity: multiview/test_data_sets.{hpp,cpp} NRealisticCamerasRing —
cameras on a ring of radius r looking at a 3D point cloud near the origin,
yielding exact K/R/t/X and projections.  Used by solver unit tests and the
end-to-end engine tests (sfm/pipelines/pipelines_test.hpp).
"""

from typing import NamedTuple

import numpy as np


class NViewScene(NamedTuple):
    K: np.ndarray      # (V, 3, 3)
    R: np.ndarray      # (V, 3, 3) world->cam
    t: np.ndarray      # (V, 3)
    C: np.ndarray      # (V, 3) camera centers
    X: np.ndarray      # (P, 3) world points
    x: np.ndarray      # (V, P, 2) pixel projections
    visible: np.ndarray  # (V, P) bool (in front + in image)

    @property
    def n_views(self):
        return self.R.shape[0]

    @property
    def n_points(self):
        return self.X.shape[0]


def _look_at(center, target, up=(0.0, 1e-6, 1.0)):
    """World->camera R with +z forward toward target (right-handed,
    y roughly down to mimic image coords)."""
    z = np.asarray(target, float) - center
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    if np.linalg.norm(x) < 1e-9:
        x = np.cross([1.0, 0.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def ring_scene(n_views=12, n_points=100, focal=1000.0, width=1000, height=1000,
               radius=2.0, seed=0, jitter=0.0):
    """Cameras on a ring of `radius` viewing a unit point cloud at origin
    (test_data_sets.cpp NRealisticCamerasRing)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-0.5, 0.5, size=(n_points, 3))
    K = np.zeros((n_views, 3, 3))
    K[:] = np.array([[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1]])
    R = np.zeros((n_views, 3, 3))
    t = np.zeros((n_views, 3))
    C = np.zeros((n_views, 3))
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        C[i] = [radius * np.cos(theta), 0.2 * np.sin(theta * 2), radius * np.sin(theta)]
        R[i] = _look_at(C[i], [0.0, 0.0, 0.0])
        t[i] = -R[i] @ C[i]
    Xc = np.einsum("vij,pj->vpi", R, X) + t[:, None, :]
    proj = Xc[..., :2] / Xc[..., 2:3]
    x = np.einsum("vij,vpj->vpi", K[:, :2, :2], proj) + K[:, None, :2, 2]
    if jitter > 0:
        x = x + rng.normal(scale=jitter, size=x.shape)
    visible = (
        (Xc[..., 2] > 0)
        & (x[..., 0] >= 0) & (x[..., 0] < width)
        & (x[..., 1] >= 0) & (x[..., 1] < height)
    )
    return NViewScene(K=K, R=R, t=t, C=C, X=X, x=x, visible=visible)


def bearings_of(scene, view, idx=None):
    """Unit bearings of pixel observations for a pinhole view."""
    x = scene.x[view] if idx is None else scene.x[view][idx]
    K = scene.K[view]
    p = (x - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
    b = np.concatenate([p, np.ones_like(p[:, :1])], axis=1)
    return b / np.linalg.norm(b, axis=1, keepdims=True)
