"""Monocular visual odometry (toy).

Reference parity: software/VO/Monocular_VO.hpp:75 — frame-to-frame feature
tracking (FAST corners + KLT), track container with landmark ids, and
relative pose from tracked correspondences (essential-matrix based, up to
scale).  This is the reference's demonstration pipeline, not a production
SLAM system.
"""

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import essential, fast
from openmvg_tpu.sfm import robust


class VOState(NamedTuple):
    pts: np.ndarray        # (N, 2) active track positions
    ids: np.ndarray        # (N,) track ids
    next_id: int
    poses: List[np.ndarray]  # accumulated [R|C] world poses (up to scale)


class MonocularVO:
    """Frame-to-frame VO: track FAST corners with KLT, re-detect when the
    track count drops, estimate relative pose with 5-pt AC-RANSAC."""

    def __init__(self, K, min_tracks=300, fast_threshold=0.06, seed=0):
        self.K = np.asarray(K)
        self.min_tracks = min_tracks
        self.fast_threshold = fast_threshold
        self.prev_img = None
        self.state: Optional[VOState] = None
        self.key = jax.random.PRNGKey(seed)
        self.trajectory = [np.zeros(3)]
        self.R_cur = np.eye(3)
        self.C_cur = np.zeros(3)

    def _detect(self, img, existing=None, max_corners=1024):
        xy, score, ok = fast.fast_detect(jnp.asarray(img, jnp.float32),
                                         threshold=self.fast_threshold,
                                         max_corners=max_corners)
        xy = np.asarray(xy)[np.asarray(ok)]
        if existing is not None and len(existing):
            # avoid re-detecting on top of live tracks
            d = np.linalg.norm(xy[:, None] - existing[None], axis=2)
            xy = xy[d.min(axis=1) > 8.0]
        return xy

    def process(self, img):
        img = np.asarray(img, np.float32)
        if self.prev_img is None:
            pts = self._detect(img)
            self.state = VOState(pts=pts, ids=np.arange(len(pts)),
                                 next_id=len(pts), poses=[np.eye(4)])
            self.prev_img = img
            return True

        st = self.state
        new_pts, ok = fast.klt_track(jnp.asarray(self.prev_img),
                                     jnp.asarray(img),
                                     jnp.asarray(st.pts, jnp.float32))
        new_pts = np.asarray(new_pts)
        ok = np.asarray(ok)
        p0 = st.pts[ok]
        p1 = new_pts[ok]
        ids = st.ids[ok]

        moved = np.linalg.norm(p1 - p0, axis=1).mean() if len(p1) else 0.0
        if len(p0) >= 8 and moved > 0.5:
            b0 = self._bearings(p0)
            b1 = self._bearings(p1)
            n = len(p0)
            k = 64
            while k < n:
                k *= 2
            pad = lambda a: np.concatenate(
                [a, np.zeros((k - n,) + a.shape[1:], a.dtype)])
            self.key, sub = jax.random.split(self.key)
            info = robust.robust_relative_pose(
                sub, jnp.asarray(pad(b0)), jnp.asarray(pad(b1)),
                jnp.asarray(pad(p0)), jnp.asarray(pad(p1)),
                jnp.asarray(self.K), jnp.asarray(self.K),
                jnp.asarray(np.arange(k) < n),
                float(self.K[0, 2] * 2), float(self.K[1, 2] * 2),
                n_samples=256)
            if bool(info.found):
                R_rel = np.asarray(info.R)
                t_rel = np.asarray(info.t)
                # compose (unit-scale translation)
                C_rel = -R_rel.T @ t_rel
                self.C_cur = self.C_cur + self.R_cur.T @ C_rel
                self.R_cur = R_rel @ self.R_cur
                self.trajectory.append(self.C_cur.copy())

        # refill tracks
        if len(p1) < self.min_tracks:
            fresh = self._detect(img, existing=p1)
            take = max(self.min_tracks - len(p1), 0)
            fresh = fresh[:take]
            new_ids = np.arange(st.next_id, st.next_id + len(fresh))
            p1 = np.concatenate([p1, fresh]) if len(fresh) else p1
            ids = np.concatenate([ids, new_ids]) if len(fresh) else ids
            next_id = st.next_id + len(fresh)
        else:
            next_id = st.next_id
        self.state = VOState(pts=p1, ids=ids, next_id=next_id, poses=st.poses)
        self.prev_img = img
        return True

    def _bearings(self, pts):
        p = (pts - self.K[:2, 2]) / np.array([self.K[0, 0], self.K[1, 1]])
        b = np.concatenate([p, np.ones((len(p), 1))], axis=1)
        return b / np.linalg.norm(b, axis=1, keepdims=True)
