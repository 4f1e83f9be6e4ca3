"""Feature tracks from pairwise matches.

Reference parity: tracks/tracks.hpp TracksBuilder (:62-197) — union-find
fusion of pairwise correspondences into multi-view tracks, conflict
filtering (a track touching the same view twice is rejected), min-length
filtering, and the per-view track index / intersection queries of
SharedTrackVisibilityHelper (:203-297).

Host-side design: instead of a pointer-based union-find over
(view, feature) nodes, build a sparse bipartite match graph and run
scipy.sparse.csgraph.connected_components (C speed, exact same
equivalence classes), then vectorized numpy group-bys for the filters.
"""

from typing import Dict, NamedTuple, Tuple

import numpy as np
from scipy import sparse
from scipy.sparse import csgraph


class Tracks(NamedTuple):
    """Flat CSR-ish track table, sorted by (track_id, view_id)."""

    track_id: np.ndarray  # (M,) int32, contiguous 0..T-1
    view_id: np.ndarray   # (M,) int32
    feat_id: np.ndarray   # (M,) int32

    @property
    def n_tracks(self):
        return 0 if len(self.track_id) == 0 else int(self.track_id[-1]) + 1

    def lengths(self):
        return np.bincount(self.track_id, minlength=self.n_tracks)


def build_tracks(pairwise_matches: Dict[Tuple[int, int], np.ndarray],
                 min_length: int = 2) -> Tracks:
    """pairwise_matches: {(i, j): (Mij, 2) int arrays of feature indices}.

    Parity with TracksBuilder::Build + Filter(min_length): union-find over
    (view, feat) nodes, drop conflicted tracks (same view twice) and short
    tracks, renumber track ids contiguously.
    """
    if not pairwise_matches:
        return Tracks(*(np.zeros(0, np.int32),) * 3)

    # node key = view * stride + feat  (stride > max feat id)
    max_feat = 0
    for m in pairwise_matches.values():
        if len(m):
            max_feat = max(max_feat, int(np.max(m)))
    stride = np.int64(max_feat + 1)

    edges_a, edges_b = [], []
    for (i, j), m in pairwise_matches.items():
        if len(m) == 0:
            continue
        m = np.asarray(m, np.int64)
        edges_a.append(i * stride + m[:, 0])
        edges_b.append(j * stride + m[:, 1])
    if not edges_a:
        return Tracks(*(np.zeros(0, np.int32),) * 3)
    a = np.concatenate(edges_a)
    b = np.concatenate(edges_b)

    # compress node ids
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    n = len(nodes)
    view = (nodes // stride).astype(np.int32)
    feat = (nodes % stride).astype(np.int32)

    # native C++ union-find fast path (openmvg_tpu/native)
    from openmvg_tpu import native

    nt = native.build_tracks_native(ia, ib, view, feat, min_length)
    if nt is not None:
        return Tracks(track_id=nt[0], view_id=nt[1], feat_id=nt[2])

    g = sparse.coo_matrix((np.ones(len(ia), np.int8), (ia, ib)), shape=(n, n))
    _, labels = csgraph.connected_components(g, directed=False)

    # conflict filter: track with duplicated view -> reject whole track
    order = np.lexsort((view, labels))
    lab_s, view_s, feat_s = labels[order], view[order], feat[order]
    same = np.zeros(len(lab_s), bool)
    same[1:] = (lab_s[1:] == lab_s[:-1]) & (view_s[1:] == view_s[:-1])
    bad_tracks = np.unique(lab_s[same])
    keep = ~np.isin(lab_s, bad_tracks)

    # min length filter
    lengths = np.bincount(lab_s[keep])
    short = np.nonzero(lengths < min_length)[0]
    keep &= ~np.isin(lab_s, short)

    lab_k, view_k, feat_k = lab_s[keep], view_s[keep], feat_s[keep]
    # renumber contiguous
    _, new_ids = np.unique(lab_k, return_inverse=True)
    return Tracks(track_id=new_ids.astype(np.int32), view_id=view_k,
                  feat_id=feat_k)


def tracks_in_views(tracks: Tracks, views) -> np.ndarray:
    """Track ids visible in ALL given views (SharedTrackVisibilityHelper).

    views: iterable of view ids.  Returns sorted array of track ids.
    """
    views = list(views)
    n = tracks.n_tracks
    if n == 0:
        return np.zeros(0, np.int32)
    count = np.zeros(n, np.int32)
    for v in views:
        sel = tracks.view_id == v
        count[np.unique(tracks.track_id[sel])] += 1
    return np.nonzero(count == len(views))[0].astype(np.int32)


def track_observations(tracks: Tracks, track_ids, view_order=None):
    """Gather (track, view, feat) rows restricted to track_ids."""
    sel = np.isin(tracks.track_id, track_ids)
    return Tracks(track_id=tracks.track_id[sel], view_id=tracks.view_id[sel],
                  feat_id=tracks.feat_id[sel])
