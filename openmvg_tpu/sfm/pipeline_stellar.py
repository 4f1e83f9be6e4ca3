"""Stellar SfM reconstruction engine.

Reference parity: sfm/pipelines/stellar/ — StellarSfMReconstructionEngine
(sfm_stellar_engine.cpp:106): for every pose, a "stellar pod" (the star of
its adjacent relative-pose edges); Stellar_Solver solves the relative
translation SCALES between pod edges from 2-uplets sharing tracks
(Solve2UpletsRelativeScales / relative_scale.hpp, L1 or L2 per
stellar_definitions.hpp:22-27), producing locally consistent pod motions;
global rotations come from rotation averaging and global translations from
the scaled relative motions; then structure + BA.

TPU recast: pod scale ratios come from batched 2-view triangulation depth
medians of shared tracks; the per-pod log-scale least squares and the
final scaled-translation registration are tiny linear solves; everything
downstream (triangulation, BA) reuses the shared engine machinery.
"""

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.models import cameras as cm
from openmvg_tpu.ops import rotation_averaging as ra
from openmvg_tpu.ops import triangulation as tri
from openmvg_tpu.sfm import ba, filters
from openmvg_tpu.sfm.pipeline_global import compute_relative_poses, _BaCfg, _TriCfg, _staged_ba
from openmvg_tpu.sfm.pipeline_incremental import (_TrackIndex, _bearings,
                                                  _run_ba, _reconstruct_tracks,
                                                  _shared_track_corr)
from openmvg_tpu.sfm.scene import Scene, rmse
from openmvg_tpu.sfm.tracks import build_tracks
from openmvg_tpu.utils import graph as graphlib


@dataclasses.dataclass
class StellarConfig:
    ransac_samples: int = 1024
    max_residual_px: float = 4.0
    ba_iterations: int = 30
    refine_intrinsics: object = ba.ADJUST_ALL
    min_track_views: int = 3
    verbose: bool = False
    dtype: object = jnp.float64
    triangulation_angle_deg: float = 2.0


def _log(cfg, *m):
    if cfg.verbose:
        print("[stellar]", *m)


def _edge_depths(scene, index, rel, pair, center):
    """Distance of each shared track's 3D point to the CENTER view's camera
    in the 2-view reconstruction of `pair` (scale unit |t_pair| = 1).

    The distance-to-center is proportional to the edge's unknown global
    scale, so ratios across two edges sharing the center view give their
    relative scale (Solve2UpletsRelativeScales equivalent)."""
    va, vb = pair
    xa, xb, track_ids = _shared_track_corr(index, va, vb)
    if len(track_ids) < 3:
        return None, None
    n = len(track_ids)
    b1 = _bearings(scene, np.full(n, va), xa)
    b2 = _bearings(scene, np.full(n, vb), xb)
    R = rel[pair]["R"]
    t = rel[pair]["t"]
    R0 = np.tile(np.eye(3), (n, 1, 1))
    t0 = np.zeros((n, 3))
    R1 = np.tile(R, (n, 1, 1))
    t1 = np.tile(t, (n, 1))
    X, ok = tri.triangulate_2view(jnp.asarray(R0), jnp.asarray(t0),
                                  jnp.asarray(b1), jnp.asarray(R1),
                                  jnp.asarray(t1), jnp.asarray(b2))
    X = np.asarray(X)
    ok = np.asarray(ok) & (np.linalg.norm(X, axis=1) < 1e4)
    C_center = np.zeros(3) if center == va else -R.T @ t
    dist = np.linalg.norm(X - C_center, axis=1)
    return track_ids[ok], dist[ok]


def _pod_scales(scene, index, rel, center, edges, cfg):
    """Relative |t| scales of the pod's edges (first edge = 1) via shared
    track depths (Solve2UpletsRelativeScales equivalent: depth ratio of
    tracks seen by two edges sharing the center view)."""
    if len(edges) < 2:
        return {edges[0]: 1.0} if edges else {}
    # per-edge distance-to-center maps
    depth_maps = {}
    for e in edges:
        tr, dep = _edge_depths(scene, index, rel, e, center)
        if tr is not None:
            depth_maps[e] = dict(zip(tr.tolist(), dep))
    edges_ok = [e for e in edges if e in depth_maps]
    if not edges_ok:
        return {}
    # log-scale LS over edges: scale of edge = median track depth ratio
    # against the reference edge through common tracks
    ref = edges_ok[0]
    scales = {ref: 1.0}
    for e in edges_ok[1:]:
        common = set(depth_maps[ref]) & set(depth_maps[e])
        if len(common) < 3:
            continue
        ratios = [depth_maps[ref][t] / max(depth_maps[e][t], 1e-9)
                  for t in common]
        s = float(np.median(ratios))
        if s > 0 and np.isfinite(s):
            scales[e] = s
    return scales


def stellar_sfm(scene: Scene, features: List[np.ndarray],
                matches: Dict[Tuple[int, int], np.ndarray],
                cfg: StellarConfig = StellarConfig(), seed: int = 0):
    key = jax.random.PRNGKey(seed)
    tracks = build_tracks(matches, min_length=2)
    index = _TrackIndex(tracks, features)

    keep_nodes = graphlib.largest_biedge_connected_component(list(matches))
    pairs = [p for p in matches if p[0] in keep_nodes and p[1] in keep_nodes]
    rel = compute_relative_poses(scene, index, pairs, _GCfg(cfg), key)
    if len(rel) < 3:
        raise RuntimeError("not enough relative poses")
    _log(cfg, f"{len(rel)} relative poses")

    # global rotations (stellar uses averaging over the pod graph too)
    views = sorted({v for p in rel for v in p})
    vmap_ = {v: i for i, v in enumerate(views)}
    ei = np.asarray([vmap_[i] for (i, j) in rel])
    ej = np.asarray([vmap_[j] for (i, j) in rel])
    R_rel = np.stack([rel[p]["R"] for p in rel])
    w = np.asarray([rel[p]["n_inliers"] for p in rel], float)
    R_glob = np.asarray(ra.l2_rotation_averaging(
        len(views), jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(R_rel),
        jnp.asarray(w / w.max())))

    # pods: per-view star; per-pod edge scales -> global per-edge scales by
    # propagation over the pod overlap graph (reference merges pod motions)
    pod_scales: Dict[Tuple[int, int], List[float]] = {}
    for c in views:
        edges = [p for p in rel if c in p]
        sc = _pod_scales(scene, index, rel, c, edges, cfg)
        # normalize pod scale so its first edge has the current consensus
        anchor = None
        for e, s in sc.items():
            if e in pod_scales:
                anchor = np.median(pod_scales[e]) / s
                break
        if anchor is None:
            anchor = 1.0
        for e, s in sc.items():
            pod_scales.setdefault(e, []).append(s * anchor)
    edge_scale = {e: float(np.median(v)) for e, v in pod_scales.items()}
    _log(cfg, f"{len(edge_scale)} scaled edges")

    # global translations: linear LS with FIXED per-edge scales
    # t_j - R_ij t_i = s_e t_ij  (gauge t_0 = 0)
    E = [e for e in rel if e in edge_scale]
    N = len(views)
    A = np.zeros((3 * len(E), 3 * N))
    b = np.zeros(3 * len(E))
    for r, e in enumerate(E):
        i, j = vmap_[e[0]], vmap_[e[1]]
        Rij = np.einsum("ij,kj->ik", R_glob[j], R_glob[i])
        A[3 * r:3 * r + 3, 3 * j:3 * j + 3] = np.eye(3)
        A[3 * r:3 * r + 3, 3 * i:3 * i + 3] = -Rij
        b[3 * r:3 * r + 3] = edge_scale[e] * rel[e]["t"]
    A[:, :3] = 0.0  # gauge: t_0 = 0
    t_flat, *_ = np.linalg.lstsq(A, b, rcond=None)
    t_glob = t_flat.reshape(N, 3)

    for v, i in vmap_.items():
        pid = scene.view_pose[v]
        scene.pose_valid[pid] = True
        scene.pose_R[pid] = R_glob[i]
        scene.pose_C[pid] = -R_glob[i].T @ t_glob[i]

    # structure + staged BA (same downstream as global engine)
    landmark_of_track = np.full(index.n_tracks, -1, np.int64)
    posed_mask = np.zeros(scene.n_views, bool)
    posed_mask[views] = True
    rows_posed = posed_mask[index.tracks.view_id]
    cand = np.bincount(index.tracks.track_id[rows_posed],
                       minlength=index.n_tracks)
    cand_tracks = np.nonzero(cand >= cfg.min_track_views)[0]
    _reconstruct_tracks(scene, index, cand_tracks, landmark_of_track,
                        _TriCfg(cfg))
    _staged_ba(scene, cfg)
    filters.remove_outliers_pixel_residual(scene, cfg.max_residual_px, 2)
    filters.remove_outliers_angle_error(scene, 2.0)
    filters.erase_unstable_poses_and_observations(scene, 12, 3)
    _run_ba(scene, _BaCfg(cfg))
    while filters.bad_track_rejector(scene, cfg.max_residual_px, 50):
        _run_ba(scene, _BaCfg(cfg))
    _log(cfg, f"done: {int(scene.pose_valid.sum())} poses, "
              f"{scene.n_landmarks} landmarks, rmse={rmse(scene):.3f}")
    return scene


class _GCfg:
    def __init__(self, cfg):
        self.ransac_samples = cfg.ransac_samples
        self.verbose = cfg.verbose
