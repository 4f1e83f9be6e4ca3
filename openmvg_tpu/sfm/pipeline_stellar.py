"""Stellar SfM reconstruction engine — per-pod local reconstructions.

Reference parity: sfm/pipelines/stellar/ —
  StellarSfMReconstructionEngine::Process (sfm_stellar_engine.cpp:106):
    1. graph simplification MST_X (default, value 5) | STAR_X
       (selectMST :191, star pruning :267-308)
    2. Relative_Pose_Engine on the selected pairs
    3. per pose a "stellar pod" (the star of its adjacent edges):
       Stellar_Solver (stellar_solver.cpp:236-340) —
         a. 2-uplets of pod edges -> relative scale from the ratio of
            median track depths to the CENTRAL pose
            (EstimateTripletRelativeScale :38-215, >= 15 shared 3-view
            tracks required)
         b. per-edge log-scales from the 2-uplet ratios via an L1 solve
            (stellar_definitions.hpp:183-227 SCALING_SOLVER_L1; here
            ops/l1_admm.solve_lad), normalized exp(x - max)
         c. pod-local reconstruction: scaled pod poses, >= 3-view tracks
            blind-triangulated, BA with intrinsics FIXED, DepthCleaning
            (5.2 x median), 4 px / 2 deg outlier removal,
            eraseUnstable(12, 3), second BA (Optimize :361-516); pods
            with < 3 surviving poses are dropped
         d. the refined pod poses re-emit relative motions for every pod
            edge (RelativeCameraMotion, sfm_stellar_engine.cpp:415-430)
    4. rotation averaging (L2) over ALL pod relative motions (:119-157)
    5. translation averaging: solve_translations_problem_softl1 with ONE
       scale per pod (each pod's motions form a RelativeInfo_Vec group,
       :556-633)
    6. initial structure (min covisibility 2) + staged BA / outlier
       cleanup (Adjust, shared with the global engine)

TPU recast: relative poses come from the batched vmapped AC-RANSAC
engine; per-edge depths are one batched 2-view triangulation per edge;
pod BAs run the Schur-CG LM solver on pow2-padded problems (pods bucket
by size, so compiled executables are shared across pods).
"""

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops import l1_admm
from openmvg_tpu.ops import rotation_averaging as ra
from openmvg_tpu.ops import translation_averaging as ta
from openmvg_tpu.ops import triangulation as tri
from openmvg_tpu.sfm import ba, filters
from openmvg_tpu.sfm.pipeline_global import (_BaCfg, _TriCfg, _staged_ba,
                                             compute_relative_poses)
from openmvg_tpu.sfm.pipeline_incremental import (_TrackIndex, _bearings,
                                                  _reconstruct_tracks,
                                                  _run_ba,
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
    # f32 = the TPU production dtype (see pipeline_incremental.py note)
    dtype: object = jnp.float32
    triangulation_angle_deg: float = 2.0
    # graph simplification (main_SfM.cpp:217-218 defaults)
    graph_simplification: str = "MST_X"   # MST_X | STAR_X | NONE
    graph_simplification_value: int = 5
    # Stellar_Solver knobs
    min_uplet_tracks: int = 15        # EstimateTripletRelativeScale :152
    pod_ba_iterations: int = 12
    min_pod_poses: int = 3


def _log(cfg, *m):
    if cfg.verbose:
        print("[stellar]", *m)


# ---------------------------------------------------------------------------
# graph simplification (selectMST / STAR_X)
# ---------------------------------------------------------------------------

def _mst_pairs(matches, n_trees=1):
    """N successive Kruskal MSTs weighted by -match count; selected edges
    get weight 0 so later trees prefer unused edges (selectMST,
    sfm_stellar_engine.cpp:191-234)."""
    pairs = list(matches)
    nodes = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(nodes)}
    weight = {p: -len(matches[p]) for p in pairs}
    selected = set()
    for _ in range(n_trees):
        parent = list(range(len(nodes)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for p in sorted(pairs, key=lambda q: weight[q]):
            ra_, rb = find(idx[p[0]]), find(idx[p[1]])
            if ra_ != rb:
                parent[ra_] = rb
                selected.add(p)
                weight[p] = 0
    return selected


def _simplify_graph(matches, cfg):
    method = cfg.graph_simplification.upper()
    if method == "NONE":
        return set(matches)
    if method == "MST_X":
        return _mst_pairs(matches, cfg.graph_simplification_value)
    # STAR_X: keep the N best edges per node (by match count) + 1 MST to
    # guarantee connectivity (sfm_stellar_engine.cpp:267-308)
    selected = set()
    per_node: Dict[int, List[Tuple[int, int]]] = {}
    for p in matches:
        per_node.setdefault(p[0], []).append(p)
        per_node.setdefault(p[1], []).append(p)
    for v, edges in per_node.items():
        best = sorted(edges, key=lambda p: -len(matches[p]))
        selected.update(best[: cfg.graph_simplification_value])
    selected.update(_mst_pairs(matches, 1))
    return selected


# ---------------------------------------------------------------------------
# pod relative scales
# ---------------------------------------------------------------------------

def _edge_depth_map(scene, index, rel, pair, center):
    """{track_id: distance to the CENTER pose's camera} in the 2-view
    reconstruction of `pair` (scale |t_pair| = 1) — the depth data of
    EstimateTripletRelativeScale (stellar_solver.cpp:126-215)."""
    va, vb = pair
    xa, xb, track_ids = _shared_track_corr(index, va, vb)
    if len(track_ids) < 3:
        return {}
    n = len(track_ids)
    b1 = _bearings(scene, np.full(n, va), xa)
    b2 = _bearings(scene, np.full(n, vb), xb)
    R = rel[pair]["R"]
    t = rel[pair]["t"]
    X, ok = tri.triangulate_2view(
        jnp.asarray(np.tile(np.eye(3), (n, 1, 1))), jnp.asarray(np.zeros((n, 3))),
        jnp.asarray(b1), jnp.asarray(np.tile(R, (n, 1, 1))),
        jnp.asarray(np.tile(t, (n, 1))), jnp.asarray(b2))
    X = np.asarray(X)
    ok = np.asarray(ok) & (np.linalg.norm(X, axis=1) < 1e4)
    C_center = np.zeros(3) if center == va else -R.T @ t
    dist = np.linalg.norm(X - C_center, axis=1)
    return dict(zip(track_ids[ok].tolist(), dist[ok]))


def _pod_scales_l1(depth_maps, edges, cfg):
    """Per-edge |t| scales from 2-uplet median-depth ratios, solved in the
    log domain under L1 (SCALING_SOLVER_L1, stellar_definitions.hpp:183),
    first edge pinned, normalized so max scale == 1."""
    edges_ok = [e for e in edges if depth_maps.get(e)]
    if len(edges_ok) < 2:
        return {}
    eidx = {e: i for i, e in enumerate(edges_ok)}
    rows = []
    rhs = []
    for a in range(len(edges_ok)):
        for b in range(a + 1, len(edges_ok)):
            ea, eb = edges_ok[a], edges_ok[b]
            common = depth_maps[ea].keys() & depth_maps[eb].keys()
            if len(common) < cfg.min_uplet_tracks:
                continue
            med_a = np.median([depth_maps[ea][t] for t in common])
            med_b = np.median([depth_maps[eb][t] for t in common])
            if med_a <= 0 or med_b <= 0:
                continue
            rows.append((eidx[ea], eidx[eb]))
            rhs.append(np.log(med_a / med_b))
    if not rows:
        return {}
    # S_a - S_b = log(med_a / med_b), S_0 = 0 (gauge), L1 solve
    m = len(rows)
    n = len(edges_ok) - 1
    A = np.zeros((m, n))
    for r, (ia, ib) in enumerate(rows):
        if ia != 0:
            A[r, ia - 1] = 1.0
        if ib != 0:
            A[r, ib - 1] = -1.0
    if n == 0:
        return {}
    x = np.asarray(l1_admm.solve_lad(jnp.asarray(A), jnp.asarray(np.asarray(rhs))))
    logs = np.concatenate([[0.0], x])
    logs -= logs.max()
    scales = np.exp(logs)
    return {e: float(scales[i]) for e, i in eidx.items()}


# ---------------------------------------------------------------------------
# pod local reconstruction
# ---------------------------------------------------------------------------

def _pod_sub_scene(scene, rel, edges, center, scales):
    """Scene with only the pod's poses set: center at identity, each
    neighbor from its scaled relative pose (stellar_definitions.hpp
    :239-283 pose upgrade)."""
    sub = Scene()
    sub.view_filename = list(scene.view_filename)
    sub.view_intrinsic = scene.view_intrinsic.copy()
    sub.view_pose = scene.view_pose.copy()
    sub.view_wh = scene.view_wh
    sub.cameras = scene.cameras
    sub.pose_valid = np.zeros(scene.n_poses, bool)
    sub.pose_R = np.tile(np.eye(3), (scene.n_poses, 1, 1))
    sub.pose_C = np.zeros((scene.n_poses, 3))

    def set_pose(v, R, C):
        pid = scene.view_pose[v]
        sub.pose_valid[pid] = True
        sub.pose_R[pid] = R
        sub.pose_C[pid] = C

    set_pose(center, np.eye(3), np.zeros(3))
    for e in edges:
        s = scales.get(e)
        if s is None or s <= 0:
            continue
        R, t = rel[e]["R"], rel[e]["t"]
        if e[0] == center:
            # pose of e[1] in center frame, center distance scaled by 1/s
            set_pose(e[1], R, (-R.T @ t) / s)
        else:
            # pose of e[0] in center(=e[1]) frame: R' = R^T, C' = t
            set_pose(e[0], R.T, t / s)
    return sub


def _pod_reconstruction(scene, index, rel, edges, center, cfg):
    """Stellar_Solver::Solve + Optimize for one pod; returns refined
    {pair: (R_ij, t_ij)} relative motions or None."""
    depth_maps = {e: _edge_depth_map(scene, index, rel, e, center)
                  for e in edges}
    scales = _pod_scales_l1(depth_maps, edges, cfg)
    if len(scales) < 2:
        return None
    sub = _pod_sub_scene(scene, rel, edges, center, scales)
    if int(sub.pose_valid.sum()) < cfg.min_pod_poses:
        return None

    # >= 3-view tracks over the pod's views, blind triangulation
    pod_views = {center}
    for e in scales:
        pod_views.update(e)
    posed_mask = np.zeros(scene.n_views, bool)
    posed_mask[list(pod_views)] = True
    rows_posed = posed_mask[index.tracks.view_id]
    cand = np.bincount(index.tracks.track_id[rows_posed],
                       minlength=index.n_tracks)
    cand_tracks = np.nonzero(cand >= 3)[0]
    if len(cand_tracks) < cfg.min_uplet_tracks:
        return None
    lot = np.full(index.n_tracks, -1, np.int64)

    class _PodTri:
        triangulation_angle_deg = 0.0     # blind (Structure_Computation_Blind)
        max_residual_px = np.inf

    _reconstruct_tracks(sub, index, cand_tracks, lot, _PodTri)
    if sub.n_landmarks < cfg.min_uplet_tracks:
        return None

    # BA with intrinsics fixed (Optimize :468-480), cleanup, second BA
    class _PodBa:
        refine_intrinsics = ba.ADJUST_NONE
        ba_iterations = cfg.pod_ba_iterations
        dtype = cfg.dtype

    _run_ba(sub, _PodBa)
    filters.depth_cleaning(sub, 5.2, 12, 3)
    filters.remove_outliers_pixel_residual(sub, 4.0, 3)
    filters.remove_outliers_angle_error(sub, 2.0)
    filters.erase_unstable_poses_and_observations(sub, 12, 3)
    if int(sub.pose_valid.sum()) < cfg.min_pod_poses:
        return None
    _run_ba(sub, _PodBa)

    # refined relative motions for every still-valid pod edge
    out = {}
    for e in scales:
        pa, pb = scene.view_pose[e[0]], scene.view_pose[e[1]]
        if not (sub.pose_valid[pa] and sub.pose_valid[pb]):
            continue
        Ri, Ci = sub.pose_R[pa], sub.pose_C[pa]
        Rj, Cj = sub.pose_R[pb], sub.pose_C[pb]
        R_ij = Rj @ Ri.T
        ti = -Ri @ Ci
        tj = -Rj @ Cj
        out[e] = (R_ij, tj - R_ij @ ti)
    return out if len(out) >= 2 else None


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def stellar_sfm(scene: Scene, features: List[np.ndarray],
                matches: Dict[Tuple[int, int], np.ndarray],
                cfg: StellarConfig = StellarConfig(), seed: int = 0):
    key = jax.random.PRNGKey(seed)
    tracks = build_tracks(matches, min_length=2)
    index = _TrackIndex(tracks, features)

    selected = _simplify_graph(matches, cfg)
    keep_nodes = graphlib.largest_biedge_connected_component(list(matches))
    pairs = sorted(p for p in selected
                   if p[0] in keep_nodes and p[1] in keep_nodes)
    _log(cfg, f"graph simplification {cfg.graph_simplification}: "
              f"{len(pairs)}/{len(matches)} pairs")
    rel = compute_relative_poses(scene, index, pairs, _GCfg(cfg), key)
    if len(rel) < 3:
        raise RuntimeError("not enough relative poses")
    _log(cfg, f"{len(rel)} relative poses")

    # pods: per-pose star -> local reconstruction -> refined motions
    pods: Dict[int, Dict[Tuple[int, int], tuple]] = {}
    pod_nodes = sorted({v for p in rel for v in p})
    for c in pod_nodes:
        edges = [p for p in rel if c in p]
        if len(edges) < 2:
            continue
        motions = _pod_reconstruction(scene, index, rel, edges, c, cfg)
        if motions:
            pods[c] = motions
    if not pods:
        raise RuntimeError("no stellar pod could be reconstructed")
    _log(cfg, f"{len(pods)} pods reconstructed")

    # rotation averaging over all pod motions (largest CC of pod pairs)
    pod_pairs = {e for m in pods.values() for e in m}
    cc_nodes = max(graphlib.connected_components(list(pod_pairs)), key=len)
    views = sorted(cc_nodes)
    vmap_ = {v: i for i, v in enumerate(views)}
    ei, ej, R_rel = [], [], []
    for motions in pods.values():
        for (a, b), (R_ab, _) in motions.items():
            if a in cc_nodes and b in cc_nodes:
                ei.append(vmap_[a])
                ej.append(vmap_[b])
                R_rel.append(R_ab)
    R_glob = np.asarray(ra.l2_rotation_averaging(
        len(views), jnp.asarray(np.asarray(ei)), jnp.asarray(np.asarray(ej)),
        jnp.asarray(np.stack(R_rel)), jnp.asarray(np.ones(len(ei)))))

    # translation averaging: one scale per pod (RelativeInfo_Vec groups)
    tei, tej, tR, tt, group = [], [], [], [], []
    for g, motions in enumerate(pods.items()):
        _, ms = motions
        for (a, b), (_, t_ab) in ms.items():
            if a not in cc_nodes or b not in cc_nodes:
                continue
            i, j = vmap_[a], vmap_[b]
            tei.append(i)
            tej.append(j)
            # relative rotation from the averaged global rotations
            tR.append(R_glob[j] @ R_glob[i].T)
            tt.append(t_ab)
            group.append(g)
    group = np.unique(np.asarray(group), return_inverse=True)[1]
    t_glob, _ = ta.solve_translation_averaging(
        len(views), np.asarray(tei), np.asarray(tej), np.stack(tR),
        np.stack(tt), method=ta.SOFTL1, scale_group=group,
        dtype=cfg.dtype)

    for v, i in vmap_.items():
        pid = scene.view_pose[v]
        scene.pose_valid[pid] = True
        scene.pose_R[pid] = R_glob[i]
        scene.pose_C[pid] = -R_glob[i].T @ t_glob[i]

    # initial structure (min covisibility 2) + staged BA + cleanup
    landmark_of_track = np.full(index.n_tracks, -1, np.int64)
    posed_mask = np.zeros(scene.n_views, bool)
    posed_mask[views] = True
    rows_posed = posed_mask[index.tracks.view_id]
    cand = np.bincount(index.tracks.track_id[rows_posed],
                       minlength=index.n_tracks)
    cand_tracks = np.nonzero(cand >= 2)[0]
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
