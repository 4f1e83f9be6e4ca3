"""Scene clustering into sub-reconstructions and match-graph splitting.

Reference parity: software/SfM/clustering/main_ComputeClusters.cpp (split
a reconstruction into overlapping view clusters for divide-and-conquer
processing) and sfm/sfm_data_graph_utils.cpp (split the match graph into
connected components with a minimum size; main_SplitMatchFileIntoMatchFiles).
"""

from typing import Dict, List, Set, Tuple

import numpy as np

from openmvg_tpu.utils import graph as graphlib


def split_matches_by_component(matches: Dict[Tuple[int, int], np.ndarray],
                               min_nodes: int = 3
                               ) -> List[Dict[Tuple[int, int], np.ndarray]]:
    """Partition the pair-match dict by connected components
    (sfm_data_graph_utils.cpp SplitMatchesIntoClusterMatches)."""
    comps = graphlib.connected_components(list(matches))
    out = []
    for comp in comps:
        if len(comp) < min_nodes:
            continue
        sub = {p: m for p, m in matches.items()
               if p[0] in comp and p[1] in comp}
        if sub:
            out.append(sub)
    return out


def cluster_views(scene, n_clusters: int, overlap_ratio: float = 0.1,
                  seed: int = 0) -> List[Set[int]]:
    """Cluster posed views into n_clusters spatially coherent groups with
    boundary overlap (main_ComputeClusters.cpp's divide step; k-means on
    camera centers + nearest-neighbour overlap augmentation)."""
    import jax

    from openmvg_tpu.ops.vlad import kmeans

    posed = [v for v in range(scene.n_views)
             if scene.view_pose[v] >= 0 and scene.pose_valid[scene.view_pose[v]]]
    if not posed:
        return []
    C = scene.pose_C[scene.view_pose[posed]]
    n_clusters = min(n_clusters, len(posed))
    centers, assign = kmeans(jax.random.PRNGKey(seed), C.astype(np.float32),
                             n_clusters)
    centers = np.asarray(centers)
    assign = np.asarray(assign)
    clusters = [set(np.asarray(posed)[assign == k].tolist())
                for k in range(n_clusters)]
    # overlap: add each cluster's nearest outside views
    n_extra = max(1, int(overlap_ratio * len(posed) / max(n_clusters, 1)))
    for k in range(n_clusters):
        outside = [v for v in posed if v not in clusters[k]]
        if not outside:
            continue
        d = np.linalg.norm(
            scene.pose_C[scene.view_pose[outside]] - centers[k], axis=1)
        for idx in np.argsort(d)[:n_extra]:
            clusters[k].add(int(outside[idx]))
    return [c for c in clusters if c]


def scene_for_views(scene, views: Set[int]):
    """Sub-scene restricted to the given views (observations filtered;
    landmark set compacted)."""
    import copy

    sub = copy.deepcopy(scene)
    keep_view = np.zeros(scene.n_views, bool)
    keep_view[list(views)] = True
    sub.obs_valid = scene.obs_valid & keep_view[scene.obs_view]
    # poses of excluded views invalidated
    for v in range(scene.n_views):
        if not keep_view[v] and scene.view_pose[v] >= 0:
            sub.pose_valid[scene.view_pose[v]] = False
    from openmvg_tpu.sfm.filters import _drop_short_tracks

    _drop_short_tracks(sub, 2)
    return sub
