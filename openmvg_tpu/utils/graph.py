"""Host-side view-graph algorithms.

Reference parity: graph/ (lemon-backed in the reference, pure
numpy/scipy here) — connected components (graph_builder.hpp), largest
bi-edge-connected subgraph extraction used by the global engine
(connectedComponent.hpp:64 CleanGraph_KeepLargestBiEdge_Nodes), and
triplet listing (triplet_finder.hpp:31).  View graphs have at most a few
thousand nodes; python adjacency loops are fine where vectorization is
awkward (bridges), scipy elsewhere.
"""

from collections import defaultdict
from typing import Dict, Iterable, List, Set, Tuple

import numpy as np
from scipy import sparse
from scipy.sparse import csgraph


def pairs_to_edges(pairs: Iterable[Tuple[int, int]]) -> np.ndarray:
    e = np.asarray(sorted(set((min(i, j), max(i, j)) for i, j in pairs)), np.int64)
    return e.reshape(-1, 2)


def connected_components(pairs) -> List[Set[int]]:
    """Connected components of the pair graph, largest first."""
    e = pairs_to_edges(pairs)
    if len(e) == 0:
        return []
    nodes, inv = np.unique(e.ravel(), return_inverse=True)
    ii = inv.reshape(-1, 2)
    g = sparse.coo_matrix(
        (np.ones(len(ii)), (ii[:, 0], ii[:, 1])), shape=(len(nodes),) * 2)
    _, labels = csgraph.connected_components(g, directed=False)
    comps = defaultdict(set)
    for node, lab in zip(nodes, labels):
        comps[lab].add(int(node))
    return sorted(comps.values(), key=len, reverse=True)


def _bridges(adj: Dict[int, Set[int]]) -> Set[Tuple[int, int]]:
    """Tarjan bridge finding (iterative DFS)."""
    disc, low = {}, {}
    bridges = set()
    timer = [0]
    for root in adj:
        if root in disc:
            continue
        stack = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for v in it:
                if v == parent:
                    continue
                if v in disc:
                    low[u] = min(low[u], disc[v])
                else:
                    disc[v] = low[v] = timer[0]
                    timer[0] += 1
                    stack.append((v, u, iter(adj[v])))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        bridges.add((min(p, u), max(p, u)))
    return bridges


def largest_biedge_connected_component(pairs) -> Set[int]:
    """Nodes of the largest 2-edge-connected component
    (CleanGraph_KeepLargestBiEdge_Nodes: remove bridges, keep largest CC)."""
    e = pairs_to_edges(pairs)
    if len(e) == 0:
        return set()
    adj = defaultdict(set)
    for i, j in e:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))
    bridges = _bridges(adj)
    kept = [tuple(p) for p in e if (int(p[0]), int(p[1])) not in bridges]
    comps = connected_components(kept)
    return comps[0] if comps else set()


def list_triplets(pairs) -> List[Tuple[int, int, int]]:
    """All (i < j < k) with all three edges present (TripletListing)."""
    e = pairs_to_edges(pairs)
    adj = defaultdict(set)
    for i, j in e:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))
    triplets = []
    for i, j in e:
        i, j = int(i), int(j)
        for k in adj[i] & adj[j]:
            if k > j:
                triplets.append((i, j, k))
    return triplets


def contiguous_pairs(n_views: int, overlap: int) -> List[Tuple[int, int]]:
    """Windowed pair list (Pair_Builder.hpp:37 contiguousWithOverlap)."""
    return [(i, j) for i in range(n_views)
            for j in range(i + 1, min(i + overlap + 1, n_views))]


def exhaustive_pairs(n_views: int) -> List[Tuple[int, int]]:
    """All pairs (Pair_Builder.hpp:25 exhaustivePairs)."""
    return [(i, j) for i in range(n_views) for j in range(i + 1, n_views)]
