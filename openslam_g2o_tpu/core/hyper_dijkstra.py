"""Graph traversal utilities over the host graph.

Host-side analogue of HyperDijkstra (g2o/core/hyper_dijkstra.h:38-108,
.cpp:86-260): shortest-path trees with pluggable cost functions, tree
visitors, and connected-component extraction. These are once-per-solve host
algorithms (the reference also runs them single-threaded on the CPU); the
device never sees them.
"""
from __future__ import annotations

import heapq
from typing import Callable, Optional

from openslam_g2o_tpu.core.graph import Graph

__all__ = ["shortest_paths", "connected_subset", "connected_components",
           "visit_tree", "find_connected_edges_with_cost_limit"]


def _adjacency(graph: Graph, edge_filter=None):
    adj = {vid: [] for vid in graph.vertices}
    for e in graph.edges:
        if edge_filter is not None and not edge_filter(e):
            continue
        for s, vid in enumerate(e.vertex_ids):
            for t, wid in enumerate(e.vertex_ids):
                if s != t:
                    adj[vid].append((e, wid))
    return adj


def shortest_paths(graph: Graph, roots, cost_fn: Optional[Callable] = None,
                   edge_filter=None):
    """Dijkstra from `roots`. Returns {vid: (distance, parent_vid, parent_edge)}
    for every reached vertex (roots have parent None).

    cost_fn(edge) -> float, default 1.0 (UniformCostFunction,
    hyper_dijkstra.h:107)."""
    if cost_fn is None:
        cost_fn = lambda e: 1.0
    if isinstance(roots, int):
        roots = [roots]
    adj = _adjacency(graph, edge_filter)
    dist = {}
    heap = []
    for r in roots:
        dist[r] = (0.0, None, None)
        heapq.heappush(heap, (0.0, r))
    visited = set()
    while heap:
        d, vid = heapq.heappop(heap)
        if vid in visited:
            continue
        visited.add(vid)
        for e, wid in adj[vid]:
            nd = d + cost_fn(e)
            if wid not in dist or nd < dist[wid][0]:
                dist[wid] = (nd, vid, e)
                heapq.heappush(heap, (nd, wid))
    return dist


def visit_tree(tree: dict, action: Callable, order_by_distance: bool = True):
    """Apply action(vid, parent_vid, edge) over a shortest_paths result in
    BFS order (visitAdjacencyMap, hyper_dijkstra.cpp:179)."""
    items = sorted(tree.items(), key=lambda kv: kv[1][0]) \
        if order_by_distance else list(tree.items())
    for vid, (d, parent, edge) in items:
        action(vid, parent, edge)


def connected_subset(graph: Graph, root: int, edge_filter=None):
    """Vertex ids reachable from root (connectedSubset,
    hyper_dijkstra.cpp:227)."""
    return set(shortest_paths(graph, root, edge_filter=edge_filter))


def find_connected_edges_with_cost_limit(graph: Graph, start: int,
                                         cost_fn: Callable,
                                         max_edge_cost: float):
    """Edge-BFS region growing (g2o_unfold/tools.cpp:17-70): starting from
    edge index `start`, flood across shared vertices collecting edges with
    cost_fn(edge) <= max_edge_cost into `selected`; costlier edges met at
    the frontier go into `border`. Returns (selected, border) as sets of
    edge indices into graph.edges. cost_fn(edge_index, edge) -> float."""
    edges_of = {vid: [] for vid in graph.vertices}
    for i, e in enumerate(graph.edges):
        for vid in e.vertex_ids:
            edges_of[vid].append(i)
    frontier = [start]
    selected: set = set()
    border: set = set()
    seen = {start}
    while frontier:
        i = frontier.pop()
        e = graph.edges[i]
        c = cost_fn(i, e)
        if not (c == c) or c == float("inf"):
            continue
        if c > max_edge_cost:
            border.add(i)
            continue
        selected.add(i)
        for vid in e.vertex_ids:
            for j in edges_of[vid]:
                if j not in seen:
                    seen.add(j)
                    frontier.append(j)
    return selected, border


def connected_components(graph: Graph):
    """All connected components, largest first."""
    remaining = set(graph.vertices)
    comps = []
    while remaining:
        root = next(iter(remaining))
        comp = connected_subset(graph, root)
        comps.append(comp)
        remaining -= comp
    comps.sort(key=len, reverse=True)
    return comps
