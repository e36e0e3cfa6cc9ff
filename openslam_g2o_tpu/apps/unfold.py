"""g2o-unfold counterpart: localized re-optimization of high-error regions.

Parity with g2o/examples/g2o_unfold/{g2o-unfold.cpp, tools.cpp}: grow a
region of the graph around a high-chi2 edge using the inverse-chi2 edge cost
(InvChi2CostFunction, g2o-unfold.cpp:40-54) and the edge-BFS with cost limit
(tools.cpp:17-70), then optimize only that subgraph with its border vertices
fixed — "unfolding" a locally inconsistent patch without touching the rest.

    python -m openslam_g2o_tpu.apps.unfold input.g2o output.g2o \
        [--max-cost 1.0] [--iterations 10] [--passes 1]
"""
from __future__ import annotations

import numpy as np

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.hyper_dijkstra import (
    find_connected_edges_with_cost_limit)

__all__ = ["edge_chi2_per_graph_edge", "unfold_region", "unfold", "main"]


def edge_chi2_per_graph_edge(graph: Graph) -> np.ndarray:
    """chi2 of every graph edge at the current estimates (host order)."""
    prob = graph.compile()
    per_group = P.edge_chi2(prob)
    rows = P.edge_group_rows(graph)
    host = {k: np.asarray(v) for k, v in per_group.items()}
    out = np.zeros(len(graph.edges))
    for i, kr in enumerate(rows):
        if kr is not None:
            out[i] = host[kr[0]][kr[1]]
    return out


def unfold_region(graph: Graph, start_edge: int, max_cost: float,
                  chi2s: np.ndarray):
    """(selected, border) edge-index sets around start_edge with the
    inverse-chi2 cost 1 / (1e-6 + chi2) (g2o-unfold.cpp:47-54): low cost =
    high error, so the region is the connected high-error patch."""
    cost = lambda i, e: 1.0 / (1e-6 + chi2s[i])
    return find_connected_edges_with_cost_limit(graph, start_edge, cost,
                                                max_cost)


def unfold(graph: Graph, max_cost: float = 1.0, iterations: int = 10,
           passes: int = 1, verbose: bool = False):
    """Iteratively pick the worst edge, grow its high-error region, optimize
    that subgraph with border vertices held fixed, and fold the estimates
    back. Returns the number of regions optimized."""
    from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize

    n_regions = 0
    for _ in range(passes):
        chi2s = edge_chi2_per_graph_edge(graph)
        worst = int(np.argmax(chi2s))
        selected, _border = unfold_region(graph, worst, max_cost, chi2s)
        if not selected:
            break
        inner = set()
        for i in selected:
            inner.update(graph.edges[i].vertex_ids)
        # border vertices: touched by any unselected edge (they anchor the
        # patch to the rest of the graph), plus originally-fixed vertices
        boundary = set()
        for i, e in enumerate(graph.edges):
            if i in selected:
                continue
            boundary.update(set(e.vertex_ids) & inner)

        sub = Graph()
        for pid, (pt, val) in graph.parameters.items():
            sub.add_parameter(pid, pt.name, val)
        for vid in sorted(inner):
            rec = graph.vertices[vid]
            sub.add_vertex(vid, rec.vtype.name, rec.params,
                           fixed=rec.fixed or vid in boundary,
                           marginalized=rec.marginalized)
        if sub.gauge_freedom():
            sub.set_fixed(sub.find_gauge(), True)
        for i in sorted(selected):
            e = graph.edges[i]
            sub.add_edge(e.etype.name, e.vertex_ids, e.measurement,
                         e.information, kernel=e.kernel,
                         kernel_delta=e.kernel_delta, param_ids=e.param_ids)
        prob = sub.compile()
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, LevenbergMarquardt(),
                              iterations=iterations)
        P.write_back(out, sub)
        for vid in sorted(inner):
            if not (graph.vertices[vid].fixed or vid in boundary):
                graph.vertices[vid].params = sub.vertices[vid].params
        n_regions += 1
        if verbose:
            print(f"region around edge {worst}: {len(selected)} edges, "
                  f"{len(inner)} vertices ({len(boundary)} border); "
                  f"chi2 {chi0:.3f} -> {stats[-1]['chi2']:.3f}")
    return n_regions


def main(argv=None):
    import argparse

    from openslam_g2o_tpu.io.g2o_format import load_g2o, save_g2o

    ap = argparse.ArgumentParser(description="optimize high-error subregions")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--max-cost", type=float, default=1.0,
                    help="inverse-chi2 cost limit for region growing")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args(argv)
    g = load_g2o(args.input)
    n = unfold(g, args.max_cost, args.iterations, args.passes, verbose=True)
    print(f"optimized {n} region(s)")
    save_g2o(g, args.output)


if __name__ == "__main__":
    main()
