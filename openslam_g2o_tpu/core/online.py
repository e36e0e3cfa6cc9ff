"""Online / incremental optimization.

TPU-native re-design of the interactive_slam engine
(g2o_interactive/graph_optimizer_sparse_online.h:37 SparseOptimizerOnline,
g2o_incremental/graph_optimizer_sparse_incremental.h:30
SparseOptimizerIncremental). The reference's incremental solver patches a
CHOLMOD factor with rank updates (cholmod_updown,
linear_solver_cholmod_online.h:135-160) because a CPU re-factorization is
expensive. On TPU the economics invert: a full re-linearize + solve is a
single fused device program measured in milliseconds, and the only real cost
is recompilation when array shapes change. So the TPU design is:

* array shapes are padded to power-of-two buckets -> O(log N) compilations
  over the whole session, everything else hits the jit cache,
* each SOLVE is a warm start from the current estimates (the reference's
  online variant also re-solves from the current state),
* new vertices are initialized from their first edge via the spanning-tree
  rule (initialEstimate), matching G2OSlamInterface::addEdge
  (g2o_slam_interface.cpp).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import GaussNewton, optimize

__all__ = ["OnlineOptimizer", "bucket_pow2"]


def bucket_pow2(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket (>= minimum)."""
    b = minimum
    while b < n:
        b *= 2
    return b


class OnlineOptimizer:
    """Incrementally growing graph with warm-started re-solves.

    Usage (mirrors G2OSlamInterface, g2o_slam_interface.h:49-57):
        oo.add_vertex(id, "se2", params_or_None)
        oo.add_edge("edge_se2", (i, j), meas, info)
        oo.fix(id)
        oo.solve()            # a few warm-started iterations
        oo.estimate(id)
    """

    def __init__(self, algorithm=None, iterations_per_solve: int = 3,
                 dtype=None, bucket=bucket_pow2):
        self.graph = Graph()
        self.algorithm = algorithm or GaussNewton()
        self.iterations = iterations_per_solve
        self.dtype = dtype
        self.bucket = bucket
        self._solves = 0
        self._compiles = 0

    # -- graph construction ------------------------------------------------

    def add_vertex(self, vid: int, type_name: str, params=None):
        from openslam_g2o_tpu.core import registry
        vt = registry.vertex_type(type_name)
        if params is None:
            params = np.asarray(vt.origin(np.float64))
        self.graph.add_vertex(vid, type_name, params)

    def add_edge(self, type_name: str, vertex_ids, measurement, information,
                 **kw):
        """Add an edge; endpoints that exist but were never initialized are
        re-initialized from the edge measurement when possible (the
        G2OSlamInterface behavior: odometry edges chain the trajectory)."""
        from openslam_g2o_tpu.core import registry
        et = registry.edge_type(type_name)
        rec = self.graph.add_edge(type_name, vertex_ids, measurement,
                                  information, **kw)
        if et.initial_estimate is not None and et.num_vertices == 2:
            v0 = self.graph.vertices[vertex_ids[0]]
            v1 = self.graph.vertices[vertex_ids[1]]
            origin1 = np.asarray(v1.vtype.origin(np.float64))
            if np.array_equal(v1.params, origin1) and not np.array_equal(
                    v0.params, np.asarray(v0.vtype.origin(np.float64))):
                est = et.initial_estimate(
                    (v0.params, v1.params), rec.measurement,
                    tuple(self.graph.parameters[p][1] for p in rec.param_ids), 1)
                if est is not None:
                    v1.params = np.asarray(est)
        return rec

    def fix(self, vid: int):
        self.graph.set_fixed(vid, True)

    # -- solving -----------------------------------------------------------

    def solve(self, iterations: Optional[int] = None):
        """Re-linearize and run a few iterations, warm-started from the
        current estimates; writes the result back into the graph."""
        if self.graph.num_edges() == 0:
            return []
        if not self.graph.any_fixed():
            self.graph.set_fixed(next(iter(self.graph.vertices)), True)
        # bucketed padding keeps array shapes stable -> jit cache hits
        prob = P.build_problem(self.graph, dtype=self.dtype,
                               pad_counts=self.bucket)
        out, stats = optimize(prob, self.algorithm,
                              iterations=iterations or self.iterations)
        P.write_back(out, self.graph)
        self._solves += 1
        return stats

    # -- queries -----------------------------------------------------------

    def estimate(self, vid: int):
        return self.graph.vertices[vid].params

    def estimates(self, vids=None):
        if vids is None:
            vids = sorted(self.graph.vertices)
        return {vid: self.graph.vertices[vid].params for vid in vids}
