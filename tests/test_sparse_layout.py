"""Lane-major block-ELL layout: gather assembly vs scatter fallback vs dense.

The contributor-table (gather) assembly and the scatter fallback must agree
bit-for-bit in f64, and the ELL matvec must reproduce the dense H product on
free slots (the structure is only used under damping + fixed-diag masks)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.sparse import (
    assemble_ell, build_ell_pattern, ell_matvec)

rng = np.random.default_rng(17)


def _problem():
    from openslam_g2o_tpu.core.graph import Graph
    from openslam_g2o_tpu.utils import np_lie
    g = Graph()
    n = 30
    info = np.diag([100.0, 100.0, 400.0])
    lm_info = np.eye(2) * 50
    for i in range(n):
        g.add_vertex(i, "se2", rng.normal(0, 1, 3), fixed=(i == 0))
    for i in range(n - 1):
        g.add_edge("edge_se2", (i, i + 1), rng.normal(0, 1, 3), info)
    # loop closures incl. repeated pairs (shared ELL slots)
    for (a, b) in [(0, 10), (5, 20), (5, 20), (3, 29), (0, 10)]:
        g.add_edge("edge_se2", (a, b), rng.normal(0, 1, 3), info)
    for i in range(12):
        g.add_vertex(100 + i, "point_xy", rng.normal(0, 2, 2))
        for j in rng.choice(n, 3, replace=False):
            g.add_edge("edge_se2_xy", (int(j), 100 + i),
                       rng.normal(0, 1, 2), lm_info)
    return g.compile(dtype=jnp.float64)


class TestLaneMajorEll:
    def test_gather_assembly_matches_scatter_fallback(self):
        prob = _problem()
        pattern = build_ell_pattern(prob)
        assert all(c is not None for c in pattern.contrib_idx)
        lin = P.linearize(prob)
        v_fast, b_fast = assemble_ell(prob, pattern, lin)
        fallback = dataclasses.replace(
            pattern,
            contrib_idx=tuple(None for _ in pattern.contrib_idx),
            contrib_mask=tuple(None for _ in pattern.contrib_mask),
            b_idx={k: None for k in pattern.b_idx},
            b_mask={k: None for k in pattern.b_mask})
        v_slow, b_slow = assemble_ell(prob, fallback, lin)
        for a, b in zip(v_fast, v_slow):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)
        for k in b_fast:
            np.testing.assert_allclose(np.asarray(b_fast[k]),
                                       np.asarray(b_slow[k]), atol=1e-12)

    def test_matvec_and_b_match_dense_system(self):
        prob = _problem()
        pattern = build_ell_pattern(prob)
        lin = P.linearize(prob)
        values, b = assemble_ell(prob, pattern, lin)
        H, b_dense, _ = P.build_dense_system(prob, lin=lin,
                                             add_fixed_diag=False)
        # random probe vectors
        for trial in range(3):
            x_flat = rng.normal(size=prob.static.total_dim)
            x_parts = {}
            for g in prob.static.vgroups:
                seg = x_flat[g.offset:g.offset + g.count * g.tangent_dim]
                x_parts[g.name] = jnp.asarray(
                    seg.reshape(g.count, g.tangent_dim))
            y = ell_matvec(prob, pattern, values, x_parts)
            y_flat = np.concatenate(
                [np.asarray(y[g.name]).reshape(-1)
                 for g in prob.static.vgroups])
            np.testing.assert_allclose(y_flat, np.asarray(H) @ x_flat,
                                       atol=1e-9)
        b_flat = np.concatenate(
            [np.asarray(b[g.name]).reshape(-1)
             for g in prob.static.vgroups])
        np.testing.assert_allclose(b_flat, np.asarray(b_dense), atol=1e-9)

    def test_diag_blocks_match_dense(self):
        prob = _problem()
        pattern = build_ell_pattern(prob)
        lin = P.linearize(prob)
        values, _ = assemble_ell(prob, pattern, lin)
        H = np.asarray(P.build_dense_system(prob, lin=lin,
                                            add_fixed_diag=False)[0])
        diag = pattern.diag_blocks(prob, values)
        for g in prob.static.vgroups:
            D = g.tangent_dim
            got = np.asarray(diag[g.name])
            for i in range(g.count):
                off = g.offset + i * D
                np.testing.assert_allclose(got[i], H[off:off + D, off:off + D],
                                           atol=1e-9)
