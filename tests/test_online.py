"""Online optimizer + interactive protocol + marginal covariance tests."""
import io
import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.core.marginals import (
    compute_marginals, compute_marginals_all_diagonal)
from openslam_g2o_tpu.core.online import OnlineOptimizer, bucket_pow2
from openslam_g2o_tpu.apps.interactive import SlamInterface, run_protocol
from openslam_g2o_tpu.utils import np_lie

rng = np.random.default_rng(13)


class TestMarginals:
    def _graph(self):
        from tests.test_graph_problem import make_se2_chain
        g, _ = make_se2_chain(6, noise=0.05)
        return g

    def test_blocks_match_dense_inverse(self):
        g = self._graph()
        prob = g.compile()
        H, _, _ = P.build_dense_system(prob)
        Hinv = np.linalg.inv(np.asarray(H))
        out = compute_marginals(prob, g, [1, 3, 5])
        for vid in (1, 3, 5):
            off = vid * 3
            np.testing.assert_allclose(out[vid], Hinv[off:off + 3, off:off + 3],
                                       atol=1e-9)

    def test_fixed_vertex_zero_covariance(self):
        g = self._graph()
        prob = g.compile()
        out = compute_marginals(prob, g, [0])
        np.testing.assert_allclose(out[0], 0.0, atol=1e-12)

    def test_all_diagonal_matches_selected(self):
        g = self._graph()
        prob = g.compile()
        alld = compute_marginals_all_diagonal(prob)
        sel = compute_marginals(prob, g, [2])
        np.testing.assert_allclose(np.asarray(alld["se2"])[2], sel[2], atol=1e-9)

    def test_covariance_grows_along_chain(self):
        """Odometry-only chain: uncertainty must grow with distance from the
        fixed anchor (textbook sanity property)."""
        g = Graph()
        info = np.diag([100.0, 100.0, 400.0])
        for i in range(6):
            g.add_vertex(i, "se2", [float(i), 0, 0], fixed=(i == 0))
        for i in range(5):
            g.add_edge("edge_se2", (i, i + 1), [1, 0, 0], info)
        prob = g.compile()
        out = compute_marginals(prob, g, [1, 3, 5])
        t1 = np.trace(out[1])
        t3 = np.trace(out[3])
        t5 = np.trace(out[5])
        assert t1 < t3 < t5


class TestOnline:
    def test_bucket_pow2(self):
        assert bucket_pow2(1) == 64
        assert bucket_pow2(64) == 64
        assert bucket_pow2(65) == 128
        assert bucket_pow2(1000) == 1024

    def test_incremental_session(self):
        oo = OnlineOptimizer()
        info = np.diag([100.0, 100.0, 400.0])
        oo.add_vertex(0, "se2", [0, 0, 0])
        oo.fix(0)
        pose = np.zeros(3)
        for i in range(1, 20):
            z = np.array([1.0, 0.0, 0.3])
            oo.add_vertex(i, "se2", None)
            oo.add_edge("edge_se2", (i - 1, i), z, info)
            if i % 5 == 0:
                oo.solve()
        # vertex initialized by chaining, then refined
        est = oo.estimate(19)
        assert np.isfinite(est).all()
        assert np.linalg.norm(est[:2]) > 1.0  # actually moved

    def test_incremental_matches_batch(self):
        """After the same edges, online result == batch result."""
        from tests.test_graph_problem import make_se2_chain
        g, _ = make_se2_chain(10, noise=0.1)
        # batch
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        batch_chi = stats[-1]["chi2"]
        # online: replay the same graph
        oo = OnlineOptimizer(algorithm=LevenbergMarquardt(),
                             iterations_per_solve=5)
        for vid, rec in g.vertices.items():
            oo.add_vertex(vid, "se2", rec.params)
            if rec.fixed:
                oo.fix(vid)
        for e in g.edges:
            oo.add_edge("edge_se2", e.vertex_ids, e.measurement, e.information)
            oo.solve()
        final = oo.graph.compile()
        np.testing.assert_allclose(float(P.chi2(final)), batch_chi, atol=1e-6)

    def test_incremental_pcg_fast_path_matches_batch(self):
        """The ELL-PCG fast path (padding-masked pattern rebuilt per solve,
        online.py solve()) reaches the batch minimum across bucket growth —
        the incremental-engine parity the reference gets from cholmod rank
        updates (graph_optimizer_sparse_incremental.cpp:194-420)."""
        from tests.test_graph_problem import make_se2_chain
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG
        g, _ = make_se2_chain(80, noise=0.15)   # crosses the 64-bucket edge
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        batch_chi = stats[-1]["chi2"]
        oo = OnlineOptimizer(
            algorithm=LevenbergMarquardtPCG(pcg_iters=200, pcg_tol=1e-10),
            iterations_per_solve=3)
        for vid, rec in g.vertices.items():
            oo.add_vertex(vid, "se2", rec.params)
            if rec.fixed:
                oo.fix(vid)
        for k, e in enumerate(g.edges):
            oo.add_edge("edge_se2", e.vertex_ids, e.measurement, e.information)
            if k % 10 == 9:
                oo.solve()
        oo.solve(iterations=8)
        final = oo.graph.compile()
        np.testing.assert_allclose(float(P.chi2(final)), batch_chi,
                                   rtol=1e-6, atol=1e-6)


class TestProtocol:
    def test_2d_session(self):
        out = io.StringIO()
        iface = SlamInterface(out=out)
        script = [
            "ADD VERTEX_XYT 0;",
            "ADD VERTEX_XYT 1;",
            "ADD EDGE_XYT 0 0 1 1 0 0 100 0 0 100 0 400;",
            "FIX 0;",
            "SOLVE_STATE;",
            "QUERY_STATE;",
        ]
        run_protocol(script, iface)
        text = out.getvalue()
        assert text.startswith("BEGIN")
        assert text.strip().endswith("END")
        lines = [l for l in text.splitlines() if l.startswith("VERTEX_XYT")]
        assert len(lines) == 2
        v1 = [float(x) for x in lines[1].split()[2:]]
        np.testing.assert_allclose(v1, [1, 0, 0], atol=1e-6)

    def test_2d_loop_session(self):
        out = io.StringIO()
        iface = SlamInterface(out=out)
        # square with a loop closure; odometry says perfect square
        cmds = []
        info = "400 0 0 400 0 800"
        for i in range(4):
            cmds.append(f"ADD EDGE_XYT {i} {i} {i + 1} 1 0 1.5707963268 {info};")
        # loop closure back to 0
        cmds.append(f"ADD EDGE_XYT 9 4 0 1 0 1.5707963268 {info};")
        cmds.append("SOLVE_STATE;")
        cmds.append("QUERY_STATE 4;")
        run_protocol(cmds, iface)
        text = out.getvalue()
        line = [l for l in text.splitlines() if l.startswith("VERTEX_XYT 4")][0]
        vals = [float(x) for x in line.split()[2:]]
        # unit square closes: pose 4 coincides with pose 0
        np.testing.assert_allclose(vals[:2], [0.0, 0.0], atol=0.05)

    def test_3d_session(self):
        out = io.StringIO()
        iface = SlamInterface(out=out)
        info21 = " ".join(["1" if i in (0, 6, 11, 15, 18, 20) else "0"
                           for i in range(21)])
        script = [
            "ADD VERTEX_XYZRPY 0;",
            "ADD VERTEX_XYZRPY 1;",
            f"ADD EDGE_XYZRPY 0 0 1 1 2 3 0 0 0 {info21};",
            "FIX 0;",
            "SOLVE_STATE;",
            "QUERY_STATE 1;",
        ]
        run_protocol(script, iface)
        line = [l for l in out.getvalue().splitlines()
                if l.startswith("VERTEX_XYZRPY 1")][0]
        vals = [float(x) for x in line.split()[2:]]
        np.testing.assert_allclose(vals[:3], [1, 2, 3], atol=1e-6)

    def test_unknown_command_not_fatal(self):
        out = io.StringIO()
        iface = SlamInterface(out=out)
        run_protocol(["BOGUS 1 2 3;", "QUERY_STATE;"], iface)
        assert "BEGIN" in out.getvalue()


class TestIncrementalPerf:
    def test_session_stats_and_bucket_compiles(self):
        """The builder must reuse jit-cached shapes: growing 0->100 vertices
        with pow2-64 buckets crosses exactly two bucket shapes (64, 128)."""
        oo = OnlineOptimizer()
        info = np.diag([100.0, 100.0, 400.0])
        oo.add_vertex(0, "se2", [0, 0, 0])
        oo.fix(0)
        for i in range(1, 100):
            oo.add_vertex(i, "se2", None)
            oo.add_edge("edge_se2", (i - 1, i), [1.0, 0.0, 0.1], info)
            if i % 10 == 0:
                oo.solve()
        st = oo.session_stats()
        assert st["vertices"] == 100
        assert st["edges"] == 99
        assert st["solves"] == 9
        assert st["shape_buckets_compiled"] == 2   # 64 then 128

    def test_incremental_matches_batch_rebuild(self):
        """The incrementally-maintained tables must produce the same solution
        as compiling the synced graph from scratch."""
        import jax.numpy as jnp
        oo = OnlineOptimizer(algorithm=LevenbergMarquardt(),
                             iterations_per_solve=4)
        info = np.diag([100.0, 100.0, 400.0])
        oo.add_vertex(0, "se2", [0, 0, 0])
        oo.fix(0)
        for i in range(1, 30):
            oo.add_vertex(i, "se2", None)
            oo.add_edge("edge_se2", (i - 1, i), [1.0, 0.0, 0.2], info)
        oo.add_edge("edge_se2", (29, 0), [1.0, 0.0, 0.2], info)
        oo.solve(iterations=8)
        batch = oo.graph.compile()      # synced estimates, fresh lowering
        chi_inc = float(P.robust_chi2(oo._build_problem()))
        chi_batch = float(P.robust_chi2(batch))
        np.testing.assert_allclose(chi_inc, chi_batch, rtol=1e-9)
