"""Round-2 gap closures: EDGE_PROJECT_P2MC_INTRINSICS, RobustKernelScaleDelta,
EstimatePropagatorCostOdometry."""
import numpy as np
import jax.numpy as jnp

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core import robust
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.core.initial_guess import (
    odometry_cost, spanning_tree_initial_guess)
from openslam_g2o_tpu.io.g2o_format import loads_g2o, save_g2o
from openslam_g2o_tpu.models.sba import _edge_p2mc_intrinsics_error
from openslam_g2o_tpu.utils import np_lie
from openslam_g2o_tpu.utils.jacobian_check import verify_jacobians

rng = np.random.default_rng(7)


def _p2mc_intrinsics_scene(perturb_intrinsics=0.0):
    """3 cameras on a ring + shared intrinsics vertex + exact projections."""
    intr_gt = np.array([500.0, 480.0, 320.0, 240.0, 0.1])
    g = Graph()
    g.add_vertex(100, "intrinsics",
                 intr_gt + np.array([1.0, 1.0, 1.0, 1.0, 0.0])
                 * perturb_intrinsics)
    pts = rng.uniform(-1.5, 1.5, size=(20, 3)) + np.array([0, 0, 6.0])
    cams = []
    for c in range(3):
        # camera-to-world ~ identity-ish: small offsets, looking down +z
        t = np.array([0.6 * c - 0.6, 0.1 * c, 0.0])
        q = np.array([0.0, 0.0, 0.0, 1.0])
        cam = np.concatenate([t, q, intr_gt])   # VERTEX_CAM carries K too
        cams.append(cam)
        g.add_vertex(c, "cam", cam, fixed=True)
    for i, p in enumerate(pts):
        g.add_vertex(1000 + i, "sba_point_xyz", p, fixed=True)
    info = np.eye(2)
    for c, cam in enumerate(cams):
        for i, p in enumerate(pts):
            pc = p - cam[:3]                    # R = I
            u = (intr_gt[0] * pc[0] + intr_gt[2] * pc[2]) / pc[2]
            v = (intr_gt[1] * pc[1] + intr_gt[3] * pc[2]) / pc[2]
            g.add_edge("edge_project_p2mc_intrinsics", (1000 + i, c, 100),
                       np.array([u, v]), info)
    return g, intr_gt


class TestP2MCIntrinsics:
    def test_error_zero_at_exact_projection(self):
        point = jnp.asarray([0.5, 0.3, 2.0])
        cam = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 500, 500, 320, 240, 0.1],
                          dtype=jnp.float64)
        intr = jnp.asarray([500.0, 500.0, 320.0, 240.0, 0.1])
        meas = jnp.asarray([445.0, 315.0])
        err = _edge_p2mc_intrinsics_error((point, cam, intr), meas, ())
        np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-9)

    def test_jacobians_match_numeric(self):
        g, _ = _p2mc_intrinsics_scene(perturb_intrinsics=3.0)
        # unfix one cam + the points so all three slots get nonzero Jacobians
        g.set_fixed(1, False)
        for i in range(20):
            g.set_fixed(1000 + i, False)
        prob = g.compile(dtype=jnp.float64)
        worst = verify_jacobians(prob)
        for key, err in worst.items():
            assert err < 1e-4, (key, err)

    def test_recovers_intrinsics(self):
        g, intr_gt = _p2mc_intrinsics_scene(perturb_intrinsics=8.0)
        prob = g.compile(dtype=jnp.float64)
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        assert stats[-1]["chi2"] < 1e-10
        got = np.asarray(out.params["intrinsics"][0])
        np.testing.assert_allclose(got[:4], intr_gt[:4], atol=1e-5)
        # baseline entry is not optimized (tangent_dim 4)
        np.testing.assert_allclose(got[4], intr_gt[4])

    def test_io_roundtrip(self):
        g, _ = _p2mc_intrinsics_scene()
        text = save_g2o(g)
        assert "EDGE_PROJECT_P2MC_INTRINSICS" in text
        assert "VERTEX_INTRINSICS" in text
        g2 = loads_g2o(text)
        assert g2.num_edges() == g.num_edges()
        e0, e1 = g.edges[0], g2.edges[0]
        np.testing.assert_allclose(e0.measurement, e1.measurement)
        assert e1.vertex_ids == list(e0.vertex_ids) or \
            tuple(e1.vertex_ids) == tuple(e0.vertex_ids)


class TestScaleDelta:
    def test_matches_scaled_kernel_for_scale_invariant_families(self):
        """ScaleDelta(delta) over a delta=1 kernel equals the kernel at delta
        for Huber/PseudoHuber/Cauchy (robust_kernel_impl.cpp:50-63 algebra)."""
        e2 = jnp.asarray(np.linspace(0.01, 60.0, 200))
        delta = jnp.full_like(e2, 2.5)
        for name in ("Huber", "PseudoHuber", "Cauchy"):
            direct = robust.robustify(robust.kernel_id(name), e2, delta)
            scaled = robust.robustify(
                robust.kernel_id(f"ScaleDelta:{name}"), e2, delta)
            for a, b in zip(direct, scaled):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-9)

    def test_registered_and_usable_in_graph(self):
        assert "ScaleDelta:Saturated" in robust.kernel_names()
        g = Graph()
        g.add_vertex(0, "se2", np.zeros(3), fixed=True)
        g.add_vertex(1, "se2", np.array([1.1, 0.05, 0.02]))
        g.add_edge("edge_se2", (0, 1), np.array([1.0, 0.0, 0.0]), np.eye(3),
                   kernel="ScaleDelta:Huber", kernel_delta=1.0)
        prob = g.compile(dtype=jnp.float64)
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=5)
        assert stats[-1]["chi2"] < 1e-8


class TestOdometryCost:
    def _chain_with_shortcut(self):
        """0-1-2-3 odometry chain plus a WRONG (0,3) loop-closure edge; the
        plain edge-count guess reaches 3 in one hop through the bad edge, the
        odometry cost must follow the chain."""
        g = Graph()
        gt = [np.array([float(i), 0.0, 0.0]) for i in range(4)]
        g.add_vertex(0, "se2", gt[0], fixed=True)
        for i in range(1, 4):
            g.add_vertex(i, "se2", np.zeros(3))
        step = np.array([1.0, 0.0, 0.0])
        info = np.eye(3)
        for i in range(3):
            g.add_edge("edge_se2", (i, i + 1), step, info)
        bogus = np.array([0.0, 5.0, 1.0])       # NOT the true relative pose
        g.add_edge("edge_se2", (0, 3), bogus, info)
        return g, gt, bogus

    def test_odometry_cost_follows_chain(self):
        g, gt, _ = self._chain_with_shortcut()
        n = spanning_tree_initial_guess(g, cost_fn=odometry_cost)
        assert n == 3
        np.testing.assert_allclose(g.vertices[3].params, gt[3], atol=1e-12)

    def test_default_cost_takes_shortcut(self):
        g, gt, bogus = self._chain_with_shortcut()
        spanning_tree_initial_guess(g)
        # one hop through the bogus edge -> initialized at the bogus pose
        np.testing.assert_allclose(
            g.vertices[3].params,
            np_lie.se2_compose(gt[0], bogus), atol=1e-12)

    def test_non_binary_and_non_consecutive_cost_infinite(self):
        g, _, _ = self._chain_with_shortcut()
        assert odometry_cost(g.edges[0]) == 1.0
        assert odometry_cost(g.edges[3]) == np.inf
