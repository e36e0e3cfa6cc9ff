"""Simulator tests: generated graphs are consistent fixtures that the
optimizer recovers ground truth from (the reference's simulator-as-fixture
test strategy, SURVEY §4.3)."""
import numpy as np
import pytest

from openslam_g2o_tpu.apps.simulator import Simulator2D, Simulator3D, create_sphere
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import (
    LevenbergMarquardt, LevenbergMarquardtPCG, optimize, TerminateCriterion)
from openslam_g2o_tpu.io.g2o_format import loads_g2o, save_g2o


def ate_rmse(est_xy, gt_xy):
    return float(np.sqrt(np.mean(np.sum((est_xy - gt_xy) ** 2, axis=1))))


class TestSimulator2D:
    def test_optimizer_recovers_ground_truth(self):
        sim = Simulator2D(seed=2, n_landmarks=60)
        g, gt = sim.simulate(150)
        prob = g.compile()
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15,
                              terminate=TerminateCriterion())
        assert stats[-1]["chi2"] < chi0
        est = np.asarray(out.params["se2"])
        noisy_ate = ate_rmse(np.asarray(prob.params["se2"])[:, :2], gt[:, :2])
        opt_ate = ate_rmse(est[:, :2], gt[:, :2])
        # optimization must beat dead-reckoning; the residual is the
        # information-theoretic floor (gauge anchored only at pose 0)
        assert opt_ate < 0.85 * noisy_ate

    def test_bearing_only(self):
        sim = Simulator2D(seed=4, n_landmarks=80)
        g, gt = sim.simulate(120, bearing_only=True)
        assert any(e.etype.name == "edge_se2_xy_bearing" for e in g.edges)
        prob = g.compile()
        _, stats = optimize(prob, LevenbergMarquardt(), iterations=10)
        assert stats[-1]["chi2"] < float(P.chi2(prob))

    def test_roundtrip_g2o(self):
        g, _ = Simulator2D(seed=5).simulate(50)
        g2 = loads_g2o(save_g2o(g))
        assert g2.num_vertices() == g.num_vertices()
        assert g2.num_edges() == g.num_edges()
        np.testing.assert_allclose(float(P.chi2(g2.compile())),
                                   float(P.chi2(g.compile())), rtol=1e-12)


class TestSimulator3D:
    def test_optimizer_recovers_ground_truth(self):
        sim = Simulator3D(seed=3, n_landmarks=120)
        g, gt = sim.simulate(80)
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        est = np.asarray(out.params["se3"])
        noisy_ate = ate_rmse(np.asarray(prob.params["se3"])[:, :3], gt[:, :3])
        opt_ate = ate_rmse(est[:, :3], gt[:, :3])
        assert opt_ate < 0.6 * noisy_ate


class TestSphere:
    def test_sphere_converges(self):
        g, gt = create_sphere(n_laps=8, n_per_lap=25, radius=20.0, seed=1)
        prob = g.compile()
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, LevenbergMarquardtPCG(pcg_iters=100),
                              iterations=15)
        assert stats[-1]["chi2"] < 0.2 * chi0


class TestSyntheticPoseGraph2D:
    def test_builds_fast_and_converges_to_noise_floor(self):
        """The 100k-pose bench generator at test scale: vectorized build,
        LM-PCG reaches the computable noise floor (the convergence gate
        shapes without a recorded reference minimum use, BASELINE.md)."""
        import jax.numpy as jnp
        from openslam_g2o_tpu.apps.simulator import synthetic_pose_graph_2d
        from openslam_g2o_tpu.core.sparse import build_ell_pattern
        from openslam_g2o_tpu.core.algorithms import (
            _lambda_init_pcg, lm_pcg_optimize_fused)

        prob, info = synthetic_pose_graph_2d(n_poses=2000, grid=20,
                                             dtype=jnp.float32)
        assert info["n_edges"] > 2000
        chi0 = float(P.robust_chi2(prob))
        assert chi0 > 10 * info["noise_floor_chi2"]   # init is genuinely bad
        pattern = build_ell_pattern(prob)
        lam = _lambda_init_pcg(prob, pattern, prob.params,
                               jnp.asarray(1e-5, prob.dtype))
        st = (prob.params, lam, jnp.asarray(2.0, prob.dtype),
              P.robust_chi2(prob))
        for _ in range(4):
            out = lm_pcg_optimize_fused(prob, pattern, *st, n_iters=10,
                                        pcg_iters=100, pcg_tol=0.15)
            st = out[:4]
        assert float(st[3]) <= info["noise_floor_chi2"] * 1.02

    def test_init_integrates_odometry_exactly(self):
        """The noisy init integrates the noisy odometry chain, so with no
        closures every odometry residual is identically zero — an exact
        invariant of the generator regardless of noise level."""
        import jax.numpy as jnp
        from openslam_g2o_tpu.apps.simulator import synthetic_pose_graph_2d
        prob, info = synthetic_pose_graph_2d(n_poses=500, grid=10,
                                             closure_prob=0.0,
                                             dtype=jnp.float64)
        assert float(P.chi2(prob)) < 1e-6
