"""ATE RMSE / Umeyama alignment tests (BASELINE.md metric line)."""
import numpy as np
import jax.numpy as jnp

from openslam_g2o_tpu.utils.ate import (
    ate_rmse, positions_from_graph, umeyama_alignment)

rng = np.random.default_rng(3)


def _rand_rot(d):
    A = rng.normal(size=(d, d))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, -1] *= -1
    return Q


class TestUmeyama:
    def test_exact_recovery_rigid(self):
        for d in (2, 3):
            X = rng.normal(size=(50, d))
            R_gt = _rand_rot(d)
            t_gt = rng.normal(size=d)
            Y = (R_gt @ X.T).T + t_gt
            s, R, t = umeyama_alignment(X, Y)
            assert s == 1.0
            np.testing.assert_allclose(R, R_gt, atol=1e-10)
            np.testing.assert_allclose(t, t_gt, atol=1e-10)

    def test_exact_recovery_with_scale(self):
        X = rng.normal(size=(40, 3))
        R_gt = _rand_rot(3)
        Y = 2.7 * (R_gt @ X.T).T + np.array([1.0, -2.0, 0.5])
        s, R, t = umeyama_alignment(X, Y, with_scale=True)
        np.testing.assert_allclose(s, 2.7, atol=1e-10)
        np.testing.assert_allclose(R, R_gt, atol=1e-10)

    def test_reflection_guard(self):
        # planar (rank-2) 3D points must still return a proper rotation
        X = rng.normal(size=(30, 3))
        X[:, 2] = 0.0
        Y = (_rand_rot(3) @ X.T).T
        _, R, _ = umeyama_alignment(X, Y)
        assert np.linalg.det(R) > 0.99


class TestAteRmse:
    def test_zero_for_gauge_shifted_trajectory(self):
        gt = rng.normal(size=(100, 3))
        est = ((_rand_rot(3) @ gt.T).T + np.array([5.0, 1.0, -3.0]))
        assert ate_rmse(est, gt) < 1e-10

    def test_reports_residual_noise(self):
        gt = rng.normal(size=(500, 2)) * 10
        est = gt + rng.normal(0, 0.1, size=gt.shape)
        r = ate_rmse(est, gt)
        assert 0.08 < r < 0.18

    def test_end_to_end_on_simulated_graph(self):
        from openslam_g2o_tpu.apps.simulator import Simulator2D
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
        from openslam_g2o_tpu.core.problem import write_back

        sim = Simulator2D(seed=4)
        g, gt = sim.simulate(60, landmark_obs=False)
        before = ate_rmse(positions_from_graph(g), gt[:, :2])
        prob = g.compile(dtype=jnp.float64)
        out, _ = optimize(prob, LevenbergMarquardt(), iterations=10)
        write_back(out, g)
        after = ate_rmse(positions_from_graph(g), gt[:, :2])
        assert after <= before
        assert after < 0.5
