"""Tests for the sim3, sclam2d, and icp model libraries."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.io.g2o_format import loads_g2o, save_g2o
from openslam_g2o_tpu.models import sim3 as sim3_model
from openslam_g2o_tpu.models.sclam2d import velocity_to_motion
from openslam_g2o_tpu.ops import lie
from openslam_g2o_tpu.utils import np_lie

rng = np.random.default_rng(21)


def rand_sim3_params(n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.uniform(-2, 2, size=(n, 3))
    s = np.exp(rng.uniform(-0.3, 0.3, size=(n, 1)))
    return np.concatenate([t, q, s], axis=1)


class TestSim3:
    def test_edge_error_zero_at_consistent_configuration(self):
        s1 = jnp.asarray(np.concatenate([rand_sim3_params(1)[0], [500, 500, 320, 240]]))
        s2 = jnp.asarray(np.concatenate([rand_sim3_params(1)[0], [500, 500, 320, 240]]))
        # error = log(Z * S1 * S2^-1) -> zero iff Z = S2 * S1^-1
        z = lie.sim3_compose(s2[:8], lie.sim3_inverse(s1[:8]))
        err = sim3_model._edge_sim3_error((s1, s2), z, ())
        np.testing.assert_allclose(err, 0.0, atol=1e-9)

    def test_vertex_file_roundtrip(self):
        v = np.concatenate([rng.uniform(-0.5, 0.5, 7), [450, 460, 320, 240]])
        params = sim3_model._vertex_sim3_from_file(v)
        v2 = sim3_model._vertex_sim3_to_file(params)
        np.testing.assert_allclose(v, v2, atol=1e-8)

    def test_pose_graph_converges(self):
        n = 8
        g = Graph()
        gt = []
        cur = np.asarray(lie.sim3_identity(jnp.float64))
        step = np.asarray(lie.sim3_exp(jnp.asarray([0.05, 0.1, -0.02, 0.5, 0.1, 0, 0.02])))
        for i in range(n):
            gt.append(cur.copy())
            cur = np.asarray(lie.sim3_compose(jnp.asarray(cur), jnp.asarray(step)))
        info = np.eye(7) * 100
        for i, p in enumerate(gt):
            full = np.concatenate([p, [500, 500, 320, 240]])
            if i == 0:
                g.add_vertex(i, "sim3", full, fixed=True)
            else:
                noisyp = np.asarray(lie.sim3_compose(
                    lie.sim3_exp(jnp.asarray(rng.normal(0, 0.03, 7))),
                    jnp.asarray(p)))
                g.add_vertex(i, "sim3", np.concatenate([noisyp, [500, 500, 320, 240]]))
        for i in range(n - 1):
            # measurement for error log(Z S1 S2^-1): Z = S_{i+1} S_i^-1
            z = np.asarray(lie.sim3_compose(jnp.asarray(gt[i + 1]),
                                            lie.sim3_inverse(jnp.asarray(gt[i]))))
            g.add_edge("edge_sim3", (i, i + 1), z, info)
        z = np.asarray(lie.sim3_compose(jnp.asarray(gt[0]),
                                        lie.sim3_inverse(jnp.asarray(gt[-1]))))
        g.add_edge("edge_sim3", (n - 1, 0), z, info)
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=20)
        assert stats[-1]["chi2"] < 1e-9


class TestSclam2d:
    def test_velocity_to_motion_straight(self):
        m = velocity_to_motion(jnp.asarray(1.0), jnp.asarray(1.0),
                               jnp.asarray(2.0), jnp.asarray(0.5))
        np.testing.assert_allclose(m, [2.0, 0.0, 0.0], atol=1e-12)

    def test_velocity_to_motion_turn_matches_reference_formula(self):
        vl, vr, dt, l = 0.8, 1.2, 1.0, 0.5
        m = np.asarray(velocity_to_motion(jnp.asarray(vl), jnp.asarray(vr),
                                          jnp.asarray(dt), jnp.asarray(l)))
        R = l * 0.5 * (vl + vr) / (vr - vl)
        w = (vr - vl) / l
        theta = w * dt
        x = R * np.sin(theta)
        y = R * (1 - np.cos(theta))
        np.testing.assert_allclose(m, [x, y, theta], atol=1e-12)

    def test_differentiable_at_equal_velocities(self):
        f = lambda v: velocity_to_motion(v[0], v[1], jnp.asarray(1.0), jnp.asarray(0.5))
        J = jax.jacfwd(f)(jnp.asarray([1.0, 1.0]))
        assert np.all(np.isfinite(np.asarray(J)))

    def test_odom_calibration_recovers_params(self):
        """sclam workflow: known wheel radii scale factors recovered from
        odometry + ground-truth pose constraints (calibration_odom_laser)."""
        true_params = np.array([0.98, 1.03, 0.52])
        g = Graph()
        g.add_vertex(100, "odom_params", [1.0, 1.0, 0.5])
        info_pose = np.eye(3) * 1e6   # strong pose prior (known trajectory)
        info_odom = np.eye(3) * 100
        pose = np.zeros(3)
        g.add_vertex(0, "se2", pose, fixed=True)
        r = np.random.default_rng(5)
        for i in range(1, 40):
            vl, vr = r.uniform(0.5, 1.5), r.uniform(0.5, 1.5)
            dt = 0.5
            m = np.asarray(velocity_to_motion(
                jnp.asarray(vl * true_params[0]), jnp.asarray(vr * true_params[1]),
                jnp.asarray(dt), jnp.asarray(true_params[2])))
            new_pose = np_lie.se2_compose(pose, m)
            g.add_vertex(i, "se2", new_pose, fixed=True)  # gt known
            g.add_edge("edge_se2_odom_calib", (i - 1, i, 100), [vl, vr, dt],
                       info_odom)
            pose = new_pose
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=25)
        est = np.asarray(out.params["odom_params"][0])
        np.testing.assert_allclose(est, true_params, atol=1e-3)


class TestGicp:
    def _make_alignment(self, edge_type, n_points=30, noise=0.0):
        g = Graph()
        t0 = np.array([0, 0, 0, 0, 0, 0, 1.0])
        t1_gt = np.asarray(lie.se3_exp(jnp.asarray([0.2, -0.1, 0.15, 0.5, -0.3, 0.8])))
        g.add_vertex(0, "se3", t0, fixed=True)
        pert = np.asarray(lie.se3_compose(
            jnp.asarray(t1_gt), lie.se3_exp(jnp.asarray(rng.normal(0, 0.1, 6)))))
        g.add_vertex(1, "se3", pert)
        pts = rng.uniform(-3, 3, size=(n_points, 3))
        info = np.eye(3) * 100
        for p in pts:
            # pos0: point in frame 0; pos1: same point in frame 1
            pos0 = p
            pos1 = np_lie.se3_apply(np_lie.se3_inverse(t1_gt), p)
            normal = rng.normal(size=3)
            normal /= np.linalg.norm(normal)
            meas = np.concatenate([pos0, normal, pos1, normal])
            g.add_edge(edge_type, (0, 1), meas, info)
        return g, t1_gt

    def test_gicp_alignment(self):
        g, t1_gt = self._make_alignment("edge_gicp")
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        assert stats[-1]["chi2"] < 1e-10
        est = np.asarray(out.params["se3"][1])
        np.testing.assert_allclose(est[:3], t1_gt[:3], atol=1e-6)

    def test_gicp_plane_alignment(self):
        g, t1_gt = self._make_alignment("edge_gicp_plane")
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=20)
        est = np.asarray(out.params["se3"][1])
        np.testing.assert_allclose(est[:3], t1_gt[:3], atol=1e-5)
