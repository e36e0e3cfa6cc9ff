"""Jacobian sweep: AD-vs-numeric agreement for EVERY model family
(the test_slam3d_jacobian.cpp methodology, applied across the registry)."""
import numpy as np
import pytest

from openslam_g2o_tpu.utils.jacobian_check import verify_jacobians

TOL = 5e-5


def _check(graph, tol=TOL):
    prob = graph.compile()
    worst = verify_jacobians(prob)
    for key, err in worst.items():
        assert err < tol, f"{key}: jacobian mismatch {err}"
    return worst


class TestJacobianSweep:
    def test_slam2d(self):
        from tests.test_graph_problem import make_se2_chain
        g, _ = make_se2_chain(8, noise=0.2)
        _check(g)

    def test_slam2d_landmarks_and_bearing(self):
        import numpy as np
        from openslam_g2o_tpu.core.graph import Graph
        g = Graph()
        g.add_vertex(0, "se2", [0.1, -0.2, 0.4], fixed=True)
        g.add_vertex(1, "se2", [1.2, 0.3, -0.5])
        g.add_vertex(10, "point_xy", [2.0, 1.5])
        g.add_edge("edge_se2_xy", (1, 10), [0.9, 1.1], np.eye(2))
        g.add_edge("edge_se2_xy_bearing", (1, 10), [0.7], np.eye(1))
        g.add_edge("edge_se2_prior", (1,), [1.0, 0.2, -0.4], np.eye(3))
        _check(g)

    def test_slam3d(self):
        rng = np.random.default_rng(8)
        from openslam_g2o_tpu.core.graph import Graph
        from openslam_g2o_tpu.ops import lie
        import jax.numpy as jnp
        g = Graph()
        g.add_parameter(0, "se3_offset", [0.1, 0, 0.05, 0, 0, 0, 1])
        for i in range(3):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            g.add_vertex(i, "se3", np.concatenate([rng.normal(0, 1, 3), q]),
                         fixed=(i == 0))
        g.add_vertex(10, "point_xyz", [1.0, 2.0, 3.0])
        z = np.array([1, 0, 0, 0, 0, 0, 1.0])
        g.add_edge("edge_se3", (0, 1), z, np.eye(6))
        g.add_edge("edge_se3", (1, 2), z, np.eye(6))
        g.add_edge("edge_se3_xyz", (1, 10), [0.5, 0.5, 2.0], np.eye(3),
                   param_ids=[0])
        g.add_edge("edge_se3_prior", (1,), z, np.eye(6), param_ids=[0])
        _check(g)

    def test_sba_and_bal(self):
        from tests.test_ba import make_ba_scene
        g, _, _ = make_ba_scene(n_cams=4, n_points=10, pixel_noise=0.5)
        _check(g)

    def test_sba_stereo_analytic(self):
        """edge_project_xyz2uvu's analytic jacobian (the stereo fast path)
        against numeric differences."""
        from tests.test_ba import make_ba_scene
        import numpy as np
        g, pts, cams = make_ba_scene(n_cams=3, n_points=8, pixel_noise=0.3)
        # rebuild as a stereo graph: same geometry, uvu observations
        from openslam_g2o_tpu.core.graph import Graph
        from openslam_g2o_tpu.utils import np_lie
        g2 = Graph()
        g2.add_parameter(0, "camera_parameters", [500.0, 320.0, 240.0, 0.1])
        for i, c in enumerate(cams):
            g2.add_vertex(i, "se3_expmap", c, fixed=(i == 0))
        for j, p in enumerate(pts):
            g2.add_vertex(100 + j, "sba_point_xyz", p)
        rng = np.random.default_rng(7)
        for i, c in enumerate(cams):
            for j, p in enumerate(pts):
                pc = np_lie.se3_apply(c, p)
                if pc[2] <= 0.1:
                    continue
                u = pc[0] / pc[2] * 500.0 + 320.0
                v = pc[1] / pc[2] * 500.0 + 240.0
                ur = (pc[0] - 0.1) / pc[2] * 500.0 + 320.0
                g2.add_edge("edge_project_xyz2uvu", (100 + j, i),
                            [u, v, ur] + rng.normal(0, 0.3, 3),
                            np.eye(3), param_ids=[0])
        _check(g2)

    def test_sim3(self):
        # reuse the sim3 pose-graph construction from the type tests
        from tests.test_types_extra import TestSim3
        import jax.numpy as jnp
        from openslam_g2o_tpu.core.graph import Graph
        from openslam_g2o_tpu.ops import lie
        rng = np.random.default_rng(5)
        g = Graph()
        info = np.eye(7)
        p0 = np.asarray(lie.sim3_identity(jnp.float64))
        step = np.asarray(lie.sim3_exp(jnp.asarray([0.1, 0.2, -0.05, 0.4, 0.1, 0, 0.05])))
        p1 = np.asarray(lie.sim3_compose(jnp.asarray(p0), jnp.asarray(step)))
        intr = [500, 500, 320, 240]
        g.add_vertex(0, "sim3", np.concatenate([p0, intr]), fixed=True)
        g.add_vertex(1, "sim3", np.concatenate([p1, intr]))
        z = np.asarray(lie.sim3_compose(jnp.asarray(p1),
                                        lie.sim3_inverse(jnp.asarray(p0))))
        g.add_edge("edge_sim3", (0, 1), z, info)
        _check(g, tol=2e-4)

    def test_sclam2d(self):
        from openslam_g2o_tpu.core.graph import Graph
        g = Graph()
        g.add_vertex(0, "se2", [0, 0, 0], fixed=True)
        g.add_vertex(1, "se2", [1, 0.1, 0.2])
        g.add_vertex(2, "se2", [0.1, 0.05, 0.02])   # laser offset vertex
        g.add_vertex(100, "odom_params", [0.98, 1.02, 0.5])
        g.add_edge("edge_se2_sensor_calib", (0, 1, 2), [1, 0, 0.1], np.eye(3))
        g.add_edge("edge_se2_odom_calib", (0, 1, 100), [1.0, 1.1, 0.5],
                   np.eye(3))
        _check(g)

    def test_icp(self):
        from tests.test_types_extra import TestGicp
        t = TestGicp()
        g, _ = t._make_alignment("edge_gicp", n_points=10)
        _check(g)
        g, _ = t._make_alignment("edge_gicp_plane", n_points=10)
        _check(g)
