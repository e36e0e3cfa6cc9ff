"""structure_only, slam2d_linear, and HyperDijkstra tests."""
import numpy as np
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import GaussNewton, optimize
from openslam_g2o_tpu.core.hyper_dijkstra import (
    connected_components, connected_subset, shortest_paths)
from openslam_g2o_tpu.core.special_solvers import (
    solve_orientation_linear, structure_only_optimize)
from openslam_g2o_tpu.utils import np_lie


class TestHyperDijkstra:
    def _chain(self, n=6):
        g = Graph()
        info = np.eye(3)
        for i in range(n):
            g.add_vertex(i, "se2", [i, 0, 0])
        for i in range(n - 1):
            g.add_edge("edge_se2", (i, i + 1), [1, 0, 0], info)
        return g

    def test_shortest_paths_distances(self):
        g = self._chain()
        d = shortest_paths(g, 0)
        assert d[0][0] == 0 and d[5][0] == 5
        assert d[3][1] == 2  # parent

    def test_connected_components(self):
        g = self._chain()
        g.add_vertex(100, "se2", [0, 0, 0])  # isolated
        comps = connected_components(g)
        assert len(comps) == 2
        assert len(comps[0]) == 6 and comps[1] == {100}

    def test_connected_subset(self):
        g = self._chain()
        assert connected_subset(g, 2) == set(range(6))


class TestStructureOnly:
    def test_landmarks_refined_poses_untouched(self):
        from tests.test_ba import make_ba_scene
        g, gt_points, _ = make_ba_scene(n_cams=5, n_points=25, pixel_noise=0.0)
        prob = g.compile()
        poses_before = np.asarray(prob.params["se3_expmap"]).copy()
        out, stats = structure_only_optimize(prob, iterations=10)
        poses_after = np.asarray(out.params["se3_expmap"])
        np.testing.assert_allclose(poses_after, poses_before, atol=0)
        pts = np.asarray(out.params["sba_point_xyz"])
        # with the (noisy) poses frozen, landmarks converge to the
        # structure-only optimum: a large (but bounded — the frozen pose
        # error remains) chi2 reduction
        assert stats[-1]["chi2"] < 0.25 * float(P.chi2(prob))
        assert np.any(pts != np.asarray(prob.params["sba_point_xyz"]))


class TestSlam2DLinear:
    def test_orientation_recovery(self):
        """Poses with badly wrong orientations: the linear init recovers the
        angles, then GN converges where plain GN from the bad init may not."""
        rng = np.random.default_rng(9)
        n = 30
        g = Graph()
        info = np.diag([100.0, 100.0, 400.0])
        gt = []
        pose = np.zeros(3)
        for i in range(n):
            gt.append(pose.copy())
            pose = np_lie.se2_compose(pose, np.array([1.0, 0, 2 * np.pi / n]))
        for i, p in enumerate(gt):
            # terrible initial orientations
            bad = p + np.array([0, 0, rng.uniform(-np.pi, np.pi)])
            g.add_vertex(i, "se2", bad if i else p, fixed=(i == 0))
        for i in range(n - 1):
            z = np_lie.se2_compose(np_lie.se2_inverse(gt[i]), gt[i + 1])
            g.add_edge("edge_se2", (i, i + 1), z, info)
        z = np_lie.se2_compose(np_lie.se2_inverse(gt[-1]), gt[0])
        g.add_edge("edge_se2", (n - 1, 0), z, info)

        thetas = solve_orientation_linear(g)
        # orientations now match ground truth (up to wrap)
        for i in range(n):
            d = np_lie.normalize_angle(thetas[i] - gt[i][2])
            assert abs(d) < 1e-6
        prob = g.compile()
        out, stats = optimize(prob, GaussNewton(), iterations=10)
        assert stats[-1]["chi2"] < 1e-10

    def test_requires_single_fixed(self):
        g = Graph()
        g.add_vertex(0, "se2", [0, 0, 0])
        g.add_vertex(1, "se2", [1, 0, 0])
        g.add_edge("edge_se2", (0, 1), [1, 0, 0], np.eye(3))
        with pytest.raises(ValueError):
            solve_orientation_linear(g)
