"""Dual-ELL (scatter-free) Schur solver tests."""
import numpy as np
import pytest

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.core.ba import LevenbergMarquardtSchur
from openslam_g2o_tpu.core.ba_ell import (
    LevenbergMarquardtSchurELL, build_ba_ell_pattern)


class TestDualEll:
    def test_converges_to_same_minimum_as_general_schur(self):
        from tests.test_ba import make_ba_scene
        g, _, _ = make_ba_scene(n_cams=6, n_points=50, pixel_noise=0.3)
        prob = g.compile()
        _, s1 = optimize(prob, LevenbergMarquardtSchur(), iterations=8)
        _, s2 = optimize(prob, LevenbergMarquardtSchurELL(), iterations=8)
        np.testing.assert_allclose(s2[-1]["chi2"], s1[-1]["chi2"], rtol=1e-6)

    def test_pattern_tables_cover_all_edges(self):
        from tests.test_ba import make_ba_scene
        g, _, _ = make_ba_scene(n_cams=5, n_points=30)
        prob = g.compile()
        pat = build_ba_ell_pattern(prob)
        (pg,) = pat.proj
        E = prob.edges[pg.egkey].measurement.shape[0]
        assert float(pg.lm_mask.sum()) == E
        assert float(pg.cam_mask.sum()) == E
        # every edge id appears exactly once per table
        lm_ids = np.asarray(pg.lm_edge_idx)[np.asarray(pg.lm_mask) > 0]
        cam_ids = np.asarray(pg.cam_edge_idx)[np.asarray(pg.cam_mask) > 0]
        assert sorted(lm_ids.tolist()) == list(range(E))
        assert sorted(cam_ids.tolist()) == list(range(E))

    def test_with_pose_pose_edges(self):
        """Camera odometry edges go through the dense-extra path."""
        from tests.test_ba import make_ba_scene
        import jax.numpy as jnp
        from openslam_g2o_tpu.ops import lie
        from openslam_g2o_tpu.utils import np_lie
        g, _, cams = make_ba_scene(n_cams=6, n_points=40, pixel_noise=0.2)
        info = np.eye(6) * 1000
        for i in range(5):
            z = np_lie.se3_compose(cams[i + 1], np_lie.se3_inverse(cams[i]))
            # EdgeSE3Expmap: log(T2^-1 Z T1) with T world-to-cam
            g.add_edge("edge_se3_expmap", (i, i + 1), z, info)
        prob = g.compile()
        _, s1 = optimize(prob, LevenbergMarquardtSchur(), iterations=8)
        _, s2 = optimize(prob, LevenbergMarquardtSchurELL(), iterations=8)
        np.testing.assert_allclose(s2[-1]["chi2"], s1[-1]["chi2"],
                                   rtol=1e-5, atol=1e-6)

    def test_rejects_multi_landmark_edges(self):
        from openslam_g2o_tpu.core.graph import Graph
        g = Graph()
        g.add_vertex(0, "se2", [0, 0, 0], fixed=True)
        g.add_vertex(1, "point_xy", [1, 1])
        g.add_vertex(2, "se2", [1, 0, 0])
        g.add_edge("edge_se2_xy_calib", (0, 1, 2), [1, 1], np.eye(2))
        with pytest.raises(ValueError):
            build_ba_ell_pattern(g.compile())
