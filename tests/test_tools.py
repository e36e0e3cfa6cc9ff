"""Graph tool apps: convert_sba_slam3d (examples/data_convert) and unfold
(examples/g2o_unfold)."""
import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.apps.convert import convert_sba_slam3d
from openslam_g2o_tpu.apps.unfold import (
    edge_chi2_per_graph_edge, unfold, unfold_region)
from openslam_g2o_tpu.utils import np_lie


def _stereo_sba_graph(rng, n_cams=3, n_points=12):
    fx, fy, cx, cy, b = 500.0, 500.0, 320.0, 240.0, 0.12
    g = Graph()
    pts = rng.uniform(-1, 1, (n_points, 3)) + np.array([0, 0, 5.0])
    for i in range(n_cams):
        t = np.array([i * 0.3, 0, 0])
        # VertexCam stores world-to-image via (t, q) of the camera pose
        g.add_vertex(i, "cam",
                     np.concatenate([t, [0, 0, 0, 1], [fx, fy, cx, cy, b]]),
                     fixed=(i == 0))
    for j, pt in enumerate(pts):
        g.add_vertex(100 + j, "sba_point_xyz", pt, marginalized=True)
        for i in range(n_cams):
            pc = pt - np.array([i * 0.3, 0, 0])
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            ur = fx * (pc[0] - b) / pc[2] + cx
            g.add_edge("edge_project_p2sc", (100 + j, i),
                       [u, v, ur], np.eye(3))
    return g, (fx, fy, cx, cy, b)


class TestConvertSbaSlam3d:
    def test_structure_and_measurement_mapping(self):
        rng = np.random.default_rng(0)
        g, (fx, fy, cx, cy, b) = _stereo_sba_graph(rng)
        out = convert_sba_slam3d(g)
        assert len(out.vertices) == len(g.vertices)
        assert len(out.edges) == len(g.edges)
        assert 0 in out.parameters
        pt, val = out.parameters[0]
        assert pt.name == "camera_calib"
        np.testing.assert_allclose(val[7:], [fx, fy, cx, cy])
        # vertex types swapped, estimates preserved
        assert out.vertices[0].vtype.name == "se3"
        assert out.vertices[100].vtype.name == "point_xyz"
        np.testing.assert_allclose(out.vertices[100].params,
                                   g.vertices[100].params)
        # disparity = (u - u_right) / (fx * baseline)
        e_in, e_out = g.edges[0], out.edges[0]
        assert e_out.etype.name == "edge_se3_disparity"
        assert e_out.vertex_ids == (e_in.vertex_ids[1], e_in.vertex_ids[0])
        u, v, ur = e_in.measurement
        np.testing.assert_allclose(
            e_out.measurement, [u, v, (u - ur) / (fx * b)], rtol=1e-12)

    def test_converted_graph_is_consistent(self):
        """Noiseless input -> the converted slam3d disparity graph has ~zero
        chi2 at the mapped estimates (geometry survives the conversion)."""
        rng = np.random.default_rng(1)
        g, _ = _stereo_sba_graph(rng)
        out = convert_sba_slam3d(g)
        chi = float(P.chi2(out.compile()))
        assert chi < 1e-10, chi


def _noisy_ring(rng, n=30, bad=17):
    g = Graph()
    info = np.diag([100.0, 100.0, 400.0])
    gt, pose = [], np.zeros(3)
    step = np.array([1.0, 0.0, 2 * np.pi / n])
    for i in range(n):
        gt.append(pose.copy())
        pose = np_lie.se2_compose(pose, step)
    for i, p in enumerate(gt):
        est = p.copy()
        if i == bad:
            est += np.array([1.5, -1.0, 0.6])   # corrupted estimate
        g.add_vertex(i, "se2", est, fixed=(i == 0))
    for i in range(n):
        j = (i + 1) % n
        z = np_lie.se2_compose(np_lie.se2_inverse(gt[i]), gt[j])
        g.add_edge("edge_se2", (i, j), z, info)
    return g, bad


class TestUnfold:
    def test_region_grows_around_worst_edge(self):
        rng = np.random.default_rng(2)
        g, bad = _noisy_ring(rng)
        chi2s = edge_chi2_per_graph_edge(g)
        worst = int(np.argmax(chi2s))
        assert bad in g.edges[worst].vertex_ids
        selected, border = unfold_region(g, worst, max_cost=1.0, chi2s=chi2s)
        assert worst in selected
        # only the two edges incident to the corrupted vertex are high-error
        assert all(bad in g.edges[i].vertex_ids for i in selected)
        assert border  # the healthy ring forms the border

    def test_unfold_reduces_chi2(self):
        rng = np.random.default_rng(3)
        g, _ = _noisy_ring(rng)
        chi0 = float(P.chi2(g.compile()))
        n = unfold(g, max_cost=1.0, iterations=10)
        assert n == 1
        chi1 = float(P.chi2(g.compile()))
        assert chi1 < chi0 * 1e-3, (chi0, chi1)


class TestActionRegistry:
    """Per-element typed actions (hyper_graph_action.h:137-205 analogue)."""

    def test_draw_dispatch_and_custom_registration(self):
        import numpy as np
        from openslam_g2o_tpu.core import actions as A
        from openslam_g2o_tpu.core.graph import Graph
        g = Graph()
        g.add_vertex(0, "se2", np.zeros(3), fixed=True)
        g.add_vertex(1, "se2", np.array([1.0, 0, 0]))
        g.add_edge("edge_se2", (0, 1), np.array([1.0, 0, 0]), np.eye(3))
        prims = A.apply_action(g, A.DRAW, edges=False)
        assert [p[0] for p in prims] == ["pose2", "pose2"]
        # custom handler registration extends dispatch (G2O_REGISTER_ACTION)
        calls = []
        A.register_action("myaction", "edge_se2",
                          lambda gr, e, p: calls.append(e.vertex_ids))
        A.apply_action(g, "myaction", vertices=False)
        assert calls == [(0, 1)]
        del A._LIBRARY["myaction"]

    def test_gnuplot_through_registry(self, tmp_path):
        import numpy as np
        from openslam_g2o_tpu.apps.viewer import write_gnuplot
        from openslam_g2o_tpu.core.graph import Graph
        g = Graph()
        g.add_vertex(0, "se2", np.zeros(3), fixed=True)
        g.add_vertex(1, "se2", np.array([1.0, 2.0, 0]))
        g.add_edge("edge_se2", (0, 1), np.array([1.0, 2.0, 0]), np.eye(3))
        out = tmp_path / "dump.gnuplot"
        write_gnuplot(g, str(out))
        lines = out.read_text().strip().splitlines()
        assert lines[0].split() == ["0.0", "0.0"]
        assert lines[1].split() == ["1.0", "2.0"]
