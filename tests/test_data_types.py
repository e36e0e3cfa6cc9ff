"""Data payload types: laser scans, tags, queue, and .g2o attachment."""
import numpy as np

from openslam_g2o_tpu.io.g2o_format import loads_g2o, save_g2o
from openslam_g2o_tpu.models.data import (
    DataQueue, RobotLaser, VertexTag, parse_data_line, format_data_line)


def _laser_line(n_beams=5):
    ranges = " ".join(str(1.0 + 0.1 * i) for i in range(n_beams))
    return (f"ROBOTLASER1 0 -1.5708 3.14159 0.0174533 30.0 0.1 0 {n_beams} "
            f"{ranges} 0 1.0 2.0 0.5 1.1 2.1 0.6 0.4 0.1 0.3 0.3 0.2 "
            f"1234.5 myhost 1234.6")


class TestRobotLaser:
    def test_parse_fields(self):
        toks = _laser_line().split()[1:]
        rl = parse_data_line("ROBOTLASER1", toks)
        assert isinstance(rl, RobotLaser)
        assert rl.params.beams == 5
        np.testing.assert_allclose(rl.ranges, [1.0, 1.1, 1.2, 1.3, 1.4])
        np.testing.assert_allclose(rl.laser_pose, [1.0, 2.0, 0.5])
        np.testing.assert_allclose(rl.odom_pose, [1.1, 2.1, 0.6])
        assert rl.hostname == "myhost"
        assert rl.timestamp == 1234.5

    def test_format_roundtrip(self):
        toks = _laser_line().split()[1:]
        rl = parse_data_line("ROBOTLASER1", toks)
        rl2 = parse_data_line("ROBOTLASER1", rl.format().split())
        np.testing.assert_allclose(rl2.ranges, rl.ranges)
        np.testing.assert_allclose(rl2.odom_pose, rl.odom_pose)

    def test_cartesian(self):
        toks = _laser_line().split()[1:]
        rl = parse_data_line("ROBOTLASER1", toks)
        pts = rl.cartesian()
        assert pts.shape == (5, 2)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), rl.ranges,
                                   atol=1e-9)


class TestAttachment:
    def test_attach_to_vertex_and_roundtrip(self):
        text = ("VERTEX_SE2 0 0 0 0\n" + _laser_line() + "\n"
                "VERTEX_SE2 1 1 0 0\n"
                "EDGE_SE2 0 1 1 0 0 1 0 0 1 0 1\n")
        g = loads_g2o(text)
        assert len(g.vertices[0].data) == 1
        assert len(g.vertices[1].data) == 0
        text2 = save_g2o(g)
        g2 = loads_g2o(text2)
        assert len(g2.vertices[0].data) == 1
        np.testing.assert_allclose(g2.vertices[0].data[0].ranges,
                                   g.vertices[0].data[0].ranges)


class TestDataQueue:
    def test_ordering_and_before(self):
        q = DataQueue()
        for ts in (3.0, 1.0, 2.0):
            t = VertexTag(name=f"t{ts}", timestamp=ts)
            q.add(t)
        assert [d.timestamp for d in q] == [1.0, 2.0, 3.0]
        assert q.before(2.5).timestamp == 2.0
        assert q.before(0.5) is None
