"""Legacy DEPRECATED_* tag support."""
import numpy as np

from openslam_g2o_tpu.io.g2o_format import loads_g2o


def test_deprecated_tags_load_as_modern_types():
    text = (
        "DEPRECATED_VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
        "DEPRECATED_VERTEX_SE3:QUAT 1 1 0 0 0 0 0 1\n"
        "DEPRECATED_EDGE_SE3:QUAT 0 1 1 0 0 0 0 0 1 "
        + " ".join("1" if i in (0, 6, 11, 15, 18, 20) else "0"
                   for i in range(21)) + "\n"
        "DEPRECATED_VERTEX_TRACKXYZ 5 1 2 3\n")
    g = loads_g2o(text)
    assert g.num_vertices() == 3
    assert g.vertices[0].vtype.name == "se3"
    assert g.vertices[5].vtype.name == "point_xyz"
    assert g.edges[0].etype.name == "edge_se3"
    np.testing.assert_allclose(g.vertices[5].params, [1, 2, 3])
