"""OptimizableGraph API parity: verifyInformationMatrices, saveSubset,
addGraph."""
import numpy as np
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P


def chain(n=5, id0=0):
    g = Graph()
    info = np.diag([10.0, 10.0, 40.0])
    for i in range(n):
        g.add_vertex(id0 + i, "se2", [i, 0, 0], fixed=(i == 0))
    for i in range(n - 1):
        g.add_edge("edge_se2", (id0 + i, id0 + i + 1), [1, 0, 0], info)
    return g


class TestVerifyInformation:
    def test_valid_graph_passes(self):
        ok, bad = chain().verify_information_matrices()
        assert ok and not bad

    def test_asymmetric_detected(self):
        g = chain()
        g.edges[1].information[0, 1] = 5.0   # break symmetry
        ok, bad = g.verify_information_matrices()
        assert not ok and bad == [1]

    def test_indefinite_detected(self):
        g = chain()
        g.edges[2].information = np.diag([1.0, -1.0, 1.0])
        ok, bad = g.verify_information_matrices()
        assert not ok and 2 in bad


class TestSubset:
    def test_induced_subgraph(self):
        g = chain(6)
        s = g.subset([1, 2, 3])
        assert sorted(s.vertices) == [1, 2, 3]
        assert s.num_edges() == 2   # (1,2), (2,3)
        assert not s.vertices[1].fixed

    def test_subset_optimizable(self):
        g = chain(6)
        s = g.subset([0, 1, 2])
        prob = s.compile()
        assert np.isfinite(float(P.chi2(prob)))


class TestAddGraph:
    def test_merge_disjoint(self):
        a = chain(4, id0=0)
        b = chain(3, id0=100)
        a.add_graph(b)
        assert a.num_vertices() == 7
        assert a.num_edges() == 3 + 2

    def test_id_collision_raises(self):
        a = chain(3)
        b = chain(3)
        with pytest.raises(ValueError):
            a.add_graph(b)
