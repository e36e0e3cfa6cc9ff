"""simple_optimize: minimal load -> optimize -> save loop.

Parity with g2o/examples/simple_optimize/simple_optimize.cpp:98. Run:

    python examples/simple_optimize.py input.g2o output.g2o
"""
import sys

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.factory import construct_algorithm
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.io.g2o_format import load_g2o, save_g2o


def main():
    if len(sys.argv) < 3:
        print("usage: simple_optimize.py input.g2o output.g2o")
        return 1
    graph = load_g2o(sys.argv[1])
    if graph.gauge_freedom():
        graph.set_fixed(graph.find_gauge(), True)
    prob = graph.compile()
    algorithm = construct_algorithm("lm_var").make()
    out, stats = optimize(prob, algorithm, iterations=10, verbose=True)
    P.write_back(out, graph)
    save_g2o(graph, sys.argv[2])
    return 0


if __name__ == "__main__":
    sys.exit(main())
