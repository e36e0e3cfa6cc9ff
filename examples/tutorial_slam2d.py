"""tutorial_slam2d: self-contained 2D landmark SLAM.

Parity with g2o/examples/tutorial_slam2d/tutorial_slam2d.cpp:23-120 — build
the graph programmatically from a simulated world, optimize, report. Run:

    python examples/tutorial_slam2d.py
"""
import numpy as np

from openslam_g2o_tpu.apps.simulator import Simulator2D
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import GaussNewton, optimize
from openslam_g2o_tpu.io.g2o_format import save_g2o


def main():
    print("Simulating world ...")
    sim = Simulator2D(seed=42, n_landmarks=80, sensor_range=3.0)
    graph, gt = sim.simulate(n_poses=200)
    print(f"  {graph.num_vertices()} vertices, {graph.num_edges()} edges")

    print("Optimizing (Gauss-Newton) ...")
    prob = graph.compile()
    chi0 = float(P.chi2(prob))
    out, stats = optimize(prob, GaussNewton(), iterations=10, verbose=True)
    print(f"chi2: {chi0:.2f} -> {stats[-1]['chi2']:.2f}")

    P.write_back(out, graph)
    save_g2o(graph, "tutorial_after.g2o")
    print("saved tutorial_after.g2o")


if __name__ == "__main__":
    main()
