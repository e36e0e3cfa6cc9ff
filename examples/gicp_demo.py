"""gicp_demo: pose-pose alignment from matched 3D points (GICP edges).

Parity with g2o/examples/icp/gicp_demo.cpp: two SE3 poses observing the
same random point cloud; Edge_V_V_GICP point-to-point edges (and the
plane-to-plane variant) recover the relative transform.

    python examples/gicp_demo.py
"""
import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.utils import np_lie


def run(edge_type, rng, n_points=100, noise=0.01):
    # truth: pose0 at identity, pose1 displaced (gicp_demo.cpp:70-90)
    t1_true = np.array([0.3, -0.2, 0.1, 0.06, -0.04, 0.05, 1.0])
    t1_true[3:] /= np.linalg.norm(t1_true[3:])
    pts = rng.uniform(-2, 2, (n_points, 3)) + np.array([0, 0, 5.0])

    g = Graph()
    g.add_vertex(0, "se3", np.array([0, 0, 0, 0, 0, 0, 1.0]),
                 fixed=True)
    # perturbed initial guess for pose 1
    g.add_vertex(1, "se3", np.array([0.1, 0.1, -0.1, 0, 0, 0, 1.0]))
    info = np.eye(3) * 1e4
    for p in pts:
        # p0: point seen in frame 0; p1: the SAME physical point expressed
        # in frame 1 = T1^-1 p (+ sensor noise); normals point up
        p0 = p + rng.normal(0, noise, 3)
        p1 = np_lie.se3_apply(np_lie.se3_inverse(t1_true), p) \
            + rng.normal(0, noise, 3)
        n0 = n1 = np.array([0.0, 0.0, 1.0])
        g.add_edge(edge_type, (0, 1),
                   np.concatenate([p0, n0, p1, n1]), info)
    out, stats = optimize(g.compile(), LevenbergMarquardt(), iterations=10)
    est = np.asarray(out.params["se3"][1])
    dt = np.linalg.norm(est[:3] - t1_true[:3])
    dq = min(np.linalg.norm(est[3:] - t1_true[3:]),
             np.linalg.norm(est[3:] + t1_true[3:]))
    print(f"{edge_type}: |t err| {dt:.5f}, |q err| {dq:.5f}, "
          f"chi2 {stats[-1]['chi2']:.4f}")
    return dt, dq


def main():
    rng = np.random.default_rng(9)
    run("edge_gicp", rng)
    run("edge_gicp_plane", rng)


if __name__ == "__main__":
    main()
