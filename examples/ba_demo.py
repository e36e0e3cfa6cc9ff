"""ba_demo: synthetic bundle adjustment with expmap cameras.

Parity with g2o/examples/ba/ba_demo.cpp — synthetic scene, noisy
observations, Schur-complement LM, with/without robust kernel. Run:

    python examples/ba_demo.py [--pixel-noise 1.0] [--outliers 0.0]
"""
import argparse

import numpy as np

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.core.ba_ell import LevenbergMarquardtSchurELL
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.utils import np_lie

FOCAL, CX, CY = 1000.0, 320.0, 240.0


def make_scene(pixel_noise, outlier_ratio, rng):
    g = Graph()
    g.add_parameter(0, "camera_parameters", [FOCAL, CX, CY, 0.1])
    true_points = np.stack([
        rng.uniform(-3, 3, 500),
        rng.uniform(-3, 3, 500),
        rng.uniform(4, 8, 500)], axis=1)
    poses = []
    for i in range(15):
        c2w = np.array([i * 0.25 - 1.75, 0, 0, 0, 0, 0, 1.0])
        w2c = np_lie.se3_inverse(c2w)
        poses.append(w2c)
        g.add_vertex(i, "se3_expmap", w2c, fixed=(i < 2))
    n_obs = 0
    added_ids = []
    for j, pt in enumerate(true_points):
        vid = 1000 + j
        added = False
        for i, w2c in enumerate(poses):
            pc = np_lie.se3_apply(w2c, pt)
            if pc[2] < 0.1:
                continue
            uv = pc[:2] / pc[2] * FOCAL + np.array([CX, CY])
            if not (0 <= uv[0] < 640 and 0 <= uv[1] < 480):
                continue
            if not added:
                g.add_vertex(vid, "sba_point_xyz", pt + rng.normal(0, 1.0, 3))
                added = True
                added_ids.append(j)
            z = uv + rng.normal(0, pixel_noise, 2)
            if rng.random() < outlier_ratio:
                z = rng.uniform(0, [640, 480])
            g.add_edge("edge_project_xyz2uv", (vid, i), z, np.eye(2),
                       param_ids=[0])
            n_obs += 1
    return g, true_points[added_ids], n_obs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixel-noise", type=float, default=1.0)
    ap.add_argument("--outliers", type=float, default=0.0)
    ap.add_argument("--robust", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(7)

    g, true_points, n_obs = make_scene(args.pixel_noise, args.outliers, rng)
    if args.robust:
        g.set_robust_kernel("Huber", 1.0)
    print(f"{g.num_vertices()} vertices, {n_obs} observations")

    prob = g.compile()
    print(f"initial chi2 = {float(P.chi2(prob)):.2f}")
    out, stats = optimize(prob, LevenbergMarquardtSchurELL(), iterations=10,
                          verbose=True)

    pts = np.asarray(out.params["sba_point_xyz"])
    err = np.linalg.norm(pts - true_points, axis=1)
    print(f"point RMSE after BA: {np.sqrt((err ** 2).mean()):.4f}")


if __name__ == "__main__":
    main()
