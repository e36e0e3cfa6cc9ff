"""sba_demo: bundle adjustment with SBACam vertices (mono + stereo).

Parity with g2o/examples/sba/sba_demo.cpp: VertexCam cameras (pose +
intrinsics baked into the vertex), VertexSBAPointXYZ points, monocular
EDGE_PROJECT_P2MC or stereo EDGE_PROJECT_P2SC projection edges.

    python examples/sba_demo.py [--stereo] [--pixel-noise 0.5]
"""
import argparse

import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.core.ba_ell import LevenbergMarquardtSchurELL

FX, FY, CX, CY, BASELINE = 500.0, 500.0, 320.0, 240.0, 0.075


def project(cam_t, pt):
    """World point through a camera at cam_t (identity rotation):
    SBACam w2i with K [R^T | -R^T t] (sbacam.h:120-159)."""
    pc = pt - cam_t
    u = FX * pc[0] / pc[2] + CX
    v = FY * pc[1] / pc[2] + CY
    ur = FX * (pc[0] - BASELINE) / pc[2] + CX
    return np.array([u, v]), np.array([u, v, ur]), pc[2]


def make_scene(rng, stereo, pixel_noise, n_cams=8, n_points=300):
    g = Graph()
    pts = rng.uniform(-2, 2, (n_points, 3)) + np.array([0, 0, 10.0])
    cam_ts = []
    for i in range(n_cams):
        t = np.array([i * 0.25 - n_cams * 0.125, 0, 0])
        cam_ts.append(t)
        g.add_vertex(i, "cam",
                     np.concatenate([t, [0, 0, 0, 1],
                                     [FX, FY, CX, CY, BASELINE]]),
                     fixed=(i < 2))
    n_obs = 0
    kept = []
    for j, pt in enumerate(pts):
        obs = []
        for i, t in enumerate(cam_ts):
            uv, uvu, z = project(t, pt)
            if z <= 0.1 or not (0 <= uv[0] < 640 and 0 <= uv[1] < 480):
                continue
            obs.append((i, uv, uvu))
        if len(obs) < 2:
            continue
        g.add_vertex(1000 + j, "sba_point_xyz", pt + rng.normal(0, 0.5, 3),
                     marginalized=True)
        kept.append(j)
        for i, uv, uvu in obs:
            if stereo:
                g.add_edge("edge_project_p2sc", (1000 + j, i),
                           uvu + rng.normal(0, pixel_noise, 3), np.eye(3))
            else:
                g.add_edge("edge_project_p2mc", (1000 + j, i),
                           uv + rng.normal(0, pixel_noise, 2), np.eye(2))
            n_obs += 1
    return g, pts[kept], n_obs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stereo", action="store_true")
    ap.add_argument("--pixel-noise", type=float, default=0.5)
    args = ap.parse_args()
    rng = np.random.default_rng(17)

    g, true_pts, n_obs = make_scene(rng, args.stereo, args.pixel_noise)
    mode = "stereo P2SC" if args.stereo else "mono P2MC"
    print(f"{mode}: {g.num_vertices()} vertices, {n_obs} observations")
    prob = g.compile()
    print(f"initial chi2 = {float(P.chi2(prob)):.2f}")
    out, stats = optimize(prob, LevenbergMarquardtSchurELL(), iterations=10,
                          verbose=True)
    est = np.asarray(out.params["sba_point_xyz"])
    rmse = np.sqrt(((est - true_pts) ** 2).sum(1).mean())
    print(f"point RMSE after BA: {rmse:.4f}")


if __name__ == "__main__":
    main()
