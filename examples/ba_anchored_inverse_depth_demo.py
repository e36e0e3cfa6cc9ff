"""ba_anchored_inverse_depth: BA with anchored inverse-depth points.

Parity with g2o/examples/ba_anchored_inverse_depth/
ba_anchored_inverse_depth_demo.cpp: each 3D point is parameterized as
psi = (u, v, rho) in the frame of its *anchor* camera (the first camera that
observed it); every observation is a ternary EdgeProjectPSI2UV
(psi, observing camera, anchor camera). Inverse depth is the numerically
robust parameterization for points near infinity.

    python examples/ba_anchored_inverse_depth_demo.py [--pixel-noise 1.0]
"""
import argparse

import numpy as np

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.core.ba import LevenbergMarquardtSchur
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.models.sba import depth_to_psi, invert_depth
from openslam_g2o_tpu.utils import np_lie

FOCAL, CX, CY = 1000.0, 320.0, 240.0


def np_invert_depth(psi):
    return np.array([psi[0], psi[1], 1.0]) / psi[2]


def make_scene(pixel_noise, rng):
    """ba_anchored_inverse_depth_demo.cpp:165-260: 500 points in a shallow
    box, 15 cameras translating along x, anchored inverse-depth init."""
    g = Graph()
    g.add_parameter(0, "camera_parameters", [FOCAL, CX, CY, 0.1])
    true_points = np.stack([
        (rng.uniform(size=500) - 0.5) * 3,
        rng.uniform(size=500) - 0.5,
        rng.uniform(size=500) + 3], axis=1)
    poses = []
    for i in range(15):
        c2w = np.array([i * 0.04 - 1.0, 0, 0, 0, 0, 0, 1.0])
        w2c = np_lie.se3_inverse(c2w)
        poses.append(w2c)
        g.add_vertex(i, "se3_expmap", w2c, fixed=(i < 2))

    n_obs, kept, anchors = 0, [], {}
    for j, pt in enumerate(true_points):
        vid = 1000 + j
        obs = []
        for i, w2c in enumerate(poses):
            pc = np_lie.se3_apply(w2c, pt)
            if pc[2] < 0.1:
                continue
            uv = pc[:2] / pc[2] * FOCAL + np.array([CX, CY])
            if not (0 <= uv[0] < 640 and 0 <= uv[1] < 480):
                continue
            obs.append((i, uv + rng.normal(0, pixel_noise, 2)))
        if len(obs) < 2:
            continue
        anchor = obs[0][0]
        anchors[vid] = anchor
        # noisy anchored inverse-depth initialization (demo lines 243-249)
        point_anchor = np_lie.se3_apply(poses[anchor],
                                        pt + rng.normal(0, 1.0, 3))
        g.add_vertex(vid, "sba_point_xyz",
                     np.asarray(depth_to_psi(point_anchor)),
                     marginalized=True)
        kept.append(j)
        for i, z in obs:
            g.add_edge("edge_project_psi2uv", (vid, i, anchor), z,
                       np.eye(2), param_ids=[0])
            n_obs += 1
    return g, true_points[kept], poses, anchors, n_obs


def point_errors(out, g, true_points, poses, anchors):
    """World-frame point error: anchor_pose^-1 * invert_depth(psi) - truth
    (demo lines 330-336)."""
    psi = np.asarray(out.params["sba_point_xyz"])
    errs = []
    ids = sorted(anchors)
    for row, vid in enumerate(ids):
        anchor_w2c = np.asarray(out.params["se3_expmap"][anchors[vid]])
        pw = np_lie.se3_apply(np_lie.se3_inverse(anchor_w2c),
                              np_invert_depth(psi[row]))
        errs.append(pw - true_points[row])
    return np.linalg.norm(np.stack(errs), axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixel-noise", type=float, default=1.0)
    args = ap.parse_args()
    rng = np.random.default_rng(11)

    g, true_points, poses, anchors, n_obs = make_scene(args.pixel_noise, rng)
    print(f"{g.num_vertices()} vertices, {n_obs} observations "
          f"(anchored inverse depth)")
    prob = g.compile()
    print(f"initial chi2 = {float(P.chi2(prob)):.2f}")
    err0 = point_errors(prob, g, true_points, poses, anchors)
    out, stats = optimize(prob, LevenbergMarquardtSchur(), iterations=30,
                          verbose=True)
    err = point_errors(out, g, true_points, poses, anchors)
    print(f"point RMSE before BA: {np.sqrt((err0 ** 2).mean()):.4f}")
    print(f"point RMSE after  BA: {np.sqrt((err ** 2).mean()):.4f}")


if __name__ == "__main__":
    main()
