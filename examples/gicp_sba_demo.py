"""gicp_sba_demo: the GICP + SBA HYBRID workload.

Parity with g2o/examples/icp/gicp_sba_demo.cpp: two stereo-camera vertices
tied by 1000 plane-to-plane GICP point-match edges AND jointly refined with
stereo projections of a separate landmark cloud (marginalized points) — the
same vertices participate in both edge families. The second camera starts
displaced; the optimizer must pull it back near its true pose (0, 0, 1).

    python examples/gicp_sba_demo.py [num_points]
"""
import sys

import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.utils import np_lie


def build(num_points=50, euc_noise=0.1, pix_noise=1.0, seed=11):
    rng = np.random.default_rng(seed)
    # camera intrinsics (gicp_sba_demo.cpp:129-137): f=500, c=(320,240),
    # baseline 7.5 cm. `cam` vertex params: [t(3), q(4), fx, fy, cx, cy, b]
    intr = np.array([500.0, 500.0, 320.0, 240.0, 0.075])
    # the `cam` vertex stores the CAM-TO-WORLD pose (like the reference's
    # VertexSCam/SBACam — projection applies the inverse internally,
    # sbacam.h:120-159): cam i at translation (0, 0, i), identity rotation
    c2w = [np.array([0, 0, 0, 0, 0, 0, 1.0]),
           np.array([0, 0, 1.0, 0, 0, 0, 1.0])]

    g = Graph()
    g.add_vertex(0, "cam", np.concatenate([c2w[0], intr]), fixed=True)
    # second cam displaced off its true position (gicp_sba_demo.cpp:297-301)
    bad = np.array([-0.1, 0.1, 0.2, 0, 0, 0, 1.0])
    g.add_vertex(1, "cam", np.concatenate([bad, intr]))

    # GICP point matches between the two cams (plane-to-plane information)
    pts = np.stack([(rng.random(1000) - 0.5) * 3,
                    rng.random(1000) - 0.5,
                    rng.random(1000) + 10.0], axis=1)
    info3 = np.eye(3)
    for i, p in enumerate(pts):
        p0 = np_lie.se3_apply(np_lie.se3_inverse(c2w[0]), p) \
            + rng.normal(0, euc_noise, 3)
        p1 = np_lie.se3_apply(np_lie.se3_inverse(c2w[1]), p) \
            + rng.normal(0, euc_noise, 3)
        # normals (0, i, 1) with the LOOP index, as the reference does
        # (gicp_sba_demo.cpp:197-200): most edges end up y-normal, whose
        # high along-normal precision pins the y/rot-x direction
        nm = np.array([0.0, float(i), 1.0])
        nm = nm / np.linalg.norm(nm)
        g.add_edge("edge_gicp_plane_cam", (0, 1),
                   np.concatenate([p0, nm, p1, nm]), info3)

    # SBA stereo projections of a fresh landmark cloud onto BOTH cams
    lm = np.stack([(rng.random(num_points) - 0.5) * 3,
                   rng.random(num_points) - 0.5,
                   rng.random(num_points) + 10.0], axis=1)
    vid = 2
    fx, cx, cy, b = intr[0], intr[2], intr[3], intr[4]
    for p in lm:
        g.add_vertex(vid, "sba_point_xyz", p + rng.normal(0, 1.0, 3))
        for j in range(2):
            pc = np_lie.se3_apply(np_lie.se3_inverse(c2w[j]), p)
            u = fx * pc[0] / pc[2] + cx
            v = fx * pc[1] / pc[2] + cy
            ur = (fx * (pc[0] - b) + cx * pc[2]) / pc[2]
            if 0 <= u < 640 and 0 <= v < 480:
                z = np.array([u, v, ur]) + np.array(
                    [rng.normal(0, pix_noise), rng.normal(0, pix_noise),
                     rng.normal(0, pix_noise / 16.0)])
                g.add_edge("edge_project_p2sc", (vid, j), z, info3)
        vid += 1
    return g, c2w, lm


def main(num_points=50):
    import jax.numpy as jnp
    from openslam_g2o_tpu.core import problem as P

    g, c2w, lm_true = build(num_points=num_points)
    prob = g.compile()
    print(f"Initial chi2 = {float(P.chi2(prob)):.4f}")
    # chi2 with the CAMERAS at their true poses (and landmarks at
    # their true positions): the data-supported optimum to beat. NOTE this scene
    # (like the reference's: a shallow cloud at z in [10, 11]) has a
    # nearly flat x-translation / y-rotation direction, so the absolute
    # cam1 position can drift along it at no chi2 cost — optimality is
    # judged against chi2, position against the remaining stiff axes.
    intr = np.asarray(prob.params["cam"])[0, 7:12]
    true_cam = dict(prob.params)
    true_cam["cam"] = jnp.asarray(np.stack(
        [np.concatenate([c2w[0], intr]), np.concatenate([c2w[1], intr])]))
    if "sba_point_xyz" in true_cam:
        true_cam["sba_point_xyz"] = jnp.asarray(lm_true)
    chi_truth = float(P.chi2(prob.with_params(true_cam)))
    out, stats = optimize(prob, LevenbergMarquardt(), iterations=30,
                          verbose=False)
    est = np.asarray(out.params["cam"])
    print("Second vertex should be near 0,0,1:")
    print("cam0:", est[0, :3], " cam1:", est[1, :3])
    err_yz = np.linalg.norm(est[1, 1:3] - c2w[1][1:3])
    print(f"final chi2 = {stats[-1]['chi2']:.2f} "
          f"(chi2 at true cams = {chi_truth:.2f}); "
          f"cam1 (y,z) err = {err_yz:.4f}")
    ok = stats[-1]["chi2"] <= 1.05 * chi_truth and err_yz < 0.05
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sys.exit(0 if main(n) else 1)
