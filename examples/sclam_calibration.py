"""Joint odometry/laser calibration (sclam2d).

Parity with g2o/examples/calibration_odom_laser/sclam_pure_calibration.cpp:
recover the differential-drive parameters (wheel radii + baseline) and the
laser mount offset from a driven trajectory, first with the closed-form
solution (closed_form_calibration.cpp), then refined on the graph with
EDGE_SE2_ODOM_DIFFERENTIAL_CALIB + EDGE_SE2_CALIB.

    python examples/sclam_calibration.py
"""
import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.models.sclam2d import (
    closed_form_calibrate, motion_to_velocity, velocity_to_motion)
from openslam_g2o_tpu.utils import np_lie

TRUE_RL, TRUE_RR, TRUE_B = 0.96, 1.03, 0.58
TRUE_OFFSET = np.array([0.25, 0.12, 0.17])


def simulate(rng, n=300, meas_noise=0.0):
    off_inv = np_lie.se2_inverse(TRUE_OFFSET)
    motions, poses = [], [np.zeros(3)]
    for _ in range(n):
        vl = rng.uniform(0.2, 1.0)
        vr = vl + rng.uniform(-0.3, 0.3)
        dt = rng.uniform(0.1, 0.3)
        odom = np.asarray(velocity_to_motion(vl, vr, dt, 1.0))
        true = np.asarray(velocity_to_motion(
            vl * TRUE_RL, vr * TRUE_RR, dt, TRUE_B))
        laser = np_lie.se2_compose(off_inv, np_lie.se2_compose(true, TRUE_OFFSET))
        laser = laser + rng.normal(0, meas_noise, 3)
        motions.append((odom, laser, dt))
        poses.append(np_lie.se2_compose(poses[-1], true))
    return motions, poses


def graph_calibration(motions, poses):
    """Graph refinement: fixed robot poses, free calibration vertices."""
    g = Graph()
    OD, OFF = 100_000, 100_001
    g.add_vertex(OD, "odom_params", [1.0, 1.0, 1.0])
    g.add_vertex(OFF, "se2", np.zeros(3))
    info = np.eye(3) * 1e4
    for k, (odom, laser, dt) in enumerate(motions):
        if k == 0:
            g.add_vertex(0, "se2", poses[0], fixed=True)
        g.add_vertex(k + 1, "se2", poses[k + 1], fixed=True)
        vl, vr = motion_to_velocity(odom[0], odom[1], odom[2], dt)
        g.add_edge("edge_se2_odom_calib", (k, k + 1, OD), [vl, vr, dt], info)
        g.add_edge("edge_se2_sensor_calib", (k, k + 1, OFF), laser, info)
    out, _ = optimize(g.compile(), LevenbergMarquardt(), iterations=20)
    # Problem rows follow insertion order within each vertex group
    se2_rows = {vid: i for i, vid in enumerate(
        v for v in g.vertices if g.vertices[v].vtype.name == "se2")}
    odom = np.asarray(out.params["odom_params"][0])
    offset = np.asarray(out.params["se2"][se2_rows[OFF]])
    return offset, odom


def main():
    rng = np.random.default_rng(5)
    motions, poses = simulate(rng, meas_noise=1e-4)

    off_cf, odom_cf = closed_form_calibrate(motions)
    print("closed-form:")
    print(f"  laser offset  {np.round(off_cf, 4)} (true {TRUE_OFFSET})")
    print(f"  odom params   {np.round(odom_cf, 4)} "
          f"(true [{TRUE_RL} {TRUE_RR} {TRUE_B}])")

    off_g, odom_g = graph_calibration(motions, poses)
    print("graph refinement:")
    print(f"  laser offset  {np.round(off_g, 4)}")
    print(f"  odom params   {np.round(odom_g, 4)}")


if __name__ == "__main__":
    main()
