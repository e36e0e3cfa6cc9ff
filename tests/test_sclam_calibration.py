"""Closed-form odometry/laser calibration
(examples/calibration_odom_laser/closed_form_calibration.cpp:41-152)."""
import numpy as np

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.models.sclam2d import (
    closed_form_calibrate, motion_to_velocity, velocity_to_motion)
from openslam_g2o_tpu.utils import np_lie


def _simulate_motions(rng, n=200, rl=0.97, rr=1.02, b=0.6,
                      offset=(0.3, 0.1, 0.25)):
    """Wheel-velocity trajectory: nominal odometry (unit radii/baseline=1)
    vs true motion under (rl, rr, b), observed through a laser mounted at
    `offset`."""
    motions = []
    off = np.asarray(offset)
    off_inv = np_lie.se2_inverse(off)
    for _ in range(n):
        vl = rng.uniform(0.2, 1.0)
        vr = vl + rng.uniform(-0.3, 0.3)
        dt = rng.uniform(0.1, 0.3)
        odom = np.asarray(velocity_to_motion(vl, vr, dt, 1.0))
        true = np.asarray(velocity_to_motion(vl * rl, vr * rr, dt, b))
        laser = np_lie.se2_compose(off_inv, np_lie.se2_compose(true, off))
        motions.append((odom, laser, dt))
    return motions


def test_motion_velocity_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(30):
        vl = rng.uniform(-1, 1)
        vr = rng.uniform(-1, 1)
        dt = rng.uniform(0.05, 0.5)
        m = np.asarray(velocity_to_motion(vl, vr, dt, 1.0))
        vl2, vr2 = motion_to_velocity(m[0], m[1], m[2], dt)
        np.testing.assert_allclose([vl2, vr2], [vl, vr], atol=1e-8)


def test_closed_form_recovers_calibration():
    rng = np.random.default_rng(1)
    motions = _simulate_motions(rng)
    laser_offset, odom_params = closed_form_calibrate(motions)
    np.testing.assert_allclose(odom_params, [0.97, 1.02, 0.6], rtol=2e-3)
    np.testing.assert_allclose(laser_offset, [0.3, 0.1, 0.25], atol=5e-3)


def test_closed_form_matches_graph_calibration():
    """The graph version (EDGE_SE2_ODOM_DIFFERENTIAL_CALIB +
    EDGE_SE2_CALIB, sclam_pure_calibration.cpp) refines to the same
    parameters the closed form finds."""
    from openslam_g2o_tpu.core.graph import Graph
    from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize

    rng = np.random.default_rng(2)
    rl, rr, b = 0.95, 1.05, 0.55
    off = np.array([0.2, -0.1, 0.15])
    motions = _simulate_motions(rng, n=150, rl=rl, rr=rr, b=b, offset=off)

    # graph: poses from integrating the true (laser-frame) motion, one
    # odometry-calibration edge per step with (vl, vr, dt) measurements
    g = Graph()
    g.add_vertex(10_000, "odom_params", [1.0, 1.0, 1.0])
    pose = np.zeros(3)
    g.add_vertex(0, "se2", pose, fixed=True)
    info = np.eye(3) * 1e4
    for k, (odom, laser, dt) in enumerate(motions):
        vl, vr = motion_to_velocity(odom[0], odom[1], odom[2], dt)
        true = np.asarray(velocity_to_motion(vl * rl, vr * rr, dt, b))
        nxt = np_lie.se2_compose(pose, true)
        g.add_vertex(k + 1, "se2", nxt, fixed=True)
        g.add_edge("edge_se2_odom_calib", (k, k + 1, 10_000),
                   [vl, vr, dt], info)
        pose = nxt
    out, stats = optimize(g.compile(), LevenbergMarquardt(), iterations=15)
    est = np.asarray(out.params["odom_params"][0])
    np.testing.assert_allclose(est, [rl, rr, b], rtol=1e-3)

    _, cf = closed_form_calibrate(motions)
    np.testing.assert_allclose(cf, est, rtol=5e-3)
