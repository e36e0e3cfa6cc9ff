"""Target-tracking types (models/target.py ~ g2o/examples/target).

Methodology mirrors the reference's target examples: simulator-generated
trajectories with known ground truth, convergence checked against the
closed-form/expected solution (static_target.cpp, constant_velocity_target.cpp).
"""
import numpy as np
import pytest

import openslam_g2o_tpu  # noqa: F401
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import GaussNewton, optimize
from openslam_g2o_tpu.core.initial_guess import spanning_tree_initial_guess
from openslam_g2o_tpu.models.target import (
    continuous_to_discrete, target_odometry_information)
from openslam_g2o_tpu.utils.jacobian_check import verify_jacobians


def test_static_target_is_measurement_mean():
    """GN on pure GPS unary edges = least-squares mean (static_target.cpp)."""
    rng = np.random.default_rng(0)
    truth = rng.uniform(-500, 500, 3)
    g = Graph()
    g.add_vertex(0, "position3d", np.zeros(3))
    meas = [truth + rng.uniform(-0.5, 0.5, 3) * np.sqrt(12.0)
            for _ in range(10)]
    for z in meas:
        g.add_edge("edge_gps_position3d", (0,), z, np.eye(3))
    out, _ = optimize(g.compile(), GaussNewton(), iterations=3)
    est = np.asarray(out.params["position3d"][0])
    np.testing.assert_allclose(est, np.mean(meas, axis=0), atol=1e-8)


def test_constant_velocity_smoother_converges():
    """Accelerometer process edges + GPS: the smoothed trajectory tracks the
    simulated truth far better than dead reckoning
    (constant_velocity_target.cpp)."""
    rng = np.random.default_rng(7)
    dt, q_sigma, a_sigma, gps_sigma = 1.0, 0.1, 1.0, 1.0
    state = np.zeros(6)
    state[:3] = 100 * rng.normal(size=3)
    g = Graph()
    g.add_vertex(0, "posvel3d", state.copy())
    info_o = target_odometry_information(dt, a_sigma)
    truth = [state.copy()]
    for k in range(1, 40):
        w = q_sigma * rng.normal(size=3)
        state[:3] += dt * (state[3:] + 0.5 * dt * w)
        state[3:] += dt * w
        truth.append(state.copy())
        g.add_vertex(k, "posvel3d", np.zeros(6))
        g.add_edge("edge_target_odometry3d", (k - 1, k),
                   np.concatenate([w + a_sigma * rng.normal(size=3), [dt]]),
                   info_o)
        g.add_edge("edge_gps_posvel3d", (k,),
                   state[:3] + gps_sigma * rng.normal(size=3),
                   np.eye(3) / gps_sigma ** 2)
    n_init = spanning_tree_initial_guess(g)
    # every vertex after the root propagates forward along the chain (the
    # odometry edge, like the reference's, only initializes slot 1)
    assert n_init >= 38
    out, stats = optimize(g.compile(), GaussNewton(), iterations=10)
    est = np.asarray(out.params["posvel3d"])
    pos_rmse = np.sqrt(np.mean(np.sum(
        (est[:, :3] - np.asarray(truth)[:, :3]) ** 2, axis=1)))
    # smoothing must beat the raw GPS fixes (per-step 3D error ~ sqrt(3)*sigma)
    assert pos_rmse < np.sqrt(3.0) * gps_sigma * 0.9
    assert stats[-1]["chi2"] < stats[0]["chi2"]


def test_target_jacobians_match_numeric():
    """AD-vs-central-difference parity (test_slam3d_jacobian methodology)."""
    rng = np.random.default_rng(3)
    g = Graph()
    for i in range(6):
        g.add_vertex(i, "posvel3d", rng.normal(size=6))
    for i in range(5):
        g.add_edge("edge_target_odometry3d", (i, i + 1),
                   np.concatenate([rng.normal(size=3), [0.5]]),
                   target_odometry_information(0.5, 1.0))
        g.add_edge("edge_gps_posvel3d", (i,), rng.normal(size=3), np.eye(3))
    worst = verify_jacobians(g.compile())
    assert max(worst.values()) < 1e-6, worst


def test_continuous_to_discrete_constant_velocity():
    """Van Loan discretization of the CV model reproduces the closed-form
    F = [[I, dt I],[0, I]] and Q (continuous_to_discrete.h:9-36)."""
    dt, q = 0.5, 2.0
    Fc = np.zeros((6, 6)); Fc[:3, 3:] = np.eye(3)
    Qc = np.zeros((6, 6)); Qc[3:, 3:] = q * np.eye(3)
    Fd, Qd = continuous_to_discrete(Fc, Qc, dt)
    F_expect = np.eye(6); F_expect[:3, 3:] = dt * np.eye(3)
    np.testing.assert_allclose(Fd, F_expect, atol=1e-12)
    Q_expect = np.zeros((6, 6))
    Q_expect[:3, :3] = q * dt ** 3 / 3 * np.eye(3)
    Q_expect[:3, 3:] = Q_expect[3:, :3] = q * dt ** 2 / 2 * np.eye(3)
    Q_expect[3:, 3:] = q * dt * np.eye(3)
    np.testing.assert_allclose(Qd, Q_expect, atol=1e-12)


def test_target_types_io_roundtrip(tmp_path):
    """Our types round-trip through .g2o (a superset of the reference, whose
    target types have no file IO — targetTypes6D.hpp:36-44)."""
    from openslam_g2o_tpu.io.g2o_format import load_g2o, save_g2o
    g = Graph()
    g.add_vertex(0, "posvel3d", np.arange(6.0))
    g.add_vertex(1, "posvel3d", np.arange(6.0) + 1)
    g.add_vertex(2, "position3d", np.array([1.0, 2.0, 3.0]))
    g.add_edge("edge_target_odometry3d", (0, 1),
               np.array([0.1, 0.2, 0.3, 1.0]),
               target_odometry_information(1.0, 0.5))
    g.add_edge("edge_gps_posvel3d", (1,), np.ones(3), np.eye(3) * 4.0)
    g.add_edge("edge_gps_position3d", (2,), np.ones(3), np.eye(3))
    path = tmp_path / "target.g2o"
    save_g2o(g, str(path))
    g2 = load_g2o(str(path))
    assert len(g2.vertices) == 3 and len(g2.edges) == 3
    np.testing.assert_allclose(g2.vertices[1].params, g.vertices[1].params)
    np.testing.assert_allclose(g2.edges[0].measurement,
                               g.edges[0].measurement, rtol=1e-12)
    np.testing.assert_allclose(g2.edges[0].information,
                               g.edges[0].information, rtol=1e-9)
