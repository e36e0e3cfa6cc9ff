"""Smoke tests: every example runs end-to-end at reduced scale.

The reference treats its examples as the workload suite (SURVEY.md §2.5);
these tests keep ours executable."""
import runpy
import sys

import numpy as np
import pytest

import openslam_g2o_tpu  # noqa: F401


def test_data_fitting_example():
    import examples.data_fitting as ex
    ex.register_types()
    rng = np.random.default_rng(3)
    est, (a, b, lam) = ex.curve_fit(rng)
    np.testing.assert_allclose(est, [a, b, lam], rtol=0.12)


def test_target_tracking_example():
    import examples.target_tracking as ex
    rng = np.random.default_rng(42)
    est, truth = ex.static_target(rng)
    np.testing.assert_allclose(est, np.asarray(truth), atol=1.5)
    err = ex.constant_velocity_target(rng, n_steps=15)
    assert err < 3.0


def test_gicp_demo_example():
    import examples.gicp_demo as ex
    rng = np.random.default_rng(9)
    dt, dq = ex.run("edge_gicp", rng, n_points=40)
    assert dt < 0.02 and dq < 0.01


def test_sba_demo_example():
    import examples.sba_demo as ex
    rng = np.random.default_rng(17)
    g, true_pts, n_obs = ex.make_scene(rng, stereo=True, pixel_noise=0.3,
                                       n_cams=4, n_points=40)
    assert n_obs > 40
    from openslam_g2o_tpu.core.algorithms import optimize
    from openslam_g2o_tpu.core.ba_ell import LevenbergMarquardtSchurELL
    out, stats = optimize(g.compile(), LevenbergMarquardtSchurELL(),
                          iterations=8)
    est = np.asarray(out.params["sba_point_xyz"])
    rmse = np.sqrt(((est - true_pts) ** 2).sum(1).mean())
    assert rmse < 0.12


def test_sclam_calibration_example():
    import examples.sclam_calibration as ex
    rng = np.random.default_rng(5)
    motions, poses = ex.simulate(rng, n=80)
    off, odom = ex.graph_calibration(motions, poses)
    np.testing.assert_allclose(odom, [ex.TRUE_RL, ex.TRUE_RR, ex.TRUE_B],
                               rtol=5e-3)
    np.testing.assert_allclose(off, ex.TRUE_OFFSET, atol=5e-3)


def test_anchored_inverse_depth_example():
    import examples.ba_anchored_inverse_depth_demo as ex
    rng = np.random.default_rng(11)
    g, true_points, poses, anchors, n_obs = ex.make_scene(0.5, rng)
    assert n_obs > 100
    prob = g.compile()
    from openslam_g2o_tpu.core import problem as P
    from openslam_g2o_tpu.core.algorithms import optimize
    from openslam_g2o_tpu.core.ba import LevenbergMarquardtSchur
    err0 = ex.point_errors(prob, g, true_points, poses, anchors)
    out, _ = optimize(prob, LevenbergMarquardtSchur(), iterations=20)
    err = ex.point_errors(out, g, true_points, poses, anchors)
    assert np.sqrt((err ** 2).mean()) < 0.8 * np.sqrt((err0 ** 2).mean())


def test_frontend_slam_example():
    import examples.frontend_slam as ex
    out = ex.main(["--frames", "16"])
    assert out["ate_rmse"] <= out["ate_rmse_odometry_only"]


def test_gicp_sba_hybrid_example():
    """The GICP+SBA hybrid workload (gicp_sba_demo.cpp): same camera
    vertices constrained by plane-GICP point matches AND stereo landmark
    projections; success = data-supported optimality (chi2 at the true
    configuration) since the scene has a flat x/rot-y direction."""
    import examples.gicp_sba_demo as ex
    assert ex.main(num_points=25)
