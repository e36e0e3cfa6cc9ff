"""Utility layer tests: properties, timers, sampler, unscented, command args,
and the per-phase profiler."""
import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.utils.properties import Property, PropertyMap
from openslam_g2o_tpu.utils.sampler import GaussianSampler, Sampler
from openslam_g2o_tpu.utils.timeutil import ScopeTime, get_monotonic_time
from openslam_g2o_tpu.utils.unscented import (
    propagate_unscented, reconstruct_gaussian, sample_unscented)
from openslam_g2o_tpu.utils.command_args import CommandArgs


class TestProperties:
    def test_typed_set_from_string(self):
        pm = PropertyMap()
        pm.make_property("initialLambda", 1e-4)
        pm.make_property("maxTrials", 10)
        pm.make_property("verbose", False)
        assert pm.update_from_string(
            "initialLambda=0.01,maxTrials=5,verbose=true")
        assert pm["initialLambda"].value == 0.01
        assert pm["maxTrials"].value == 5
        assert pm["verbose"].value is True

    def test_unknown_key_reports_failure(self):
        pm = PropertyMap()
        pm.make_property("a", 1.0)
        assert not pm.update_from_string("b=2")


class TestSampler:
    def test_gaussian_sampler_covariance(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        s = GaussianSampler(cov, seed=1)
        draws = np.stack([s.generate_sample() for _ in range(20000)])
        np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.1)

    def test_scalar_draws(self):
        s = Sampler(seed=2)
        xs = [s.gaussian(2.0) for _ in range(5000)]
        assert abs(np.std(xs) - 2.0) < 0.1


class TestUnscented:
    def test_linear_map_exact(self):
        mean = jnp.asarray([1.0, -2.0, 0.5])
        cov = jnp.asarray(np.diag([0.1, 0.2, 0.3]))
        A = jnp.asarray(np.random.default_rng(3).normal(size=(3, 3)))
        m2, c2 = propagate_unscented(lambda x: A @ x, mean, cov)
        np.testing.assert_allclose(m2, A @ mean, atol=1e-8)
        np.testing.assert_allclose(c2, A @ cov @ A.T, atol=1e-7)

    def test_reconstruct_roundtrip(self):
        mean = jnp.asarray([0.3, 0.7])
        cov = jnp.asarray([[0.5, 0.1], [0.1, 0.4]])
        pts, wm, wc = sample_unscented(mean, cov)
        m2, c2 = reconstruct_gaussian(pts, wm, wc)
        np.testing.assert_allclose(m2, mean, atol=1e-9)
        np.testing.assert_allclose(c2, cov, atol=1e-7)


class TestCommandArgs:
    def test_reference_style_flags(self):
        ca = CommandArgs("test")
        ca.param("i", 10, "iterations")
        ca.param("v", False, "verbose")
        ca.param("solver", "lm_var", "solver name")
        ca.param_leftover("input")
        ca.parse_args(["-i", "25", "-v", "-solver", "gn_var", "file.g2o"])
        assert ca.i == 25 and ca.v is True
        assert ca.solver == "gn_var" and ca.input == "file.g2o"


class TestProfiler:
    def test_phases_cover_iteration(self):
        from openslam_g2o_tpu.core.batch_stats import profile_iteration
        from tests.test_graph_problem import make_se2_chain
        g, _ = make_se2_chain(10, noise=0.1)
        prob = g.compile()
        for solver in ("dense", "pcg"):
            s = profile_iteration(prob, solver, repeats=1)
            assert s["chi2"] > 0
            for key in ("time_residuals", "time_linearize",
                        "time_quadratic_form", "time_update"):
                assert s[key] >= 0
            # pcg reports the production solve by differencing plus the
            # de-fused reference; dense reports it directly
            if solver == "pcg":
                assert s["time_linear_solution_net"] >= 0
                assert s["time_linear_solution_defused"] >= 0
            else:
                assert s["time_linear_solution"] >= 0
            assert s["dispatch_floor"] >= 0
            assert s["iteration_fused"] > 0
            assert s["hessian_dims"] == 30

    def test_schur_phases(self):
        from openslam_g2o_tpu.core.batch_stats import profile_iteration
        from tests.test_ba import make_ba_scene
        g, _, _ = make_ba_scene(n_cams=4, n_points=12)
        prob = g.compile()
        s = profile_iteration(prob, "schur", repeats=1)
        assert s["time_schur_complement"] >= 0
        assert s["hessian_pose_dims"] == 24
