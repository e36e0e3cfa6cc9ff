"""A trial whose retraction lands outside an error function's domain
produces a NON-FINITE chi2; every trial loop must treat that exactly like
a failed linear solve — reject AND keep retrying (LM: larger lambda,
Dogleg: smaller trust radius). Regression for the round-5 review finding:
a NaN gain ratio used to END the LM trial while_loop early (NaN fails
both the accept test and the rho<0 retry condition) and to leave the
Dogleg delta unchanged (burning max_trials identical evaluations).

The graph: one free 2-dof vertex with a unary edge
r = [log(1 - x0) - t, x1], t = -2. At x0 = 0 the residual is [2, 0] and
H = I, so the UNDAMPED Newton step is dx0 = 2 — past the x0 = 1 domain
boundary, where log goes NaN. Only a damped (or trust-region-clipped)
step of length < 1 can be accepted, which requires the trial loop to
actually retry after the non-finite first trial.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.registry import EdgeType, register_edge_type
from openslam_g2o_tpu.core.algorithms import (
    Dogleg, DoglegPCG, LevenbergMarquardt, LevenbergMarquardtPCG, optimize)


def _log_domain_error(vparams, meas, pdata):
    (x,) = vparams
    return jnp.stack([jnp.log(1.0 - x[0]) - meas[0], x[1]])


register_edge_type(EdgeType(
    name="edge_log_domain_test",
    tag="EDGE_LOG_DOMAIN_TEST",
    vertex_types=("point_xy",),
    error_dim=2,
    measurement_dim=1,
    error=_log_domain_error,
))


def _make_problem():
    g = Graph()
    g.add_vertex(0, "point_xy", [0.0, 0.0])
    g.add_edge("edge_log_domain_test", (0,), [-2.0], np.eye(2))
    return g.compile()


@pytest.mark.parametrize("alg", [
    LevenbergMarquardt(),
    LevenbergMarquardtPCG(pcg_iters=50, pcg_tol=1e-10),
    Dogleg(),
    DoglegPCG(pcg_iters=50, pcg_tol=1e-10),
], ids=["lm_dense", "lm_pcg", "dl_dense", "dl_pcg"])
def test_nonfinite_trial_chi2_is_retried(alg):
    prob = _make_problem()
    out, stats = optimize(prob, alg, iterations=1)
    # the step must ACCEPT a damped/clipped trial (the non-finite first
    # trial rejected and retried within the step), not silently end the
    # trial loop with no progress
    assert stats[-1]["ok"], stats
    assert np.isfinite(stats[-1]["chi2"])
    assert stats[-1]["chi2"] < 4.0 - 1e-3      # initial chi2 is 4
    x = np.asarray(out.params["point_xy"])[0]
    assert x[0] < 1.0                           # stayed inside the domain
