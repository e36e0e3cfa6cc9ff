"""Analytic/AD-vs-numeric Jacobian verification.

The reference's test strategy item (a) (SURVEY §4): standalone checkers
compare linearizeOplus against numeric differentiation over many random
instances (test_slam3d_jacobian.cpp:100-160). Here it is a reusable utility:
for every edge group of a compiled problem, compare the production Jacobians
(jax.jacfwd, or the type's analytic override) against central differences on
the manifold tangent, across ALL edges at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core import registry

__all__ = ["verify_jacobians"]


def verify_jacobians(problem: P.Problem, h: float = 1e-6) -> dict:
    """Returns {edge_group_key: max |J_ad - J_numeric|} over all edges/slots.

    Central differences through the same retraction the production path
    differentiates (base_binary_edge.hpp:131-205 methodology)."""
    lin = P.linearize(problem)
    out = {}
    for eg in problem.static.egroups:
        ea = problem.edges[eg.key]
        vtypes = [registry.vertex_type(n) for n in eg.slots]
        vparams = tuple(problem.params[g][ea.indices[s]]
                        for s, g in enumerate(eg.slots))
        _, jacs, _ = lin[eg.key]
        worst = 0.0
        for s, vt in enumerate(vtypes):
            D = vt.tangent_dim

            def err_at(delta_scalar, d, vp_s, others, meas, pdata):
                delta = jnp.zeros(D, dtype=problem.dtype).at[d].set(delta_scalar)
                vps = list(others)
                vps[s] = vt.retract(vp_s, delta)
                return eg.etype.error(tuple(vps), meas, pdata)

            cols = []
            for d in range(D):
                plus = jax.vmap(
                    lambda vp_s, *rest: err_at(h, d, vp_s, rest[:-2], rest[-2],
                                               rest[-1])
                )(vparams[s], *vparams, ea.measurement, ea.pdata)
                minus = jax.vmap(
                    lambda vp_s, *rest: err_at(-h, d, vp_s, rest[:-2],
                                               rest[-2], rest[-1])
                )(vparams[s], *vparams, ea.measurement, ea.pdata)
                cols.append((plus - minus) / (2 * h))
            J_num = jnp.stack(cols, axis=-1)          # [E, err_dim, D]
            # production jacobians are free-mask scaled; apply same mask
            mask = problem.free[eg.slots[s]][ea.indices[s]][:, None, None]
            diff = jnp.abs(jacs[s] - J_num * mask)
            worst = max(worst, float(jnp.max(diff)) if diff.size else 0.0)
        out[eg.key] = worst
    return out
