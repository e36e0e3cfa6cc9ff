"""data_fitting: curve and circle fitting — "non-SLAM" least squares.

Parity with g2o/examples/data_fitting/{curve_fit.cpp:45-113, circle_fit.cpp}.
Also demonstrates registering custom vertex/edge types at runtime (the user
extension story: what subclassing BaseVertex/BaseEdge is in the reference).

    python examples/data_fitting.py
"""
import numpy as np
import jax.numpy as jnp

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.registry import (
    VertexType, EdgeType, register_vertex_type, register_edge_type,
    vertex_type_by_tag)
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize


def register_types():
    """Custom types: params vertex in R^3, observation edges."""
    if vertex_type_by_tag("VERTEX_PARAMS3") is None:
        register_vertex_type(VertexType(
            name="params3", tag="VERTEX_PARAMS3", ambient_dim=3,
            tangent_dim=3, retract=lambda p, d: p + d,
            origin=lambda dtype: jnp.ones(3, dtype=dtype)))

        # y = a * exp(-lambda x) + b ; measurement = (x, y)
        def curve_error(vparams, meas, pdata):
            (abl,) = vparams
            a, b, lam = abl[0], abl[1], abl[2]
            return jnp.stack([meas[1] - (a * jnp.exp(-lam * meas[0]) + b)])

        register_edge_type(EdgeType(
            name="edge_curve_point", tag="EDGE_CURVE_POINT",
            vertex_types=("params3",), error_dim=1, measurement_dim=2,
            error=curve_error))

        # circle: params (cx, cy, r); measurement = point (x, y)
        def circle_error(vparams, meas, pdata):
            (c,) = vparams
            d = jnp.linalg.norm(meas - c[:2])
            return jnp.stack([d - c[2]])

        register_edge_type(EdgeType(
            name="edge_circle_point", tag="EDGE_CIRCLE_POINT",
            vertex_types=("params3",), error_dim=1, measurement_dim=2,
            error=circle_error))


def curve_fit(rng):
    a, b, lam = 2.0, 0.4, 0.2
    g = Graph()
    g.add_vertex(0, "params3", [1.0, 1.0, 1.0])
    for i in range(50):
        x = rng.uniform(0, 10)
        y = a * np.exp(-lam * x) + b + rng.normal(0, 0.02)
        g.add_edge("edge_curve_point", (0,), [x, y], np.eye(1) * 2500)
    out, stats = optimize(g.compile(), LevenbergMarquardt(), iterations=20)
    est = np.asarray(out.params["params3"][0])
    print(f"curve fit: a={est[0]:.4f} (true {a}), b={est[1]:.4f} (true {b}), "
          f"lambda={est[2]:.4f} (true {lam}); chi2={stats[-1]['chi2']:.3f}")
    return est, (a, b, lam)


def circle_fit(rng):
    center, radius = np.array([4.0, 2.0]), 2.0
    g = Graph()
    g.add_vertex(0, "params3", [3.0, 3.0, 3.0])
    for i in range(100):
        th = rng.uniform(0, 2 * np.pi)
        p = center + (radius + rng.normal(0, 0.05)) * np.array(
            [np.cos(th), np.sin(th)])
        g.add_edge("edge_circle_point", (0,), p, np.eye(1) * 400)
    out, stats = optimize(g.compile(), LevenbergMarquardt(), iterations=20)
    est = np.asarray(out.params["params3"][0])
    print(f"circle fit: center=({est[0]:.4f}, {est[1]:.4f}) "
          f"(true {tuple(center)}), r={est[2]:.4f} (true {radius})")
    return est, (center, radius)


def main():
    register_types()
    rng = np.random.default_rng(3)
    curve_fit(rng)
    circle_fit(rng)


if __name__ == "__main__":
    main()
