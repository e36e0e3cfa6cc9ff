"""Target tracking: static target + constant-velocity target estimation.

Parity with g2o/examples/target/{static_target.cpp, constant_velocity_target.cpp}:
a target observed through noisy GPS fixes, optionally with an accelerometer
driving a constant-velocity process model between states. Demonstrates the
"non-SLAM" estimation usage of the framework with the target types
(openslam_g2o_tpu/models/target.py ~ targetTypes3D.hpp / targetTypes6D.hpp).

    python examples/target_tracking.py
"""
import numpy as np

import openslam_g2o_tpu  # noqa: F401  (registers the standard types)
from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core.algorithms import GaussNewton, optimize
from openslam_g2o_tpu.models.target import target_odometry_information


def static_target(rng):
    """static_target.cpp: a fixed 3D point observed by 10 uniform-noise GPS
    measurements — the GN estimate is the measurement mean."""
    true_point = rng.uniform(-500, 500, 3)
    g = Graph()
    g.add_vertex(0, "position3d", np.zeros(3))
    noise_limit = np.sqrt(12.0)
    noise_sigma = noise_limit ** 2 / 12.0
    meas = []
    for _ in range(10):
        z = true_point + rng.uniform(-0.5, 0.5, 3) * noise_limit
        meas.append(z)
        g.add_edge("edge_gps_position3d", (0,), z,
                   np.eye(3) / noise_sigma)
    out, stats = optimize(g.compile(), GaussNewton(), iterations=5)
    est = np.asarray(out.params["position3d"][0])
    mean = np.mean(meas, axis=0)
    print(f"static target: estimate {np.round(est, 3)}")
    print(f"  measurement mean      {np.round(mean, 3)} "
          f"(max |diff| {np.abs(est - mean).max():.2e})")
    print(f"  truth                 {np.round(true_point, 3)}; "
          f"chi2={stats[-1]['chi2']:.3f}")
    return est, true_point


def constant_velocity_target(rng, n_steps=50, dt=1.0):
    """constant_velocity_target.cpp: (pos, vel) chain driven by accelerometer
    process edges + GPS position observations each step."""
    process_sigma, accel_sigma, gps_sigma = 0.1, 1.0, 1.0
    state = np.zeros(6)
    state[:3] = 1000 * rng.normal(size=3)

    g = Graph()
    g.add_vertex(0, "posvel3d", state.copy())
    info_odom = target_odometry_information(dt, accel_sigma)
    info_gps = np.eye(3) / gps_sigma ** 2
    for k in range(1, n_steps + 1):
        w = process_sigma * rng.normal(size=3)
        state[:3] += dt * (state[3:] + 0.5 * dt * w)
        state[3:] += dt * w
        accel = w + accel_sigma * rng.normal(size=3)
        gps = state[:3] + gps_sigma * rng.normal(size=3)
        # new vertex, initialized by forward propagation (the reference calls
        # toe->initialEstimate; load-time auto-init does the same here)
        g.add_vertex(k, "posvel3d", np.zeros(6))
        g.add_edge("edge_target_odometry3d", (k - 1, k),
                   np.concatenate([accel, [dt]]), info_odom)
        g.add_edge("edge_gps_posvel3d", (k,), gps, info_gps)

    # forward-propagate the initial guess along the odometry chain
    from openslam_g2o_tpu.core.initial_guess import spanning_tree_initial_guess
    spanning_tree_initial_guess(g)
    out, stats = optimize(g.compile(), GaussNewton(), iterations=10)
    est = np.asarray(out.params["posvel3d"][-1])
    err = np.linalg.norm(est[:3] - state[:3])
    print(f"constant-velocity target after {n_steps} steps:")
    print(f"  final position estimate {np.round(est[:3], 2)}")
    print(f"  truth                   {np.round(state[:3], 2)} "
          f"(|err| {err:.3f}, chi2={stats[-1]['chi2']:.3f})")
    return err


def main():
    rng = np.random.default_rng(42)
    static_target(rng)
    constant_velocity_target(rng)


if __name__ == "__main__":
    main()
