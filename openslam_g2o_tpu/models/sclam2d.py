"""Sensor-calibration SLAM (sclam2d): joint estimation of robot poses, a
laser sensor offset, and differential-drive odometry parameters.

TPU-native re-design of g2o/types/sclam2d (types_sclam2d.cpp:42-45). The
calibration unknowns are ordinary vertices (not graph parameters), exactly as
in the reference — every edge is a hyperedge touching them.
"""
from __future__ import annotations

import jax.numpy as jnp

from openslam_g2o_tpu.core.registry import (
    VertexType, EdgeType, register_vertex_type, register_edge_type)
from openslam_g2o_tpu.ops import lie


VERTEX_ODOM_PARAMS = register_vertex_type(VertexType(
    name="odom_params",
    tag="VERTEX_ODOM_DIFFERENTIAL",
    ambient_dim=3,                 # left wheel radius, right radius, baseline
    tangent_dim=3,
    retract=lambda p, d: p + d,
    origin=lambda dtype: jnp.asarray([1.0, 1.0, 1.0], dtype=dtype),
))


def _edge_se2_sensor_calib_error(vparams, meas, pdata):
    """EdgeSE2SensorCalib: Z^-1 * ((x1*off)^-1 * x2 * off)
    (edge_se2_sensor_calib.h:45-54); slot 2 is the laser-offset SE2 vertex."""
    x1, x2, off = vparams
    s1 = lie.se2_compose(x1, off)
    s2 = lie.se2_compose(x2, off)
    return lie.se2_error(lie.se2_inverse(meas), s1, s2)


EDGE_SE2_SENSOR_CALIB = register_edge_type(EdgeType(
    name="edge_se2_sensor_calib",
    tag="EDGE_SE2_CALIB",
    vertex_types=("se2", "se2", "se2"),
    error_dim=3,
    measurement_dim=3,
    error=_edge_se2_sensor_calib_error,
))


def velocity_to_motion(vl, vr, dt, baseline):
    """Differential-drive kinematics: wheel velocities -> SE2 motion
    (OdomConvert::convertToMotion, odometry_measurement.cpp:95-117),
    branch-free for autodiff at vr == vl."""
    diff = vr - vl
    straight = jnp.abs(diff) < 1e-7
    safe_diff = jnp.where(straight, 1.0, diff)
    R = baseline * 0.5 * (vl + vr) / safe_diff
    w = safe_diff / baseline
    theta = jnp.where(straight, 0.0, w * dt)
    # rotation of (-icc) + icc with icc = (0, R)
    x_turn = R * jnp.sin(theta)
    y_turn = R * (1.0 - jnp.cos(theta))
    tv = 0.5 * (vr + vl)
    x = jnp.where(straight, tv * dt, x_turn)
    y = jnp.where(straight, 0.0, y_turn)
    return jnp.stack([x, y, theta])


def _edge_se2_odom_calib_error(vparams, meas, pdata):
    """EdgeSE2OdomDifferentialCalib: scale wheel velocities by the estimated
    radii, convert to motion with the estimated baseline, compare to the
    relative pose (edge_se2_odom_differential_calib.h:45-63).
    measurement = (vl, vr, dt)."""
    x1, x2, params = vparams
    motion = velocity_to_motion(meas[0] * params[0], meas[1] * params[1],
                                meas[2], params[2])
    delta = lie.se2_compose(lie.se2_inverse(motion),
                            lie.se2_compose(lie.se2_inverse(x1), x2))
    return delta


EDGE_SE2_ODOM_CALIB = register_edge_type(EdgeType(
    name="edge_se2_odom_calib",
    tag="EDGE_SE2_ODOM_DIFFERENTIAL_CALIB",
    vertex_types=("se2", "se2", "odom_params"),
    error_dim=3,
    measurement_dim=3,
    error=_edge_se2_odom_calib_error,
))
