"""BAL (Bundle Adjustment in the Large) camera model and problem loader.

Parity with g2o/examples/bal/bal_example.cpp: the 9-parameter Snavely camera
(Rodrigues axis-angle rotation, translation, focal length, two radial
distortion coefficients) with the negative-z perspective convention, and the
BAL text format reader. The reference differentiates the projection with
vendored ceres forward-mode autodiff (bal_example.cpp:261-268); here
jax.jacfwd does that for free — no AD machinery to vendor.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from openslam_g2o_tpu.core.registry import (
    VertexType, EdgeType, register_vertex_type, register_edge_type)
from openslam_g2o_tpu.ops import lie

__all__ = ["load_bal_problem", "snavely_project"]


VERTEX_CAMERA_BAL = register_vertex_type(VertexType(
    name="bal_camera",
    tag="VERTEX_CAMERA_BAL",
    ambient_dim=9,          # (rodrigues 3, t 3, f, k1, k2)
    tangent_dim=9,
    retract=lambda p, d: p + d,   # the reference treats the 9-vector additively
    origin=lambda dtype: jnp.asarray([0, 0, 0, 0, 0, 0, 1, 0, 0], dtype=dtype),
))


def snavely_project(cam, point):
    """BAL projection (bal_example.cpp:191-243): p = R x + t,
    proj = -p.xy/p.z, prediction = f * (1 + k1 r^2 + k2 r^4) * proj."""
    q = lie.so3_exp(cam[:3])
    p = lie.quat_rotate(q, point) + cam[3:6]
    proj = -p[:2] / p[2]
    r2 = proj[0] * proj[0] + proj[1] * proj[1]
    distortion = 1.0 + cam[7] * r2 + cam[8] * r2 * r2
    return cam[6] * distortion * proj


def _edge_bal_error(vparams, meas, pdata):
    point, cam = vparams
    return snavely_project(cam, point) - meas


EDGE_PROJECT_BAL = register_edge_type(EdgeType(
    name="edge_project_bal",
    tag="EDGE_PROJECT_BAL",
    vertex_types=("sba_point_xyz", "bal_camera"),
    error_dim=2,
    measurement_dim=2,
    error=_edge_bal_error,
))


def load_bal_problem(path: str, dtype=None, min_obs_per_point: int = 2):
    """Read a BAL text file directly into a device Problem (struct-of-arrays;
    no per-record bookkeeping — venice-scale files load in seconds).

    Format: ``n_cams n_points n_obs`` then per observation
    ``cam_idx point_idx u v``, then 9 numbers per camera, 3 per point.
    Camera 0 is fixed as the gauge. Returns (Problem, meta dict).
    """
    import jax.numpy as jnp
    from openslam_g2o_tpu.core import problem as P
    from openslam_g2o_tpu.core import registry, robust

    with open(path) as f:
        data = np.array(f.read().split(), dtype=np.float64)
    n_cams, n_points, n_obs = int(data[0]), int(data[1]), int(data[2])
    pos = 3
    obs = data[pos:pos + 4 * n_obs].reshape(n_obs, 4)
    pos += 4 * n_obs
    cams = data[pos:pos + 9 * n_cams].reshape(n_cams, 9)
    pos += 9 * n_cams
    points = data[pos:pos + 3 * n_points].reshape(n_points, 3)

    cam_idx = obs[:, 0].astype(np.int32)
    pt_idx = obs[:, 1].astype(np.int32)
    uv = obs[:, 2:4]

    if dtype is None:
        dtype = jnp.zeros((), jnp.float64).dtype
    cam_vt = registry.vertex_type("bal_camera")
    pt_vt = registry.vertex_type("sba_point_xyz")
    et = registry.edge_type("edge_project_bal")

    free_cam = np.ones(n_cams)
    free_cam[0] = 0.0
    vg_cam = P.VGroup("bal_camera", cam_vt, n_cams, 0)
    vg_pt = P.VGroup("sba_point_xyz", pt_vt, n_points, n_cams * 9)
    eg = P.EGroup(et.name, et, robust.NONE_ID, n_obs)
    static = P.ProblemStatic((vg_cam, vg_pt), (eg,),
                             n_cams * 9 + n_points * 3, n_cams * 9)
    E = n_obs
    edges = {et.name: P.EdgeArrays(
        (jnp.asarray(pt_idx), jnp.asarray(cam_idx)),
        jnp.asarray(uv, dtype=dtype),
        jnp.asarray(np.tile(np.eye(2), (E, 1, 1)), dtype=dtype),
        jnp.ones((E,), dtype=dtype),
        ())}
    prob = P.Problem(
        params={"bal_camera": jnp.asarray(cams, dtype=dtype),
                "sba_point_xyz": jnp.asarray(points, dtype=dtype)},
        free={"bal_camera": jnp.asarray(free_cam, dtype=dtype),
              "sba_point_xyz": jnp.ones((n_points,), dtype=dtype)},
        edges=edges, static=static)
    meta = {"n_cams": n_cams, "n_points": n_points, "n_obs": n_obs}
    return prob, meta


def save_bal_problem(problem, path: str):
    """Write a Problem (bal_camera + sba_point_xyz + edge_project_bal) back
    to the BAL text format."""
    cams = np.asarray(problem.params["bal_camera"], dtype=np.float64)
    points = np.asarray(problem.params["sba_point_xyz"], dtype=np.float64)
    ea = problem.edges["edge_project_bal"]
    pt_idx = np.asarray(ea.indices[0])
    cam_idx = np.asarray(ea.indices[1])
    uv = np.asarray(ea.measurement, dtype=np.float64)
    with open(path, "w") as f:
        f.write(f"{len(cams)} {len(points)} {len(uv)}\n")
        for c, p, m in zip(cam_idx, pt_idx, uv):
            f.write(f"{c} {p} {float(m[0])!r} {float(m[1])!r}\n")
        for c in cams:
            f.write("\n".join(repr(float(v)) for v in c) + "\n")
        for p in points:
            f.write("\n".join(repr(float(v)) for v in p) + "\n")
