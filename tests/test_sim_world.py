"""World/Robot/sensor-suite tests: every sensor -> edge mapping
(simulator.h:42-280, sensor_*.h parity).

Exactness check: with noise forced to zero, every sensor's measurement must
make the generated graph's chi2 vanish at the ground-truth estimates — this
pins the measurement-from-state convention of each sensor to its edge type's
error definition. A noisy end-to-end run then checks the optimizer recovers
the trajectory."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.apps import sim_world as SW
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.io.g2o_format import loads_g2o, save_g2o
from openslam_g2o_tpu.utils import np_lie

rng = np.random.default_rng(11)


def _walk_2d(robot, n=25):
    robot.move(np.zeros(3))
    for i in range(n):
        if i % 6 == 5:
            robot.relative_move(np.array([0.0, 0.0, math.pi / 2]))
        else:
            robot.relative_move(np.array([1.0, 0.0, 0.0]))
        robot.sense()


def _walk_3d(robot, n=25):
    robot.move(np.array([0, 0, 0, 0, 0, 0, 1.0]))
    turn = np.concatenate([[0, 0, 0], [0, 0, math.sin(math.pi / 4),
                                       math.cos(math.pi / 4)]])
    for i in range(n):
        if i % 6 == 5:
            robot.relative_move(turn)
        else:
            robot.relative_move(np.array([1.0, 0, 0, 0, 0, 0, 1.0]))
        robot.sense()


def _world_2d(with_landmarks=True, seed=0):
    w = SW.World(seed=seed)
    if with_landmarks:
        for _ in range(40):
            w.add_object("point_xy", w.rng.uniform(-3, 9, 2))
    r = w.add_robot(SW.Robot2D(w, "r"))
    return w, r


def _world_3d(with_landmarks=True, seed=0):
    w = SW.World(seed=seed)
    if with_landmarks:
        for _ in range(60):
            w.add_object("point_xyz", w.rng.uniform(-3, 9, 3))
    r = w.add_robot(SW.Robot3D(w, "r"))
    return w, r


SENSORS_2D = [
    (lambda: SW.SensorOdometry2D("odo"), "edge_se2", False),
    (lambda: SW.SensorPose2D("pose", steps_to_ignore=3, max_range=2.5),
     "edge_se2", False),
    (lambda: SW.SensorPointXY("pt", max_range=3.0), "edge_se2_xy", True),
    (lambda: SW.SensorPointXYBearing("bear", max_range=3.0),
     "edge_se2_xy_bearing", True),
    (lambda: SW.SensorPointXYOffset("off", offset=[0.2, 0.1, 0.3],
                                    max_range=3.0), "edge_se2_xy_offset",
     True),
]

SENSORS_3D = [
    (lambda: SW.SensorOdometry3D("odo"), "edge_se3", False),
    (lambda: SW.SensorPose3D("pose", steps_to_ignore=3, max_range=2.5),
     "edge_se3", False),
    (lambda: SW.SensorPose3DOffset(
        "poff", steps_to_ignore=3, max_range=2.5,
        offset1=[0.1, 0, 0, 0, 0, 0, 1.0],
        offset2=[0, 0.1, 0, 0, 0, 0, 1.0]), "edge_se3_offset", False),
    (lambda: SW.SensorPointXYZ(
        "pt", max_range=4.0,
        offset=[0, 0, 0.3, -0.5, 0.5, -0.5, 0.5], fov=math.pi / 3),
     "edge_se3_xyz", True),
    (lambda: SW.SensorPointXYZDepth(
        "depth", max_range=4.0, min_range=0.2,
        offset=[0, 0, 0.3, -0.5, 0.5, -0.5, 0.5], fov=math.pi / 3,
        fx=100.0, fy=100.0, cx=50.0, cy=50.0), "edge_se3_depth", True),
    (lambda: SW.SensorPointXYZDisparity(
        "disp", max_range=4.0, min_range=0.2,
        offset=[0, 0, 0.3, -0.5, 0.5, -0.5, 0.5], fov=math.pi / 3,
        fx=100.0, fy=100.0, cx=50.0, cy=50.0), "edge_se3_disparity", True),
    (lambda: SW.SensorSE3Prior("gps", offset=[0.1, 0, 0, 0, 0, 0, 1.0]),
     "edge_se3_prior", False),
]


def _run_sensor(make, is_3d, monkeypatch, zero_noise=True):
    if zero_noise:
        monkeypatch.setattr(
            SW._Sensor, "_noise",
            lambda self: np.zeros(self.error_dim))
    w, r = (_world_3d() if is_3d else _world_2d())
    r.add_sensor(make())
    (_walk_3d if is_3d else _walk_2d)(r)
    return w


@pytest.mark.parametrize("make,edge_name,needs_lm", SENSORS_2D,
                         ids=[e for _, e, _ in SENSORS_2D][:3]
                         + ["bearing", "xy_offset"])
def test_2d_sensor_zero_noise_zero_chi2(make, edge_name, needs_lm,
                                        monkeypatch):
    w = _run_sensor(make, False, monkeypatch)
    names = {e.etype.name for e in w.graph.edges}
    assert names == {edge_name}
    assert w.graph.num_edges() > 5
    w.graph.set_fixed(w.graph.find_gauge(), True)
    prob = w.graph.compile(dtype=jnp.float64)
    assert float(P.chi2(prob)) < 1e-16 * w.graph.num_edges() + 1e-12


@pytest.mark.parametrize("make,edge_name,needs_lm", SENSORS_3D,
                         ids=[e for _, e, _ in SENSORS_3D][:3]
                         + ["xyz", "depth", "disparity", "prior"])
def test_3d_sensor_zero_noise_zero_chi2(make, edge_name, needs_lm,
                                        monkeypatch):
    w = _run_sensor(make, True, monkeypatch)
    names = {e.etype.name for e in w.graph.edges}
    assert names == {edge_name}
    assert w.graph.num_edges() > 5
    w.graph.set_fixed(w.graph.find_gauge(), True)
    prob = w.graph.compile(dtype=jnp.float64)
    assert float(P.chi2(prob)) < 1e-12


def test_full_2d_suite_optimizes_back_to_gt():
    """All 2D sensors together with noise: perturb the estimates, optimize,
    ATE must come back near zero (the reference's simulator-as-fixture
    methodology, SURVEY §4.3)."""
    from openslam_g2o_tpu.utils.ate import ate_rmse, positions_from_graph

    w, r = _world_2d(seed=5)
    odo = r.add_sensor(SW.SensorOdometry2D("odo"))
    odo.set_information(np.diag([400.0, 400.0, 1000.0]))
    pt = r.add_sensor(SW.SensorPointXY("pt", max_range=3.0))
    pt.set_information(np.eye(2) * 400.0)
    _walk_2d(r, 40)
    gt = positions_from_graph(w.graph)

    # perturb all pose estimates, keep gauge
    w.graph.set_fixed(0, True)
    for vid, rec in w.graph.vertices.items():
        if rec.vtype.name == "se2" and vid != 0:
            rec.params = rec.params + rng.normal(0, 0.15, 3)
    assert ate_rmse(positions_from_graph(w.graph), gt) > 0.05
    prob = w.graph.compile(dtype=jnp.float64)
    out, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
    P.write_back(out, w.graph)
    after = ate_rmse(positions_from_graph(w.graph), gt)
    assert after < 0.08, after


def test_generated_graph_roundtrips_through_g2o():
    w, r = _world_3d(seed=2)
    r.add_sensor(SW.SensorPointXYZ("pt", max_range=4.0, fov=math.pi / 3))
    r.add_sensor(SW.SensorOdometry3D("odo"))
    r.add_sensor(SW.SensorSE3Prior("gps"))
    _walk_3d(r, 15)
    text = save_g2o(w.graph)
    for tag in ("EDGE_SE3_TRACKXYZ", "EDGE_SE3:QUAT", "EDGE_SE3_PRIOR",
                "PARAMS_SE3OFFSET", "VERTEX_TRACKXYZ"):
        assert tag in text, tag
    g2 = loads_g2o(text)
    assert g2.num_edges() == w.graph.num_edges()
    assert g2.num_vertices() == w.graph.num_vertices()
