"""World/Robot/sensor composition API: the g2o_simulator architecture.

Re-designs apps/g2o_simulator/simulator.h:42-280 (World + Robot + pluggable
Unary/Binary sensors) as plain host-side Python over the Graph: a World owns
the graph and hands out vertex/parameter ids, Robots append ground-truth
trajectory vertices, and each sensor's sense() emits its matching registered
edge with Gaussian noise sampled from information^-1 (GaussianSampler,
g2o/stuff/sampler.h:49-95). Manifold measurements get right-multiplied
exp-noise, vector measurements additive noise — exactly the per-sensor
addNoise semantics (e.g. sensor_odometry2d.cpp:73-79 vs
sensor_pointxyz.cpp:69-73).

Sensor -> edge map (one class per reference sensor_*.h):
  SensorOdometry2D        EDGE_SE2                 sensor_odometry2d.h
  SensorPose2D            EDGE_SE2                 sensor_pose2d.h
  SensorPointXY           EDGE_SE2_XY              sensor_pointxy.h
  SensorPointXYBearing    EDGE_BEARING_SE2_XY      sensor_pointxy_bearing.h
  SensorPointXYOffset     EDGE_SE2_POINTXY_OFFSET  sensor_pointxy_offset.h
  SensorOdometry3D        EDGE_SE3:QUAT            sensor_odometry3d.h
  SensorPose3D            EDGE_SE3:QUAT            sensor_pose3d.h
  SensorPose3DOffset      EDGE_SE3_OFFSET          sensor_pose3d_offset.h
  SensorPointXYZ          EDGE_SE3_TRACKXYZ        sensor_pointxyz.h
  SensorPointXYZDepth     EDGE_PROJECT_DEPTH       sensor_pointxyz_depth.h
  SensorPointXYZDisparity EDGE_PROJECT_DISPARITY   sensor_pointxyz_disparity.h
  SensorSE3Prior          EDGE_SE3_PRIOR           sensor_se3_prior.h

Ground truth stays in the graph estimates (the reference writes the simulated
graph with true vertex estimates and noisy measurements); tests optimize from
a perturbed copy and assert ATE/chi2 against it.
"""
from __future__ import annotations

import math

import numpy as np

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.utils import np_lie

__all__ = [
    "World", "Robot2D", "Robot3D", "PointSensorParameters",
    "SensorOdometry2D", "SensorPose2D", "SensorPointXY",
    "SensorPointXYBearing", "SensorPointXYOffset",
    "SensorOdometry3D", "SensorPose3D", "SensorPose3DOffset",
    "SensorPointXYZ", "SensorPointXYZDepth", "SensorPointXYZDisparity",
    "SensorSE3Prior",
]


def _quat_from_compact(v):
    w = math.sqrt(max(0.0, 1.0 - float(np.dot(v, v))))
    return np.concatenate([v, [w]])


def _se3_noise(meas7, noise6):
    """measurement * fromVectorMQT(noise) — the 3D manifold noise model."""
    n = np.concatenate([noise6[:3], _quat_from_compact(noise6[3:6])])
    return np_lie.se3_compose(meas7, n)


def _se2_noise(meas3, noise3):
    out = np_lie.se2_compose(meas3, noise3)
    out[2] = np_lie.normalize_angle(out[2])
    return out


class World:
    """Owns the graph, hands out running vertex/parameter ids
    (simulator.h:270-280)."""

    def __init__(self, graph: Graph = None, seed: int = 0):
        self.graph = graph if graph is not None else Graph()
        self.rng = np.random.default_rng(seed)
        self.objects: list = []          # (vid, vertex type name)
        self.robots: list = []
        self._next_id = 0
        self._next_param_id = 0

    def _take_id(self) -> int:
        vid = self._next_id
        self._next_id += 1
        return vid

    def add_object(self, type_name: str, params, fixed: bool = False) -> int:
        vid = self._take_id()
        self.graph.add_vertex(vid, type_name, np.asarray(params, float),
                              fixed=fixed)
        self.objects.append((vid, type_name))
        return vid

    def add_parameter(self, type_name: str, values) -> int:
        pid = self._next_param_id
        self._next_param_id += 1
        self.graph.add_parameter(pid, type_name, np.asarray(values, float))
        return pid

    def add_robot(self, robot):
        self.robots.append(robot)
        return robot


class _Robot:
    """Robot<PoseObject> (simulator.h:95-123): move() appends a ground-truth
    trajectory vertex; sense() fires every attached sensor."""

    vertex_type: str = ""

    def __init__(self, world: World, name: str):
        self.world = world
        self.name = name
        self.sensors: list = []
        self.trajectory: list = []       # vertex ids, ground-truth estimates
        self.pose = self._identity()

    def add_sensor(self, sensor):
        sensor.robot = self
        sensor.add_parameters(self.world)
        self.sensors.append(sensor)
        return sensor

    def move(self, pose):
        self.pose = np.asarray(pose, float)
        vid = self.world.add_object(self.vertex_type, self.pose)
        self.trajectory.append(vid)
        return vid

    def relative_move(self, motion):
        return self.move(self._compose(self.pose, np.asarray(motion, float)))

    def sense(self):
        for s in self.sensors:
            s.sense()

    def pose_of(self, vid):
        return self.world.graph.vertices[vid].params


class Robot2D(_Robot):
    vertex_type = "se2"

    @staticmethod
    def _identity():
        return np.zeros(3)

    @staticmethod
    def _compose(a, b):
        out = np_lie.se2_compose(a, b)
        out[2] = np_lie.normalize_angle(out[2])
        return out


class Robot3D(_Robot):
    vertex_type = "se3"

    @staticmethod
    def _identity():
        return np.array([0, 0, 0, 0, 0, 0, 1.0])

    @staticmethod
    def _compose(a, b):
        return np_lie.se3_compose(a, b)


class PointSensorParameters:
    """min/max range, field of view, angular-difference window
    (pointsensorparameters.h:37-50). fov is the half-angle from the sensor's
    forward axis (+x for planar sensors, +z for cameras)."""

    def __init__(self, min_range: float = 0.0, max_range: float = 1e9,
                 fov: float = math.pi, max_angular_difference: float = math.pi):
        self.min_range = min_range
        self.max_range = max_range
        self.fov = fov
        self.max_angular_difference = max_angular_difference

    def _range_ok(self, d2):
        return self.min_range ** 2 <= d2 <= self.max_range ** 2


class _Sensor:
    """BaseSensor + GaussianSampler (simulator.h:125-139): information
    defaults to identity; noise ~ N(0, information^-1)."""

    edge_type: str = ""
    error_dim: int = 0

    def __init__(self, name: str):
        self.name = name
        self.robot = None
        self.information = np.eye(self.error_dim)

    def set_information(self, info):
        self.information = np.asarray(info, float)

    def add_parameters(self, world: World):
        pass

    def _noise(self):
        cov = np.linalg.inv(self.information)
        return self.robot.world.rng.multivariate_normal(
            np.zeros(self.error_dim), cov)

    def _graph(self):
        return self.robot.world.graph


# ---------------------------------------------------------------------------
# 2D sensors
# ---------------------------------------------------------------------------

class SensorOdometry2D(_Sensor):
    """EDGE_SE2 between the last two trajectory poses
    (sensor_odometry2d.cpp:40-79)."""
    edge_type = "edge_se2"
    error_dim = 3

    def sense(self):
        traj = self.robot.trajectory
        if len(traj) < 2:
            return
        a, b = traj[-2], traj[-1]
        z = np_lie.se2_compose(np_lie.se2_inverse(self.robot.pose_of(a)),
                               self.robot.pose_of(b))
        z = _se2_noise(z, self._noise())
        self._graph().add_edge(self.edge_type, (a, b), z, self.information)


class SensorPose2D(_Sensor, PointSensorParameters):
    """EDGE_SE2 loop closures to other visible trajectory/SE2 world poses
    (sensor_pose2d.cpp:36-95): range + fov + max angular difference, skipping
    the last steps_to_ignore poses."""
    edge_type = "edge_se2"
    error_dim = 3

    def __init__(self, name, steps_to_ignore: int = 10, **kw):
        _Sensor.__init__(self, name)
        PointSensorParameters.__init__(self, **kw)
        self.steps_to_ignore = steps_to_ignore

    def sense(self):
        traj = self.robot.trajectory
        if not traj:
            return
        cur = traj[-1]
        ignore = set(traj[-self.steps_to_ignore:])
        cur_pose = self.robot.pose_of(cur)
        inv = np_lie.se2_inverse(cur_pose)
        for vid, tname in self.robot.world.objects:
            if tname != "se2" or vid in ignore or vid == cur:
                continue
            other = self.robot.pose_of(vid)
            delta = np_lie.se2_compose(inv, other)
            d2 = float(delta[0] ** 2 + delta[1] ** 2)
            if not self._range_ok(d2):
                continue
            if d2 > 0 and abs(math.acos(
                    np.clip(delta[0] / math.sqrt(d2), -1, 1))) > self.fov:
                continue
            if abs(np_lie.normalize_angle(delta[2])) \
                    > self.max_angular_difference:
                continue
            z = _se2_noise(delta.copy(), self._noise())
            self._graph().add_edge(self.edge_type, (cur, vid), z,
                                   self.information)


class _Point2DSensor(_Sensor, PointSensorParameters):
    """Shared visibility for planar landmark sensors (sensor_pointxy.cpp):
    range window + bearing within fov of the sensor frame's +x axis."""

    def __init__(self, name, **kw):
        _Sensor.__init__(self, name)
        PointSensorParameters.__init__(self, **kw)

    def _sensor_pose(self):
        return self.robot.pose_of(self.robot.trajectory[-1])

    def _visible_landmarks(self):
        sp = self._sensor_pose()
        inv = np_lie.se2_inverse(sp)
        for vid, tname in self.robot.world.objects:
            if tname != "point_xy":
                continue
            rel = np_lie.se2_apply(inv, self._graph().vertices[vid].params)
            d2 = float(rel @ rel)
            if not self._range_ok(d2) or d2 == 0.0:
                continue
            if abs(math.acos(np.clip(rel[0] / math.sqrt(d2), -1, 1))) \
                    > self.fov:
                continue
            yield vid, rel

    def sense(self):
        if not self.robot.trajectory:
            return
        cur = self.robot.trajectory[-1]
        for vid, rel in self._visible_landmarks():
            self._emit(cur, vid, rel)


class SensorPointXY(_Point2DSensor):
    """EDGE_SE2_XY: landmark position in the robot frame."""
    edge_type = "edge_se2_xy"
    error_dim = 2

    def _emit(self, cur, vid, rel):
        z = rel + self._noise()
        self._graph().add_edge(self.edge_type, (cur, vid), z, self.information)


class SensorPointXYBearing(_Point2DSensor):
    """EDGE_BEARING_SE2_XY: bearing of the landmark
    (sensor_pointxy_bearing.cpp)."""
    edge_type = "edge_se2_xy_bearing"
    error_dim = 1

    def _emit(self, cur, vid, rel):
        z = np.array([np_lie.normalize_angle(
            math.atan2(rel[1], rel[0]) + float(self._noise()[0]))])
        self._graph().add_edge(self.edge_type, (cur, vid), z, self.information)


class SensorPointXYOffset(_Point2DSensor):
    """EDGE_SE2_POINTXY_OFFSET: landmark seen from an offset sensor frame;
    registers its PARAMS_SE2OFFSET (sensor_pointxy_offset.cpp)."""
    edge_type = "edge_se2_xy_offset"
    error_dim = 2

    def __init__(self, name, offset=(0.0, 0.0, 0.0), **kw):
        super().__init__(name, **kw)
        self.offset = np.asarray(offset, float)
        self.param_id = None

    def add_parameters(self, world: World):
        self.param_id = world.add_parameter("se2_offset", self.offset)

    def _sensor_pose(self):
        return np_lie.se2_compose(
            self.robot.pose_of(self.robot.trajectory[-1]), self.offset)

    def _emit(self, cur, vid, rel):
        z = rel + self._noise()
        self._graph().add_edge(self.edge_type, (cur, vid), z,
                               self.information, param_ids=[self.param_id])


# ---------------------------------------------------------------------------
# 3D sensors
# ---------------------------------------------------------------------------

class SensorOdometry3D(_Sensor):
    """EDGE_SE3:QUAT between the last two poses (sensor_odometry3d.cpp)."""
    edge_type = "edge_se3"
    error_dim = 6

    def sense(self):
        traj = self.robot.trajectory
        if len(traj) < 2:
            return
        a, b = traj[-2], traj[-1]
        z = np_lie.se3_compose(np_lie.se3_inverse(self.robot.pose_of(a)),
                               self.robot.pose_of(b))
        z = _se3_noise(z, self._noise())
        self._graph().add_edge(self.edge_type, (a, b), z, self.information)


class SensorPose3D(_Sensor, PointSensorParameters):
    """EDGE_SE3:QUAT loop closures (sensor_pose3d.cpp), forward axis +x."""
    edge_type = "edge_se3"
    error_dim = 6

    def __init__(self, name, steps_to_ignore: int = 10, **kw):
        _Sensor.__init__(self, name)
        PointSensorParameters.__init__(self, **kw)
        self.steps_to_ignore = steps_to_ignore

    def _delta_ok(self, delta):
        t = delta[:3]
        d2 = float(t @ t)
        if not self._range_ok(d2) or d2 == 0.0:
            return False
        if abs(math.acos(np.clip(t[0] / math.sqrt(d2), -1, 1))) > self.fov:
            return False
        ang = 2.0 * math.acos(np.clip(abs(delta[6]), -1, 1))
        return ang <= self.max_angular_difference

    def sense(self):
        traj = self.robot.trajectory
        if not traj:
            return
        cur = traj[-1]
        ignore = set(traj[-self.steps_to_ignore:])
        inv = np_lie.se3_inverse(self.robot.pose_of(cur))
        for vid, tname in self.robot.world.objects:
            if tname != "se3" or vid in ignore or vid == cur:
                continue
            delta = np_lie.se3_compose(inv, self.robot.pose_of(vid))
            if not self._delta_ok(delta):
                continue
            z = _se3_noise(delta, self._noise())
            self._graph().add_edge(self.edge_type, (cur, vid), z,
                                   self.information)


class SensorPose3DOffset(SensorPose3D):
    """EDGE_SE3_OFFSET pose closures through two sensor mounts
    (sensor_pose3d_offset.cpp): measurement is (Xi off1)^-1 (Xj off2)."""
    edge_type = "edge_se3_offset"
    error_dim = 6

    def __init__(self, name, offset1=None, offset2=None, **kw):
        super().__init__(name, **kw)
        ident = np.array([0, 0, 0, 0, 0, 0, 1.0])
        self.offset1 = np.asarray(offset1, float) if offset1 is not None else ident
        self.offset2 = np.asarray(offset2, float) if offset2 is not None else ident
        self.param_ids = None

    def add_parameters(self, world: World):
        self.param_ids = [world.add_parameter("se3_offset", self.offset1),
                          world.add_parameter("se3_offset", self.offset2)]

    def sense(self):
        traj = self.robot.trajectory
        if not traj:
            return
        cur = traj[-1]
        ignore = set(traj[-self.steps_to_ignore:])
        cur_pose = self.robot.pose_of(cur)
        inv_plain = np_lie.se3_inverse(cur_pose)
        inv_s1 = np_lie.se3_inverse(np_lie.se3_compose(cur_pose, self.offset1))
        for vid, tname in self.robot.world.objects:
            if tname != "se3" or vid in ignore or vid == cur:
                continue
            other = self.robot.pose_of(vid)
            if not self._delta_ok(np_lie.se3_compose(inv_plain, other)):
                continue
            z = np_lie.se3_compose(
                inv_s1, np_lie.se3_compose(other, self.offset2))
            z = _se3_noise(z, self._noise())
            self._graph().add_edge(self.edge_type, (cur, vid), z,
                                   self.information,
                                   param_ids=list(self.param_ids))


class _Point3DSensor(_Sensor, PointSensorParameters):
    """Camera-style visibility (sensor_pointxyz.cpp:41-60): range window on
    the point in the sensor frame + bearing within fov of the +z axis."""

    def __init__(self, name, offset=None, **kw):
        _Sensor.__init__(self, name)
        PointSensorParameters.__init__(self, **kw)
        ident = np.array([0, 0, 0, 0, 0, 0, 1.0])
        self.offset = np.asarray(offset, float) if offset is not None else ident
        self.param_id = None

    def _visible_landmarks(self):
        sp = np_lie.se3_compose(
            self.robot.pose_of(self.robot.trajectory[-1]), self.offset)
        inv = np_lie.se3_inverse(sp)
        for vid, tname in self.robot.world.objects:
            if tname != "point_xyz":
                continue
            rel = np_lie.se3_apply(inv, self._graph().vertices[vid].params)
            d2 = float(rel @ rel)
            if not self._range_ok(d2) or d2 == 0.0:
                continue
            if abs(math.acos(np.clip(rel[2] / math.sqrt(d2), -1, 1))) \
                    > self.fov:
                continue
            yield vid, rel

    def sense(self):
        if not self.robot.trajectory:
            return
        cur = self.robot.trajectory[-1]
        for vid, rel in self._visible_landmarks():
            self._emit(cur, vid, rel)


class SensorPointXYZ(_Point3DSensor):
    """EDGE_SE3_TRACKXYZ: point in the offset sensor frame."""
    edge_type = "edge_se3_xyz"
    error_dim = 3

    def add_parameters(self, world: World):
        self.param_id = world.add_parameter("se3_offset", self.offset)

    def _emit(self, cur, vid, rel):
        z = rel + self._noise()
        self._graph().add_edge(self.edge_type, (cur, vid), z,
                               self.information, param_ids=[self.param_id])


class _CameraPointSensor(_Point3DSensor):
    """Shared PARAMS_CAMERACALIB plumbing for depth/disparity sensors."""

    def __init__(self, name, offset=None, fx=1.0, fy=1.0, cx=0.5, cy=0.5,
                 **kw):
        super().__init__(name, offset=offset, **kw)
        self.K = np.array([fx, fy, cx, cy])

    def add_parameters(self, world: World):
        self.param_id = world.add_parameter(
            "camera_calib", np.concatenate([self.offset, self.K]))

    def _project(self, rel):
        fx, fy, cx, cy = self.K
        return np.array([fx * rel[0] + cx * rel[2],
                         fy * rel[1] + cy * rel[2],
                         rel[2]])


class SensorPointXYZDepth(_CameraPointSensor):
    """EDGE_PROJECT_DEPTH: (u, v, z) (sensor_pointxyz_depth.cpp)."""
    edge_type = "edge_se3_depth"
    error_dim = 3

    def _emit(self, cur, vid, rel):
        p = self._project(rel)
        z = np.array([p[0] / p[2], p[1] / p[2], p[2]]) + self._noise()
        self._graph().add_edge(self.edge_type, (cur, vid), z,
                               self.information, param_ids=[self.param_id])


class SensorPointXYZDisparity(_CameraPointSensor):
    """EDGE_PROJECT_DISPARITY: (u, v, 1/z) (sensor_pointxyz_disparity.cpp)."""
    edge_type = "edge_se3_disparity"
    error_dim = 3

    def _emit(self, cur, vid, rel):
        p = self._project(rel)
        z = np.array([p[0] / p[2], p[1] / p[2], 1.0 / p[2]]) + self._noise()
        self._graph().add_edge(self.edge_type, (cur, vid), z,
                               self.information, param_ids=[self.param_id])


class SensorSE3Prior(_Sensor):
    """EDGE_SE3_PRIOR: unary GPS-like pose prior through an offset
    (sensor_se3_prior.cpp:56-80): measurement = robot_pose * offset."""
    edge_type = "edge_se3_prior"
    error_dim = 6

    def __init__(self, name, offset=None):
        super().__init__(name)
        ident = np.array([0, 0, 0, 0, 0, 0, 1.0])
        self.offset = np.asarray(offset, float) if offset is not None else ident
        self.param_id = None

    def add_parameters(self, world: World):
        self.param_id = world.add_parameter("se3_offset", self.offset)

    def sense(self):
        if not self.robot.trajectory:
            return
        cur = self.robot.trajectory[-1]
        z = np_lie.se3_compose(self.robot.pose_of(cur), self.offset)
        z = _se3_noise(z, self._noise())
        self._graph().add_edge(self.edge_type, (cur,), z, self.information,
                               param_ids=[self.param_id])
