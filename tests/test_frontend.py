"""Front-end tests: detector repeatability, matcher correctness on known
transforms, closed-form relative SE2 recovery, and the end-to-end demo
(detect + match -> EDGE_SE2 constraints -> incremental optimization) beating
dead reckoning on a synthetic loop."""
import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.apps import frontend as F
from openslam_g2o_tpu.utils import np_lie

PX = 16.0


@pytest.fixture(scope="module")
def world():
    return jnp.asarray(F._world_texture(1024, 3))


def _pair(world, p0, p1, max_kp=96):
    im0 = F.render_frame(world, jnp.asarray(p0), px_per_m=PX)
    im1 = F.render_frame(world, jnp.asarray(p1), px_per_m=PX)
    yx0, _, v0 = F.detect_keypoints(im0, max_kp=max_kp)
    yx1, _, v1 = F.detect_keypoints(im1, max_kp=max_kp)
    d0 = F.extract_descriptors(im0, yx0)
    d1 = F.extract_descriptors(im1, yx1)
    idx, ok = F.match_descriptors(d0, d1, v0, v1)
    xy0 = np.asarray(yx0)
    xy1 = np.asarray(yx1)[np.asarray(idx)]
    h, w = im0.shape
    rel, nin = F.relative_se2_from_matches(
        xy0, xy1, np.asarray(ok), px_per_m=PX, center=(h / 2, w / 2))
    return int(ok.sum()), rel, nin


def test_detector_finds_corners(world):
    im = F.render_frame(world, jnp.zeros(3), px_per_m=PX)
    yx, score, valid = F.detect_keypoints(im, max_kp=96)
    assert int(valid.sum()) > 30
    # static output shapes regardless of detection count
    assert yx.shape == (96, 2) and valid.shape == (96,)
    # scores are sorted descending over the valid prefix
    s = np.asarray(score)[np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()


def test_descriptors_normalized(world):
    im = F.render_frame(world, jnp.zeros(3), px_per_m=PX)
    yx, _, valid = F.detect_keypoints(im, max_kp=64)
    d = F.extract_descriptors(im, yx)
    norms = np.linalg.norm(np.asarray(d), axis=1)
    np.testing.assert_allclose(norms[np.asarray(valid)], 1.0, atol=1e-4)


def test_match_identity_is_identity(world):
    im = F.render_frame(world, jnp.zeros(3), px_per_m=PX)
    yx, _, valid = F.detect_keypoints(im, max_kp=96)
    d = F.extract_descriptors(im, yx)
    idx, ok = F.match_descriptors(d, d, valid, valid)
    okn = np.asarray(ok)
    assert okn.sum() > 20
    np.testing.assert_array_equal(np.asarray(idx)[okn],
                                  np.arange(96)[okn])


@pytest.mark.parametrize("rel_gt", [
    np.array([0.5, 0.0, 0.0]),
    np.array([0.0, 0.5, 0.0]),
    np.array([0.0, 0.0, np.deg2rad(15)]),
    np.array([0.3, -0.2, np.deg2rad(10)]),
])
def test_relative_pose_recovery(world, rel_gt):
    n, rel, nin = _pair(world, np.zeros(3), rel_gt)
    assert rel is not None and nin >= 3
    assert np.abs(rel[:2] - rel_gt[:2]).max() < 0.05
    assert abs(np_lie.normalize_angle(rel[2] - rel_gt[2])) < 0.02


def test_relative_pose_general_start(world):
    p0 = np.array([1.0, 0.5, 0.7])
    p1 = np.array([1.4, 0.3, 0.95])
    gt = np_lie.se2_compose(np_lie.se2_inverse(p0), p1)
    n, rel, nin = _pair(world, p0, p1)
    assert rel is not None
    assert np.abs(rel[:2] - gt[:2]).max() < 0.05
    assert abs(np_lie.normalize_angle(rel[2] - gt[2])) < 0.02


def test_end_to_end_demo_beats_dead_reckoning():
    out = F.frontend_slam_demo(n_frames=24)
    assert out["n_loop_closures"] >= 1
    assert out["ate_rmse"] < out["ate_rmse_odometry_only"]
    assert out["ate_rmse"] < 0.3
