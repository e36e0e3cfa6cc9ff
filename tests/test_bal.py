"""BAL format + Snavely camera tests (bal_example.cpp parity)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import optimize
from openslam_g2o_tpu.core.ba_ell import LevenbergMarquardtSchurELL
from openslam_g2o_tpu.models.bal import (
    load_bal_problem, save_bal_problem, snavely_project)
from openslam_g2o_tpu.ops import lie


def make_bal_file(path, n_cams=6, n_points=40, noise=0.5, seed=4):
    """Synthesize a BAL problem: ring of cameras around a point cloud,
    BAL's -z viewing convention."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n_points, 3))
    cams = np.zeros((n_cams, 9))
    for i in range(n_cams):
        # camera at z = +8 looking down -z toward the cloud: BAL projection
        # divides by -z, so the cloud must be at negative z in camera frame
        cams[i, :3] = [0, 0, 0]
        cams[i, 3:6] = [i * 0.4 - n_cams * 0.2, 0, 8.0]
        cams[i, 6] = 800.0
    # camera frame: p = R x + t with z ~ 8 -> proj = -p/z valid (z>0 means
    # BAL's convention looks down -z; projections are just flipped)
    obs = []
    for j, x in enumerate(pts):
        for i in range(n_cams):
            cam = cams[i]
            uv = np.asarray(snavely_project(jnp.asarray(cam), jnp.asarray(x)))
            obs.append((i, j, uv[0] + rng.normal(0, noise),
                        uv[1] + rng.normal(0, noise)))
    with open(path, "w") as f:
        f.write(f"{n_cams} {n_points} {len(obs)}\n")
        for c, p, u, v in obs:
            f.write(f"{c} {p} {float(u)!r} {float(v)!r}\n")
        for c in cams:
            # perturb all but camera 0 (gauge)
            out = c.copy()
            f.write("\n".join(repr(float(v)) for v in out) + "\n")
        for j, p in enumerate(pts):
            noisy = p + rng.normal(0, 0.2, 3)
            f.write("\n".join(repr(float(v)) for v in noisy) + "\n")
    return pts


class TestBal:
    def test_snavely_projection_distortion(self):
        cam = jnp.asarray([0, 0, 0, 0, 0, 5.0, 100.0, 0.1, 0.01])
        pt = jnp.asarray([1.0, 0.5, 0.0])
        uv = np.asarray(snavely_project(cam, pt))
        proj = -np.array([1.0, 0.5]) / 5.0
        r2 = (proj ** 2).sum()
        expect = 100.0 * (1 + 0.1 * r2 + 0.01 * r2 * r2) * proj
        np.testing.assert_allclose(uv, expect, atol=1e-6)

    def test_load_optimize_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.bal")
        pts = make_bal_file(path)
        prob, meta = load_bal_problem(path)
        assert meta["n_cams"] == 6 and meta["n_points"] == 40
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, LevenbergMarquardtSchurELL(pcg_iters=100),
                              iterations=12)
        assert stats[-1]["chi2"] < 0.05 * chi0
        est = np.asarray(out.params["sba_point_xyz"])
        # points initialized with 0.2 noise recover to the noise floor
        assert np.abs(est - pts).max() < 0.15
        # round-trip
        out_path = str(tmp_path / "out.bal")
        save_bal_problem(out, out_path)
        prob2, meta2 = load_bal_problem(out_path)
        np.testing.assert_allclose(float(P.chi2(prob2)), stats[-1]["chi2"],
                                   rtol=1e-9)
