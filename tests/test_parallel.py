"""Multi-chip tests on the virtual 8-device CPU mesh: edge-sharded pose-graph
LM and landmark-partitioned distributed Schur BA must reproduce the
single-device trajectories."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core.algorithms import LevenbergMarquardt, optimize
from openslam_g2o_tpu.core.ba import LevenbergMarquardtSchur, _schur_lambda_init
from openslam_g2o_tpu.parallel.ba_sharding import make_sharded_ba_lm_step
from openslam_g2o_tpu.parallel.sharding import (
    make_sharded_lm_step, sharded_lm_optimize, make_mesh)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8])


class TestEdgeShardedLM:
    def test_matches_single_device(self, mesh8):
        from tests.test_graph_problem import make_se2_chain
        g, _ = make_se2_chain(24, noise=0.15)
        prob = g.compile()
        _, stats = optimize(prob, LevenbergMarquardt(), iterations=5)
        single = [s["chi2"] for s in stats]

        from openslam_g2o_tpu.parallel.sharding import sharded_lm_optimize
        _, sstats = sharded_lm_optimize(prob, mesh8, iterations=5)
        sharded = [s["chi2"] for s in sstats]
        np.testing.assert_allclose(sharded, single, rtol=1e-9)


class TestDistributedSchurBA:
    def test_matches_single_device(self, mesh8):
        from tests.test_ba import make_ba_scene
        g, _, _ = make_ba_scene(n_cams=6, n_points=64, pixel_noise=0.3)
        prob = g.compile()
        chi0 = float(P.robust_chi2(prob))
        _, stats = optimize(prob, LevenbergMarquardtSchur(), iterations=5)
        single = [s["chi2"] for s in stats]

        mesh = Mesh(np.array(jax.devices()[:8]), ("lm",))
        state0, step = make_sharded_ba_lm_step(prob, mesh)
        lam = _schur_lambda_init(prob, prob.params,
                                 jnp.asarray(1e-5, prob.dtype))
        ni = jnp.asarray(2.0, prob.dtype)
        chi = jnp.asarray(chi0, prob.dtype)
        pose, lm = state0["pose_params"], state0["lm_params"]
        traj = []
        for _ in range(5):
            pose, lm, lam, ni, chi, trials, ok = step(pose, lm, lam, ni, chi)
            traj.append(float(chi))
        np.testing.assert_allclose(traj, single, rtol=1e-7)

    def test_landmarks_land_on_right_devices(self, mesh8):
        """Landmark shards must keep their values consistent with the
        single-device result after optimization."""
        from tests.test_ba import make_ba_scene
        g, gt_points, _ = make_ba_scene(n_cams=5, n_points=40, pixel_noise=0.0)
        prob = g.compile()
        mesh = Mesh(np.array(jax.devices()[:8]), ("lm",))
        state0, step = make_sharded_ba_lm_step(prob, mesh)
        lam = _schur_lambda_init(prob, prob.params,
                                 jnp.asarray(1e-5, prob.dtype))
        ni = jnp.asarray(2.0, prob.dtype)
        chi = P.robust_chi2(prob)
        pose, lm = state0["pose_params"], state0["lm_params"]
        for _ in range(10):
            pose, lm, lam, ni, chi, trials, ok = step(pose, lm, lam, ni, chi)
        assert float(chi) < 1e-8
        # gauge: only cam 0 is fixed, so monocular scale is free — compare
        # against the single-device optimum, not ground truth
        out, _ = optimize(prob, LevenbergMarquardtSchur(), iterations=10)
        est = np.asarray(lm)[:40]   # unpadded region
        np.testing.assert_allclose(est, np.asarray(out.params["sba_point_xyz"]),
                                   atol=1e-5)


class TestKeyframePartitionedPCG:
    """parallel/pg_sharding.py: row-sharded (keyframe-partitioned) ELL-PCG."""

    def _single_traj(self, prob, iterations=5, pcg_iters=120, pcg_tol=1e-10):
        from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG
        _, stats = optimize(
            prob, LevenbergMarquardtPCG(pcg_iters=pcg_iters, pcg_tol=pcg_tol),
            iterations=iterations)
        return [s["chi2"] for s in stats]

    def test_pad_problem_vertices_is_noop_for_objective(self):
        from tests.test_graph_problem import make_se2_chain
        from openslam_g2o_tpu.parallel.pg_sharding import pad_problem_vertices
        g, _ = make_se2_chain(13, noise=0.2)
        prob = g.compile()
        padded = pad_problem_vertices(prob, 8)
        for vg in padded.static.vgroups:
            assert vg.count % 8 == 0
        assert float(P.robust_chi2(padded)) == pytest.approx(
            float(P.robust_chi2(prob)), rel=1e-12)
        # layout invariant: poses-first offsets are contiguous
        off = 0
        for vg in padded.static.vgroups:
            assert vg.offset == off
            off += vg.count * vg.tangent_dim
        assert padded.static.total_dim == off

    def test_matches_single_device_1d(self, mesh8):
        from tests.test_graph_problem import make_se2_chain
        from openslam_g2o_tpu.parallel.pg_sharding import (
            distributed_pcg_lm_optimize)
        g, _ = make_se2_chain(26, noise=0.15)
        prob = g.compile()
        single = self._single_traj(prob)
        _, stats = distributed_pcg_lm_optimize(
            prob, mesh8, iterations=5, pcg_iters=120, pcg_tol=1e-10)
        np.testing.assert_allclose([s["chi2"] for s in stats], single,
                                   rtol=1e-6, atol=1e-15)

    def test_matches_single_device_2d_host_chip(self):
        """2D mesh: rows over the 'host' (DCN) axis, edges over both axes."""
        from tests.test_graph_problem import make_se2_chain
        from openslam_g2o_tpu.parallel.pg_sharding import (
            distributed_pcg_lm_optimize)
        g, _ = make_se2_chain(26, noise=0.15)
        prob = g.compile()
        single = self._single_traj(prob)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("host", "chip"))
        _, stats = distributed_pcg_lm_optimize(
            prob, mesh, iterations=5, row_axis="host", pcg_iters=120,
            pcg_tol=1e-10)
        np.testing.assert_allclose([s["chi2"] for s in stats], single,
                                   rtol=1e-6, atol=1e-15)

    def test_landmark_slam_mixed_groups(self, mesh8):
        """Mixed SE2 + point-XY graph exercises per-group row partitions of
        different sizes (incl. a group smaller than the row-axis count)."""
        from openslam_g2o_tpu.apps.simulator import Simulator2D
        from openslam_g2o_tpu.parallel.pg_sharding import (
            distributed_pcg_lm_optimize)
        g, _ = Simulator2D(n_landmarks=5, seed=3, sensor_range=6.0).simulate(
            n_poses=20)
        if g.gauge_freedom():
            g.set_fixed(g.find_gauge(), True)
        prob = g.compile()
        single = self._single_traj(prob)
        _, stats = distributed_pcg_lm_optimize(
            prob, mesh8, iterations=5, pcg_iters=120, pcg_tol=1e-10)
        np.testing.assert_allclose([s["chi2"] for s in stats], single,
                                   rtol=1e-6, atol=1e-15)

    def test_cross_group_dia_pair_takes_gather_path(self, mesh8):
        """A 1:1 pose->landmark pairing makes offset 0 cover every row of
        the CROSS-group (se2, point_xy) pairs, so build_ell_pattern
        activates the DIA split for them — with DIFFERENT group counts.
        The per-shard DIA window starts at the row group's shard offset
        into the column group's x, which dynamic_slice would CLAMP (and
        silently misalign) on late shards; such pairs must take the exact
        gather path instead (round-5 review fix). Trajectory parity vs
        the single-device hot pipeline proves the route is exact."""
        from tests.test_graph_problem import make_se2_chain
        from openslam_g2o_tpu.core.sparse import build_ell_pattern
        from openslam_g2o_tpu.parallel.pg_sharding import (
            distributed_pcg_lm_optimize)
        rng = np.random.default_rng(7)
        g, gt = make_se2_chain(24, noise=0.15)
        # landmarks for the FIRST 16 poses only: group counts differ
        # (24 vs 16) so the row-offset window cannot be assumed aligned
        for i in range(16):
            t, th = gt[i][:2], gt[i][2]
            l_world = t + [0.5, 0.8] + rng.normal(0, 0.02, 2)
            R = np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
            z = R.T @ (l_world - t)
            g.add_vertex(1000 + i, "point_xy",
                         l_world + rng.normal(0, 0.1, 2))
            g.add_edge("edge_se2_xy", (i, 1000 + i), z, np.eye(2) * 25.0)
        prob = g.compile()
        pattern = build_ell_pattern(prob)
        cross_dia = [pattern.dia_offsets[pid] is not None
                     for pid, (r, c) in enumerate(pattern.pairs) if r != c]
        assert any(cross_dia), \
            "premise: the 1:1 pairing must activate DIA on a cross pair"
        single = self._single_traj(prob)
        _, stats = distributed_pcg_lm_optimize(
            prob, mesh8, iterations=5, pcg_iters=120, pcg_tol=1e-10)
        np.testing.assert_allclose([s["chi2"] for s in stats], single,
                                   rtol=1e-6, atol=1e-15)
