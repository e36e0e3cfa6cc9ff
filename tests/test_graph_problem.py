"""Graph container + compiled Problem tests: chi2 semantics, masking,
linearization against numeric differentiation, and small end-to-end solves."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core.graph import Graph
from openslam_g2o_tpu.core import problem as P
from openslam_g2o_tpu.core import robust
from openslam_g2o_tpu.core.algorithms import (
    GaussNewton, LevenbergMarquardt, optimize, TerminateCriterion)
from openslam_g2o_tpu.ops import lie

rng = np.random.default_rng(7)


def make_se2_chain(n=6, noise=0.05, loop=True):
    """Odometry chain with optional loop closure, known ground truth."""
    g = Graph()
    gt = []
    pose = np.zeros(3)
    for i in range(n):
        gt.append(pose.copy())
        pose = np.asarray(lie.se2_compose(jnp.asarray(pose),
                                          jnp.asarray([1.0, 0.0, 2 * np.pi / n])))
    info = np.diag([100.0, 100.0, 400.0])
    for i, p in enumerate(gt):
        noisy = p + rng.normal(0, noise, 3) if i > 0 else p
        g.add_vertex(i, "se2", noisy, fixed=(i == 0))
    for i in range(n - 1):
        z = lie.se2_compose(lie.se2_inverse(jnp.asarray(gt[i])), jnp.asarray(gt[i + 1]))
        g.add_edge("edge_se2", (i, i + 1), np.asarray(z), info)
    if loop:
        z = lie.se2_compose(lie.se2_inverse(jnp.asarray(gt[-1])), jnp.asarray(gt[0]))
        g.add_edge("edge_se2", (n - 1, 0), np.asarray(z), info)
    return g, np.stack(gt)


class TestCompile:
    def test_basic_structure(self):
        g, _ = make_se2_chain(5)
        prob = g.compile()
        assert prob.static.total_dim == 15
        assert [vg.name for vg in prob.static.vgroups] == ["se2"]
        (eg,) = prob.static.egroups
        assert eg.count == 5
        assert float(prob.free["se2"][0]) == 0.0
        assert float(jnp.sum(prob.free["se2"])) == 4.0

    def test_chi2_at_ground_truth_is_zero(self):
        g, gt = make_se2_chain(5, noise=0.0)
        prob = g.compile()
        assert float(P.chi2(prob)) < 1e-16

    def test_chi2_matches_manual(self):
        g, _ = make_se2_chain(4)
        prob = g.compile()
        errors = P.compute_errors(prob)
        total = 0.0
        for eg in prob.static.egroups:
            r = np.asarray(errors[eg.key])
            info = np.asarray(prob.edges[eg.key].information)
            total += np.einsum("ea,eab,eb->", r, info, r)
        np.testing.assert_allclose(float(P.chi2(prob)), total, rtol=1e-12)

    def test_mixed_types_and_landmarks(self):
        g = Graph()
        g.add_vertex(0, "se2", [0, 0, 0], fixed=True)
        g.add_vertex(1, "se2", [1, 0.1, 0.05])
        g.add_vertex(10, "point_xy", [2.0, 1.0])
        g.add_edge("edge_se2", (0, 1), [1, 0, 0], np.eye(3) * 10)
        g.add_edge("edge_se2_xy", (0, 10), [2.0, 1.0], np.eye(2))
        g.add_edge("edge_se2_xy", (1, 10), [1.0, 1.0], np.eye(2))
        prob = g.compile()
        assert prob.static.total_dim == 3 * 2 + 2
        assert len(prob.static.egroups) == 2
        assert np.isfinite(float(P.chi2(prob)))


class TestLinearize:
    def test_jacobian_matches_numeric(self):
        """Analogue of test_slam3d_jacobian.cpp: jacfwd vs central differences."""
        g, _ = make_se2_chain(4)
        prob = g.compile()
        lin = P.linearize(prob)
        eg = prob.static.egroups[0]
        ea = prob.edges[eg.key]
        resid, jacs, w = lin[eg.key]
        h = 1e-7
        for e in range(eg.count):
            for s in range(2):
                gname = eg.slots[s]
                vidx = int(ea.indices[s][e])
                pi = prob.params["se2"][ea.indices[0][e]]
                pj = prob.params["se2"][ea.indices[1][e]]
                m = ea.measurement[e]
                Jnum = np.zeros((3, 3))
                for d in range(3):
                    delta = np.zeros(3)
                    delta[d] = h
                    def err(di, dj):
                        return lie.se2_error(
                            lie.se2_inverse(m),
                            lie.se2_retract(pi, jnp.asarray(di)),
                            lie.se2_retract(pj, jnp.asarray(dj)))
                    if s == 0:
                        ep = err(delta, np.zeros(3)); em = err(-delta, np.zeros(3))
                    else:
                        ep = err(np.zeros(3), delta); em = err(np.zeros(3), -delta)
                    Jnum[:, d] = np.asarray(ep - em) / (2 * h)
                free = float(prob.free[gname][vidx])
                np.testing.assert_allclose(np.asarray(jacs[s][e]), Jnum * free,
                                           atol=1e-5)

    def test_fixed_vertex_columns_zero(self):
        g, _ = make_se2_chain(4)
        prob = g.compile()
        lin = P.linearize(prob)
        eg = prob.static.egroups[0]
        ea = prob.edges[eg.key]
        _, jacs, _ = lin[eg.key]
        for s in range(2):
            fixed_edges = np.asarray(prob.free["se2"][ea.indices[s]]) == 0.0
            assert np.all(np.asarray(jacs[s])[fixed_edges] == 0.0)


class TestDenseSystem:
    def test_hb_match_explicit(self):
        g, _ = make_se2_chain(4)
        prob = g.compile()
        lin = P.linearize(prob)
        H, b, raw_diag = P.build_dense_system(prob, lin=lin)
        T = prob.static.total_dim
        Href = np.zeros((T, T))
        bref = np.zeros(T)
        eg = prob.static.egroups[0]
        ea = prob.edges[eg.key]
        resid, jacs, w = lin[eg.key]
        for e in range(eg.count):
            idx = [int(ea.indices[s][e]) * 3 for s in range(2)]
            J = np.zeros((3, T))
            for s in range(2):
                J[:, idx[s]:idx[s] + 3] += np.asarray(jacs[s][e])
            O = np.asarray(ea.information[e]) * float(w[e])
            Href += J.T @ O @ J
            bref += -J.T @ O @ np.asarray(resid[e])
        Href += np.diag(np.asarray(P.tangent_masks(prob)[1]))
        np.testing.assert_allclose(np.asarray(H), Href, atol=1e-9)
        np.testing.assert_allclose(np.asarray(b), bref, atol=1e-9)
        assert np.all(np.asarray(b)[:3] == 0.0)  # fixed vertex

    def test_H_symmetric_psd(self):
        g, _ = make_se2_chain(6)
        prob = g.compile()
        H, b, _ = P.build_dense_system(prob)
        Hn = np.asarray(H)
        np.testing.assert_allclose(Hn, Hn.T, atol=1e-10)
        w = np.linalg.eigvalsh(Hn)
        assert w.min() > -1e-8


class TestOptimize:
    def test_gauss_newton_converges(self):
        g, gt = make_se2_chain(8, noise=0.08)
        prob = g.compile()
        chi0 = float(P.chi2(prob))
        out, stats = optimize(prob, GaussNewton(), iterations=10)
        assert stats[-1]["chi2"] < 1e-10
        est = np.asarray(out.params["se2"])
        # gauge fixed at vertex 0 == gt, so estimates must match ground truth
        np.testing.assert_allclose(est[:, :2], gt[:, :2], atol=1e-6)

    def test_lm_converges(self):
        g, gt = make_se2_chain(10, noise=0.2)
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=20,
                              terminate=TerminateCriterion())
        assert stats[-1]["chi2"] < 1e-8

    def test_lm_monotone_nonincreasing(self):
        g, _ = make_se2_chain(10, noise=0.3)
        prob = g.compile()
        _, stats = optimize(prob, LevenbergMarquardt(), iterations=15)
        chis = [s["chi2"] for s in stats]
        for a, b in zip(chis, chis[1:]):
            assert b <= a + 1e-9

    def test_landmark_slam_converges(self):
        g = Graph()
        info2 = np.eye(2) * 100
        info3 = np.diag([100.0, 100.0, 400.0])
        n = 6
        gt_poses = [np.array([i, 0.0, 0.0]) for i in range(n)]
        gt_lms = [np.array([i + 0.5, 2.0]) for i in range(n - 1)]
        for i, p in enumerate(gt_poses):
            g.add_vertex(i, "se2", p + (0 if i == 0 else rng.normal(0, 0.1, 3)),
                         fixed=(i == 0))
        for j, l in enumerate(gt_lms):
            g.add_vertex(100 + j, "point_xy", l + rng.normal(0, 0.3, 2))
        for i in range(n - 1):
            z = lie.se2_compose(lie.se2_inverse(jnp.asarray(gt_poses[i])),
                                jnp.asarray(gt_poses[i + 1]))
            g.add_edge("edge_se2", (i, i + 1), np.asarray(z), info3)
        for j, l in enumerate(gt_lms):
            for i in (j, j + 1):
                z = lie.se2_apply(lie.se2_inverse(jnp.asarray(gt_poses[i])),
                                  jnp.asarray(l))
                g.add_edge("edge_se2_xy", (i, 100 + j), np.asarray(z), info2)
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=20)
        assert stats[-1]["chi2"] < 1e-10
        np.testing.assert_allclose(np.asarray(out.params["point_xy"]),
                                   np.stack(gt_lms), atol=1e-5)


class TestRobust:
    def test_robust_kernels_downweight_outlier(self):
        def solve_with(kernel):
            g, gt = make_se2_chain(8, noise=0.05)
            # corrupt the loop-closure edge
            g.edges[-1].measurement = (g.edges[-1].measurement
                                       + np.array([3.0, -2.0, 0.5]))
            if kernel:
                g.set_robust_kernel(kernel, 1.0)
            prob = g.compile()
            out, _ = optimize(prob, LevenbergMarquardt(), iterations=25)
            est = np.asarray(out.params["se2"])
            return np.abs(est[:, :2] - gt[:, :2]).max()

        err_none = solve_with(None)
        # saturating kernels fully reject the gross outlier: the inlier chain
        # snaps back to ground truth (Huber only *bounds* the pull — with a
        # floppy open chain the positions still move, so no position check)
        assert err_none > 1.0
        assert solve_with("DCS") < 0.05
        assert solve_with("Cauchy") < 0.2
        assert solve_with("Saturated") < 0.3

    def test_robust_chi2_less_than_chi2_for_outliers(self):
        g, _ = make_se2_chain(8, noise=0.05)
        g.edges[-1].measurement = g.edges[-1].measurement + np.array([5.0, 0, 0])
        g.set_robust_kernel("Huber", 1.0)
        prob = g.compile()
        assert float(P.robust_chi2(prob)) < float(P.chi2(prob))

    def test_kernel_values_match_reference_formulas(self):
        e2 = jnp.asarray([0.25, 4.0, 100.0])
        delta = jnp.asarray([1.0, 1.0, 1.0])
        rho0, rho1, rho2 = robust.robustify(robust.kernel_id("Huber"), e2, delta)
        np.testing.assert_allclose(rho0, [0.25, 2 * 2 - 1, 2 * 10 - 1], atol=1e-12)
        np.testing.assert_allclose(rho1, [1.0, 0.5, 0.1], atol=1e-12)
        rho0, rho1, _ = robust.robustify(robust.kernel_id("Cauchy"), e2, delta)
        np.testing.assert_allclose(rho0, np.log1p([0.25, 4.0, 100.0]), atol=1e-9)
        np.testing.assert_allclose(rho1, 1.0 / (1.0 + np.array([0.25, 4, 100])), atol=1e-12)


class TestSE3:
    def test_se3_chain_converges(self):
        g = Graph()
        n = 6
        gt = []
        pose = np.array([0, 0, 0, 0, 0, 0, 1.0])
        step = np.asarray(lie.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 1.0, 0.0, 0.1])))
        for i in range(n):
            gt.append(pose.copy())
            pose = np.asarray(lie.se3_compose(jnp.asarray(pose), jnp.asarray(step)))
        info = np.eye(6) * 100
        for i, p in enumerate(gt):
            if i == 0:
                g.add_vertex(i, "se3", p, fixed=True)
            else:
                noisy = np.asarray(lie.se3_compose(
                    jnp.asarray(p),
                    lie.se3_exp(jnp.asarray(rng.normal(0, 0.05, 6)))))
                g.add_vertex(i, "se3", noisy)
        for i in range(n - 1):
            z = lie.se3_compose(lie.se3_inverse(jnp.asarray(gt[i])), jnp.asarray(gt[i + 1]))
            g.add_edge("edge_se3", (i, i + 1), np.asarray(z), info)
        z = lie.se3_compose(lie.se3_inverse(jnp.asarray(gt[-1])), jnp.asarray(gt[0]))
        g.add_edge("edge_se3", (n - 1, 0), np.asarray(z), info)
        prob = g.compile()
        out, stats = optimize(prob, LevenbergMarquardt(), iterations=20)
        assert stats[-1]["chi2"] < 1e-10
        est = np.asarray(out.params["se3"])
        np.testing.assert_allclose(est[:, :3], np.stack(gt)[:, :3], atol=1e-5)


def test_fused_lm_runner_matches_per_step():
    """lm_pcg_optimize_fused (one lax.scan device program) follows the same
    trajectory as the per-step jit path, including the forcing tolerance."""
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.algorithms import (
        _lm_pcg_step, _lambda_init_pcg, lm_pcg_optimize_fused)
    from openslam_g2o_tpu.core.problem import robust_chi2
    from openslam_g2o_tpu.core.sparse import build_ell_pattern
    from openslam_g2o_tpu.utils import np_lie
    from openslam_g2o_tpu.core.graph import Graph
    import numpy as np

    rng = np.random.default_rng(4)
    g = Graph()
    n = 24
    gt, pose = [], np.zeros(3)
    step_m = np.array([1.0, 0.0, 2 * np.pi / n])
    for i in range(n):
        gt.append(pose.copy())
        pose = np_lie.se2_compose(pose, step_m)
    info = np.diag([100.0, 100.0, 400.0])
    for i, p in enumerate(gt):
        g.add_vertex(i, "se2", p + (rng.normal(0, 0.05, 3) if i else 0),
                     fixed=(i == 0))
    for i in range(n):
        z = np_lie.se2_compose(np_lie.se2_inverse(gt[i]), gt[(i + 1) % n])
        g.add_edge("edge_se2", (i, (i + 1) % n), z, info)

    prob = g.compile()
    pattern = build_ell_pattern(prob)
    lam = _lambda_init_pcg(prob, pattern, prob.params,
                           jnp.asarray(1e-5, prob.dtype))
    ni = jnp.asarray(2.0, prob.dtype)
    chi = robust_chi2(prob)

    st = (prob.params, lam, ni, chi)
    for _ in range(5):
        st = _lm_pcg_step(prob, pattern, *st, pcg_iters=100,
                          pcg_tol=0.05)[:4]

    _, _, _, chi_f, traj = lm_pcg_optimize_fused(
        prob, pattern, prob.params, lam, ni, chi, n_iters=5,
        pcg_iters=100, pcg_tol=0.05)
    np.testing.assert_allclose(float(chi_f), float(st[3]), rtol=1e-6)
    assert traj.shape == (5,)

    # chi=None computes the initial chi2 inside the fused program (the
    # online engine's one-dispatch-per-solve configuration) — identical
    # trajectory
    _, _, _, chi_n, _ = lm_pcg_optimize_fused(
        prob, pattern, prob.params, lam, ni, None, n_iters=5,
        pcg_iters=100, pcg_tol=0.05)
    np.testing.assert_allclose(float(chi_n), float(chi_f), rtol=1e-6)


def test_fused_trial_per_iter_matches_while_step():
    """trial_per_iter=True must walk the while-loop step's trajectory:
    a rejected trial re-linearizes the identical system (round-4 design
    note in lm_pcg_optimize_fused)."""
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.algorithms import (
        _lambda_init_pcg, _lm_pcg_step, lm_pcg_optimize_fused)
    from openslam_g2o_tpu.core.sparse import build_ell_pattern

    g, _ = make_se2_chain(n=14, noise=0.2)
    prob = g.compile(dtype=jnp.float64)
    pattern = build_ell_pattern(prob)
    lam = _lambda_init_pcg(prob, pattern, prob.params,
                           jnp.asarray(1e-5, prob.dtype))
    st = (prob.params, lam, jnp.asarray(2.0, prob.dtype),
          P.robust_chi2(prob))
    # while-loop steps, counting total trials
    st_w, trials = st, 0
    while trials < 8:
        out = _lm_pcg_step(prob, pattern, *st_w, pcg_iters=200,
                           pcg_tol=1e-12)
        st_w = out[:4]
        trials += int(out[4])
    out_t = lm_pcg_optimize_fused(prob, pattern, *st, n_iters=trials,
                                  pcg_iters=200, pcg_tol=1e-12,
                                  trial_per_iter=True)
    np.testing.assert_allclose(float(out_t[3]), float(st_w[3]), rtol=1e-9,
                               atol=1e-20)
