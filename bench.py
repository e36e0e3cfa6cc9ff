"""Benchmark suite: TPU performance + parity evidence on the reference
datasets and BAL-scale synthetic bundle adjustment.

Prints ONE JSON line whose headline is Manhattan3500 LM iterations/second:
{"metric", "value", "unit", "vs_baseline", ...} plus sections for
chi2 parity (gate: within 0.5% of the recorded reference minimum), ATE RMSE
(Umeyama-aligned trajectory error vs the converged f64 solution / simulator
ground truth), bundle adjustment at 80k and 400k observations
(venice871-proportioned; the real BAL files sit behind zero-egress
download.sh scripts, so a synthetic generator with identical structure
stands in — data/ba/venice/download.sh), roofline/MFU accounting per hot
phase, and the incremental/online engine's replay throughput.

Protocol (BASELINE.md): identical dataset, identical chi2 definition
(sum e^T Omega e), LM damping/trial semantics matching the reference
(optimization_algorithm_levenberg.cpp). The CPU baseline is a faithful
reimplementation of the reference's per-LM-iteration pipeline (analytic SE2
Jacobians + scipy sparse Cholesky — the same algorithmic structure as g2o's
CSparse backend, measured in-process since the reference C++ cannot be built
in this image: no Eigen, zero egress). vs_baseline = tpu_iters_per_sec /
cpu_baseline_iters_per_sec.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

MANHATTAN = "/root/reference/data/2d/manhattan3500/manhattanOlson3500.g2o"
INTEL = "/root/reference/data/2d/intel/intel.g2o"
# Converged chi2 for manhattanOlson3500 under this chi2 definition: the
# 2dlinear (Carlone orientation init) + GN f64 run reaches 146.0766 in 4
# iterations; plain LM f64 from the file init reaches 146.175 in 15. The
# f32 gate is CONVERGED_CHI2 * 1.005 (0.5%).
CONVERGED_CHI2 = 146.08
CHI2_GATE = 1.005
N_TIMED_ITERS = 10
# Frozen vs_baseline denominator: the MAX measured CPU baseline across
# rounds (16.23 it/s in round 1, 14.16 in round 2) — the speedup ratio is
# judged against the baseline's best day, never against its noise.
PINNED_CPU_BASELINE = 16.23
SPHERE = "/root/reference/data/3d/sphere/sphere_bignoise_vertex3.g2o"
# recorded f64 reference plateau for sphere_bignoise (BASELINE.md; all
# solvers plateau here after ~60 LM iterations) and the convergence gate:
# the TPU f32 SOLUTION re-evaluated in f64 must come within 0.5% — a gate
# that actually fails on optimizer regressions (round-4's 123 m flatness
# bound was a non-divergence proof, not a convergence proof)
SPHERE_PLATEAU = 743862.7
SPHERE_GATE = 1.005


def _load_problem(dtype):
    import jax.numpy as jnp
    from openslam_g2o_tpu.io.g2o_format import load_g2o

    g = load_g2o(MANHATTAN)
    if g.gauge_freedom():
        g.set_fixed(g.find_gauge(), True)
    return g, g.compile(dtype=dtype)


def _timed_window(run, st, n_iters, floor_s_per_iter=2e-4):
    """Robust fused-window timing: 3 repeats with a PERTURBED lambda per
    repeat (defeats any remote-service result caching of identical
    program+input executions), MEDIAN instead of min, and a physical-floor
    guard — the round-5 dress run once recorded 0.31 ms for a 10-LM-iter
    Manhattan window (32k it/s, unphysical: one LM iteration costs at
    least one PCG iteration) that 7/7 immediate re-probes could not
    reproduce; a headline must never ride such an artifact. If the median
    still sits under the floor, fall back to timing with a forced value
    fetch inside the window (real data, dispatch-inflated — a safe
    UNDERestimate of throughput)."""
    import jax

    def sample(i, fetch=False):
        stp = (st[0], st[1] * (1.0 + 1e-7 * (i + 1)), st[2], st[3])
        t0 = time.monotonic()
        out = run(stp)
        jax.block_until_ready(out[0])
        if fetch:
            float(out[3])
        return time.monotonic() - t0

    samples = sorted(sample(i) for i in range(3))
    elapsed = samples[1]
    if elapsed < floor_s_per_iter * n_iters:
        _progress(f"timed window median {elapsed*1e3:.2f} ms is below the "
                  f"physical floor — re-timing with value fetch")
        elapsed = sorted(sample(i, fetch=True) for i in range(3))[1]
    return elapsed


def run_tpu_manhattan():
    """Time LM iterations on the TPU (matrix-free lane-major block-ELL PCG,
    the TPU-native fast path), then converge with a tight-tolerance polish
    phase for the chi2 parity gate.

    Timing uses the fused multi-step runner (lax.scan over LM steps — the
    production serving shape: the whole optimization is one XLA executable);
    per-step host dispatch pipelines to the same steady-state rate, so the
    number is representative of both driving modes.
    """
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.algorithms import (
        _lm_pcg_step, _lambda_init_pcg, lm_pcg_optimize_fused)
    from openslam_g2o_tpu.core.problem import robust_chi2
    from openslam_g2o_tpu.core.sparse import build_ell_pattern

    graph, prob = _load_problem(jnp.float32)
    pattern = build_ell_pattern(prob)
    # Inexact-Newton forcing (relative tol 0.15, budget 100) is the fast
    # mid-optimization config; the rho test guards inexact steps. Measured
    # on the timed window this config descends DEEPER per step than the
    # older tol-0.05 setting (chi 334 vs 405 after the same 10 steps) while
    # running ~10% faster — looser forcing is both cheaper and, via LM's
    # gain control, better-conditioned here.
    step = lambda *s: _lm_pcg_step(prob, pattern, *s, pcg_iters=100,
                                   pcg_tol=0.15)[:4]
    lam = _lambda_init_pcg(prob, pattern, prob.params,
                           jnp.asarray(1e-5, prob.dtype))
    st = (prob.params, lam, jnp.asarray(2.0, prob.dtype), robust_chi2(prob))
    # warmup/compile + move into the basin so timed iterations are
    # representative mid-optimization steps
    for _ in range(5):
        st = step(*st)
    jax.block_until_ready(st[0])
    run10 = lambda s: lm_pcg_optimize_fused(prob, pattern, *s, n_iters=10,
                                            pcg_iters=100, pcg_tol=0.15)
    out = run10(st)                     # compile
    jax.block_until_ready(out[0])
    elapsed = _timed_window(run10, st, n_iters=10)
    st = out[:4]
    # converge: more forcing steps, then warm-started tight-tolerance polish
    # toward the reference minimum (146.076 at f32). NOTE the basin is very
    # flat: the gauge-fixed Hessian's smallest eigenvalue at the minimum is
    # ~1.6e-5, so a chi2 excess of just 0.01 permits ~0.3-0.6 m of
    # chi2-equivalent trajectory drift (reported as chi2_flat_ate_bound in
    # the output). f32 chi2 cannot resolve the minimum position below that;
    # the ATE number must be read against the bound, not against zero.
    out = run10(st)
    st = out[:4]
    polish = lambda s, n: lm_pcg_optimize_fused(
        prob, pattern, *s, n_iters=n, pcg_iters=600, pcg_tol=1e-6, warm=True)
    out = polish(st, 10)
    st = out[:4]
    for _ in range(10):
        if float(st[3]) <= CONVERGED_CHI2 * 1.0003:
            break
        out = polish(st, 10)
        st = out[:4]
    est = np.asarray(st[0]["se2"])        # full [N, 3] (f64 re-evaluation)
    return N_TIMED_ITERS / elapsed, float(st[3]), est


def _manhattan_arrays():
    """Host f64 edge arrays of the Manhattan graph (shared by the CPU
    baseline and the f64 re-evaluation of the TPU f32 solution)."""
    from openslam_g2o_tpu.io.g2o_format import load_g2o

    g = load_g2o(MANHATTAN)
    ids = sorted(g.vertices)
    idx = {v: i for i, v in enumerate(ids)}
    x = np.stack([g.vertices[v].params for v in ids])  # [N,3]
    ii = np.array([idx[e.vertex_ids[0]] for e in g.edges])
    jj = np.array([idx[e.vertex_ids[1]] for e in g.edges])
    meas = np.stack([e.measurement for e in g.edges])
    info = np.stack([e.information for e in g.edges])
    return x, ii, jj, meas, info


def se2_chi2_f64(x, ii, jj, meas, info):
    """Exact f64 chi2 of an SE2 pose array under the reference chi2
    definition (sum e^T Omega e) — evaluates the TPU f32 SOLUTION in f64,
    so f32 chi2 summation/representation stops limiting how tightly the
    solution can be placed against the f64 minimum (round-4 task:
    mixed-precision polish accounting)."""
    from openslam_g2o_tpu.utils import np_lie

    x = np.asarray(x, dtype=np.float64)
    xi, xj = x[ii], x[jj]
    ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    rx = ci * dx + si * dy
    ry = -si * dx + ci * dy
    rth = xj[:, 2] - xi[:, 2]
    cz, sz = np.cos(meas[:, 2]), np.sin(meas[:, 2])
    ex = cz * (rx - meas[:, 0]) + sz * (ry - meas[:, 1])
    ey = -sz * (rx - meas[:, 0]) + cz * (ry - meas[:, 1])
    eth = np_lie.normalize_angle(rth - meas[:, 2])
    r = np.stack([ex, ey, eth], 1)
    return float(np.einsum("ea,eab,eb->", r, info, r))


def run_cpu_baseline(n_iters=3, converge_iters=30):
    """Reference-equivalent LM iteration on CPU: analytic SE2 Jacobians,
    sparse CSC Hessian, scipy sparse Cholesky (splu on the SPD system —
    the CSparse-equivalent exact factorization), same damping semantics.

    Also runs to convergence (f64) to produce the reference trajectory for
    the ATE comparison."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from openslam_g2o_tpu.utils import np_lie

    x, ii, jj, meas, info = _manhattan_arrays()
    N = len(x)
    fixed0 = 0  # gauge

    def errors(x):
        xi, xj = x[ii], x[jj]
        ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
        dx = xj[:, 0] - xi[:, 0]
        dy = xj[:, 1] - xi[:, 1]
        # Xi^-1 * Xj
        rx = ci * dx + si * dy
        ry = -si * dx + ci * dy
        rth = xj[:, 2] - xi[:, 2]
        cz, sz = np.cos(meas[:, 2]), np.sin(meas[:, 2])
        # Z^-1 * (.)
        ex = cz * (rx - meas[:, 0]) + sz * (ry - meas[:, 1])
        ey = -sz * (rx - meas[:, 0]) + cz * (ry - meas[:, 1])
        eth = np_lie.normalize_angle(rth - meas[:, 2])
        return np.stack([ex, ey, eth], 1), (rx, ry, ci, si, cz, sz)

    def jacobians(x, aux):
        rx, ry, ci, si, cz, sz = aux
        E_ = len(rx)
        Rz = np.zeros((E_, 2, 2))
        Rz[:, 0, 0] = cz; Rz[:, 0, 1] = sz; Rz[:, 1, 0] = -sz; Rz[:, 1, 1] = cz
        Ji = np.zeros((E_, 3, 3)); Jj = np.zeros((E_, 3, 3))
        # d(rx,ry)/dtheta_i = (-si*dx+ci*dy, -ci*dx-si*dy) = (ry, -rx)
        dr_dthi = np.stack([ry, -rx], 1)
        Ji_r = np.einsum("eab,eb->ea", Rz, dr_dthi)
        Ji[:, 0, 2] = Ji_r[:, 0]; Ji[:, 1, 2] = Ji_r[:, 1]; Ji[:, 2, 2] = -1.0
        blk = np.stack([np.stack([ci, si], 1), np.stack([-si, ci], 1)], 1)
        JiR = -np.einsum("eab,ebc->eac", Rz, blk)
        Ji[:, :2, :2] = JiR
        Jj[:, :2, :2] = np.einsum("eab,ebc->eac", Rz, blk)
        Jj[:, 2, 2] = 1.0
        return Ji, Jj

    def build(x):
        r, aux = errors(x)
        Ji, Jj = jacobians(x, aux)
        # mask gauge
        free = np.ones(N); free[fixed0] = 0.0
        Ji = Ji * free[ii][:, None, None]
        Jj = Jj * free[jj][:, None, None]
        WJi = np.einsum("eab,ebc->eac", info, Ji)
        WJj = np.einsum("eab,ebc->eac", info, Jj)
        Hii = np.einsum("eba,ebc->eac", Ji, WJi)
        Hij = np.einsum("eba,ebc->eac", Ji, WJj)
        Hjj = np.einsum("eba,ebc->eac", Jj, WJj)
        bi = -np.einsum("eba,eb->ea", Ji, np.einsum("eab,eb->ea", info, r))
        bj = -np.einsum("eba,eb->ea", Jj, np.einsum("eab,eb->ea", info, r))
        rows = np.concatenate([
            (ii[:, None, None] * 3 + np.arange(3)[None, :, None] + np.zeros((1, 1, 3), int)).ravel(),
            (ii[:, None, None] * 3 + np.arange(3)[None, :, None] + np.zeros((1, 1, 3), int)).ravel(),
            (jj[:, None, None] * 3 + np.arange(3)[None, :, None] + np.zeros((1, 1, 3), int)).ravel(),
            (jj[:, None, None] * 3 + np.arange(3)[None, :, None] + np.zeros((1, 1, 3), int)).ravel(),
        ])
        cols = np.concatenate([
            (ii[:, None, None] * 3 + np.zeros((1, 3, 1), int) + np.arange(3)[None, None, :]).ravel(),
            (jj[:, None, None] * 3 + np.zeros((1, 3, 1), int) + np.arange(3)[None, None, :]).ravel(),
            (ii[:, None, None] * 3 + np.zeros((1, 3, 1), int) + np.arange(3)[None, None, :]).ravel(),
            (jj[:, None, None] * 3 + np.zeros((1, 3, 1), int) + np.arange(3)[None, None, :]).ravel(),
        ])
        vals = np.concatenate([Hii.ravel(), Hij.ravel(),
                               np.swapaxes(Hij, 1, 2).ravel(), Hjj.ravel()])
        H = sp.coo_matrix((vals, (rows, cols)), shape=(3 * N, 3 * N)).tocsc()
        fixdiag = np.zeros(3 * N); fixdiag[3 * fixed0:3 * fixed0 + 3] = 1.0
        H = H + sp.diags(fixdiag)
        b = np.zeros(3 * N)
        np.add.at(b, (ii[:, None] * 3 + np.arange(3)[None, :]).ravel(), bi.ravel())
        np.add.at(b, (jj[:, None] * 3 + np.arange(3)[None, :]).ravel(), bj.ravel())
        chi = np.einsum("ea,eab,eb->", r, info, r)
        return H, b, chi

    def chi2_of(x):
        r, _ = errors(x)
        return np.einsum("ea,eab,eb->", r, info, r)

    H, b, chi = build(x)
    lam = 1e-5 * np.abs(H.diagonal()).max()
    free = np.ones(N); free[fixed0] = 0.0
    t0 = time.monotonic()
    elapsed = None
    for it in range(converge_iters):
        H, b, chi = build(x)
        for _trial in range(10):
            Hd = H + sp.diags(np.repeat(free, 3) * lam)
            dx = spla.splu(Hd.tocsc()).solve(b)
            xc = x + (dx.reshape(N, 3) * np.repeat(free, 3).reshape(N, 3))
            xc[:, 2] = np_lie.normalize_angle(xc[:, 2])
            chi_new = chi2_of(xc)
            rho = (chi - chi_new) / (dx @ (lam * dx + b) + 1e-3)
            if rho > 0 and np.isfinite(chi_new):
                x = xc
                lam *= max(1 / 3, min(1 - (2 * rho - 1) ** 3, 2 / 3))
                break
            lam *= 2
        if it + 1 == n_iters:
            elapsed = time.monotonic() - t0
    H, _, _ = build(x)   # gauge-fixed Hessian AT the minimum (flatness probe)
    return n_iters / elapsed, chi2_of(x), x, H


def run_tpu_ba(n_cams, n_points, obs_per_point, pcg_iters, pcg_tol,
               n_timed=N_TIMED_ITERS, n_converge=10):
    """Bundle adjustment: dual-ELL Schur LM on a synthetic BAL-style problem.
    Returns (iters/s, final chi2, n_obs, roofline dict, ate_rmse vs GT)."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.apps.simulator import synthetic_bal_problem
    from openslam_g2o_tpu.core.ba_ell import (
        LevenbergMarquardtSchurELL, ba_ell_step, build_ba_ell_pattern)
    from openslam_g2o_tpu.utils.ate import ate_rmse
    from openslam_g2o_tpu.utils import roofline as RL

    prob, gt = synthetic_bal_problem(n_cams=n_cams, n_points=n_points,
                                     obs_per_point=obs_per_point,
                                     dtype=jnp.float32)
    pattern = build_ba_ell_pattern(prob)
    algo = LevenbergMarquardtSchurELL()
    state = algo.init(prob)
    st = (state["params"], state["lam"], state["ni"], state["chi2"])
    from openslam_g2o_tpu.core import ba_ell as BE
    fused_ok = not (BE._wants_host_trials(pattern)
                    or BE._fused_chunk_unsafe(prob, pattern))
    if fused_ok:
        # production serving shape: the whole window is ONE XLA executable
        # (lax.scan, loop-free trial-per-iteration body) — per-step host
        # dispatch through the tunnel would otherwise add ~2-4 ms/step
        # (round-4 measurement); same methodology as the Manhattan window
        n_timed = max(n_timed, 30)
        run = lambda s, n: BE.ba_ell_optimize_fused(
            prob, pattern, *s, n_iters=n, pcg_iters=pcg_iters,
            pcg_tol=pcg_tol)
        out = run(st, n_timed)          # compile
        jax.block_until_ready(out[0])
        # robust window timing (_timed_window): perturbed lambda per
        # repeat + median — the remote service can serve a CACHED result
        # for an identical (program, inputs) re-execution (round-5
        # discovery; it once returned a 10-iter window in 0.31 ms)
        elapsed = _timed_window(lambda s: run(s, n_timed), st,
                                n_iters=n_timed)
        out = run(st, n_timed)
        st = out[:4]
        for _ in range(max(n_converge // n_timed, 1)):
            out = run(st, n_timed)
            st = out[:4]
    else:
        # chunk-scanned pattern (400k shape): the unpeeled while-loop step
        # is the only on-chip-verified configuration — host-driven loop
        ba_step = lambda *s: ba_ell_step(prob, pattern, *s,
                                         pcg_iters=pcg_iters, pcg_tol=pcg_tol)
        out = ba_step(*st)
        jax.block_until_ready(out[0])
        st = out[:4]
        t0 = time.monotonic()
        for _ in range(n_timed):
            out = ba_step(*st)
            st = out[:4]
        jax.block_until_ready(st[0])
        elapsed = time.monotonic() - t0
        for _ in range(n_converge):
            out = ba_step(*st)
            st = out[:4]
    seconds_per_step = elapsed / n_timed
    cost = RL.ba_ell_step_cost(prob, pattern, pcg_iters=pcg_iters)
    roof = RL.roofline_report(cost, seconds_per_step)
    # ATE of the estimated structure vs simulator ground truth (aligned)
    pts_est = None
    for name, arr in st[0].items():
        if np.asarray(arr).shape[-1] == 3:
            pts_est = np.asarray(arr)
    ate = ate_rmse(pts_est, gt["points"]) if pts_est is not None else None
    return (n_timed / elapsed, float(st[3]), gt["n_obs"], roof,
            None if ate is None else float(ate))


def expected_ba_chi2(n_obs, n_cams, n_points, pixel_noise=1.0):
    """Noise-floor chi2 for the synthetic BAL scenes: residual dof times the
    injected pixel variance, E[chi2_min] ~ (2*E - dof) * sigma^2 with
    dof = 6*(C-1) + 3*P free parameters (identity information, cam 0 fixed).
    The converged solver must land within a few percent of this — the
    convergence gate the reference's known-minimum datasets provide for the
    pose graphs (BASELINE.md protocol)."""
    dof = 6 * (n_cams - 1) + 3 * n_points
    return (2.0 * n_obs - dof) * pixel_noise ** 2


def run_cpu_ba_baseline(n_cams, n_points, obs_per_point, n_iters=3,
                        converge_iters=15):
    """Reference-equivalent Schur BA iteration on CPU: analytic projection
    Jacobians, block Schur complement over the landmark blocks, scipy
    sparse LU on the reduced camera system (the CSparse-equivalent exact
    factorization, block_solver.hpp:353-486 pipeline), same LM damping
    semantics. Measured in-process on the SAME synthetic scene as the TPU
    run (the reference C++ cannot be built in this image: no Eigen, zero
    egress). The symbolic phase (pair sort) runs once outside the timed
    loop, like the reference's buildStructure."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    import jax.numpy as jnp
    from openslam_g2o_tpu.apps.simulator import synthetic_bal_problem

    prob, gt = synthetic_bal_problem(n_cams=n_cams, n_points=n_points,
                                     obs_per_point=obs_per_point,
                                     dtype=jnp.float32)
    et_name = next(iter(prob.edges))
    ea = prob.edges[et_name]
    pt_idx = np.asarray(ea.indices[0]).astype(np.int64)
    cam_idx = np.asarray(ea.indices[1]).astype(np.int64)
    obs = np.asarray(ea.measurement, dtype=np.float64)
    focal = float(np.asarray(ea.pdata[0])[0, 0])
    cams = np.asarray(prob.params["se3_expmap"], dtype=np.float64)  # [C,7] t,q
    pts = np.asarray(prob.params["sba_point_xyz"], dtype=np.float64)
    C, P, E = n_cams, n_points, len(obs)
    free_cam = np.ones(C)
    free_cam[0] = 0.0

    def quat_to_R(q):
        x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                      2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                      2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                      1 - 2 * (x * x + y * y)], -1)], -2)

    def residuals(cams, pts):
        R = quat_to_R(cams[:, 3:7])
        pc = np.einsum("eab,eb->ea", R[cam_idx], pts[pt_idx]) \
            + cams[cam_idx, :3]
        z = np.maximum(pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None] * focal
        return proj - obs, pc, R

    def chi2_of(cams, pts):
        r, _, _ = residuals(cams, pts)
        return float((r * r).sum())

    def linearize_np(cams, pts):
        r, pc, R = residuals(cams, pts)
        x, y, z = pc[:, 0], pc[:, 1], np.maximum(pc[:, 2], 1e-6)
        iz = 1.0 / z
        dproj = np.zeros((E, 2, 3))
        dproj[:, 0, 0] = focal * iz
        dproj[:, 0, 2] = -focal * x * iz * iz
        dproj[:, 1, 1] = focal * iz
        dproj[:, 1, 2] = -focal * y * iz * iz
        # cam tangent: left-multiplicative (upsilon, omega) on w2c
        dpc_dcam = np.zeros((E, 3, 6))
        dpc_dcam[:, :, :3] = np.eye(3)
        dpc_dcam[:, 0, 4] = pc[:, 2];  dpc_dcam[:, 0, 5] = -pc[:, 1]
        dpc_dcam[:, 1, 3] = -pc[:, 2]; dpc_dcam[:, 1, 5] = pc[:, 0]
        dpc_dcam[:, 2, 3] = pc[:, 1];  dpc_dcam[:, 2, 4] = -pc[:, 0]
        Jc = np.einsum("eab,ebc->eac", dproj, dpc_dcam) \
            * free_cam[cam_idx][:, None, None]
        Jp = np.einsum("eab,ebc->eac", dproj, R[cam_idx])
        return r, Jc, Jp

    def retract(cams, dxc):
        ups, om = dxc[:, :3], dxc[:, 3:]
        th = np.linalg.norm(om, axis=1, keepdims=True)
        small = th[:, 0] < 1e-12
        ax = om / np.where(th > 1e-12, th, 1.0)
        q = np.concatenate([np.sin(th / 2) * ax, np.cos(th / 2)], axis=1)
        q[small] = [0, 0, 0, 1]
        Rd = quat_to_R(q)
        out = cams.copy()
        out[:, :3] = np.einsum("cab,cb->ca", Rd, cams[:, :3]) + ups
        qc = cams[:, 3:7]
        x1, y1, z1, w1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        x2, y2, z2, w2 = qc[:, 0], qc[:, 1], qc[:, 2], qc[:, 3]
        out[:, 3] = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
        out[:, 4] = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
        out[:, 5] = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
        out[:, 6] = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
        out[:, 3:7] /= np.linalg.norm(out[:, 3:7], axis=1, keepdims=True)
        return out

    # symbolic phase: landmark-major observation grouping + camera-pair
    # ordering for the Schur fill (runs once — buildStructure analogue)
    order = np.argsort(pt_idx, kind="stable")
    counts = np.bincount(pt_idx, minlength=P)
    assert counts.min() == counts.max(), "uniform obs/point expected"
    m = int(counts[0])
    e_of = order.reshape(P, m)            # [P, m] edge ids per landmark
    cam_of = cam_idx[e_of]                # [P, m]
    pair_ca = np.repeat(cam_of, m, axis=1).reshape(P, m, m)
    pair_cb = np.tile(cam_of, (1, m)).reshape(P, m, m)
    pair_flat = (pair_ca * C + pair_cb).reshape(-1)
    pair_order = np.argsort(pair_flat, kind="stable")
    pair_sorted = pair_flat[pair_order]
    uniq_pairs, pair_starts = np.unique(pair_sorted, return_index=True)
    Srows = np.broadcast_to((uniq_pairs // C)[:, None, None] * 6
                            + np.arange(6)[None, :, None],
                            (len(uniq_pairs), 6, 6))
    Scols = np.broadcast_to((uniq_pairs % C)[:, None, None] * 6
                            + np.arange(6)[None, None, :],
                            (len(uniq_pairs), 6, 6))
    cam_flat = cam_of.reshape(-1)
    cam_order = np.argsort(cam_flat, kind="stable")
    cam_starts = np.searchsorted(cam_flat[cam_order], np.arange(C))

    lam = None
    t0 = time.monotonic()
    elapsed = None
    chi = chi2_of(cams, pts)
    ni = 2.0
    for it in range(converge_iters):
        r, Jc, Jp = linearize_np(cams, pts)
        # block quantities
        Hcc = np.zeros((C, 6, 6))
        np.add.at(Hcc, cam_idx, np.einsum("eab,eac->ebc", Jc, Jc))
        bc = np.zeros((C, 6))
        np.add.at(bc, cam_idx, -np.einsum("eab,ea->eb", Jc, r))
        Hll = np.einsum("eab,eac->ebc", Jp[e_of].reshape(-1, 2, 3),
                        Jp[e_of].reshape(-1, 2, 3)).reshape(P, m, 3, 3).sum(1)
        bl = -np.einsum("eab,ea->eb", Jp[e_of].reshape(-1, 2, 3),
                        r[e_of].reshape(-1, 2)).reshape(P, m, 3).sum(1)
        W = np.einsum("eab,eac->ebc", Jc, Jp)          # [E, 6, 3]
        W_lm = W[e_of]                                  # [P, m, 6, 3]
        if lam is None:
            dmax = max(np.abs(np.einsum("caa->ca", Hcc)).max(),
                       np.abs(np.einsum("paa->pa", Hll)).max())
            lam = 1e-5 * dmax
        for _trial in range(10):
            Hll_d = Hll + lam * np.eye(3)
            Hinv = np.linalg.inv(Hll_d)
            # reduced system blocks: W Hll^-1 W^T per camera pair
            WH = np.einsum("pmst,ptu->pmsu", W_lm, Hinv)
            pairs = np.einsum("pmsu,pnvu->pmnsv", WH, W_lm)
            pair_blocks = pairs.reshape(-1, 6, 6)[pair_order]
            S_blocks = np.add.reduceat(pair_blocks, pair_starts, axis=0)
            diag_pairs = uniq_pairs // C == uniq_pairs % C
            S_blocks = -S_blocks
            S_blocks[diag_pairs] += Hcc[uniq_pairs[diag_pairs] // C] \
                + lam * np.eye(6)
            # fixed cam: unit diagonal (J columns already masked)
            fixed_diag = diag_pairs & (free_cam[uniq_pairs // C] == 0.0)
            S_blocks[fixed_diag] = np.eye(6)
            S = sp.coo_matrix(
                (S_blocks.ravel(), (Srows.ravel(), Scols.ravel())),
                shape=(6 * C, 6 * C)).tocsc()
            hib = np.einsum("pst,pt->ps", Hinv, bl)
            b_red = bc - np.add.reduceat(
                np.einsum("pmst,pt->pms", W_lm, hib).reshape(-1, 6)
                [cam_order], cam_starts, axis=0)
            dxc = spla.splu(S).solve(b_red.reshape(-1)).reshape(C, 6) \
                * free_cam[:, None]
            u = np.einsum("pmst,pms->pt", W_lm, dxc[cam_of])
            dxl = np.einsum("pst,pt->ps", Hinv, bl - u)
            cams_new = retract(cams, dxc)
            pts_new = pts + dxl
            chi_new = chi2_of(cams_new, pts_new)
            denom = (dxc * (lam * dxc + bc)).sum() \
                + (dxl * (lam * dxl + bl)).sum() + 1e-3
            rho = (chi - chi_new) / denom
            if rho > 0 and np.isfinite(chi_new):
                cams, pts, chi = cams_new, pts_new, chi_new
                lam *= max(1 / 3, min(1 - (2 * rho - 1) ** 3, 2 / 3))
                ni = 2.0
                break
            lam *= ni
            ni *= 2.0
        if it + 1 == n_iters:
            elapsed = time.monotonic() - t0
    return n_iters / elapsed, chi


def run_pose_graph_100k():
    """100,000-pose SE2 pose graph on ONE chip — the scale proof for the
    pose-graph path (the reference handles such graphs via CHOLMOD,
    linear_solver_csparse.h:106-143; here the two-tier lane-major ELL-PCG
    LM runs the whole problem on-chip). Synthetic serpentine-grid graph
    with a computable noise floor (synthetic_pose_graph_2d docstring);
    gate: converge within 2% of the floor."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.apps.simulator import synthetic_pose_graph_2d
    from openslam_g2o_tpu.core.sparse import build_ell_pattern
    from openslam_g2o_tpu.core.algorithms import (
        _lambda_init_pcg, lm_pcg_optimize_fused)
    from openslam_g2o_tpu.core.problem import robust_chi2
    from openslam_g2o_tpu.utils import roofline as RL

    # noise scale: rotation drift over one 10k-pose sweep must stay well
    # under pi/2 or the closure measurements wrap and the problem stops
    # being basin-connected from the odometry init (round-4 on-chip
    # finding: sigma_rot=0.01 at 100k poses stalls LM at 30x the floor —
    # the reference would need its 2dlinear orientation init there too)
    t0 = time.monotonic()
    prob, info = synthetic_pose_graph_2d(n_poses=100000, grid=100,
                                         trans_noise=0.03, rot_noise=0.002,
                                         dtype=jnp.float32)
    pattern = build_ell_pattern(prob)
    build_s = time.monotonic() - t0
    lam = _lambda_init_pcg(prob, pattern, prob.params,
                           jnp.asarray(1e-5, prob.dtype))
    st = (prob.params, lam, jnp.asarray(2.0, prob.dtype), robust_chi2(prob))
    run = lambda s, n: lm_pcg_optimize_fused(prob, pattern, *s, n_iters=n,
                                             pcg_iters=100, pcg_tol=0.15)
    t0 = time.monotonic()
    out = run(st, 10)
    jax.block_until_ready(out[0])
    compile_s = time.monotonic() - t0
    st = out[:4]
    elapsed = _timed_window(lambda s: run(s, 10), st, n_iters=10)
    out = run(st, 10)
    st = out[:4]
    floor = info["noise_floor_chi2"]
    for _ in range(8):
        if float(st[3]) <= floor * 1.05:
            break
        out = run(st, 10)
        st = out[:4]
    # polish: warm-started tighter-tolerance windows (the Manhattan polish
    # config; NOTE pcg budget 2000 in a fused window faulted the TPU
    # backend at this shape on this toolchain — keep the proven 600)
    pol = lambda s: lm_pcg_optimize_fused(
        prob, pattern, *s, n_iters=5, pcg_iters=600, pcg_tol=1e-6,
        warm=True)
    for _ in range(10):
        if float(st[3]) <= floor * 1.02:
            break
        out = pol(st)
        st = out[:4]
    # per-CG-iteration roofline (carry-serialized scan differencing) —
    # the HOT-loop configuration: DIA-direct assembled values (on this
    # serpentine graph every neighbor offset is one of {0, +-1, +-sweep},
    # so the matvec runs with ZERO gathers); NOTE rounds 3-4 quoted
    # 35 us/iteration from repeat-the-call timing, which the remote
    # service's result caching under-measured ~3x
    from openslam_g2o_tpu.core.problem import linearize
    from openslam_g2o_tpu.core.sparse import (
        assemble_hot, ell_matvec_lane_kmajor_hot, hot_split)
    from openslam_g2o_tpu.core.solvers import pcg_solve
    work = prob.with_params(st[0])
    lin = linearize(work)
    hot, b = assemble_hot(work, pattern, lin)
    bT = {k: v.T for k, v in b.items()}

    per_iter = _scan_differenced_cg_iteration(work, pattern, hot, bT)
    cost = RL.ell_pcg_iteration_cost(prob, pattern)
    return {
        "n_poses": 100000,
        "n_edges": int(info["n_edges"]),
        "lm_iters_per_sec": round(10 / elapsed, 2),
        "ms_per_lm_iter": round(elapsed / 10 * 1e3, 2),
        "final_chi2": round(float(st[3]), 1),
        "noise_floor_chi2": round(floor, 1),
        "chi2_gate": BA_CHI2_GATE,
        "converged_to_noise_floor": bool(float(st[3]) <= floor * 1.02),
        "build_plus_pattern_seconds": round(build_s, 2),
        "compile_seconds_first_window": round(compile_s, 1),
        "cg_iteration_roofline": RL.roofline_report(cost, per_iter),
    }


def _scan_differenced_cg_iteration(work, pattern, hot, bT, n_cg=100,
                                   k_lo=2, k_hi=8):
    """Per-CG-iteration time by CARRY-SERIALIZED scan differencing: a
    lax.scan whose body perturbs its rhs through the carry re-executes the
    whole 100-iteration CG solve every scan step — the only timing
    methodology robust to BOTH XLA hoisting and the remote service's
    result caching of identical (program, input) executions. Round-5
    finding: the old repeat-the-same-call averaging measured 32-43 us per
    iteration where the true cost is ~105 us — cached re-executions
    returned at the dispatch floor; the end-to-end LM window arithmetic
    only closes with the scan-differenced number."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.sparse import (
        ell_matvec_lane_kmajor_hot, hot_split)
    from openslam_g2o_tpu.core.solvers import pcg_solve

    # the hot entries carry static "dia"/"k" tags — pass only the array
    # leaves into jit and rebuild the tagged tuple inside the trace
    hot_vals = tuple(v for e in hot for v in e[1:] if v is not None)

    def make(K):
        def f(hot_vals, bT, seed):
            it = iter(hot_vals)
            tagged = tuple((e[0], next(it),
                            None if e[2] is None else next(it))
                           for e in hot)
            ops = hot_split(work, pattern, tagged)
            mv = lambda xT: ell_matvec_lane_kmajor_hot(work, pattern, ops,
                                                       xT)

            def body(carry, _):
                fc = 1.0 + (carry - jnp.floor(carry)) * 1e-5 + 1e-6
                sol, ok = pcg_solve(
                    mv, {k: v * fc for k, v in bT.items()},
                    max_iter=n_cg, tol=0.0, unroll=2)
                return carry + jnp.abs(sol[list(sol)[0]]).mean() * 0.1, None

            c, _ = jax.lax.scan(body, seed, None, length=K)
            return c
        return jax.jit(f)

    def timed(jf):
        seed = jnp.asarray(0.321, work.dtype)
        out = jf(hot_vals, bT, seed)
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(2):
            t0 = time.monotonic()
            out = jf(hot_vals, bT, seed * (1.0 + 1e-6 * (r + 1)))
            jax.block_until_ready(out)
            best = min(best, time.monotonic() - t0)
        return best

    t_lo, t_hi = timed(make(k_lo)), timed(make(k_hi))
    return max((t_hi - t_lo) / ((k_hi - k_lo) * n_cg), 1e-9)


def run_marginals_80k():
    """Schur-path marginal covariances ON the 80k-observation BA problem,
    on-chip: wall time + a spot-check of camera/landmark diagonal blocks
    against an INDEPENDENT host-side numpy assembly (flat W gather +
    np.add.at scatter into a dense S + numpy inverse — a completely
    different assembly than the B2-matmul route compute_marginals_schur
    now runs, so it catches at-scale densify/assembly bugs; the Schur
    identity itself is verified against dense H^-1 in
    tests/test_marginals_schur.py)."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.apps.simulator import synthetic_bal_problem
    from openslam_g2o_tpu.core import ba_ell as BE
    from openslam_g2o_tpu.core.marginals import compute_marginals_schur
    from openslam_g2o_tpu.core.problem import linearize

    import dataclasses as _dc

    prob, _ = synthetic_bal_problem(n_cams=100, n_points=10000,
                                    obs_per_point=8, dtype=jnp.float32)
    # fix a second camera: monocular BA has a 7-dof (similarity) gauge and
    # cam 0 pins only 6 — the remaining near-null SCALE mode makes the
    # covariances mathematically huge and numerically meaningless (both
    # routes then disagree at ~10% from rounding in the near-singular
    # direction). With the scale gauge pinned the covariance is well-posed
    # and the routes agree to f32 roundoff.
    Tp = prob.static.pose_dim
    cg = [g for g in prob.static.vgroups if g.offset < Tp][0]
    free2 = dict(prob.free)
    free2[cg.name] = free2[cg.name].at[1].set(0.0)
    prob = _dc.replace(prob, free=free2)
    pattern = BE.build_ba_ell_pattern(prob)
    cov = compute_marginals_schur(prob, pattern)
    jax.block_until_ready(cov)
    # timed on a PERTURBED problem (remote result-cache defense: an
    # identical re-execution of the device phase can be served cached)
    probt = prob.with_params({k: v * (1.0 + 1e-9)
                              for k, v in prob.params.items()})
    t0 = time.monotonic()
    cov = compute_marginals_schur(probt, pattern)
    jax.block_until_ready(cov)
    seconds = time.monotonic() - t0

    # independent HOST route: numpy scatter assembly of S from the flat
    # per-landmark W tables, numpy inverse. The check derives its
    # reference from THE SAME linearization/_build products the route
    # consumes (passed via lin=/sys=) and runs at HIGHEST matmul
    # precision: round 4 shipped a phantom 185% "failure" from bf16-pass
    # inputs, and round 5 chased a phantom 1e-2 from comparing two
    # SEPARATE f32 evaluations of the 8e4-term Hcc reductions (eager vs
    # jitted fusion order, amplified ~1e3x through S^-1). Sharing the
    # inputs is correct: the check's job is catching route-added
    # assembly/densify/recovery bugs, not re-deriving shared input math.
    dt = prob.dtype
    lg = prob.static.vgroup(pattern.lm_name)
    dl, L = lg.tangent_dim, lg.count
    Tp = prob.static.pose_dim
    cg = [g for g in prob.static.vgroups if g.offset < Tp][0]
    Dp = cg.tangent_dim

    from openslam_g2o_tpu.core.marginals import _gather_w_flat
    pg = pattern.proj[0]
    with jax.default_matmul_precision("highest"):
        lin = jax.jit(linearize)(prob)
        sys_ = jax.jit(lambda p, l: BE._build(p, pattern, l))(prob, lin)
        Hll, Hcc = sys_["Hll"], sys_["groups"][cg.name]["Hcc"]
        W_lm = np.asarray(_gather_w_flat(prob, lin, pg),
                          dtype=np.float64)             # [L, K, Dp, dl]
        cov = compute_marginals_schur(prob, pattern, lin=lin, sys=sys_)
        jax.block_until_ready(cov)
    free_l = np.asarray(prob.free[lg.name], dtype=np.float64)
    Hll_np = np.moveaxis(np.asarray(Hll, dtype=np.float64), -1, 0)
    Hll_np += (1.0 - free_l)[:, None, None] * np.eye(dl)
    Hinv_np = np.linalg.inv(Hll_np)                     # [L, dl, dl]
    f = np.asarray(prob.free[cg.name], dtype=np.float64)
    Hcc_np = np.moveaxis(np.asarray(Hcc, dtype=np.float64), -1, 0)
    Hcc_np = Hcc_np * f[:, None, None] \
        + (1.0 - f)[:, None, None] * np.eye(Dp)
    S_np = np.zeros((Tp, Tp))
    gidx = np.arange(cg.count)[:, None] * Dp + np.arange(Dp)[None, :]
    S_np[gidx[:, :, None], gidx[:, None, :]] += Hcc_np
    lm_cam = np.asarray(pg.lm_cam)                      # [L, K]
    pairs = np.einsum("lkst,ltu,lmvu->lkmsv", W_lm, Hinv_np, W_lm)
    rows = (lm_cam[:, :, None] * Dp)[..., None, None] \
        + np.arange(Dp)[None, None, None, :, None]
    cols = (lm_cam[:, None, :] * Dp)[..., None, None] \
        + np.arange(Dp)[None, None, None, None, :]
    np.add.at(S_np, (np.broadcast_to(rows, pairs.shape).ravel(),
                     np.broadcast_to(cols, pairs.shape).ravel()),
              -pairs.ravel())
    Sinv = np.linalg.inv(S_np)
    cam_ref = Sinv.reshape(cg.count, Dp, cg.count, Dp)
    cam_err = 0.0
    for c in np.linspace(2, cg.count - 1, 5).astype(int):  # 0, 1 fixed
        got = np.asarray(cov[cg.name][c])
        want = cam_ref[c, :, c, :]
        cam_err = max(cam_err, float(np.abs(got - want).max()
                                     / max(np.abs(want).max(), 1e-12)))
    # landmark blocks: host-side evaluation of the back-substitution
    # identity with the independently-assembled Sinv (checks the B2
    # densify + matmul correction in compute_marginals_schur at scale)
    Hinv_row = Hinv_np                                   # [L, dl, dl]
    Sinv_np = Sinv
    lm_err = 0.0
    for j in np.linspace(3, L - 1, 5).astype(int):
        cams = lm_cam[j]
        K = len(cams)
        corr = np.zeros((dl, dl))
        for a in range(K):
            for b in range(K):
                Sab = Sinv_np[cams[a] * Dp:(cams[a] + 1) * Dp,
                              cams[b] * Dp:(cams[b] + 1) * Dp]
                corr += W_lm[j, a].T @ Sab @ W_lm[j, b]
        want = Hinv_row[j] + Hinv_row[j] @ corr @ Hinv_row[j]
        got = np.asarray(cov[pattern.lm_name][j])
        lm_err = max(lm_err, float(np.abs(got - want).max()
                                   / max(np.abs(want).max(), 1e-12)))
    # nonzero-evidence sample: a literal-zero spot check with a zero trace
    # would mean both routes silently produced zeros, not agreement
    sample_trace = float(np.trace(np.asarray(cov[cg.name][2])))
    return seconds, cam_err, lm_err, sample_trace


def _load_sphere(dtype):
    import jax.numpy as jnp
    from openslam_g2o_tpu.io.g2o_format import load_g2o

    g = load_g2o(SPHERE)
    if g.gauge_freedom():
        g.set_fixed(g.find_gauge(), True)
    return g.compile(dtype=dtype)


def run_tpu_sphere(n_iters=60):
    """sphere_bignoise f32 on TPU: fused LM-PCG to the recorded plateau
    (743862.7); returns (chi2, translations [N, 3]) for the ATE matrix."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.algorithms import (
        _lambda_init_pcg, lm_pcg_optimize_fused)
    from openslam_g2o_tpu.core.problem import robust_chi2
    from openslam_g2o_tpu.core.sparse import build_ell_pattern

    prob = _load_sphere(jnp.float32)
    pattern = build_ell_pattern(prob)
    lam = _lambda_init_pcg(prob, pattern, prob.params,
                           jnp.asarray(1e-5, prob.dtype))
    st = (prob.params, lam, jnp.asarray(2.0, prob.dtype), robust_chi2(prob))
    for _ in range(n_iters // 10):
        out = lm_pcg_optimize_fused(prob, pattern, *st, n_iters=10,
                                    pcg_iters=200, pcg_tol=0.05)
        st = out[:4]
    # polish toward the recorded plateau: warm-started deep-tolerance
    # windows (the Manhattan/100k polish configuration) — the forcing-tol
    # phase above stalls ~0.3% high because its inexact steps stop paying
    # near the basin floor
    pol = lambda s: lm_pcg_optimize_fused(prob, pattern, *s, n_iters=5,
                                          pcg_iters=600, pcg_tol=1e-6,
                                          warm=True)
    for _ in range(8):
        if float(st[3]) <= SPHERE_PLATEAU * SPHERE_GATE:
            break
        out = pol(st)
        st = out[:4]
    name = next(iter(st[0]))
    return float(st[3]), np.asarray(st[0][name])


def run_cpu_sphere_f64(tpu_solution=None, n_iters=60):
    """f64 CPU reference trajectory for the sphere (enable x64 LAST — this
    must run after all f32 TPU work; flipping the flag invalidates traces).
    Also re-evaluates the TPU f32 SOLUTION's chi2 in f64 (same
    mixed-precision accounting as the Manhattan block)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG, optimize
    from openslam_g2o_tpu.core import problem as P

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prob = _load_sphere(jnp.float64)
        name = next(iter(prob.params))
        tpu_chi_f64 = None
        if tpu_solution is not None:
            sol = {name: jnp.asarray(np.asarray(tpu_solution,
                                                dtype=np.float64))}
            tpu_chi_f64 = float(P.chi2(prob.with_params(sol)))
        out, stats = optimize(
            prob, LevenbergMarquardtPCG(pcg_iters=200, pcg_tol=1e-2),
            iterations=n_iters)
        # flatness probe for the sphere ATE (same methodology as
        # Manhattan): smallest eigenvalue of the gauge-fixed Hessian at
        # the f64 plateau
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        from openslam_g2o_tpu.core.problem import build_dense_system
        H, _, _ = build_dense_system(out)
        Hs = sp.csc_matrix(np.asarray(H))
        lam_min = float(spla.eigsh(Hs, k=1, sigma=0, which="LM",
                                   return_eigenvectors=False)[0])
        return (stats[-1]["chi2"], np.asarray(out.params[name])[:, :3],
                lam_min, tpu_chi_f64)


def run_pcg_roofline():
    """Measured per-iteration time of the Manhattan ELL-PCG hot loop tied to
    its analytic FLOP/byte cost (two fixed-budget solves, differenced —
    subtracts the tunnel dispatch floor)."""
    import jax
    import jax.numpy as jnp
    from openslam_g2o_tpu.core.problem import (
        robust_chi2, linearize, block_jacobi_preconditioner_lane)
    from openslam_g2o_tpu.core.sparse import (
        build_ell_pattern, assemble_ell, ell_matvec_lane)
    from openslam_g2o_tpu.core.solvers import pcg_solve
    from openslam_g2o_tpu.utils import roofline as RL

    _, prob = _load_problem(jnp.float32)
    pattern = build_ell_pattern(prob)
    work = prob
    lin = linearize(work)
    values, b = assemble_ell(work, pattern, lin)
    diag = pattern.diag_blocks(work, values)
    lam = jnp.asarray(1e-3, prob.dtype)
    bT = {k: v.T for k, v in b.items()}
    free_lane = {g.name: work.free[g.name][None, :]
                 for g in work.static.vgroups}
    extraT = {k: lam * f + (1.0 - f) for k, f in free_lane.items()}

    # carry-serialized scan differencing (see
    # _scan_differenced_cg_iteration for why repeat-the-call averaging is
    # not trustworthy through the remote service)
    def make(K, n):
        def f(values, bT, seed):
            mv = lambda xT: ell_matvec_lane(work, pattern, values, xT,
                                            extra_diagT=extraT)
            pre = block_jacobi_preconditioner_lane(work, diag, lam)

            def body(carry, _):
                fc = 1.0 + (carry - jnp.floor(carry)) * 1e-5 + 1e-6
                sol, ok = pcg_solve(mv, {k: v * fc for k, v in bT.items()},
                                    precond=pre, max_iter=n, tol=0.0,
                                    unroll=2)
                return carry + jnp.abs(sol[list(sol)[0]]).mean() * 0.1, None

            c, _ = jax.lax.scan(body, seed, None, length=K)
            return c
        return jax.jit(f)

    def timed(jf):
        seed = jnp.asarray(0.321, prob.dtype)
        out = jf(values, bT, seed)
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(2):
            t0 = time.monotonic()
            out = jf(values, bT, seed * (1.0 + 1e-6 * (r + 1)))
            jax.block_until_ready(out)
            best = min(best, time.monotonic() - t0)
        return best

    t_lo, t_hi = timed(make(2, 100)), timed(make(8, 100))
    per_iter = max((t_hi - t_lo) / (6 * 100), 1e-9)
    cost = RL.ell_pcg_iteration_cost(prob, pattern)
    return RL.roofline_report(cost, per_iter)


def run_incremental():
    """Online/incremental engine throughput: replay intel.g2o as an
    ADD/SOLVE protocol stream (solve every 50 vertices, 2 iterations each —
    the reference CLI's incremental mode shape, g2o.cpp:350-532), fixed
    shape bucket (2048) so the whole replay is ONE jit cache entry.

    Runs the replay twice in-process: the cold pass pays the compile, the
    warm pass measures the engine's steady-state throughput — the honest
    serving number for a long-running incremental session (the reference's
    incremental engine likewise amortizes its symbolic analysis)."""
    import jax.numpy as jnp
    from openslam_g2o_tpu.io.g2o_format import load_g2o
    from openslam_g2o_tpu.core.online import OnlineOptimizer
    from openslam_g2o_tpu.core.algorithms import LevenbergMarquardtPCG

    # measure a GENUINE first-ever cold start WITHOUT destroying the
    # machine's shared persistent cache (round-4 advisor finding: rmtree
    # of default_cache_dir() silently un-warmed every other session):
    # point this process's cache at a fresh temp dir instead — same
    # first-ever semantics, zero collateral
    import tempfile
    import jax as _jax
    if not all(d.platform == "cpu" for d in _jax.devices()):
        tmp_cache = tempfile.mkdtemp(prefix="g2o_tpu_bench_xla_cache_")
        _jax.config.update("jax_compilation_cache_dir", tmp_cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    g = load_g2o(INTEL)
    ids = sorted(g.vertices)
    by_new_vertex = {}
    for e in g.edges:
        anchor = max(e.vertex_ids)
        by_new_vertex.setdefault(anchor, []).append(e)

    def replay(bg=False):
        # the ELL-PCG fast path: padding-masked pattern per solve, device
        # solve in milliseconds (online.py solve() docstring).
        # bg=True: the round-5 background-warmup serving mode — first
        # solves run on the CPU backend while the accelerator program
        # AOT-compiles in a daemon thread (the cold-session configuration);
        # bg=False measures the pure accelerator path (warm sessions).
        oo = OnlineOptimizer(algorithm=LevenbergMarquardtPCG(
                                 pcg_iters=200, pcg_tol=1e-2),
                             iterations_per_solve=2, dtype=jnp.float32,
                             bucket=lambda n, minimum=64: 2048,
                             background_warmup=bg)
        t0 = time.monotonic()
        n_solves = 0
        first_solve = None
        for k, vid in enumerate(ids):
            rec = g.vertices[vid]
            oo.add_vertex(vid, rec.vtype.name, rec.params)
            if k == 0:
                oo.fix(vid)
            for e in by_new_vertex.get(vid, []):
                oo.add_edge(e.etype.name, e.vertex_ids, e.measurement,
                            e.information)
            if k > 0 and k % 50 == 0:
                # want_stats=False skips the per-solve trajectory fetch
                # (one ~20 ms device->host sync through the tunnel) — the
                # protocol replay does not consume stats, same as the
                # reference CLI's non-verbose incremental mode
                oo.solve(want_stats=False)
                if first_solve is None:
                    first_solve = time.monotonic() - t0
                n_solves += 1
        oo.solve(want_stats=False)
        n_solves += 1
        return oo, n_solves, time.monotonic() - t0, first_solve

    oo, n_solves, cold, cold_first_solve = replay(bg=True)
    cold_stats = oo.session_stats()
    # let any still-running background compile land in the persistent
    # cache before the fresh-session simulation measures it
    oo.drain_warmup()
    # fresh-session simulation: drop every in-process compiled executable,
    # keep the persistent on-disk cache the cold pass just wrote — the
    # compile requests of this pass go through the full backend-compile
    # path and hit the disk cache (what a NEW process on this machine
    # pays; round-4 cold-start fix, utils/compile_cache.py)
    import jax
    jax.clear_caches()
    oo, _, cold_cached, _ = replay()
    oo, _, warm, _ = replay()
    stats = oo.session_stats()
    from openslam_g2o_tpu.core import problem as P
    final_chi = float(P.chi2(oo.graph.compile(dtype=jnp.float32)))
    return {
        "dataset": "intel",
        "vertices_per_sec": round(len(ids) / warm, 1),
        "solves_per_sec": round(n_solves / warm, 2),
        "final_chi2": round(final_chi, 2),
        "shape_buckets_compiled": stats["shape_buckets_compiled"],
        "cold_seconds_incl_compile": round(cold, 2),
        # time from session start to the FIRST solve returning in a
        # cache-cold session: the background-warmup mode serves it from
        # the CPU backend while the accelerator program compiles
        # (VERDICT r4 #5 — the reference's cholmod_updown cheap-first-
        # solve economics, linear_solver_cholmod_online.h:135-160)
        "cold_first_solve_seconds": round(cold_first_solve, 2),
        "cold_cpu_fallback_solves": cold_stats["cpu_fallback_solves"],
        "cold_seconds_with_persistent_cache": round(cold_cached, 2),
        "warm_seconds": round(warm, 2),
    }


def _progress(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def _read_canary():
    """Latest recorded verdict of scripts/canary_bucketed_400k.py (it runs
    in its own process because a toolchain fault poisons the client; the
    bench carries the recorded result so every round re-checks the gated
    4.5x bucketed path instead of assuming it blocked)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CANARY_400K.json")
    try:
        with open(path) as fh:
            out = json.load(fh)
        out["kept_gated"] = not out.get(
            "bucketed_path_correct_on_toolchain", False)
        return out
    except (OSError, ValueError):
        return {"status": "never run this round — "
                          "scripts/canary_bucketed_400k.py"}


# Marginals spot-check HARD gate (round 5): max relative error of the
# on-chip Schur covariance route vs the independent f64 host assembly.
# f32 + Jacobi-equilibrated S measures ~1e-4 at the 80k shape; 5e-3 leaves
# headroom for f32 roundoff through cond(S)~1e9 while failing RED on any
# real assembly/densify regression (the class of bug round 4 could not see).
MARGINALS_REL_ERR_GATE = 5e-3

# BA convergence gate: the synthetic scenes have a computable noise-floor
# chi2 (expected_ba_chi2); the solver must land within 2% of it. The CPU
# baseline must pass the same gate — a shared standard, not a self-grade.
BA_CHI2_GATE = 1.02


def _ba_section(ba, base_ips, base_chi, n_cams, n_points):
    ips, chi, n_obs, roof, ate = ba
    exp = expected_ba_chi2(n_obs, n_cams, n_points)
    return {
        "iters_per_sec": round(ips, 2),
        "vs_baseline": round(ips / base_ips, 1),
        "cpu_baseline_iters_per_sec": round(base_ips, 3),
        "final_chi2": round(chi, 1),
        "noise_floor_chi2": round(exp, 1),
        "chi2_gate": BA_CHI2_GATE,
        "converged_to_noise_floor": bool(chi <= exp * BA_CHI2_GATE),
        "cpu_baseline_final_chi2": round(float(base_chi), 1),
        "cpu_baseline_converged": bool(base_chi <= exp * BA_CHI2_GATE),
        "n_observations": int(n_obs),
        "ate_rmse_points_vs_gt": ate,
        "roofline": roof,
    }


def main():
    from openslam_g2o_tpu.utils.ate import ate_rmse
    from openslam_g2o_tpu.utils import roofline as RL

    _progress("manhattan LM-PCG (timed + converge)")
    tpu_ips, tpu_chi, est_full = run_tpu_manhattan()
    est_xy = est_full[:, :2]
    _progress(f"manhattan done: {tpu_ips:.1f} it/s chi {tpu_chi:.3f}")
    pcg_roof = run_pcg_roofline()
    _progress("pcg roofline done")
    ba80 = run_tpu_ba(n_cams=100, n_points=10000, obs_per_point=8,
                      pcg_iters=30, pcg_tol=0.05, n_converge=15)
    _progress(f"ba80k done: {ba80[0]:.2f} it/s")
    ba400 = run_tpu_ba(n_cams=900, n_points=50000, obs_per_point=8,
                       pcg_iters=30, pcg_tol=0.05, n_timed=5, n_converge=8)
    _progress(f"ba400k done: {ba400[0]:.2f} it/s")
    pg100k = run_pose_graph_100k()
    _progress(f"pose_graph_100k done: {pg100k['lm_iters_per_sec']} it/s "
              f"gate={'GREEN' if pg100k['converged_to_noise_floor'] else 'RED'}")
    ba80_base, ba80_base_chi = run_cpu_ba_baseline(
        100, 10000, 8, n_iters=3, converge_iters=15)
    _progress(f"cpu ba80k baseline done: {ba80_base:.3f} it/s")
    ba400_base, ba400_base_chi = run_cpu_ba_baseline(
        900, 50000, 8, n_iters=2, converge_iters=8)
    _progress(f"cpu ba400k baseline done: {ba400_base:.3f} it/s")
    incr = run_incremental()
    _progress(f"incremental done: {incr['vertices_per_sec']} v/s")
    marg_s, marg_cam_err, marg_lm_err, marg_trace = run_marginals_80k()
    _progress(f"marginals_80k done: {marg_s:.2f}s")
    sphere_chi_f32, sphere_sol = run_tpu_sphere()
    sphere_t32 = sphere_sol[:, :3]
    _progress(f"sphere f32 done: chi {sphere_chi_f32:.1f}")
    base_ips, base_chi, ref_x, H_min = run_cpu_baseline()
    _progress(f"cpu baseline done: {base_ips:.2f} it/s")
    ate_manhattan = float(ate_rmse(est_xy, ref_x[:, :2]))
    # basin-flatness bound: smallest eigenvalue of the gauge-fixed Hessian
    # at the f64 minimum; chi2-equivalent displacement at the measured
    # f32 chi2 excess (run_tpu_manhattan comment)
    import scipy.sparse.linalg as spla
    lam_min = float(spla.eigsh(H_min.tocsc(), k=1, sigma=0, which="LM",
                               return_eigenvectors=False)[0])
    # with chi2 = e^T Omega e and H = J^T Omega J the quadratic model is
    # delta_chi2 ~ d^T H d, so |d| <= sqrt(delta_chi2 / lam_min) (no factor
    # 2: grad^2(chi2) = 2H but delta_chi2 = (1/2) d^T (2H) d).
    # BOTH chi2 values are evaluated in f64 on the host (se2_chi2_f64):
    # the TPU f32 SOLUTION is re-scored exactly, so f32 chi2
    # representation/summation no longer inflates d_chi — the bound now
    # measures the solution's true placement in the basin (round-4
    # mixed-precision accounting).
    xm, ii_m, jj_m, meas_m, info_m = _manhattan_arrays()
    tpu_chi_f64 = se2_chi2_f64(est_full, ii_m, jj_m, meas_m, info_m)
    ref_chi_f64 = se2_chi2_f64(ref_x, ii_m, jj_m, meas_m, info_m)
    d_chi = max(tpu_chi_f64 - ref_chi_f64, 1e-9)
    flat_bound = float(np.sqrt(d_chi / lam_min) / np.sqrt(ref_x.shape[0]))
    # sphere f64 reference LAST (flips jax x64 config)
    (sphere_chi_f64, sphere_t64, sphere_lam_min,
     sphere_tpu_chi_f64) = run_cpu_sphere_f64(tpu_solution=sphere_sol)
    _progress(f"sphere f64 reference done: chi {sphere_chi_f64:.1f}")
    ate_sphere = float(ate_rmse(sphere_t32, sphere_t64))
    sphere_d_chi = max(sphere_tpu_chi_f64 - float(sphere_chi_f64), 1e-9)
    converged = tpu_chi < CONVERGED_CHI2 * CHI2_GATE
    report = {
        "metric": "manhattan3500_lm_iters_per_sec",
        "value": round(tpu_ips, 3),
        "unit": "iter/s",
        # PINNED denominator: max of the measured CPU baseline across
        # rounds (r01 16.23, r02 14.16 it/s) so the ratio cannot drift
        # green on baseline noise; the live measurement is reported too.
        "vs_baseline": round(tpu_ips / PINNED_CPU_BASELINE, 2),
        "pinned_cpu_baseline_iters_per_sec": PINNED_CPU_BASELINE,
        "vs_baseline_live": round(tpu_ips / base_ips, 2),
        "tpu_final_chi2": round(tpu_chi, 3),
        "reference_chi2": CONVERGED_CHI2,
        "chi2_gate": CHI2_GATE,
        "converged_to_reference_chi2": bool(converged),
        "ate_rmse_manhattan_vs_f64": round(ate_manhattan, 5),
        "ate": {
            "manhattan_rmse_vs_f64": round(ate_manhattan, 5),
            "tpu_solution_chi2_reevaluated_f64": round(tpu_chi_f64, 6),
            "cpu_f64_min_chi2": round(ref_chi_f64, 6),
            "manhattan_delta_chi2_vs_f64_min": round(d_chi, 6),
            "hessian_lambda_min_at_min": lam_min,
            "chi2_flat_ate_bound": round(flat_bound, 4),
            "within_flat_bound": bool(ate_manhattan <= flat_bound),
            "note": "the gauge-fixed Hessian's smallest eigenvalue makes "
                    "the basin nearly flat: any trajectory within "
                    "delta-chi2 of the minimum can sit up to the bound "
                    "away in RMSE; f32 chi2 resolution cannot pin the "
                    "trajectory tighter",
            "sphere_rmse_vs_f64": round(ate_sphere, 4),
            "sphere_tpu_f32_chi2": round(sphere_chi_f32, 1),
            "sphere_tpu_solution_chi2_reevaluated_f64": round(
                sphere_tpu_chi_f64, 3),
            "sphere_cpu_f64_chi2": round(float(sphere_chi_f64), 3),
            "sphere_hessian_lambda_min": sphere_lam_min,
            "sphere_chi2_flat_ate_bound": round(float(
                np.sqrt(sphere_d_chi / sphere_lam_min)
                / np.sqrt(sphere_t64.shape[0])), 4),
            "sphere_within_flat_bound": bool(
                ate_sphere <= float(np.sqrt(sphere_d_chi / sphere_lam_min)
                                    / np.sqrt(sphere_t64.shape[0]))),
            "sphere_recorded_plateau": SPHERE_PLATEAU,
            "sphere_plateau_gate": SPHERE_GATE,
            "sphere_converged_to_plateau": bool(
                sphere_tpu_chi_f64 <= SPHERE_PLATEAU * SPHERE_GATE),
        },
        "cpu_baseline_iters_per_sec": round(base_ips, 3),
        "cpu_baseline_converged_chi2": round(float(base_chi), 3),
        "device": RL.chip_peaks()["device_kind"],
        "pcg_iteration_roofline": pcg_roof,
        "ba_80k": _ba_section(ba80, ba80_base, ba80_base_chi,
                              n_cams=100, n_points=10000),
        "ba_400k_venice_scale": dict(
            _ba_section(ba400, ba400_base, ba400_base_chi,
                        n_cams=900, n_points=50000),
            note="real venice871.g2o is behind a zero-egress download.sh;"
                 " synthetic generator with the same structure stands in",
            bucketed_canary=_read_canary(),
        ),
        "pose_graph_100k": pg100k,
        "incremental": incr,
        "marginals_80k": {
            "seconds": round(marg_s, 3),
            "spot_check_max_rel_err_camera_blocks": round(marg_cam_err, 8),
            "spot_check_max_rel_err_landmark_blocks": round(marg_lm_err, 8),
            "spot_check_gate": MARGINALS_REL_ERR_GATE,
            "spot_check_green": bool(
                max(marg_cam_err, marg_lm_err) <= MARGINALS_REL_ERR_GATE),
            "sample_camera_cov_trace": marg_trace,
            "note": "compute_marginals_schur on the 80k-obs BA problem "
                    "on-chip; spot-checked against an independently "
                    "assembled dense reduced system (one-hot densify route)",
        },
    }
    print(json.dumps(report))
    # compact headline LAST: the driver's artifact keeps only the output
    # tail, which truncated the round-3 flagship numbers out of BENCH_r03 —
    # this line always carries them (and is itself a valid one-line JSON
    # with the required metric/value/unit/vs_baseline fields)
    print(json.dumps({
        "metric": report["metric"],
        "value": report["value"],
        "unit": report["unit"],
        "vs_baseline": report["vs_baseline"],
        "manhattan_chi2": report["tpu_final_chi2"],
        "manhattan_converged": report["converged_to_reference_chi2"],
        "ate_within_flat_bound": report["ate"]["within_flat_bound"],
        "ba_80k_iters_per_sec": report["ba_80k"]["iters_per_sec"],
        "ba_80k_vs_baseline": report["ba_80k"]["vs_baseline"],
        "ba_80k_gate": report["ba_80k"]["converged_to_noise_floor"],
        "ba_400k_iters_per_sec":
            report["ba_400k_venice_scale"]["iters_per_sec"],
        "ba_400k_gate":
            report["ba_400k_venice_scale"]["converged_to_noise_floor"],
        "pose_graph_100k_iters_per_sec":
            report["pose_graph_100k"]["lm_iters_per_sec"],
        "pose_graph_100k_gate":
            report["pose_graph_100k"]["converged_to_noise_floor"],
        "incremental_vps": report["incremental"]["vertices_per_sec"],
        "incremental_cold_s":
            report["incremental"]["cold_seconds_incl_compile"],
        "incremental_cold_cached_s":
            report["incremental"]["cold_seconds_with_persistent_cache"],
        "marginals_80k_s": report["marginals_80k"]["seconds"],
        "marginals_80k_gate": report["marginals_80k"]["spot_check_green"],
        "sphere_plateau_gate": report["ate"]["sphere_converged_to_plateau"],
        "summary": "headline-last compact line; full report is the "
                   "previous JSON line",
    }))


if __name__ == "__main__":
    main()
