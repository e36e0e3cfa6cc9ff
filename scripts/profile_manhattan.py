"""Phase-level TPU profiling of the Manhattan LM-PCG step.

Per-program dispatch through the axon tunnel has a ~6 ms floor (CLAUDE.md),
so phases are measured by scan-repeating them INSIDE one program with a
sequential carry dependency (prevents CSE/hoisting), then dividing.

Run: python scripts/profile_manhattan.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from openslam_g2o_tpu.io.g2o_format import load_g2o
from openslam_g2o_tpu.core.problem import (
    linearize, robust_chi2, block_jacobi_preconditioner)
from openslam_g2o_tpu.core.sparse import (
    build_ell_pattern, assemble_ell, ell_matvec)
from openslam_g2o_tpu.core.algorithms import _lm_pcg_step, _lambda_init_pcg
from openslam_g2o_tpu.core.solvers import _tree_dot

MANHATTAN = "/root/reference/data/2d/manhattanOlson3500.g2o"
import os
if not os.path.exists(MANHATTAN):
    MANHATTAN = "/root/reference/data/2d/manhattan3500/manhattanOlson3500.g2o"


def timed(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / reps


def main():
    g = load_g2o(MANHATTAN)
    if g.gauge_freedom():
        g.set_fixed(g.find_gauge(), True)
    prob = g.compile(dtype=jnp.float32)
    pattern = build_ell_pattern(prob)
    print("device:", jax.devices()[0].device_kind, flush=True)
    print("pairs:", pattern.pairs, "K:", pattern.K)
    for eg in prob.static.egroups:
        print("egroup", eg.key, "count", eg.count)

    params = prob.params
    lam = _lambda_init_pcg(prob, pattern, params, jnp.asarray(1e-5, prob.dtype))
    ni = jnp.asarray(2.0, prob.dtype)
    chi = robust_chi2(prob)

    # settle into the basin so timings are mid-optimization
    state = (params, lam, ni, chi)
    step200 = jax.jit(lambda *s: _lm_pcg_step(prob, pattern, *s,
                                              pcg_iters=200, pcg_tol=0.05)[:4])
    for _ in range(5):
        state = step200(*state)
    jax.block_until_ready(state[0])
    params, lam, ni, chi = state
    print("settled chi2:", float(chi), "lam:", float(lam), flush=True)

    # ---- A. full-step timing vs FIXED pcg iteration budget (tol=0 disables
    # early exit) -> slope = per-PCG-iter cost, intercept = fixed cost
    for iters in (0, 25, 50, 100, 200):
        f = jax.jit(lambda p, l, n, c: _lm_pcg_step(
            prob, pattern, p, l, n, c, pcg_iters=iters, pcg_tol=0.0)[:4])
        t = timed(lambda: f(params, lam, ni, chi), reps=20)
        print(f"full step pcg_iters={iters:4d} tol=0: {t*1e3:8.3f} ms", flush=True)

    # ---- B. phase scans inside one program ------------------------------
    def scan_time(body, init, length, label):
        @jax.jit
        def run(x):
            return jax.lax.scan(lambda c, _: (body(c), None), x, None,
                                length=length)[0]
        t = timed(lambda: run(init), reps=10)
        print(f"{label:40s}: {t/length*1e6:9.1f} us/rep  ({t*1e3:.2f} ms / {length})",
              flush=True)

    work = prob.with_params(params)

    # linearize only
    def lin_body(p):
        lin = linearize(prob, p)
        s = sum(jnp.sum(v[0]) for v in lin.values())
        return jax.tree_util.tree_map(lambda x: x + 0e0 * s, p)
    # need real dependency: add tiny s
    def lin_body2(p):
        lin = linearize(prob, p)
        s = sum(jnp.sum(v[0]) for v in lin.values())
        return jax.tree_util.tree_map(lambda x: x + 1e-30 * s, p)
    scan_time(lin_body2, params, 32, "linearize")

    # linearize + assemble
    def asm_body(p):
        lin = linearize(prob, p)
        values, b = assemble_ell(prob, pattern, lin)
        s = sum(jnp.sum(v) for v in values) + sum(jnp.sum(v) for v in b.values())
        return jax.tree_util.tree_map(lambda x: x + 1e-30 * s, p)
    scan_time(asm_body, params, 32, "linearize + assemble_ell")

    # assemble only (linearization fixed) — measures the scatter cost
    lin0 = jax.jit(lambda p: linearize(prob, p))(params)
    def asm_only_body(carry):
        linp = jax.tree_util.tree_map(lambda x: x + 1e-30 * carry[1], lin0)
        values, b = assemble_ell(prob, pattern, linp)
        s = sum(jnp.sum(v) for v in values)
        return (carry[0], s)
    @jax.jit
    def asm_only_run(lin_in):
        return jax.lax.scan(lambda c, _: (asm_only_body(c), None),
                            (0, jnp.zeros((), prob.dtype)), None, length=32)[0]
    t = timed(lambda: asm_only_run(lin0), reps=10)
    print(f"{'assemble_ell only':40s}: {t/32*1e6:9.1f} us/rep", flush=True)

    # matvec only
    values, b = jax.jit(lambda p: assemble_ell(
        prob, pattern, linearize(prob, p)))(params)
    def mv_body(x):
        y = ell_matvec(prob, pattern, values, x)
        return y
    x0 = {k: v * 1e-3 for k, v in b.items()}
    scan_time(mv_body, x0, 256, "ell_matvec")

    # matvec + precond + 2 dots + axpys  (a full PCG body worth of work)
    diag_blocks = pattern.diag_blocks(prob, values)
    precond = block_jacobi_preconditioner(prob, diag_blocks, lam)
    def pcgbody(st):
        x, p, r = st
        hp = mv_body(p)
        denom = _tree_dot(p, hp)
        alpha = jnp.ones((), prob.dtype) / jnp.where(denom == 0, 1.0, denom)
        x = jax.tree_util.tree_map(lambda a, c: alpha * a + c, p, x)
        r = jax.tree_util.tree_map(lambda a, c: -alpha * a + c, hp, r)
        z = precond(r)
        rz = _tree_dot(r, z)
        beta = rz / jnp.where(denom == 0, 1.0, denom)
        p = jax.tree_util.tree_map(lambda zz, pp: beta * pp + zz, z, p)
        return (x, p, r)
    scan_time(pcgbody, (x0, x0, x0), 256, "scan PCG body (mv+prec+dots)")

    # same body inside a while_loop with the early-exit cond -> while overhead
    @jax.jit
    def while_pcg(x0in):
        def cond(st):
            i = st[0]
            return jnp.logical_and(i < 256, _tree_dot(st[3], st[3]) > -1.0)
        def body(st):
            i, x, p, r = st
            x, p, r = pcgbody((x, p, r))
            return (i + 1, x, p, r)
        return jax.lax.while_loop(cond, body, (0, x0in, x0in, x0in))[1]
    t = timed(lambda: while_pcg(x0), reps=10)
    print(f"{'while PCG body (+cond reduction)':40s}: {t/256*1e6:9.1f} us/rep",
          flush=True)


if __name__ == "__main__":
    main()
