"""On-chip breakdown of one Manhattan LM-PCG step.

The axon tunnel has a ~6 ms per-program dispatch floor, so each phase is
timed as a lax.scan of R chained repetitions inside ONE jitted program and
divided by R. Chaining (each repetition consumes the previous output) stops
XLA from CSE-ing the loop away.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from openslam_g2o_tpu.io.g2o_format import load_g2o
from openslam_g2o_tpu.core.problem import (
    linearize, robust_chi2, apply_update_parts, block_jacobi_preconditioner)
from openslam_g2o_tpu.core.sparse import (
    build_ell_pattern, assemble_ell, ell_matvec)
from openslam_g2o_tpu.core.solvers import pcg_solve
from openslam_g2o_tpu.core.algorithms import _lm_pcg_step, _lambda_init_pcg

MANHATTAN = "/root/reference/data/2d/manhattanOlson3500.g2o"
import os
if not os.path.exists(MANHATTAN):
    MANHATTAN = "/root/reference/data/2d/manhattan3500/manhattanOlson3500.g2o"

R = 50


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n


def main():
    g = load_g2o(MANHATTAN)
    if g.gauge_freedom():
        g.set_fixed(g.find_gauge(), True)
    prob = g.compile(dtype=jnp.float32)
    pattern = build_ell_pattern(prob)
    params = prob.params

    # --- repeated-phase timings (amortize dispatch) ---
    def rep_linearize(p):
        def body(c, _):
            work = prob.with_params(c)
            lin = linearize(work)
            # fold a scalar of lin back into carry to chain iterations
            s = sum(jnp.sum(j[0]) * 0 for _, jacs, _ in lin.values() for j in jacs[:1])
            c2 = jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, c)
            return c2, None
        c, _ = jax.lax.scan(body, p, None, length=R)
        return c

    t_lin = timed(jax.jit(rep_linearize), params) / R
    print(f"linearize (jacfwd+errors): {t_lin*1e6:9.1f} us", flush=True)

    work = prob.with_params(params)
    lin0 = linearize(work)

    def rep_assemble(l):
        def body(c, _):
            values, b = assemble_ell(work, pattern, l)
            s = sum(jnp.sum(v) * 0 for v in values)
            l2 = jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, l)
            return l2, (values, b)
        c, out = jax.lax.scan(body, l, None, length=R)
        return jax.tree_util.tree_map(lambda a: a[0], out)

    t_asm = timed(jax.jit(rep_assemble), lin0) / R
    print(f"assemble_ell:              {t_asm*1e6:9.1f} us", flush=True)

    values, b = assemble_ell(work, pattern, lin0)
    diag = pattern.diag_blocks(work, values)
    lam = jnp.asarray(1e-3, prob.dtype)
    free_parts = {gr.name: work.free[gr.name][:, None] for gr in work.static.vgroups}
    extra = {k: lam * f + (1.0 - f) for k, f in free_parts.items()}

    def rep_matvec(x):
        def body(c, _):
            y = ell_matvec(work, pattern, values, c, extra_diag=extra)
            return y, None
        c, _ = jax.lax.scan(body, x, None, length=R)
        return c

    t_mv = timed(jax.jit(rep_matvec), b) / R
    print(f"ell_matvec (damped):       {t_mv*1e6:9.1f} us", flush=True)

    def rep_chi2(p):
        def body(c, _):
            chi = robust_chi2(work, c)
            c2 = jax.tree_util.tree_map(
                lambda a: a + (chi * 0).astype(a.dtype), c)
            return c2, None
        c, _ = jax.lax.scan(body, p, None, length=R)
        return c

    t_chi = timed(jax.jit(rep_chi2), params) / R
    print(f"robust_chi2:               {t_chi*1e6:9.1f} us", flush=True)

    # --- full PCG solve at two budgets (fixed iters, tol=0 -> runs budget) ---
    def solve_n(n):
        def f(values, b):
            pre = block_jacobi_preconditioner(work, diag, lam)
            mv = lambda x: ell_matvec(work, pattern, values, x, extra_diag=extra)
            return pcg_solve(mv, b, precond=pre, max_iter=n, tol=0.0)
        return timed(jax.jit(f), values, b)

    t10, t110 = solve_n(10), solve_n(110)
    per_iter = (t110 - t10) / 100
    print(f"pcg per-iteration:         {per_iter*1e6:9.1f} us  "
          f"(solve10={t10*1e3:.2f} ms, solve110={t110*1e3:.2f} ms)", flush=True)

    # --- whole LM steps at two PCG budgets, differenced ---
    lam0 = _lambda_init_pcg(prob, pattern, params, jnp.asarray(1e-5, prob.dtype))
    ni = jnp.asarray(2.0, prob.dtype)
    chi = robust_chi2(prob)

    def step_n(n, tol):
        f = lambda p, l, v, c: _lm_pcg_step(prob, pattern, p, l, v, c,
                                            pcg_iters=n, pcg_tol=tol)[:4]
        return timed(lambda *a: f(*a), params, lam0, ni, chi)

    s1 = step_n(1, 0.0)
    s101 = step_n(101, 0.0)
    print(f"lm step pcg=1:             {s1*1e3:9.2f} ms", flush=True)
    print(f"lm step pcg=101:           {s101*1e3:9.2f} ms  "
          f"(per-iter {1e6*(s101-s1)/100:.1f} us)", flush=True)
    s_forcing = step_n(200, 0.05)
    print(f"lm step budget200 tol.05:  {s_forcing*1e3:9.2f} ms", flush=True)

    fixed = s1
    print(f"\nfixed cost (s1): {fixed*1e3:.2f} ms; of which "
          f"lin {t_lin*1e3:.2f} + asm {t_asm*1e3:.2f} + chi2 {t_chi*1e3:.2f} "
          f"= {(t_lin+t_asm+t_chi)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
