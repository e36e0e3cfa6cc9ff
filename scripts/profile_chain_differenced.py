"""Chain-differenced phase attribution — the round-4 on-chip methodology.

Times a phase function as a lax.scan of R chained repetitions inside ONE
jitted program (amortizes the remote tunnel's per-dispatch floor, ~6-20 ms).
The chain is a GENUINE data dependency: a tiny scalar derived from FULL
reductions of every output leaf feeds the next iteration's inputs, so XLA
can neither hoist the phase out of the loop nor dead-code-eliminate parts
of it (both observed failure modes — see CLAUDE.md measurement traps:
never multiply the chain scalar by zero, never consume only one element).

Usage:
    from scripts.profile_chain_differenced import chain_time
    t_ms = chain_time(lambda p: linearize(prob.with_params(p)),
                      prob.params, dtype=prob.dtype)
Report DELTAS between phase-prefix timings; subtract a noop baseline.

Round-4 results produced with this harness (v5e, f32):
- 80k dense-Schur trial: linearize 0.70, _build 1.85, _solve 1.78,
  apply+chi2 0.40 ms (ba_ell phases).
- 100k pose-graph trial: assemble 15, damp/scale/split 5, 100 CG
  iterations 3 ms (the DIA matvec at 35 us/iteration).
"""
import time

import jax
import jax.numpy as jnp


def _perturb(tree, c):
    return jax.tree_util.tree_map(
        lambda a: a + c.astype(a.dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _scal(x, dtype):
    s = jnp.zeros((), dtype)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            s = s + jnp.sum(leaf).astype(dtype)
    return jnp.tanh(s) * 1e-20


def chain_time(fn, arg, dtype=jnp.float32, repeats: int = 8,
               best_of: int = 3) -> float:
    """Milliseconds per invocation of `fn(arg)` (dispatch-amortized)."""
    def run(a):
        def body(carry, _):
            c, acc = carry
            out = fn(_perturb(a, c))
            return (_scal(out, dtype), acc + c), None
        (c, acc), _ = jax.lax.scan(
            body, (jnp.zeros((), dtype), jnp.zeros((), dtype)), None,
            length=repeats)
        return c + acc

    jf = jax.jit(run)
    out = jf(arg)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.monotonic()
        out = jf(arg)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best / repeats * 1e3


def noop_baseline(arg, dtype=jnp.float32, repeats: int = 8) -> float:
    """The harness's own cost (dispatch + chain) to subtract."""
    return chain_time(lambda a: (jnp.zeros(()),), arg, dtype, repeats)
