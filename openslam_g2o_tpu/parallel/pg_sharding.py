"""Keyframe-partitioned distributed ELL-PCG for pose graphs (multi-host).

The reference has no distributed execution at all (SURVEY §2.7); its big-graph
levers are sparsity + CHOLMOD (block_solver.hpp:353-486). This module is the
TPU-native scaling story for *pose graphs* too large for one chip's HBM or one
host:

  * **Rows (keyframes) are partitioned over the `row_axis`** of the mesh —
    intended to be the DCN/multi-host axis. Vertex insertion order in a SLAM
    graph is trajectory order, so contiguous row blocks are contiguous
    keyframe submaps; each host owns the block-ELL Hessian rows (the O(N*K*D^2)
    object) of its submap.
  * **Edges are sharded over the whole mesh** for linearization/assembly
    (data parallel, the analogue of the reference's OpenMP edge loop,
    block_solver.hpp:521-545) and reduced with one psum per LM iteration.
  * **The PCG hot loop keeps its state replicated** (tangent vectors are
    O(N*D) — tiny next to the Hessian): the only per-iteration collective is
    ONE `all_gather` of the local matvec rows over `row_axis`. Over DCN that
    is the minimum possible traffic for an exact distributed SpMV — the state
    vector, once per iteration; dot products need no communication at all
    because every replica holds the full vectors.

Communication layout (the scaling-book recipe: shard the big operand, let the
small one ride the collectives):

    linearize/assemble: psum(values, b, chi2) over ("host", "chip")
    PCG iteration:      all_gather(y_rows, "host")      <- DCN, O(N*D) bytes
    LM trial:           psum(chi2) over ("host", "chip")

Verified digit-close against the single-device `_lm_pcg_step` on the same
padded problem (tests/test_parallel.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openslam_g2o_tpu.core.problem import (
    Problem, apply_update_parts, block_jacobi_preconditioner, linearize,
    robust_chi2,
)
from openslam_g2o_tpu.core.solvers import _tree_dot, pcg_solve
from openslam_g2o_tpu.core.sparse import assemble_ell, build_ell_pattern
from openslam_g2o_tpu.parallel.sharding import pad_problem_edges

__all__ = ["pad_problem_vertices", "make_distributed_pcg_lm_step",
           "distributed_pcg_lm_optimize"]


def pad_problem_vertices(problem: Problem, multiple: int) -> Problem:
    """Pad every vertex group to a multiple of `multiple` with fixed dummy
    vertices (params repeat row 0 so manifold kernels stay finite; free = 0 so
    they never move and their tangent slots get the unit diagonal). Offsets,
    total_dim and pose_dim are recomputed preserving the poses-first layout
    (the buildIndexMapping invariant, sparse_optimizer.cpp:166-190)."""
    new_params = {}
    new_free = {}
    new_vgroups = []
    off = 0
    pose_dim = 0
    for g in problem.static.vgroups:
        nc = ((g.count + multiple - 1) // multiple) * multiple
        pad = nc - g.count
        p = problem.params[g.name]
        f = problem.free[g.name]
        if pad:
            p = jnp.concatenate([p, jnp.repeat(p[:1], pad, axis=0)])
            f = jnp.concatenate([f, jnp.zeros((pad,), dtype=f.dtype)])
        new_params[g.name] = p
        new_free[g.name] = f
        new_vgroups.append(dataclasses.replace(g, count=nc, offset=off))
        if g.offset < problem.static.pose_dim:
            pose_dim = off + nc * g.tangent_dim
        off += nc * g.tangent_dim
    static = dataclasses.replace(
        problem.static, vgroups=tuple(new_vgroups), total_dim=off,
        pose_dim=pose_dim)
    return dataclasses.replace(problem, params=new_params, free=new_free,
                               static=static)


def make_distributed_pcg_lm_step(problem: Problem, mesh: Mesh,
                                 row_axis: str = None,
                                 max_trials: int = 10, pcg_iters: int = 150,
                                 pcg_tol: float = 1e-8):
    """Build the keyframe-partitioned LM-PCG step over `mesh`.

    mesh may be 1D or 2D; `row_axis` (default: first axis) is the axis the
    Hessian rows are partitioned over (put the DCN/host axis here), edges are
    sharded over ALL mesh axes. Returns (placed_problem, pattern, step_fn)
    with step_fn(params, lam, ni, chi_cur) -> (params, lam, ni, chi, trials,
    ok); all outputs replicated.
    """
    names = tuple(mesh.axis_names)
    row_axis = row_axis if row_axis is not None else names[0]
    assert row_axis in names, (row_axis, names)
    n_rows = mesh.shape[row_axis]
    n_dev = mesh.devices.size

    padded = pad_problem_vertices(problem, n_rows)
    padded = pad_problem_edges(padded, n_dev)
    pattern = build_ell_pattern(padded)
    # edges are sharded here, so the dest-major contributor tables (which
    # index the GLOBAL contribution stream) do not apply: drop them to route
    # assemble_ell through its shard-local scatter path, reduced by psum.
    # (self_mask is only used by the single-device fast path's folded
    # damping, ell_add_diag — this step applies damping via extra_diag)
    pattern = dataclasses.replace(
        pattern,
        contrib_idx=tuple(None for _ in pattern.contrib_idx),
        contrib_mask=tuple(None for _ in pattern.contrib_mask),
        b_idx={k: None for k in pattern.b_idx},
        b_mask={k: None for k in pattern.b_mask},
        self_mask=tuple(None for _ in pattern.self_mask),
        # the two-tier matvec split is a single-device hot-loop layout;
        # this step's row-partitioned matvec slices nb_idx directly
        tier_rows=tuple(None for _ in pattern.tier_rows),
        tier_lo_nbT=tuple(None for _ in pattern.tier_lo_nbT),
        tier_hi_nbT=tuple(None for _ in pattern.tier_hi_nbT),
        tier_kb=tuple(pattern.K),
        # the DIA band split DOES apply per shard (round 5): contiguous
        # row blocks of a trajectory-ordered graph are themselves
        # near-banded, so each shard's matvec consumes statically SHIFTED
        # windows of the replicated x (dynamic_slice at row_offset+d — no
        # gather) — dia_src/dia_mask/res_* are kept and sliced per shard
        contrib_base=tuple(None for _ in pattern.contrib_base),
        b_base={k: None for k in pattern.b_base},
        dia_asm=tuple(None for _ in pattern.dia_asm),
        dia_asm_m=tuple(None for _ in pattern.dia_asm_m),
        dia_sh=tuple(None for _ in pattern.dia_sh),
        dia_sh_meta=tuple(None for _ in pattern.dia_sh_meta))

    # --- placement ------------------------------------------------------
    edge_spec = P(names)          # leading edge axis sharded over all axes
    repl = NamedSharding(mesh, P())

    def place_edges(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(names, *([None] * (x.ndim - 1)))))

    edges = jax.tree_util.tree_map(place_edges, padded.edges)
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl),
                                    padded.params)
    free = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl),
                                  padded.free)
    placed = dataclasses.replace(padded, edges=edges, params=params, free=free)
    put_repl = lambda t: None if t is None else jax.device_put(t, repl)
    pattern = dataclasses.replace(
        pattern,
        nb_idx=tuple(jax.device_put(t, repl) for t in pattern.nb_idx),
        positions={k: place_edges(v) for k, v in pattern.positions.items()},
        dia_src=tuple(put_repl(t) for t in pattern.dia_src),
        dia_mask=tuple(put_repl(t) for t in pattern.dia_mask),
        res_srcT=tuple(put_repl(t) for t in pattern.res_srcT),
        res_nbT=tuple(put_repl(t) for t in pattern.res_nbT),
        res_maskT=tuple(put_repl(t) for t in pattern.res_maskT))

    edges_in_spec = jax.tree_util.tree_map(lambda _: edge_spec, placed.edges)
    pattern_in_spec = dataclasses.replace(
        pattern,
        nb_idx=tuple(P() for _ in pattern.nb_idx),
        positions={k: edge_spec for k in pattern.positions},
        dia_src=tuple(None if t is None else P() for t in pattern.dia_src),
        dia_mask=tuple(None if t is None else P() for t in pattern.dia_mask),
        res_srcT=tuple(None if t is None else P() for t in pattern.res_srcT),
        res_nbT=tuple(None if t is None else P() for t in pattern.res_nbT),
        res_maskT=tuple(None if t is None else P()
                        for t in pattern.res_maskT))

    vgroups = placed.static.vgroups
    rows_of = {g.name: g.count // n_rows for g in vgroups}

    # check_vma=False: outputs ARE replicated (every replica runs the same
    # psum/all_gather-synchronised computation) but the varying-manual-axes
    # checker cannot infer that through the axis_index row slicing.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(edges_in_spec, pattern_in_spec, P(), P(), P(), P()),
             out_specs=(P(), P(), P(), P(), P(), P()), check_vma=False)
    def step_impl(edges_local, pattern_local, params, lam, ni, chi_cur):
        work = dataclasses.replace(placed, edges=edges_local)

        # -- linearize + assemble: edge-sharded, psum over the whole mesh --
        lin = linearize(work, params)
        values, b = assemble_ell(work, pattern_local, lin)
        values = tuple(jax.lax.psum(v, names) for v in values)
        b = {k: jax.lax.psum(v, names) for k, v in b.items()}
        diag_blocks = pattern_local.diag_blocks(work, values)


        # -- row partition: this host's keyframe block -----------------
        # (values are lane-major [Dr*Dc, N, K] — rows live on axis 1)
        i_row = jax.lax.axis_index(row_axis)
        values_loc = []
        nb_loc = []
        dia_loc = []
        for pid, (rg_name, cg_name) in enumerate(pattern_local.pairs):
            nr = rows_of[rg_name]
            values_loc.append(jax.lax.dynamic_slice_in_dim(
                values[pid], i_row * nr, nr, axis=1))
            nb_loc.append(jax.lax.dynamic_slice_in_dim(
                pattern_local.nb_idx[pid], i_row * nr, nr, axis=0))
            # per-shard DIA split (round 5): re-lay this shard's rows into
            # offset-major planes once per LM step — contiguous keyframe
            # submaps of trajectory-ordered graphs are near-banded, so the
            # hot-loop x access becomes a shifted dynamic_slice of the
            # REPLICATED x (exact across shard boundaries, zero gathers).
            # SAME-GROUP pairs only: the shifted window below starts at
            # i_row*nr (the ROW group's shard offset) into the COLUMN
            # group's x — for a cross-group DIA pair with differing
            # counts, dynamic_slice would CLAMP the last shard's window
            # and silently misalign every element (the single-device
            # _shift_stack zero-fills instead); such pairs take the
            # gather path, which is exact for any group combination
            if pattern.dia_offsets[pid] is None or rg_name != cg_name:
                dia_loc.append(None)
                continue
            src = jax.lax.dynamic_slice_in_dim(
                pattern_local.dia_src[pid], i_row * nr, nr, axis=1)  # [m,nr]
            msk = jax.lax.dynamic_slice_in_dim(
                pattern_local.dia_mask[pid], i_row * nr, nr, axis=1)
            Vd = jnp.take_along_axis(
                values_loc[pid], jnp.swapaxes(src, 0, 1)[None], axis=2) \
                * jnp.swapaxes(msk, 0, 1)[None].astype(work.dtype)
            Vr = nb_r = msk_r = None
            if pattern.res_k[pid]:
                src_r = jax.lax.dynamic_slice_in_dim(
                    pattern_local.res_srcT[pid], i_row * nr, nr, axis=1)
                nb_r = jax.lax.dynamic_slice_in_dim(
                    pattern_local.res_nbT[pid], i_row * nr, nr, axis=1)
                msk_r = jax.lax.dynamic_slice_in_dim(
                    pattern_local.res_maskT[pid], i_row * nr, nr, axis=1)
                Vr = jnp.take_along_axis(
                    values_loc[pid], jnp.swapaxes(src_r, 0, 1)[None],
                    axis=2) \
                    * jnp.swapaxes(msk_r, 0, 1)[None].astype(work.dtype)
            dia_loc.append((Vd, Vr, nb_r))

        free_parts = {g.name: work.free[g.name][:, None] for g in vgroups}

        def trial_cond(st):
            trials, done, rho = st[0], st[1], st[2]
            return jnp.logical_and(
                jnp.logical_not(done),
                jnp.logical_and(rho < 0, trials < max_trials))

        def trial_body(st):
            trials, done, rho, lam, ni, best_params, best_chi = st
            extra = {k: lam * f + (1.0 - f) for k, f in free_parts.items()}
            precond = block_jacobi_preconditioner(work, diag_blocks, lam)

            def matvec(x):
                # row-local SpMV (lane gather + VPU reduce on the owned
                # block, the single-device ell_matvec layout; DIA pairs
                # consume shifted dynamic_slice windows instead) ...
                xT = {k: v.T for k, v in x.items()}
                y_loc = {g.name: jnp.zeros((rows_of[g.name], g.tangent_dim),
                                           dtype=work.dtype) for g in vgroups}
                for pid, (rg_name, cg_name) in enumerate(pattern_local.pairs):
                    nr = rows_of[rg_name]
                    K = pattern_local.K[pid]
                    Dr = next(g.tangent_dim for g in vgroups
                              if g.name == rg_name)
                    Dc = next(g.tangent_dim for g in vgroups
                              if g.name == cg_name)
                    if dia_loc[pid] is not None:
                        Vd, Vr, nb_r = dia_loc[pid]
                        offs = pattern.dia_offsets[pid]
                        pad_l = max(0, -min(offs))
                        pad_r = max(0, max(offs))
                        xp = jnp.pad(xT[cg_name],
                                     ((0, 0), (pad_l, pad_r)))
                        xs = jnp.stack(
                            [jax.lax.dynamic_slice_in_dim(
                                xp, i_row * nr + d + pad_l, nr, axis=1)
                             for d in offs], axis=-1)    # [Dc, nr, m]
                        y_loc[rg_name] = y_loc[rg_name] + (
                            Vd.reshape(Dr, Dc, nr, len(offs))
                            * xs[None]).sum(axis=(1, 3)).T
                        if Vr is not None:
                            kr = nb_r.shape[0]
                            xg = jnp.take(xT[cg_name], nb_r.T.reshape(-1),
                                          axis=1).reshape(Dc, nr, kr)
                            y_loc[rg_name] = y_loc[rg_name] + (
                                Vr.reshape(Dr, Dc, nr, kr)
                                * xg[None]).sum(axis=(1, 3)).T
                        continue
                    xg = jnp.take(xT[cg_name], nb_loc[pid].reshape(-1),
                                  axis=1).reshape(Dc, nr, K)
                    V = values_loc[pid].reshape(Dr, Dc, nr, K)
                    y_loc[rg_name] = y_loc[rg_name] + \
                        (V * xg[None]).sum(axis=(1, 3)).T
                # ... then ONE all_gather over the row axis rebuilds the
                # replicated full vector (the only PCG-loop collective)
                y = {k: jax.lax.all_gather(v, row_axis, axis=0, tiled=True)
                     for k, v in y_loc.items()}
                return {k: y[k] + extra[k] * x[k] for k in y}

            dx, ok = pcg_solve(matvec, b, precond=precond,
                               max_iter=pcg_iters, tol=pcg_tol)
            cand = apply_update_parts(work, dx, params)

            # chi2 of the candidate: edge-sharded + psum (the same shape as
            # the reference's computeActiveErrors, sparse_optimizer.cpp:61)
            chi_new = jax.lax.psum(robust_chi2(work, cand), names)
            solved = jnp.logical_and(ok, jnp.isfinite(chi_new))
            chi_new = jnp.where(solved, chi_new, jnp.inf)

            scale = _tree_dot(dx, jax.tree_util.tree_map(
                lambda d, bi: lam * d + bi, dx, b)) + 1e-3
            rho = jnp.where(solved, (chi_cur - chi_new) / scale, -1.0)
            accept = jnp.logical_and(rho > 0, jnp.isfinite(chi_new))
            alpha = 1.0 - (2.0 * rho - 1.0) ** 3
            good_scale = jnp.maximum(1.0 / 3.0,
                                     jnp.minimum(alpha, 2.0 / 3.0))
            lam = jnp.where(accept, lam * good_scale, lam * ni)
            ni = jnp.where(accept, 2.0, ni * 2.0)
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old),
                cand, best_params)
            best_chi = jnp.where(accept, chi_new, best_chi)
            return trials + 1, accept, rho, lam, ni, best_params, best_chi

        init = (jnp.int32(0), jnp.array(False),
                jnp.array(-1.0, work.dtype), lam, ni, params, chi_cur)
        trials, ok, rho, lam, ni, best_params, best_chi = jax.lax.while_loop(
            trial_cond, trial_body, init)
        return best_params, lam, ni, best_chi, trials, ok

    @jax.jit
    def step(params, lam, ni, chi_cur):
        return step_impl(placed.edges, pattern, params, lam, ni, chi_cur)

    return placed, pattern, step


def distributed_pcg_lm_optimize(problem: Problem, mesh: Mesh,
                                iterations: int = 10, row_axis: str = None,
                                tau: float = 1e-5, max_trials: int = 10,
                                pcg_iters: int = 150, pcg_tol: float = 1e-8,
                                verbose: bool = False):
    """Convenience driver mirroring sharded_lm_optimize. Returns
    (params, stats); params include the padding rows (slice by the original
    group counts to write back)."""
    from openslam_g2o_tpu.core.algorithms import _lambda_init_pcg

    placed, pattern, step = make_distributed_pcg_lm_step(
        problem, mesh, row_axis=row_axis, max_trials=max_trials,
        pcg_iters=pcg_iters, pcg_tol=pcg_tol)
    lam = _lambda_init_pcg(placed, pattern, placed.params,
                           jnp.asarray(tau, placed.dtype))
    ni = jnp.asarray(2.0, placed.dtype)
    chi = robust_chi2(placed)
    params = placed.params
    stats = []
    for it in range(iterations):
        params, lam, ni, chi, trials, ok = step(params, lam, ni, chi)
        stats.append({"iteration": it, "chi2": float(chi),
                      "lambda": float(lam), "levenberg_iters": int(trials)})
        if verbose:
            print(f"iteration= {it}\t chi2= {float(chi):.6f}\t "
                  f"lambda= {float(lam):.6g}\t levenbergIter= {int(trials)}")
    return params, stats
