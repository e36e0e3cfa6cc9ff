"""Scatter-free bundle adjustment: dual-ELL Schur solver.

The general Schur path (core/ba.py) accumulates with segment_sums, which
lower to scatter-adds — TPU's weakest primitive — inside the PCG hot loop.
This module removes every scatter from the iteration for the canonical BA
shape (binary projection edges: one landmark slot + one pose slot; optional
pose-pose edges):

* observations live in TWO neighbor-padded ELL index tables, by-landmark
  ``[L, K_l]`` and by-camera ``[C, K_c]`` (host-precomputed per topology),
* every reduction — Hll blocks, b_l, Hcc diagonal blocks, b_p, the
  W^T x / W v products inside PCG, the preconditioner correction — is a
  gather + einsum + sum over the K axis,
* Hpp from projection edges is exactly block-diagonal (each observation
  touches one camera), applied as a batched [C,6,6]x[C,6] product; pose-pose
  edges (odometry/loop closures between cameras) contribute a small dense
  extra assembled once per linearization.

This is the "speed-of-light" layout the hardware wants: HBM-bandwidth-bound
gathers and VPU/MXU einsums, no serialized scatters.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from openslam_g2o_tpu.core import robust as robust_mod
from openslam_g2o_tpu.core.problem import (
    Problem, apply_update, linearize, robust_chi2, _slot_tangent_indices,
    tangent_masks)
from openslam_g2o_tpu.core.solvers import batched_small_inv, pcg_solve

__all__ = ["build_ba_ell_pattern", "BAEllPattern", "_lm_ba_ell_step",
           "LevenbergMarquardtSchurELL"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["lm_edge_idx", "lm_mask", "cam_edge_idx", "cam_mask",
                      "li", "ci", "lm_cam", "cam_lm"],
         meta_fields=["egkey", "lm_slot", "cam_slot", "cam_group", "lm_group"])
@dataclasses.dataclass
class ProjGroupPattern:
    """Dual-ELL tables for one projection edge group."""
    lm_edge_idx: jnp.ndarray    # [L, K_l] int32 edge ids (0-padded)
    lm_mask: jnp.ndarray        # [L, K_l] 1.0 valid / 0.0 pad
    cam_edge_idx: jnp.ndarray   # [C, K_c]
    cam_mask: jnp.ndarray       # [C, K_c]
    li: jnp.ndarray             # [E] landmark index per edge
    ci: jnp.ndarray             # [E] camera index per edge
    lm_cam: jnp.ndarray         # [L, K_l] camera of each landmark slot
    cam_lm: jnp.ndarray         # [C, K_c] landmark of each camera slot
    egkey: str
    lm_slot: int
    cam_slot: int
    cam_group: str
    lm_group: str


@partial(jax.tree_util.register_dataclass,
         data_fields=["proj", ], meta_fields=["pose_only_keys", "lm_name"])
@dataclasses.dataclass
class BAEllPattern:
    proj: tuple                  # ProjGroupPattern per projection group
    pose_only_keys: tuple        # edge group keys without a landmark slot
    lm_name: str


def _ell_tables(owner_idx: np.ndarray, n_owners: int):
    """[E] owner ids -> ([n_owners, K] edge-id table, mask)."""
    E = len(owner_idx)
    order = np.argsort(owner_idx, kind="stable")
    counts = np.bincount(owner_idx, minlength=n_owners)
    K = max(int(counts.max()) if E else 1, 1)
    tbl = np.zeros((n_owners, K), dtype=np.int32)
    mask = np.zeros((n_owners, K), dtype=np.float64)
    starts = np.zeros(n_owners + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for o in range(n_owners):
        seg = order[starts[o]:starts[o + 1]]
        tbl[o, :len(seg)] = seg
        mask[o, :len(seg)] = 1.0
    return tbl, mask


def build_ba_ell_pattern(problem: Problem) -> BAEllPattern:
    """Host symbolic phase. Requires: every edge group with a marginalized
    slot is binary (landmark, pose)."""
    mg = problem.static.marginalized_groups
    if len(mg) != 1:
        raise ValueError("dual-ELL Schur expects exactly one marginalized group")
    lg = mg[0]

    proj = []
    pose_only = []
    for eg in problem.static.egroups:
        slot_groups = [problem.static.vgroup(g) for g in eg.slots]
        lm_slots = [s for s in range(len(slot_groups))
                    if slot_groups[s].name == lg.name]
        if not lm_slots:
            pose_only.append(eg.key)
            continue
        if len(lm_slots) != 1 or eg.etype.num_vertices != 2:
            raise ValueError(
                f"edge group {eg.key} is not a binary (landmark, pose) "
                f"projection edge; use the general Schur solver")
        sl = lm_slots[0]
        sc = 1 - sl
        ea = problem.edges[eg.key]
        li = np.asarray(ea.indices[sl])
        ci = np.asarray(ea.indices[sc])
        lm_tbl, lm_mask = _ell_tables(li, lg.count)
        cam_tbl, cam_mask = _ell_tables(ci, slot_groups[sc].count)
        dt = problem.dtype
        proj.append(ProjGroupPattern(
            jnp.asarray(lm_tbl), jnp.asarray(lm_mask, dtype=dt),
            jnp.asarray(cam_tbl), jnp.asarray(cam_mask, dtype=dt),
            jnp.asarray(li.astype(np.int32)), jnp.asarray(ci.astype(np.int32)),
            jnp.asarray(ci[lm_tbl].astype(np.int32)),
            jnp.asarray(li[cam_tbl].astype(np.int32)),
            eg.key, sl, sc, slot_groups[sc].name, lg.name))
    return BAEllPattern(tuple(proj), tuple(pose_only), lg.name)


# K-axis chunking bound: gather/einsum programs over a [N, K, ...] axis blow
# up XLA's TPU lowering when K is large (the [C, 1088, 6, 3] programs at
# 400k observations compile for 15+ minutes; see CLAUDE.md). Packing the K
# axis into [nch, N, chunk, ...] and lax.scan-ning over chunks keeps the
# compiled program one-chunk-sized at identical FLOPs. Chunk width 512
# measured fastest on a v5e chip (69.7 ms/step vs 73.3 flat / 85.7 @256 on
# the 80k-obs bench shape) while keeping BAL-scale compiles in seconds.
_K_CHUNK = 512


def _chunk2(a, nch):
    """[N, nch*chunk, ...] -> [nch, N, chunk, ...]."""
    return jnp.swapaxes(
        a.reshape(a.shape[0], nch, _K_CHUNK, *a.shape[2:]), 0, 1)


def _pack_tables(idx, mask):
    """Pack an ELL (index, mask) table pair for chunked K-reductions:
    ("flat", [N, K], [N, K]) for small K, else
    ("chunked", [nch, N, chunk], [nch, N, chunk]). Zero-padded slots gather
    row 0 with zero mask — harmless by construction."""
    K = idx.shape[1]
    if K <= 2 * _K_CHUNK:
        return ("flat", idx, mask)
    nch = -(-K // _K_CHUNK)
    pad = nch * _K_CHUNK - K
    if pad:
        idx = jnp.pad(idx, [(0, 0), (0, pad)])
        mask = jnp.pad(mask, [(0, 0), (0, pad)])
    return ("chunked", _chunk2(idx, nch), _chunk2(mask, nch))


def _bcast_mask(mask, ndim_tail):
    return mask.reshape(mask.shape + (1,) * ndim_tail)


def _reduce_k(per_edge, packed):
    """sum over each owner's edge slots: [E, ...] -> [N, ...] through the
    packed table — one gather+sum when flat, a scan of chunk-sized
    gather+sums when chunked."""
    kind, idx, mask = packed
    tail = per_edge.ndim - 1
    if kind == "flat":
        return (per_edge[idx] * _bcast_mask(mask, tail)).sum(axis=1)

    def body(acc, inp):
        i, m = inp
        return acc + (per_edge[i] * _bcast_mask(m, tail)).sum(axis=1), None

    init = jnp.zeros((idx.shape[1],) + per_edge.shape[1:],
                     dtype=per_edge.dtype)
    out, _ = jax.lax.scan(body, init, (idx, mask))
    return out


def _gather_w(per_edge, packed):
    """Pre-gather the per-edge W blocks into the packed owner layout:
    ("flat", [N, K, s, t]) or ("chunked", [nch, N, chunk, s, t]). Chunked
    uses lax.map so the program holds one chunk-sized gather."""
    kind, idx, mask = packed
    tail = per_edge.ndim - 1
    if kind == "flat":
        return ("flat", per_edge[idx] * _bcast_mask(mask, tail))
    W_ch = jax.lax.map(
        lambda im: per_edge[im[0]] * _bcast_mask(im[1], tail), (idx, mask))
    return ("chunked", W_ch)


def _pack_gidx(gidx, packed_tables):
    """Pack a [N, K] neighbor-gather table (lm_cam / cam_lm) into the same
    chunk layout as its W operand."""
    kind, idx, _ = packed_tables
    if kind == "flat":
        return ("flat", gidx)
    nch = idx.shape[0]
    pad = nch * _K_CHUNK - gidx.shape[1]
    if pad:
        gidx = jnp.pad(gidx, [(0, 0), (0, pad)])
    return ("chunked", _chunk2(gidx, nch))


def _apply_k(W_packed, gidx_packed, x, spec, out_shape, dtype):
    """sum_k einsum(spec, W[:, k], x[gidx[:, k]]): a single fused
    gather+einsum when flat, a lax.scan over chunks when chunked (identical
    arithmetic, bounded program size)."""
    W = W_packed[1]
    gidx = gidx_packed[1]
    if W_packed[0] == "flat":
        return jnp.einsum(spec, W, x[gidx])

    def body(acc, inp):
        Wc, ic = inp
        return acc + jnp.einsum(spec, Wc, x[ic]), None

    init = jnp.zeros(out_shape, dtype=dtype)
    out, _ = jax.lax.scan(body, init, (W, gidx))
    return out


def _apply_k_sandwich(W_packed, gidx_packed, M):
    """corr[c] = sum_k W[c, k] @ M[gidx[c, k]] @ W[c, k]^T (the block-Jacobi
    preconditioner correction), chunk-scanned like _apply_k."""
    spec = "ckst,cktu,ckvu->csv"
    W = W_packed[1]
    gidx = gidx_packed[1]
    if W_packed[0] == "flat":
        return jnp.einsum(spec, W, M[gidx], W)

    def body(acc, inp):
        Wc, ic = inp
        return acc + jnp.einsum(spec, Wc, M[ic], Wc), None

    C, s = W.shape[1], W.shape[3]
    init = jnp.zeros((C, s, s), dtype=W.dtype)
    out, _ = jax.lax.scan(body, init, (W, gidx))
    return out


def _build(problem: Problem, pattern: BAEllPattern, lin: dict):
    """Per-linearization quantities, all scatter-free except the (small)
    pose-pose extra."""
    dt = problem.dtype
    lg = problem.static.vgroup(pattern.lm_name)
    L, dl = lg.count, lg.tangent_dim
    Tp = problem.static.pose_dim

    Hll = jnp.zeros((L, dl, dl), dtype=dt)
    b_l = jnp.zeros((L, dl), dtype=dt)
    groups = {}   # cam group name -> dict with Hcc_diag, b_p parts

    proj_data = []
    for pg in pattern.proj:
        ea = problem.edges[pg.egkey]
        resid, jacs, w = lin[pg.egkey]
        w_omega = w[:, None, None] * ea.information
        Jl, Jc = jacs[pg.lm_slot], jacs[pg.cam_slot]
        Jl_w = jnp.einsum("eas,eab->esb", Jl, w_omega)
        Jc_w = jnp.einsum("eas,eab->esb", Jc, w_omega)
        lm_tbl = _pack_tables(pg.lm_edge_idx, pg.lm_mask)
        cam_tbl = _pack_tables(pg.cam_edge_idx, pg.cam_mask)
        Hll = Hll + _reduce_k(jnp.einsum("esb,ebt->est", Jl_w, Jl), lm_tbl)
        b_l = b_l + _reduce_k(-jnp.einsum("esb,eb->es", Jl_w, resid), lm_tbl)
        W = jnp.einsum("esb,ebt->est", Jc_w, Jl)     # [E, Dp, dl]
        Hcc_e = jnp.einsum("esb,ebt->est", Jc_w, Jc)
        bp_e = -jnp.einsum("esb,eb->es", Jc_w, resid)
        cg = problem.static.vgroup(pg.cam_group)
        slot = groups.setdefault(pg.cam_group, {
            "Hcc": jnp.zeros((cg.count, cg.tangent_dim, cg.tangent_dim), dt),
            "b": jnp.zeros((cg.count, cg.tangent_dim), dt)})
        slot["Hcc"] = slot["Hcc"] + _reduce_k(Hcc_e, cam_tbl)
        slot["b"] = slot["b"] + _reduce_k(bp_e, cam_tbl)
        # pre-gather W into BOTH ELL layouts (one-time per linearization)
        # so PCG matvecs gather only from the small x_c / v tables
        proj_data.append({
            "pg": pg,
            "W_lm": _gather_w(W, lm_tbl),
            "W_cam": _gather_w(W, cam_tbl),
            "lm_cam": _pack_gidx(pg.lm_cam, lm_tbl),
            "cam_lm": _pack_gidx(pg.cam_lm, cam_tbl)})

    # pose-only edges -> small dense extra over the pose tangent block
    Hpp_extra = jnp.zeros((Tp, Tp), dtype=dt)
    b_extra = jnp.zeros((Tp,), dtype=dt)
    for key in pattern.pose_only_keys:
        eg = next(e for e in problem.static.egroups if e.key == key)
        ea = problem.edges[key]
        resid, jacs, w = lin[key]
        w_omega = w[:, None, None] * ea.information
        k = eg.etype.num_vertices
        slot_groups = [problem.static.vgroup(g) for g in eg.slots]
        idx = [_slot_tangent_indices(slot_groups[s], ea.indices[s])
               for s in range(k)]
        for s in range(k):
            js_w = jnp.einsum("eas,eab->esb", jacs[s], w_omega)
            b_extra = b_extra.at[idx[s]].add(
                -jnp.einsum("esb,eb->es", js_w, resid))
            for t in range(s, k):
                blk = jnp.einsum("esb,ebt->est", js_w, jacs[t])
                Hpp_extra = Hpp_extra.at[
                    idx[s][:, :, None], idx[t][:, None, :]].add(blk)
                if t != s:
                    Hpp_extra = Hpp_extra.at[
                        idx[t][:, :, None], idx[s][:, None, :]].add(
                        jnp.swapaxes(blk, 1, 2))
    has_extra = bool(pattern.pose_only_keys)

    return {"Hll": Hll, "b_l": b_l, "groups": groups, "proj": proj_data,
            "Hpp_extra": Hpp_extra, "b_extra": b_extra,
            "has_extra": has_extra, "L": L, "dl": dl, "Tp": Tp}


def _solve(problem: Problem, pattern: BAEllPattern, sys, lam,
           pcg_iters: int, pcg_tol: float = 1e-10):
    """Damped Schur solve on the dual-ELL structures. dx over part-dicts."""
    dt = problem.dtype
    lg = problem.static.vgroup(pattern.lm_name)
    L, dl = sys["L"], sys["dl"]
    Hll, b_l = sys["Hll"], sys["b_l"]
    free_l = problem.free[lg.name]
    eye_l = jnp.eye(dl, dtype=dt)
    Hll_d = Hll + (lam * free_l + (1.0 - free_l))[:, None, None] * eye_l
    Hinv = batched_small_inv(Hll_d)

    pose_groups = [g for g in problem.static.vgroups
                   if g.offset < problem.static.pose_dim]
    free_p = {g.name: problem.free[g.name] for g in pose_groups}

    # damped block-diagonal Hcc per group (+ fixed identity)
    Hcc_d = {}
    for g in pose_groups:
        D = g.tangent_dim
        eye = jnp.eye(D, dtype=dt)
        base = sys["groups"].get(g.name, {"Hcc": jnp.zeros(
            (g.count, D, D), dt)})["Hcc"]
        f = free_p[g.name]
        Hcc_d[g.name] = (base + lam * eye[None]) * f[:, None, None] \
            + (1.0 - f)[:, None, None] * eye[None]

    # hoist the dense extra into per-part closures
    has_extra = sys["has_extra"]

    def parts_to_flat(parts):
        return jnp.concatenate([parts[g.name].reshape(-1)
                                for g in pose_groups])

    def flat_to_parts(x):
        out = {}
        for g in pose_groups:
            seg = jax.lax.dynamic_slice(x, (g.offset,),
                                        (g.count * g.tangent_dim,))
            out[g.name] = seg.reshape(g.count, g.tangent_dim)
        return out

    def cam_shape(pg):
        g = problem.static.vgroup(pg.cam_group)
        return (g.count, g.tangent_dim)

    # reduced rhs
    hib = jnp.einsum("lst,lt->ls", Hinv, b_l)
    b_red = {g.name: sys["groups"].get(g.name, {"b": jnp.zeros(
        (g.count, g.tangent_dim), dt)})["b"] for g in pose_groups}
    for pd in sys["proj"]:
        pg = pd["pg"]
        b_red[pg.cam_group] = b_red[pg.cam_group] - _apply_k(
            pd["W_cam"], pd["cam_lm"], hib, "ckst,ckt->cs", cam_shape(pg), dt)
    if has_extra:
        extra = flat_to_parts(sys["b_extra"])
        b_red = {k: b_red[k] + extra[k] for k in b_red}

    def s_matvec(x_parts):
        """Gathers only from the small x_c [C, Dp] / v [L, dl] tables; the
        heavy W tensors are read sequentially by the einsums."""
        y = {g.name: jnp.einsum("nst,nt->ns", Hcc_d[g.name], x_parts[g.name])
             for g in pose_groups}
        if has_extra:
            flat = sys["Hpp_extra"] @ parts_to_flat(x_parts)
            extra = flat_to_parts(flat)
            y = {k: y[k] + extra[k] for k in y}
        u = jnp.zeros((L, dl), dtype=dt)
        for pd in sys["proj"]:
            pg = pd["pg"]
            u = u + _apply_k(pd["W_lm"], pd["lm_cam"], x_parts[pg.cam_group],
                             "lkst,lks->lt", (L, dl), dt)
        v = jnp.einsum("lst,lt->ls", Hinv, u)
        for pd in sys["proj"]:
            pg = pd["pg"]
            y[pg.cam_group] = y[pg.cam_group] - _apply_k(
                pd["W_cam"], pd["cam_lm"], v, "ckst,ckt->cs", cam_shape(pg),
                dt)
        return y

    # block-Jacobi preconditioner on diag(S)
    s_blocks = dict(Hcc_d)
    for pd in sys["proj"]:
        pg = pd["pg"]
        corr = -_apply_k_sandwich(pd["W_cam"], pd["cam_lm"], Hinv)
        s_blocks[pg.cam_group] = s_blocks[pg.cam_group] + corr
    s_binv = {k: batched_small_inv(v) for k, v in s_blocks.items()}

    def precond(r_parts):
        return {k: jnp.einsum("nst,nt->ns", s_binv[k], r_parts[k])
                for k in r_parts}

    dx_p, ok = pcg_solve(s_matvec, b_red, precond=precond,
                         max_iter=pcg_iters, tol=pcg_tol)
    dx_p = {k: dx_p[k] * free_p[k][:, None] for k in dx_p}

    # back-substitution
    u = jnp.zeros((L, dl), dtype=dt)
    for pd in sys["proj"]:
        pg = pd["pg"]
        u = u + _apply_k(pd["W_lm"], pd["lm_cam"], dx_p[pg.cam_group],
                         "lkst,lks->lt", (L, dl), dt)
    dx_l = jnp.einsum("lst,lt->ls", Hinv, b_l - u) * free_l[:, None]

    dx_parts = dict(dx_p)
    dx_parts[pattern.lm_name] = dx_l
    b_parts = {g.name: sys["groups"].get(g.name, {"b": jnp.zeros(
        (g.count, g.tangent_dim), dt)})["b"] for g in pose_groups}
    if has_extra:
        extra = flat_to_parts(sys["b_extra"])
        b_parts = {k: b_parts[k] + extra[k] for k in b_parts}
    b_parts[pattern.lm_name] = b_l
    return dx_parts, ok, b_parts


@partial(jax.jit, static_argnames=("max_trials", "pcg_iters", "pcg_tol"))
def _lm_ba_ell_step(prob: Problem, pattern: BAEllPattern, params: dict,
                    lam, ni, chi_cur, max_trials: int = 10,
                    pcg_iters: int = 100, pcg_tol: float = 1e-10):
    """One LM iteration on the dual-ELL Schur solver (same trial semantics
    as the reference LM, optimization_algorithm_levenberg.cpp:95-142)."""
    from openslam_g2o_tpu.core.problem import apply_update_parts
    from openslam_g2o_tpu.core.solvers import _tree_dot

    work = prob.with_params(params)
    lin = linearize(work)
    sys = _build(work, pattern, lin)

    def trial_cond(st):
        trials, done, rho = st[0], st[1], st[2]
        return jnp.logical_and(jnp.logical_not(done),
                               jnp.logical_and(rho < 0, trials < max_trials))

    def trial_body(st):
        trials, done, rho, lam, ni, best_params, best_chi = st
        dx, ok, b_parts = _solve(work, pattern, sys, lam, pcg_iters,
                                 pcg_tol=pcg_tol)
        cand = apply_update_parts(work, dx)
        chi_new = robust_chi2(work, cand)
        chi_new = jnp.where(ok, chi_new, jnp.inf)
        scale = _tree_dot(dx, jax.tree_util.tree_map(
            lambda d, bi: lam * d + bi, dx, b_parts)) + 1e-3
        rho = (chi_cur - chi_new) / scale
        accept = jnp.logical_and(rho > 0, jnp.isfinite(chi_new))
        alpha = 1.0 - (2.0 * rho - 1.0) ** 3
        good = jnp.maximum(1.0 / 3.0, jnp.minimum(alpha, 2.0 / 3.0))
        lam = jnp.where(accept, lam * good, lam * ni)
        ni = jnp.where(accept, 2.0, ni * 2.0)
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old), cand, best_params)
        best_chi = jnp.where(accept, chi_new, best_chi)
        return trials + 1, accept, rho, lam, ni, best_params, best_chi

    init = (jnp.int32(0), jnp.array(False), jnp.array(-1.0, prob.dtype),
            lam, ni, params, chi_cur)
    trials, accepted, rho, lam, ni, best_params, best_chi = jax.lax.while_loop(
        trial_cond, trial_body, init)
    return best_params, lam, ni, best_chi, trials, accepted


class LevenbergMarquardtSchurELL:
    """LM + dual-ELL Schur: the production BA configuration on TPU."""

    name = "lm_schur_ell"

    def __init__(self, initial_lambda: float = 0.0,
                 max_trials_after_failure: int = 10, tau: float = 1e-5,
                 pcg_iters: int = 100, pcg_tol: float = 1e-10):
        self.initial_lambda = initial_lambda
        self.max_trials = max_trials_after_failure
        self.tau = tau
        self.pcg_iters = pcg_iters
        self.pcg_tol = pcg_tol
        self._pattern = None
        self._pattern_for = None

    def pattern(self, prob: Problem):
        if self._pattern_for is not prob.static:
            self._pattern = build_ba_ell_pattern(prob)
            self._pattern_for = prob.static
        return self._pattern

    def init(self, prob: Problem):
        pattern = self.pattern(prob)
        if self.initial_lambda > 0:
            lam = jnp.asarray(self.initial_lambda, prob.dtype)
        else:
            # tau * max |diag(H)| over landmark AND camera blocks
            # (computeLambdaInit, optimization_algorithm_levenberg.cpp:149-163)
            def max_diag(l):
                sys = _build(prob, pattern, l)
                m = jnp.max(jnp.abs(jnp.diagonal(sys["Hll"], axis1=1, axis2=2)))
                for g in sys["groups"].values():
                    m = jnp.maximum(m, jnp.max(jnp.abs(
                        jnp.diagonal(g["Hcc"], axis1=1, axis2=2))))
                if sys["has_extra"]:
                    m = jnp.maximum(m, jnp.max(jnp.abs(
                        jnp.diagonal(sys["Hpp_extra"]))))
                return m

            lin = linearize(prob)
            m = jax.jit(max_diag)(lin)
            lam = jnp.asarray(self.tau, prob.dtype) * m
        return {"params": prob.params, "lam": lam,
                "ni": jnp.asarray(2.0, prob.dtype),
                "chi2": robust_chi2(prob)}

    def step(self, prob: Problem, state: dict):
        params, lam, ni, chi, trials, accepted = _lm_ba_ell_step(
            prob, self.pattern(prob), state["params"], state["lam"],
            state["ni"], state["chi2"],
            max_trials=self.max_trials, pcg_iters=self.pcg_iters,
            pcg_tol=self.pcg_tol)
        new_state = {"params": params, "lam": lam, "ni": ni, "chi2": chi}
        info = {"chi2": float(chi), "lambda": float(lam),
                "levenberg_iters": int(trials), "ok": bool(accepted)}
        return new_state, info
