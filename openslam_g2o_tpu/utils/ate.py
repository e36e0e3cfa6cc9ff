"""Absolute Trajectory Error (ATE) tooling: Umeyama alignment + RMSE.

The reference evaluates convergence by chi2 only (activeChi2,
g2o/core/sparse_optimizer.cpp:90-114); chi2 alone can hide gauge or
trajectory errors, so the evaluation protocol here (BASELINE.md) also
reports ATE RMSE against ground truth the way the SLAM benchmark literature
does: find the similarity/rigid transform that best aligns the estimated
trajectory to ground truth (Umeyama, IEEE TPAMI 1991 — closed form via SVD),
then report the RMSE of the residual translations.

Host-side numpy: alignment is a one-shot O(N d^2) reduction, not a device
hot path.
"""
from __future__ import annotations

import numpy as np

__all__ = ["umeyama_alignment", "ate_rmse", "positions_from_graph"]


def umeyama_alignment(est: np.ndarray, gt: np.ndarray,
                      with_scale: bool = False):
    """Least-squares similarity transform aligning `est` onto `gt`.

    est, gt: [N, d] point sets (d = 2 or 3). Returns (s, R, t) minimizing
    sum ||gt_i - (s R est_i + t)||^2, with s = 1 when with_scale is False.
    Degenerate (rank-deficient) point sets get the reflection-safe branch of
    Umeyama's theorem (det correction on the last singular vector).
    """
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if est.shape != gt.shape or est.ndim != 2:
        raise ValueError(f"shape mismatch: {est.shape} vs {gt.shape}")
    n, d = est.shape
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = xg.T @ xe / n                      # [d, d]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(d)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[-1, -1] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe ** 2).sum() / n
        s = float((D * np.diag(S)).sum() / max(var_e, 1e-30))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True,
             with_scale: bool = False) -> float:
    """RMSE of trajectory positions after (optional) Umeyama alignment."""
    est = np.asarray(est, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if align:
        s, R, t = umeyama_alignment(est, gt, with_scale=with_scale)
        est = (s * (R @ est.T)).T + t
    err = est - gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def positions_from_graph(graph, vtype_names=("se2", "se3")) -> np.ndarray:
    """Stack the translation part of every pose vertex (id order). SE2
    params are (x, y, theta) -> (x, y); SE3 params are (t, q) -> t."""
    rows = []
    for vid in sorted(graph.vertices):
        rec = graph.vertices[vid]
        if rec.vtype.name not in vtype_names:
            continue
        if rec.vtype.name == "se2":
            rows.append(rec.params[:2])
        else:
            rows.append(rec.params[:3])
    return np.stack(rows) if rows else np.zeros((0, 2))
