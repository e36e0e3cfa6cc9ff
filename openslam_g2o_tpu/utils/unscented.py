"""Unscented transform: sigma-point sampling and Gaussian reconstruction.

Re-implements g2o/stuff/unscented.h:49 (sampleUnscented /
reconstructGaussian) in batched jnp so it composes with vmapped manifolds —
used for propagating covariance through nonlinear maps (e.g. sensor models in
the simulator or covariance visualization).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sample_unscented", "reconstruct_gaussian", "propagate_unscented"]


def sample_unscented(mean, covariance, alpha: float = 1e-3, beta: float = 2.0,
                     kappa: float = 0.0):
    """Returns (sigma_points [2n+1, n], weights_mean [2n+1],
    weights_cov [2n+1]) — the standard scaled sigma-point set."""
    mean = jnp.asarray(mean)
    cov = jnp.asarray(covariance)
    n = mean.shape[0]
    lam = alpha * alpha * (n + kappa) - n
    L = jnp.linalg.cholesky((n + lam) * cov)
    pts = [mean]
    for i in range(n):
        pts.append(mean + L[:, i])
    for i in range(n):
        pts.append(mean - L[:, i])
    points = jnp.stack(pts)
    wm0 = lam / (n + lam)
    wc0 = wm0 + (1.0 - alpha * alpha + beta)
    wi = 1.0 / (2.0 * (n + lam))
    w_mean = jnp.concatenate([jnp.asarray([wm0]), jnp.full((2 * n,), wi)])
    w_cov = jnp.concatenate([jnp.asarray([wc0]), jnp.full((2 * n,), wi)])
    return points, w_mean, w_cov


def reconstruct_gaussian(points, w_mean, w_cov):
    """(mean, covariance) from weighted sigma points
    (unscented.h reconstructGaussian)."""
    mean = jnp.einsum("i,id->d", w_mean, points)
    d = points - mean[None, :]
    cov = jnp.einsum("i,id,ie->de", w_cov, d, d)
    return mean, cov


def propagate_unscented(fn, mean, covariance, **kw):
    """Propagate N(mean, cov) through `fn` (applied per sigma point)."""
    pts, wm, wc = sample_unscented(mean, covariance, **kw)
    mapped = jnp.stack([fn(p) for p in pts])
    return reconstruct_gaussian(mapped, wm, wc)
