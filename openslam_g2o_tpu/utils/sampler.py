"""Random sampling helpers for simulators and tests.

Re-implements g2o/stuff/sampler.h:49-95 (GaussianSampler: scalar/vector
Gaussian draws, optionally correlated through a covariance matrix) on numpy
Generators.
"""
from __future__ import annotations

import numpy as np

__all__ = ["Sampler", "GaussianSampler", "uniform_rand", "gauss_rand"]


class GaussianSampler:
    """Draws x ~ N(0, Sigma) via the Cholesky factor (sampler.h:49-95)."""

    def __init__(self, covariance=None, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self._L = None
        if covariance is not None:
            self.set_distribution(covariance)

    def set_distribution(self, covariance):
        cov = np.atleast_2d(np.asarray(covariance, dtype=np.float64))
        self._L = np.linalg.cholesky(cov)

    def generate_sample(self):
        if self._L is None:
            raise ValueError("distribution not set")
        return self._L @ self.rng.standard_normal(self._L.shape[0])


class Sampler:
    """Uniform/Gaussian scalar draws with a shared seed (sampler.h top-level
    helpers)."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def uniform(self, low: float = 0.0, high: float = 1.0) -> float:
        return float(self.rng.uniform(low, high))

    def gaussian(self, sigma: float = 1.0) -> float:
        return float(self.rng.normal(0.0, sigma))


_default = Sampler()


def uniform_rand(low: float, high: float) -> float:
    return _default.uniform(low, high)


def gauss_rand(sigma: float) -> float:
    return _default.gaussian(sigma)
