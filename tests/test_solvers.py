"""Linear-solver unit tests: PCG convergence/stall signalling and the
closed-form batched Cholesky building blocks of the Jacobi-scaled CG path."""
import numpy as np
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.core.solvers import (
    batched_chol_inv_lower, batched_chol_lower, batched_small_inv, pcg_solve)


class TestPCG:
    def test_solves_spd_system(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(8, 8))
        A = A @ A.T + 8 * np.eye(8)
        b = rng.normal(size=8)
        Aj = jnp.asarray(A)
        x, ok = pcg_solve(lambda v: Aj @ v, jnp.asarray(b), max_iter=50,
                          tol=1e-10)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("unroll,norm", [(1, "true"), (2, "precond")])
    def test_unroll_and_norm_variants_agree(self, unroll, norm):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(12, 12))
        A = A @ A.T + 12 * np.eye(12)
        b = rng.normal(size=12)
        Aj = jnp.asarray(A)
        x, ok = pcg_solve(lambda v: Aj @ v, jnp.asarray(b), max_iter=60,
                          tol=1e-10, unroll=unroll, norm=norm)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-4, atol=1e-6)

    def test_indefinite_system_flags_not_ok(self):
        """Negative curvature must surface as ok=False (the stall signal a
        GN caller needs; optimization_algorithm_levenberg.cpp:119-120
        failure semantics), not a silently-diverged solution."""
        A = jnp.asarray(np.diag([1.0, -1.0, 2.0]))
        b = jnp.asarray(np.array([1.0, 1.0, 1.0]))
        x, ok = pcg_solve(lambda v: A @ v, b, max_iter=10, tol=1e-12)
        assert not bool(ok)
        np.testing.assert_array_equal(np.asarray(x), 0.0)

    def test_warm_start_converges(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(10, 10))
        A = A @ A.T + 10 * np.eye(10)
        b = rng.normal(size=10)
        Aj = jnp.asarray(A)
        x_exact = np.linalg.solve(A, b)
        x0 = jnp.asarray(x_exact + 0.01 * rng.normal(size=10))
        x, ok = pcg_solve(lambda v: Aj @ v, jnp.asarray(b), x0=x0,
                          max_iter=30, tol=1e-10)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(x), x_exact, rtol=1e-5,
                                   atol=1e-7)


class TestBatchedChol:
    @pytest.mark.parametrize("D", [1, 2, 3, 5])
    def test_chol_and_inverse(self, D):
        rng = np.random.default_rng(D)
        M = rng.normal(size=(32, D, D))
        A = M @ np.swapaxes(M, 1, 2) + 3 * np.eye(D)
        L = np.asarray(batched_chol_lower(jnp.asarray(A)))
        np.testing.assert_allclose(L @ np.swapaxes(L, 1, 2), A, rtol=1e-5,
                                   atol=1e-8)
        # lower triangular
        assert np.allclose(np.triu(L, 1), 0.0)
        Linv = np.asarray(batched_chol_inv_lower(jnp.asarray(A)))
        np.testing.assert_allclose(Linv @ L,
                                   np.broadcast_to(np.eye(D), A.shape),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("D", [1, 2, 3])
    def test_small_inv(self, D):
        rng = np.random.default_rng(10 + D)
        M = rng.normal(size=(16, D, D))
        A = M @ np.swapaxes(M, 1, 2) + 2 * np.eye(D)
        inv = np.asarray(batched_small_inv(jnp.asarray(A)))
        np.testing.assert_allclose(inv @ A,
                                   np.broadcast_to(np.eye(D), A.shape),
                                   rtol=1e-4, atol=1e-5)


class TestLaneInverse:
    """Closed-form lane-major [D, D, N] inverse (ba_ell._inv_lane):
    adjugate for D <= 3, recursive blockwise Schur above."""

    @pytest.mark.parametrize("D", [1, 2, 3, 4, 6, 7])
    def test_matches_numpy(self, D):
        from openslam_g2o_tpu.core.ba_ell import _inv_lane
        rng = np.random.default_rng(20 + D)
        M = rng.normal(size=(24, D, D))
        A = M @ np.swapaxes(M, 1, 2) + 3 * np.eye(D)
        A_lane = jnp.asarray(np.moveaxis(A, 0, -1))
        inv = np.moveaxis(np.asarray(_inv_lane(A_lane)), -1, 0)
        np.testing.assert_allclose(inv @ A,
                                   np.broadcast_to(np.eye(D), A.shape),
                                   rtol=1e-4, atol=1e-6)


class TestChebyshevPrecond:
    """Chebyshev polynomial preconditioner: SPD for any spectrum in
    (0, hi], and CG under it reaches the same solution in fewer outer
    iterations (solvers.make_chebyshev_precond)."""

    def _scaled_spd(self, n=60, seed=3):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(n, n))
        A = A @ A.T / n + 0.05 * np.eye(n)
        d = np.sqrt(np.diag(A))
        return A / d[:, None] / d[None, :]

    def test_preconditioner_is_spd_under_gershgorin_bound(self):
        from openslam_g2o_tpu.core.solvers import make_chebyshev_precond
        S = self._scaled_spd()
        n = S.shape[0]
        Sj = jnp.asarray(S)
        hi = jnp.asarray(np.abs(S).sum(axis=1).max())   # Gershgorin
        pre = make_chebyshev_precond(lambda v: Sj @ v, hi * 0.02, hi, 4)
        P = np.column_stack(
            [np.asarray(pre(jnp.eye(n)[:, i])) for i in range(n)])
        ev = np.linalg.eigvalsh((P + P.T) / 2)
        assert ev.min() > 0

    def test_cheby_cg_matches_direct_solve(self):
        from openslam_g2o_tpu.core.solvers import make_chebyshev_precond
        S = self._scaled_spd(seed=5)
        rng = np.random.default_rng(6)
        b = rng.normal(size=S.shape[0])
        Sj = jnp.asarray(S)
        hi = jnp.asarray(np.abs(S).sum(axis=1).max())
        pre = make_chebyshev_precond(lambda v: Sj @ v, hi * 0.02, hi, 4)
        x, ok = pcg_solve(lambda v: Sj @ v, jnp.asarray(b), precond=pre,
                          max_iter=60, tol=1e-10, norm="precond")
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(S, b),
                                   rtol=1e-6, atol=1e-8)

    def test_fewer_outer_iterations_than_plain_cg(self):
        from openslam_g2o_tpu.core.solvers import make_chebyshev_precond
        S = self._scaled_spd(n=150, seed=9)
        rng = np.random.default_rng(10)
        b = rng.normal(size=S.shape[0])
        Sj = jnp.asarray(S)
        bj = jnp.asarray(b)
        hi = jnp.asarray(np.abs(S).sum(axis=1).max())
        pre = make_chebyshev_precond(lambda v: Sj @ v, hi * 0.02, hi, 6)

        def iters_to(pre_fn, tol=1e-8):
            for it in range(2, 200, 2):
                x, _ = pcg_solve(lambda v: Sj @ v, bj, precond=pre_fn,
                                 max_iter=it, tol=0.0, norm="precond")
                rel = float(jnp.linalg.norm(Sj @ x - bj)
                            / jnp.linalg.norm(bj))
                if rel < tol:
                    return it
            return 200

        assert iters_to(pre) < iters_to(None) // 2
