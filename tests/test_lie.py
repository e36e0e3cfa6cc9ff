"""Manifold kernel tests.

Methodology mirrors the reference's standalone checkers
(test_isometry3d_mappings.cpp: round-trips; test_slam3d_jacobian.cpp: many
random instances), but as a pytest suite with vmapped batches.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openslam_g2o_tpu.ops import lie

rng = np.random.default_rng(42)


def rand_se2(n):
    v = rng.uniform(-1, 1, size=(n, 3))
    v[:, 2] *= np.pi
    return jnp.asarray(v)


def rand_quat(n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def rand_se3(n):
    t = rng.uniform(-2, 2, size=(n, 3))
    return jnp.asarray(np.concatenate([t, rand_quat(n)], axis=1))


def rand_sim3(n):
    t = rng.uniform(-2, 2, size=(n, 3))
    s = np.exp(rng.uniform(-0.5, 0.5, size=(n, 1)))
    return jnp.asarray(np.concatenate([t, rand_quat(n), s], axis=1))


class TestSE2:
    def test_compose_inverse_identity(self):
        a = rand_se2(100)
        out = jax.vmap(lie.se2_compose)(a, jax.vmap(lie.se2_inverse)(a))
        np.testing.assert_allclose(out, 0.0, atol=1e-12)

    def test_associativity(self):
        a, b, c = rand_se2(50), rand_se2(50), rand_se2(50)
        ab_c = jax.vmap(lie.se2_compose)(jax.vmap(lie.se2_compose)(a, b), c)
        a_bc = jax.vmap(lie.se2_compose)(a, jax.vmap(lie.se2_compose)(b, c))
        np.testing.assert_allclose(ab_c, a_bc, atol=1e-12)

    def test_apply_matches_compose(self):
        a = rand_se2(50)
        p = jnp.asarray(rng.normal(size=(50, 2)))
        via_apply = jax.vmap(lie.se2_apply)(a, p)
        b = jnp.concatenate([p, jnp.zeros((50, 1))], axis=1)
        via_comp = jax.vmap(lie.se2_compose)(a, b)[:, :2]
        np.testing.assert_allclose(via_apply, via_comp, atol=1e-12)

    def test_error_zero_at_measurement(self):
        xi, xj = rand_se2(50), rand_se2(50)
        z = jax.vmap(lie.se2_compose)(jax.vmap(lie.se2_inverse)(xi), xj)
        e = jax.vmap(lie.se2_error)(jax.vmap(lie.se2_inverse)(z), xi, xj)
        np.testing.assert_allclose(e, 0.0, atol=1e-12)

    def test_normalize_angle(self):
        th = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 7.1])
        out = lie.normalize_angle(th)
        assert np.all(np.abs(out) <= np.pi + 1e-12)
        np.testing.assert_allclose(np.cos(out), np.cos(th), atol=1e-12)
        np.testing.assert_allclose(np.sin(out), np.sin(th), atol=1e-12)


class TestQuat:
    def test_mul_matches_matrix(self):
        q1, q2 = jnp.asarray(rand_quat(100)), jnp.asarray(rand_quat(100))
        R = jax.vmap(lie.quat_to_matrix)(jax.vmap(lie.quat_mul)(q1, q2))
        R12 = jax.vmap(lie.quat_to_matrix)(q1) @ jax.vmap(lie.quat_to_matrix)(q2)
        np.testing.assert_allclose(R, R12, atol=1e-12)

    def test_rotate_matches_matrix(self):
        q = jnp.asarray(rand_quat(100))
        v = jnp.asarray(rng.normal(size=(100, 3)))
        out = jax.vmap(lie.quat_rotate)(q, v)
        ref = jnp.einsum("nij,nj->ni", jax.vmap(lie.quat_to_matrix)(q), v)
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_matrix_quat_roundtrip(self):
        q = jnp.asarray(rand_quat(200))
        R = jax.vmap(lie.quat_to_matrix)(q)
        q2 = jax.vmap(lie.matrix_to_quat)(R)
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_roundtrip_near_singular_rotations(self):
        # 180-degree rotations about each axis exercise all Shepperd branches
        for axis in np.eye(3):
            q = np.concatenate([np.sin(np.pi / 2) * axis, [np.cos(np.pi / 2)]])
            R = lie.quat_to_matrix(jnp.asarray(q))
            q2 = lie.matrix_to_quat(R)
            assert abs(abs(float(jnp.dot(jnp.asarray(q), q2))) - 1.0) < 1e-9

    def test_compact_roundtrip(self):
        q = jnp.asarray(rand_quat(100))
        qpos = jax.vmap(lie.quat_normalize_positive)(q)
        q2 = jax.vmap(lie.quat_from_compact)(jax.vmap(lie.quat_to_compact)(q))
        np.testing.assert_allclose(qpos, q2, atol=1e-9)


class TestSE3:
    def test_compose_inverse(self):
        a = rand_se3(100)
        out = jax.vmap(lie.se3_compose)(a, jax.vmap(lie.se3_inverse)(a))
        ident = lie.se3_identity(out.dtype)
        # quaternion may be -identity
        np.testing.assert_allclose(out[:, :3], 0.0, atol=1e-12)
        np.testing.assert_allclose(jnp.abs(out[:, 6]), 1.0, atol=1e-12)

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng.uniform(-1, 1, size=(200, 6)))
        p = jax.vmap(lie.se3_exp)(xi)
        xi2 = jax.vmap(lie.se3_log)(p)
        np.testing.assert_allclose(xi, xi2, atol=1e-9)

    def test_exp_log_small_angle(self):
        xi = jnp.asarray(rng.normal(size=(50, 6)) * 1e-8)
        p = jax.vmap(lie.se3_exp)(xi)
        xi2 = jax.vmap(lie.se3_log)(p)
        np.testing.assert_allclose(xi, xi2, atol=1e-14)

    def test_exp_is_differentiable_at_zero(self):
        J = jax.jacfwd(lie.se3_exp)(jnp.zeros(6))
        assert np.all(np.isfinite(J))
        # d t / d upsilon = I, d qvec / d omega = 0.5 I at zero
        np.testing.assert_allclose(J[:3, 3:6], np.eye(3), atol=1e-9)
        np.testing.assert_allclose(J[3:6, 0:3], 0.5 * np.eye(3), atol=1e-9)

    def test_mqt_retract_error_consistency(self):
        xi, xj = rand_se3(50), rand_se3(50)
        z = jax.vmap(lie.se3_compose)(jax.vmap(lie.se3_inverse)(xi), xj)
        e = jax.vmap(lie.se3_error_mqt)(jax.vmap(lie.se3_inverse)(z), xi, xj)
        np.testing.assert_allclose(e, 0.0, atol=1e-9)

    def test_retract_mqt_direction(self):
        p = rand_se3(1)[0]
        d = jnp.asarray([0.1, -0.2, 0.3, 0.01, 0.02, -0.03])
        out = lie.se3_retract_mqt(p, d)
        expect = lie.se3_compose(p, lie.se3_from_mqt(d))
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_apply(self):
        a = rand_se3(50)
        p = jnp.asarray(rng.normal(size=(50, 3)))
        out = jax.vmap(lie.se3_apply)(a, p)
        R = jax.vmap(lie.quat_to_matrix)(a[:, 3:7])
        ref = jnp.einsum("nij,nj->ni", R, p) + a[:, :3]
        np.testing.assert_allclose(out, ref, atol=1e-12)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng.uniform(-0.8, 0.8, size=(200, 7)))
        p = jax.vmap(lie.sim3_exp)(xi)
        xi2 = jax.vmap(lie.sim3_log)(p)
        np.testing.assert_allclose(xi, xi2, atol=1e-8)

    def test_exp_reduces_to_se3_at_zero_sigma(self):
        xi6 = jnp.asarray(rng.uniform(-1, 1, size=(50, 6)))
        xi7 = jnp.concatenate([xi6, jnp.zeros((50, 1))], axis=1)
        p_sim = jax.vmap(lie.sim3_exp)(xi7)
        p_se3 = jax.vmap(lie.se3_exp)(xi6)
        np.testing.assert_allclose(p_sim[:, :3], p_se3[:, :3], atol=1e-9)
        dot = jnp.abs(jnp.sum(p_sim[:, 3:7] * p_se3[:, 3:7], axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)
        np.testing.assert_allclose(p_sim[:, 7], 1.0, atol=1e-12)

    def test_compose_inverse(self):
        a = rand_sim3(100)
        out = jax.vmap(lie.sim3_compose)(a, jax.vmap(lie.sim3_inverse)(a))
        np.testing.assert_allclose(out[:, :3], 0.0, atol=1e-10)
        np.testing.assert_allclose(out[:, 7], 1.0, atol=1e-12)

    def test_apply_scale(self):
        a = lie.sim3_identity(jnp.float64).at[7].set(2.0)
        p = jnp.asarray([1.0, 0.0, 0.0])
        np.testing.assert_allclose(lie.sim3_apply(a, p), [2.0, 0, 0], atol=1e-12)

    def test_exp_differentiable_at_zero(self):
        J = jax.jacfwd(lie.sim3_exp)(jnp.zeros(7))
        assert np.all(np.isfinite(J))
        np.testing.assert_allclose(J[:3, 3:6], np.eye(3), atol=1e-8)
