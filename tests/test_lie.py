"""Lie-group unit tests: round trips, group axioms, Jacobian checks.

Models the oracle style of Sophus's own tests
(/root/reference/Thirdparty/Sophus/test/core/test_se3.cpp): exp/log round
trips, closure, and numeric-vs-analytic Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_study_kr_tpu import lie


def random_so3(rng, n=16, scale=2.0):
    w = rng.normal(size=(n, 3)) * scale
    return np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    # Keep |w| < pi so the tangent is unique.
    w = rng.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, (64, 1))
    w = jnp.asarray(w, jnp.float32)
    R = lie.exp_so3(w)
    w2 = lie.log_so3(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)


def test_so3_log_exp_near_pi(rng):
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    th = np.pi - rng.uniform(0, 1e-3, size=(32, 1))
    w = jnp.asarray(axis * th, jnp.float32)
    R = lie.exp_so3(w)
    w2 = lie.log_so3(R)
    R2 = lie.exp_so3(w2)
    # Sign of axis may flip at pi; compare rotations, not tangents.
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, -1e-9, 1e-10], [0, 0, 0]], jnp.float32)
    R = lie.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(lie.log_so3(R))))


def test_so3_orthonormal(rng):
    R = jnp.asarray(random_so3(rng, 32))
    eye = np.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(32), atol=1e-5)


def test_right_jacobian_finite_diff(rng):
    """J_r: exp(w + dw) ~ exp(w) exp(J_r dw)."""
    w = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    Jr = lie.right_jacobian_so3(w)
    eps = 1e-3
    for k in range(3):
        dw = np.zeros((8, 3), np.float32)
        dw[:, k] = eps
        lhs = lie.exp_so3(w + jnp.asarray(dw))
        rhs = lie.exp_so3(w) @ lie.exp_so3(jnp.einsum("nij,nj->ni", Jr, jnp.asarray(dw)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=5e-5)


def test_right_jacobian_inverse(rng):
    w = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    J = lie.right_jacobian_so3(w) @ lie.right_jacobian_inv_so3(w)
    np.testing.assert_allclose(np.asarray(J), np.eye(3)[None].repeat(16, 0), atol=1e-4)


def test_normalize_rotation(rng):
    R = jnp.asarray(random_so3(rng, 8)) + 0.01 * jnp.asarray(
        rng.normal(size=(8, 3, 3)), jnp.float32
    )
    Rn = lie.normalize_rotation(R)
    eye = np.eye(3)[None].repeat(8, 0)
    np.testing.assert_allclose(np.asarray(Rn @ jnp.swapaxes(Rn, -1, -2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(Rn)), np.ones(8), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    from orb_slam3_study_kr_tpu.lie.so3 import matrix_to_quat, quat_to_matrix

    R = jnp.asarray(random_so3(rng, 64, scale=3.0))
    q = matrix_to_quat(R)
    R2 = quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 6)) * 0.9, jnp.float32)
    R, t = lie.exp_se3(xi)
    xi2 = lie.log_se3(R, t)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=5e-5)


def test_se3_group_ops(rng):
    xi = jnp.asarray(rng.normal(size=(2, 8, 6)), jnp.float32)
    Ra, ta = lie.exp_se3(xi[0])
    Rb, tb = lie.exp_se3(xi[1])
    Rc, tc = lie.se3_compose(Ra, ta, Rb, tb)
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    lhs = lie.se3_apply(Rc, tc, p)
    rhs = lie.se3_apply(Ra, ta, lie.se3_apply(Rb, tb, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    Ri, ti = lie.se3_inverse(Ra, ta)
    Re, te = lie.se3_compose(Ri, ti, Ra, ta)
    np.testing.assert_allclose(np.asarray(Re), np.eye(3)[None].repeat(8, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), np.zeros((8, 3)), atol=1e-5)


def test_se3_matrix_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    R, t = lie.exp_se3(xi)
    T = lie.se3_matrix(R, t)
    R2, t2 = lie.se3_from_matrix(T)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2))


def test_sim3_exp_log_roundtrip(rng):
    zeta = jnp.asarray(rng.normal(size=(64, 7)) * 0.8, jnp.float32)
    R, t, s = lie.exp_sim3(zeta)
    zeta2 = lie.log_sim3(R, t, s)
    np.testing.assert_allclose(np.asarray(zeta), np.asarray(zeta2), atol=2e-4)


def test_sim3_compose_apply(rng):
    za = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, jnp.float32)
    zb = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, jnp.float32)
    Ra, ta, sa = lie.exp_sim3(za)
    Rb, tb, sb = lie.exp_sim3(zb)
    Rc, tc, sc = lie.sim3_compose(Ra, ta, sa, Rb, tb, sb)
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    lhs = lie.sim3_apply(Rc, tc, sc, p)
    rhs = lie.sim3_apply(Ra, ta, sa, lie.sim3_apply(Rb, tb, sb, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_sim3_inverse(rng):
    z = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, jnp.float32)
    R, t, s = lie.exp_sim3(z)
    Ri, ti, si = lie.sim3_inverse(R, t, s)
    p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    q = lie.sim3_apply(Ri, ti, si, lie.sim3_apply(R, t, s, p))
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=1e-4)


def test_sim3_zero_rotation_nonzero_scale():
    zeta = jnp.asarray([[0, 0, 0, 1.0, 2.0, 3.0, 0.5]], jnp.float32)
    R, t, s = lie.exp_sim3(zeta)
    np.testing.assert_allclose(float(s[0]), np.exp(0.5), rtol=1e-5)
    zeta2 = lie.log_sim3(R, t, s)
    np.testing.assert_allclose(np.asarray(zeta), np.asarray(zeta2), atol=1e-4)


def test_lie_jit_and_grad(rng):
    """Everything must be jittable and differentiable."""

    def loss(xi, p):
        R, t = lie.exp_se3(xi)
        return jnp.sum(lie.se3_apply(R, t, p) ** 2)

    g = jax.jit(jax.grad(loss))(
        jnp.asarray(rng.normal(size=(6,)), jnp.float32),
        jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
    )
    assert np.all(np.isfinite(np.asarray(g)))
