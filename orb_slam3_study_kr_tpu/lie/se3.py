"""SE(3): rigid transforms as (R, t) pairs, R (..., 3, 3), t (..., 3).

Replaces Sophus::SE3 (/root/reference/Thirdparty/Sophus/sophus/se3.hpp).
Tangent convention: xi = (rho, phi) with translation part first is avoided;
we use xi = (phi, rho) — rotation first — matching the ordering used by the
reference's optimizer update steps (g2o SE3Quat::exp uses [omega, upsilon],
Thirdparty/g2o/g2o/types/se3quat.h).
"""

import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.so3 import (
    exp_so3, hat, left_jacobian_so3, log_so3, _theta, _EPS,
)


def se3_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


def exp_se3(xi):
    """(..., 6) tangent [phi, rho] -> (R, t)."""
    phi, rho = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    V = left_jacobian_so3(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def log_se3(R, t):
    """(R, t) -> (..., 6) tangent [phi, rho]."""
    phi = log_so3(R)
    Vinv = _left_jacobian_inv_so3(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([phi, rho], axis=-1)


def _left_jacobian_inv_so3(w):
    th, th2 = _theta(w)
    small = th2 < _EPS
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        1.0 / jnp.maximum(th2, _EPS * _EPS)
        - (1.0 + jnp.cos(th)) / jnp.maximum(2.0 * th * jnp.sin(th), _EPS),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) @ (Rb, tb): apply b then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, p):
    """Transform points p (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R, t):
    """(R, t) -> (..., 4, 4) homogeneous matrix."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*batch, 1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]
