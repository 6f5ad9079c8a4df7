"""Sim(3): similarity transforms (R, t, s) for loop closing / map merging.

Replaces Sophus::Sim3 / g2o::Sim3 (/root/reference/Thirdparty/Sophus/sophus/
sim3.hpp, Thirdparty/g2o/g2o/types/sim3.h).  Action: p -> s * R p + t.
Tangent: zeta = (phi, rho, sigma) with s = exp(sigma).
"""

import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.so3 import exp_so3, hat, log_so3, _theta, _EPS


def sim3_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    s = jnp.ones(batch_shape, dtype=dtype)
    return R, t, s


def _sim3_W(phi, sigma):
    """The Sim3 'V'-like matrix W s.t. t = W rho (Ethan Eade / Strasdat form)."""
    th, th2 = _theta(phi)
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = th2 < _EPS

    # Coefficients A, B, C of W = A * hat + B * hat^2 + C * I
    sig2 = sigma * sigma

    C = jnp.where(small_sig, 1.0 - sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))

    cos_th, sin_th = jnp.cos(th), jnp.sin(th)

    # Generic expressions (guarded):
    denom = jnp.where(small_sig, 1.0, sig2) + th2
    a_big = (s * sin_th * sigma + (1.0 - s * cos_th) * th) / (
        jnp.maximum(th, _EPS) * denom
    )
    b_big = (
        C
        - ((s * cos_th - 1.0) * sigma + s * sin_th * th) / denom
    ) / jnp.maximum(th2, _EPS * _EPS)

    # sigma -> 0 limits
    a_sig0 = jnp.where(
        small_th, 0.5 - th2 / 24.0, (1.0 - cos_th) / jnp.maximum(th2, _EPS * _EPS)
    )
    b_sig0 = jnp.where(
        small_th,
        1.0 / 6.0 - th2 / 120.0,
        (th - sin_th) / jnp.maximum(th2 * th, _EPS),
    )
    # theta -> 0, sigma != 0 limits
    a_th0 = jnp.where(
        small_sig,
        0.5 - sigma / 6.0,
        ((sigma - 1.0) * s + 1.0) / jnp.where(small_sig, 1.0, sig2),
    )
    b_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 - sigma / 24.0,
        (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / jnp.where(small_sig, 1.0, sig2 * sigma),
    )

    A = jnp.where(small_th, a_th0, jnp.where(small_sig, a_sig0, a_big))
    B = jnp.where(small_th, b_th0, jnp.where(small_sig, b_sig0, b_big))

    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return A[..., None, None] * W + B[..., None, None] * W2 + C[..., None, None] * eye


def exp_sim3(zeta):
    """(..., 7) tangent [phi, rho, sigma] -> (R, t, s)."""
    phi, rho, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    R = exp_so3(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, jnp.exp(sigma)


def log_sim3(R, t, s):
    """(R, t, s) -> (..., 7) tangent [phi, rho, sigma]."""
    phi = log_so3(R)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([phi, rho, sigma[..., None]], axis=-1)


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """a . b : p -> sa Ra (sb Rb p + tb) + ta."""
    return (
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
        sa * sb,
    )


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t
