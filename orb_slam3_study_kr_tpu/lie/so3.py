"""SO(3): rotation group on (..., 3, 3) matrices.

Replaces Sophus::SO3 (/root/reference/Thirdparty/Sophus/sophus/so3.hpp) and
the reference's hand-rolled IMU helpers ExpSO3 / LogSO3 / RightJacobianSO3 /
InverseRightJacobianSO3 / NormalizeRotation
(/root/reference/src/ImuTypes.cc:40-110, include/ImuTypes.h:254-260).

All functions broadcast over leading batch axes.  Small-angle branches use
Taylor series selected with `jnp.where` on *both* operands computed safely
(the classic "double-where" trick) so gradients stay finite at theta = 0.
"""

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """(..., 3, 3) skew matrix -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w):
    """Rotation angle with a safe sqrt; returns (theta, theta^2)."""
    th2 = jnp.sum(w * w, axis=-1)
    th = jnp.sqrt(jnp.maximum(th2, _EPS * _EPS))
    return th, th2


def exp_so3(w):
    """Exponential map (..., 3) -> (..., 3, 3), Rodrigues with Taylor guard."""
    th, th2 = _theta(w)
    small = th2 < _EPS
    # sin(th)/th and (1-cos th)/th^2 with series fallback.
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R):
    """Logarithm map (..., 3, 3) -> (..., 3).

    Handles the near-pi case via the diagonal-dominant axis extraction so the
    result is accurate over the whole group (mirrors Sophus so3.hpp::log
    semantics without its quaternion representation).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_th = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Angle via atan2(|skew|/2, cos) — much better conditioned than arccos
    # near theta = pi (where arccos loses ~sqrt(eps) digits in float32).
    # sqrt is guarded away from 0 so autodiff stays finite at identity.
    skew = vee(R - jnp.swapaxes(R, -1, -2))
    sin_th = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(skew * skew, axis=-1), _EPS * _EPS))
    sin_th = jnp.clip(sin_th, 0.0, 1.0)
    th = jnp.arctan2(sin_th, cos_th)

    # Generic branch: th/(2 sin th) * vee(R - R^T), safe near 0 by series.
    small = th < 1e-4
    scale = jnp.where(
        small,
        0.5 + th * th / 12.0,
        th / jnp.maximum(2.0 * sin_th, _EPS),
    )
    w_generic = scale[..., None] * vee(R - jnp.swapaxes(R, -1, -2))

    # Near-pi branch: w = th * axis, axis from largest diagonal of
    # (R + I)/2 = axis axis^T cos-corrected form.
    near_pi = cos_th < -1.0 + 1e-6
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    d = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    # axis_i^2 = (d_i - cos)/ (1 - cos)
    denom = jnp.maximum(1.0 - cos_th, _EPS)
    ax2 = jnp.clip((d - cos_th[..., None]) / denom[..., None], 0.0, 1.0)
    # Guard the sqrt away from zero: this branch is only *selected* near pi,
    # but autodiff evaluates it everywhere and sqrt'(0) = inf would leak NaN
    # through the jnp.where.
    ax = jnp.sqrt(jnp.maximum(ax2, _EPS))
    # Fix signs using the off-diagonal skew part where available, falling back
    # to making the largest component positive (sign of axis is arbitrary at pi).
    k = jnp.argmax(ax, axis=-1)
    sym = jnp.stack(
        [B[..., 1, 0], B[..., 2, 1], B[..., 0, 2]], axis=-1
    )  # products axis_i*axis_j * (1-cos)
    # Sign fix: pivot component forced positive, others take the sign of their
    # symmetric product with the pivot axis (axis sign is arbitrary at pi).
    prods = jnp.stack(
        [
            jnp.stack([ax2[..., 0], sym[..., 0], sym[..., 2]], axis=-1),
            jnp.stack([sym[..., 0], ax2[..., 1], sym[..., 1]], axis=-1),
            jnp.stack([sym[..., 2], sym[..., 1], ax2[..., 2]], axis=-1),
        ],
        axis=-2,
    ) / denom[..., None, None]
    row = jnp.take_along_axis(prods, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    signs = jnp.where(row >= 0, 1.0, -1.0)
    ax_signed = ax * signs
    # For theta slightly below pi the overall sign is still observable in the
    # skew part (skew = 2 sin(theta) axis); align with it when it is above
    # float noise.  Exactly at pi the sign is genuinely arbitrary.
    flip = jnp.where(jnp.sum(ax_signed * skew, axis=-1) < 0.0, -1.0, 1.0)
    ax_signed = ax_signed * flip[..., None]
    w_pi = th[..., None] * ax_signed / jnp.maximum(
        jnp.linalg.norm(ax_signed, axis=-1, keepdims=True), _EPS
    )

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def left_jacobian_so3(w):
    """Left Jacobian J_l of SO(3): exp(w+dw) ~ exp(J_l dw) exp(w)."""
    th, th2 = _theta(w)
    small = th2 < _EPS
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, _EPS * _EPS))
    c = jnp.where(
        small,
        1.0 / 6.0 - th2 / 120.0,
        (th - jnp.sin(th)) / jnp.maximum(th2 * th, _EPS),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def right_jacobian_so3(w):
    """Right Jacobian J_r(w) = J_l(-w); reference ImuTypes.cc RightJacobianSO3."""
    return left_jacobian_so3(-w)


def right_jacobian_inv_so3(w):
    """Inverse right Jacobian (reference InverseRightJacobianSO3)."""
    th, th2 = _theta(w)
    small = th2 < _EPS
    # coefficient of W: +1/2; of W^2: 1/th^2 - (1+cos)/(2 th sin)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        1.0 / jnp.maximum(th2, _EPS * _EPS)
        - (1.0 + jnp.cos(th)) / jnp.maximum(2.0 * th * jnp.sin(th), _EPS),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + cot_term[..., None, None] * W2


def normalize_rotation(R):
    """Project (..., 3, 3) onto SO(3) via SVD (reference NormalizeRotation
    uses the same SVD projection, ImuTypes.cc:105-110)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    # Flip the last singular direction if reflection.
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def quat_to_matrix(q):
    """(..., 4) [w, x, y, z] unit quaternion -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """(..., 3, 3) -> (..., 4) [w, x, y, z], w >= 0.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the best-conditioned one by the largest pivot.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw = 0.5 * safe_sqrt(1.0 + tr)
    # candidates keyed by largest of (tr, m00, m11, m22)
    c0 = jnp.stack(
        [qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], -1
    )
    qx = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    c1 = jnp.stack(
        [(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], -1
    )
    qy = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    c2 = jnp.stack(
        [(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], -1
    )
    qz = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    c3 = jnp.stack(
        [(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], -1
    )
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, k[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q * sign
