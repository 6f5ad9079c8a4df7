"""Shared reprojection residual/Jacobian blocks for pose and BA solvers.

Closed forms matching the reference's analytic g2o Jacobians
(EdgeSE3ProjectXYZ::linearizeOplus and GeometricCamera::projectJac): for a
world point X, camera pose T_cw = (R, t), camera point p = R X + t and a
left-multiplicative se3 update exp(delta) T_cw with delta = (omega, upsilon):

    dp/ddelta = [-hat(p) | I_3]          (2 blocks of 3)
    dp/dX     = R
    dr/d*     = dproj/dp . dp/d*
"""

import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.so3 import hat


def camera_points(R_cw, t_cw, X):
    return jnp.einsum("...ij,...j->...i", R_cw, X) + t_cw


def residual_and_jacobians(project_jac_fn, project_fn, R_cw, t_cw, X, uv_obs):
    """Batched residual r = proj(p) - uv and Jacobians.

    Args:
      project_jac_fn / project_fn: camera functions on camera-frame points.
      R_cw (..., 3, 3), t_cw (..., 3): per-observation poses.
      X (..., 3): per-observation world points.
      uv_obs (..., 2).

    Returns (r (..., 2), J_pose (..., 2, 6), J_point (..., 2, 3), p_cam)."""
    p = camera_points(R_cw, t_cw, X)
    r = project_fn(p) - uv_obs
    Jp = project_jac_fn(p)  # (..., 2, 3)
    dpd_rot = -hat(p)  # (..., 3, 3)
    J_pose = jnp.concatenate([Jp @ dpd_rot, Jp], axis=-1)  # (..., 2, 6)
    J_point = Jp @ R_cw
    return r, J_pose, J_point, p
