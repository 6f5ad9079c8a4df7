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


def residual_and_jacobians(project_jac_fn, project_fn, R_cw, t_cw, X, uv_obs,
                           ur_obs=None, bf=None):
    """Batched residual r = proj(p) - uv and Jacobians.

    Args:
      project_jac_fn / project_fn: camera functions on camera-frame points.
      R_cw (..., 3, 3), t_cw (..., 3): per-observation poses.
      X (..., 3): per-observation world points.
      uv_obs (..., 2).
      ur_obs (...,) or None: right-image u coordinate of a rectified stereo
        observation (< 0 where the observation is mono-only); with bf =
        fx * baseline this adds the reference's third stereo residual row
        u_r_hat = u_hat - bf / z (EdgeStereoSE3ProjectXYZ, g2o
        types_six_dof_expmap).  Rows for mono-only observations are zeroed
        in both residual and Jacobians so they drop out of normal equations.

    Returns (r (..., D), J_pose (..., D, 6), J_point (..., D, 3), p_cam)
    with D = 2 (mono) or 3 (stereo)."""
    p = camera_points(R_cw, t_cw, X)
    r = project_fn(p) - uv_obs
    Jp = project_jac_fn(p)  # (..., 2, 3)
    if ur_obs is not None:
        z = jnp.maximum(p[..., 2], 1e-6)
        ur_hat = project_fn(p)[..., 0] - bf / z
        has_ur = (ur_obs >= 0).astype(r.dtype)
        r3 = (ur_hat - ur_obs) * has_ur
        # d ur_hat / dp = d u / dp + [0, 0, bf / z^2]
        J3 = Jp[..., 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), bf / (z * z)], axis=-1)
        J3 = J3 * has_ur[..., None]
        r = jnp.concatenate([r, r3[..., None]], axis=-1)
        Jp = jnp.concatenate([Jp, J3[..., None, :]], axis=-2)  # (..., 3, 3)
    dpd_rot = -hat(p)  # (..., 3, 3)
    J_pose = jnp.concatenate([Jp @ dpd_rot, Jp], axis=-1)  # (..., D, 6)
    J_point = Jp @ R_cw
    return r, J_pose, J_point, p
