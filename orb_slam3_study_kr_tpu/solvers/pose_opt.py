"""Pose-only optimization: the tracking hot loop's solver.

Replaces Optimizer::PoseOptimization (/root/reference/src/Optimizer.cc:815):
4 rounds x 10 LM iterations over the reprojection of the frame's matched
landmarks, re-classifying outliers between rounds at chi2 5.991 (mono).
Here each round is a lax.scan of damped Gauss-Newton steps on one SE3 (a
6x6 solve), with all residuals/Jacobians batched over landmarks; the
between-round outlier reclassification is a masked update, and the Huber
kernel is IRLS reweighting (active in the first two rounds, dropped after,
as the reference removes the robust kernel from round 3 on).
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.se3 import exp_se3, se3_compose
from orb_slam3_study_kr_tpu.solvers import robust
from orb_slam3_study_kr_tpu.solvers.reproj import residual_and_jacobians

N_ROUNDS = 4
ITERS_PER_ROUND = 10


@functools.partial(jax.jit, static_argnames=("project_fn", "project_jac_fn",
                                             "wide_fov"))
def optimize_pose(
    project_fn, project_jac_fn,
    R_cw, t_cw, X, uv_obs, level, mask,
    damping=1e-3,
    ur_obs=None, bf=None, wide_fov=False,
):
    """Optimize one camera pose against fixed landmarks.

    Args:
      project_fn / project_jac_fn: camera-frame-point -> pixel map and its
        Jacobian (partially applied with intrinsics).
      R_cw (3, 3), t_cw (3): initial world->camera pose.
      X (N, 3): matched landmark positions (fixed).
      uv_obs (N, 2): observed (undistorted) keypoints.
      level (N,): keypoint octave, sets the per-observation information.
      mask (N,): 1.0 for real observations.
      ur_obs (N,) or None: right-image u for stereo observations (< 0 =
        mono-only row); bf = fx * baseline.  Adds the reference's stereo
        residual (PoseOptimization's EdgeStereoSE3ProjectXYZOnlyPose) with
        the 3-dof chi2 gate 7.815 on those observations.
      wide_fov: True for fisheye frames — replaces the z > 0 cheirality
        gate with |p| > 0 so observations past 90 deg off-axis keep their
        weight (the reference's fisheye BA edges project in-model the same
        way, OptimizableTypes.h:31-117).

    Returns (R, t, inlier_mask (N,) bool, n_inliers).
    """
    inv_sigma2 = robust.octave_inv_sigma2(level)
    if ur_obs is None:
        chi2_gate = robust.CHI2_MONO
        huber_delta = robust.HUBER_MONO
    else:
        has_ur = ur_obs >= 0
        chi2_gate = jnp.where(has_ur, robust.CHI2_STEREO, robust.CHI2_MONO)
        huber_delta = jnp.sqrt(chi2_gate)

    def residuals(R, t):
        return residual_and_jacobians(
            project_jac_fn, project_fn, R[None], t[None], X, uv_obs,
            ur_obs=ur_obs, bf=bf,
        )

    def gn_round(carry, use_huber):
        R, t, inlier = carry

        def step(state, _):
            R, t = state
            r, J_pose, _, p = residuals(R, t)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w = inv_sigma2 * mask * inlier
            w = w * jnp.where(
                use_huber > 0, robust.huber_weight(chi2, huber_delta), 1.0
            )
            # Degenerate observations contribute nothing (behind a
            # pinhole camera / at a fisheye camera's center).
            cheir = (jnp.linalg.norm(p, axis=-1) > 1e-3) if wide_fov \
                else (p[:, 2] > 1e-3)
            w = w * cheir
            H = jnp.einsum("nia,n,nib->ab", J_pose, w, J_pose)
            b = jnp.einsum("nia,n,ni->a", J_pose, w, r)
            H = H + damping * jnp.eye(6, dtype=H.dtype)
            delta = -jnp.linalg.solve(H, b)
            dR, dt = exp_se3(delta)
            R_new, t_new = se3_compose(dR, dt, R, t)
            # Reject the step if it increases the (robust-weighted) cost.
            r_new, _, _, _ = residuals(R_new, t_new)
            c_old = jnp.sum(w * jnp.sum(r * r, axis=-1))
            c_new = jnp.sum(w * jnp.sum(r_new * r_new, axis=-1))
            better = c_new < c_old
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            return (R, t), None

        (R, t), _ = jax.lax.scan(step, (R, t), None, length=ITERS_PER_ROUND)
        # Re-classify inliers at chi2 5.991 for the next round (the reference
        # flips outliers back in if they re-pass).
        r, _, _, p = residuals(R, t)
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        cheir = (jnp.linalg.norm(p, axis=-1) > 1e-3) if wide_fov \
            else (p[:, 2] > 1e-3)
        inlier = ((chi2 <= chi2_gate) & cheir).astype(R.dtype)
        return (R, t, inlier), None

    init = (R_cw, t_cw, jnp.ones_like(mask))
    # Huber active for rounds 0-1, off after (reference drops the kernel at
    # round 3 of 4; we drop at 2 since IRLS converges faster).
    use_huber = jnp.array([1.0, 1.0, 0.0, 0.0])
    (R, t, inlier), _ = jax.lax.scan(gn_round, init, use_huber)
    inlier_b = (inlier > 0) & (mask > 0)
    return R, t, inlier_b, jnp.sum(inlier_b)
