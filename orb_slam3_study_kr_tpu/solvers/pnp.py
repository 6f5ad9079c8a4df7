"""RANSAC PnP for relocalization (replaces src/MLPnPsolver.cpp).

The reference uses a maximum-likelihood bearing-vector PnP; here each
minimal sample solves the 6-point DLT for the projection matrix (batched
SVD over all hypotheses at once), poses are extracted by orthogonalizing
the left 3x3, inliers gate on reprojection chi2, and the best hypothesis is
polished with the standard pose-only GN solver — which plays the role of
MLPnP's internal Gauss-Newton refinement.
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.so3 import normalize_rotation
from orb_slam3_study_kr_tpu.solvers.pose_opt import optimize_pose

CHI2_2D = 5.991


def _dlt_pose(X, b):
    """P (3,4) from >= 6 points: X (..., m, 3) world, b (..., m, 3)
    bearing vectors (for pinhole, (xn, yn, 1)).  Rows are the bearing
    cross-product constraints, valid past 90 degrees off-axis."""
    m = X.shape[-2]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (..., m, 4)
    z = jnp.zeros_like(Xh)
    bx = b[..., 0:1]
    by = b[..., 1:2]
    bz = b[..., 2:3]
    rows_u = jnp.concatenate([bz * Xh, z, -bx * Xh], axis=-1)  # (..., m, 12)
    rows_v = jnp.concatenate([z, bz * Xh, -by * Xh], axis=-1)
    rows_w = jnp.concatenate([-by * Xh, bx * Xh, z], axis=-1)
    A = jnp.concatenate([rows_u, rows_v, rows_w], axis=-2)  # (..., 3m, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[..., 11, :].reshape(*A.shape[:-2], 3, 4)
    # Fix sign/scale so that det(R) > 0 and points are in front.
    M = P[..., :3]
    scale = jnp.linalg.det(M)
    sgn = jnp.where(scale < 0, -1.0, 1.0)
    norm = jnp.abs(scale) ** (1.0 / 3.0)
    P = P * (sgn / jnp.maximum(norm, 1e-12))[..., None, None]
    R = normalize_rotation(P[..., :3])
    t = P[..., 3]
    return R, t


@functools.partial(jax.jit, static_argnames=("project_fn", "project_jac_fn",
                                             "iters"))
def ransac_pnp(
    key, project_fn, project_jac_fn, K,
    X, uv, level, mask,
    bearings=None,
    iters=256, min_inliers=15,
):
    """Pose from 2D-3D matches with no prior (Relocalization's solver).

    X (N, 3) world points, uv (N, 2) pixels in project_fn's convention.
    `bearings` (N, 3): optional unprojected rays for the minimal DLT and
    cheirality — REQUIRED for non-pinhole models (KB8 fisheye, where the
    reference's MLPnP likewise works on unprojected bearings,
    MLPnPsolver.cpp); defaults to pinhole normalization by K.  Hypothesis
    scoring projects through `project_fn`.  Returns
    dict(R, t, inliers, n_inliers, success)."""
    n = X.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # Caller-supplied bearings mean a non-pinhole (fisheye) model: the GN
    # polish must then use the wide-FOV cheirality (|p| > 0, not z > 0) or
    # every legitimate >90-deg-off-axis observation is zero-weighted.
    wide_fov = bearings is not None
    if bearings is None:
        xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
        bearings = jnp.concatenate([xn, jnp.ones_like(xn[:, :1])], -1)
    b = bearings / jnp.maximum(
        jnp.linalg.norm(bearings, axis=-1, keepdims=True), 1e-12)

    u = jax.random.uniform(key, (iters, n))
    u = jnp.where(mask[None, :] > 0, u, 2.0)
    sets = jnp.argsort(u, axis=1)[:, :6]

    R_h, t_h = _dlt_pose(X[sets], b[sets])  # (T, 3, 3), (T, 3)

    p = jnp.einsum("tij,nj->tni", R_h, X) + t_h[:, None, :]
    uvp = project_fn(p)
    err = jnp.sum((uvp - uv[None]) ** 2, -1)
    sigma2 = 1.2 ** (2.0 * level.astype(jnp.float32))
    # Cheirality along the observed bearing (z > 0 for pinhole; stays
    # valid past 90 deg off-axis for fisheye).
    cheir = jnp.einsum("tni,ni->tn", p, b) > 0
    inl = (err < CHI2_2D * sigma2[None]) & cheir & (mask[None] > 0)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # GN polish on the best hypothesis over all its inliers.
    R0, t0 = R_h[best], t_h[best]
    w = inl[best].astype(X.dtype) * mask
    R_f, t_f, inliers, n_inl = optimize_pose(
        project_fn, project_jac_fn, R0, t0, X, uv, level, w,
        wide_fov=wide_fov)
    return dict(R=R_f, t=t_f, inliers=inliers, n_inliers=n_inl,
                success=n_inl >= min_inliers)
