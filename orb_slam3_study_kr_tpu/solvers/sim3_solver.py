"""Sim3 estimation between matched 3-D point sets: batched Horn closed form
inside RANSAC plus reprojection-gated inliers.

Replaces src/Sim3Solver.cc: where the reference iterates RANSAC hypotheses
sequentially, all T minimal 3-point sets solve in one batched Horn
(quaternion-free SVD variant) and score against all matches at once.
"""

import functools

import jax
import jax.numpy as jnp


def horn_sim3(P, Q, w=None, fix_scale=False):
    """Closed-form similarity Q ~ s R P + t for point sets (..., N, 3).

    Horn 1987 via SVD of the weighted correlation; scale from the symmetric
    ratio (as evaluate_ate_scale and the reference's ComputeSim3)."""
    if w is None:
        w = jnp.ones(P.shape[:-1], P.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    muP = jnp.sum(P * w[..., None], axis=-2) / wsum
    muQ = jnp.sum(Q * w[..., None], axis=-2) / wsum
    Pc = (P - muP[..., None, :]) * w[..., None]
    Qc = (Q - muQ[..., None, :]) * w[..., None]
    W = jnp.einsum("...ni,...nj->...ij", Qc, Pc)
    U, S, Vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[..., None, :]) @ Vt
    if fix_scale:
        s = jnp.ones(P.shape[:-2], P.dtype)
    else:
        num = jnp.sum(S * D, axis=-1)
        den = jnp.sum(Pc * Pc, axis=(-1, -2)) / 1.0
        s = num / jnp.maximum(den, 1e-12)
    t = muQ - s[..., None] * jnp.einsum("...ij,...j->...i", R, muP)
    return R, t, s


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def ransac_sim3(
    key, P1, P2, mask, uv1, uv2, K,
    R1w=None, t1w=None, R2w=None, t2w=None,
    iters=128, chi2_th=9.21, fix_scale=False,
):
    """Sim3 S12 aligning landmark sets of two keyframes (P2 -> P1 frame).

    Args:
      P1, P2: (N, 3) matched landmark positions in each keyframe's CAMERA
        frame (the reference works in camera frames, Sim3Solver.cc).
      mask: (N,) valid matches.
      uv1, uv2: (N, 2) the keypoints observing them in each image.
      K: (3, 3) intrinsics (both cameras pinhole-ideal here).
      chi2_th: reprojection gate (9.21 = 2-dof 99%).

    Returns dict(R12, t12, s12, inliers, n_inliers, success).
    """
    n = P1.shape[0]
    u = jax.random.uniform(key, (iters, n))
    u = jnp.where(mask[None, :] > 0, u, 2.0)
    sets = jnp.argsort(u, axis=1)[:, :3]  # minimal sets of 3

    Ps = P2[sets]  # hypothesis maps P2 -> P1
    Qs = P1[sets]
    R_h, t_h, s_h = horn_sim3(Ps, Qs, fix_scale=fix_scale)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)

    # Score: project P2 through S12 into image 1 and P1 through S21 into 2.
    P2in1 = s_h[:, None, None] * jnp.einsum("tij,nj->tni", R_h, P2) + t_h[:, None, :]
    e1 = jnp.sum((project(P2in1) - uv1[None]) ** 2, -1)
    R_inv = jnp.swapaxes(R_h, -1, -2)
    s_inv = 1.0 / s_h
    t_inv = -s_inv[:, None] * jnp.einsum("tij,tj->ti", R_inv, t_h)
    P1in2 = s_inv[:, None, None] * jnp.einsum("tij,nj->tni", R_inv, P1) + t_inv[:, None, :]
    e2 = jnp.sum((project(P1in2) - uv2[None]) ** 2, -1)
    inl = (e1 < chi2_th) & (e2 < chi2_th) & (mask[None] > 0)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # Refit on the best hypothesis' inliers.
    w = inl[best].astype(P1.dtype)
    R_f, t_f, s_f = horn_sim3(P2, P1, w=w, fix_scale=fix_scale)
    P2in1 = s_f * P2 @ R_f.T + t_f
    e1 = jnp.sum((project(P2in1) - uv1) ** 2, -1)
    R_b = R_f.T
    s_b = 1.0 / s_f
    t_b = -s_b * R_b @ t_f
    P1in2 = s_b * P1 @ R_b.T + t_b
    e2 = jnp.sum((project(P1in2) - uv2) ** 2, -1)
    inl_f = (e1 < chi2_th) & (e2 < chi2_th) & (mask > 0)
    n_inl = jnp.sum(inl_f)
    return dict(
        R12=R_f, t12=t_f, s12=s_f,
        inliers=inl_f, n_inliers=n_inl,
        success=n_inl >= 20,  # reference Sim3 inlier threshold
    )
