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


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale",
                                             "project_fn"))
def ransac_sim3(
    key, P1, P2, mask, uv1, uv2, K,
    R1w=None, t1w=None, R2w=None, t2w=None,
    iters=128, chi2_th=9.21, fix_scale=False, project_fn=None,
):
    """Sim3 S12 aligning landmark sets of two keyframes (P2 -> P1 frame).

    Args:
      P1, P2: (N, 3) matched landmark positions in each keyframe's CAMERA
        frame (the reference works in camera frames, Sim3Solver.cc).
      mask: (N,) valid matches.
      uv1, uv2: (N, 2) the keypoints observing them in each image.
      K: (3, 3) intrinsics; ignored when `project_fn` is given.
      project_fn: optional camera projection (3-D camera points -> pixels)
        for non-pinhole models (KB8 fisheye); defaults to ideal pinhole
        from K (reference Sim3Solver uses pCamera->project likewise).
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

    if project_fn is None:
        def project(p):
            z = jnp.maximum(p[..., 2], 1e-6)
            return jnp.stack(
                [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)
    else:
        project = project_fn

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


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale",
                                             "project_fn"))
def optimize_sim3(P1, P2, mask, uv1, uv2, K, R12, t12, s12,
                  n_iters=10, chi2_th=10.0, fix_scale=False,
                  damping=1e-4, project_fn=None):
    """GN refinement of a Sim3 on two-sided reprojection residuals —
    Optimizer::OptimizeSim3 (/root/reference/src/Optimizer.cc:2118):
    EdgeSim3ProjectXYZ projects P2 through S12 into image 1 and
    EdgeInverseSim3ProjectXYZ projects P1 through S12^-1 into image 2, with
    Huber(sqrt(th2=10)) and outliers gated at chi2 > 10.

    P1/P2 in each keyframe's camera frame; uv in each image; the solve is
    over [omega(3), upsilon(3), log_s(1)] right-increments.  Mirrors the
    reference's two-round schedule: optimize, hard-remove pairs with either
    edge chi2 > th2 (Optimizer.cc:2260-2290), optimize again on survivors.

    Returns dict(R12, t12, s12, inliers, n_inliers)."""
    from orb_slam3_study_kr_tpu.lie.so3 import exp_so3
    from orb_slam3_study_kr_tpu.solvers import robust

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    if project_fn is None:
        def project(p):
            z = jnp.maximum(p[..., 2], 1e-6)
            return jnp.stack([fx * p[..., 0] / z + cx,
                              fy * p[..., 1] / z + cy], -1)
    else:
        project = project_fn

    def unpack(x):
        R = R12 @ exp_so3(x[0:3])
        t = t12 + x[3:6]
        ls = jnp.where(fix_scale, 0.0, x[6])
        s = s12 * jnp.exp(ls)
        return R, t, s

    def residuals(x):
        R, t, s = unpack(x)
        p1 = s * P2 @ R.T + t
        e1 = project(p1) - uv1
        Rb = R.T
        sb = 1.0 / s
        tb = -sb * Rb @ t
        p2 = sb * P1 @ Rb.T + tb
        e2 = project(p2) - uv2
        return e1, e2

    def chi2(x):
        e1, e2 = residuals(x)
        return jnp.sum(e1 * e1, -1), jnp.sum(e2 * e2, -1)

    def weights(x, gate):
        c1, c2 = chi2(x)
        d = jnp.sqrt(jnp.asarray(chi2_th, P1.dtype))
        w1 = mask * gate * robust.huber_weight(c1, d)
        w2 = mask * gate * robust.huber_weight(c2, d)
        return w1, w2

    def flat(x, w1, w2):
        e1, e2 = residuals(x)
        return jnp.concatenate([
            (e1 * jnp.sqrt(w1)[:, None]).reshape(-1),
            (e2 * jnp.sqrt(w2)[:, None]).reshape(-1),
        ])

    def gn_step(carry, _):
        x, lam, gate = carry
        w1, w2 = weights(x, gate)
        r = flat(x, w1, w2)
        J = jax.jacfwd(lambda xx: flat(xx, w1, w2))(x)
        H = J.T @ J + lam * jnp.eye(7, dtype=x.dtype)
        dx = -jnp.linalg.solve(H, J.T @ r)
        x_new = x + dx
        better = jnp.sum(flat(x_new, w1, w2) ** 2) < jnp.sum(r ** 2)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 5.0, 1e3))
        return (x, lam, gate), None

    x0 = jnp.zeros(7, P1.dtype)
    lam0 = jnp.asarray(damping, P1.dtype)
    gate = jnp.ones_like(mask)
    (x, lam, _), _ = jax.lax.scan(gn_step, (x0, lam0, gate),
                                  None, length=n_iters)
    # Hard outlier removal between rounds (a pair is dropped if either of
    # its edges exceeds th2), then re-optimize on the survivors.
    c1, c2 = chi2(x)
    gate = ((c1 < chi2_th) & (c2 < chi2_th)).astype(mask.dtype)
    (x, _, _), _ = jax.lax.scan(gn_step, (x, lam0, gate),
                                None, length=n_iters)
    R, t, s = unpack(x)
    c1, c2 = chi2(x)
    inl = (c1 < chi2_th) & (c2 < chi2_th) & (mask > 0)
    return dict(R12=R, t12=t, s12=s, inliers=inl,
                n_inliers=jnp.sum(inl))
