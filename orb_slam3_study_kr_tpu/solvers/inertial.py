"""Inertial optimizations: IMU initialization (gravity direction, scale,
biases, velocities) and pose-inertial frame tracking.

Replaces Optimizer::InertialOptimization (/root/reference/src/Optimizer.cc:
3050,3235,3397 — the 3-stage IMU init solves behind LocalMapping::
InitializeIMU) and PoseInertialOptimizationLastKeyFrame/LastFrame
(:4499/:4883).  States are small (tens of dofs), so Jacobians come from
autodiff and each solve is a damped GN lax.scan — no hand-derived 15-D
linearizations to maintain.

Conventions: body states (R_wb, p_wb, v_w); gravity g = R_wg @ [0,0,-9.81]
with R_wg a 2-dof rotation (VertexGDir); monocular scale s multiplies the
visual translations.
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.imu.preintegration import (
    GRAVITY, Preintegrated, bias_corrected_deltas)
from orb_slam3_study_kr_tpu.lie.so3 import exp_so3, log_so3
from orb_slam3_study_kr_tpu.solvers import robust


def _edge_residual(R1, p1, v1, R2, p2, v2, bias, pre: Preintegrated, g):
    db = bias - pre.bias
    dbg, dba = db[:3], db[3:]
    dR = pre.dR @ exp_so3(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    t = pre.dT
    e_R = log_so3(dR.T @ R1.T @ R2)
    e_v = R1.T @ (v2 - v1 - g * t) - dV
    e_p = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
    return jnp.concatenate([e_R, e_v, e_p])


def _edge_weights(pre_stack, eps=1e-8):
    """(K-1, 9, 9) whitening matrices W = chol(inv(cov9))^T per edge."""
    C = pre_stack.cov[:, :9, :9]
    C = C + eps * jnp.eye(9)[None]
    Cinv = jnp.linalg.inv(C)
    # Cholesky of the information matrix: r' = L^T r has unit covariance.
    L = jnp.linalg.cholesky(Cinv)
    return jnp.swapaxes(L, -1, -2)


def _linear_init(R_wb, p_vis, pre_stack, fix_scale):
    """Closed-form seed for (scale, gravity, velocities).

    Given keyframe rotations, the preintegration constraints
      v_{i+1} = v_i + g dt + R_i dV_i
      s p_{i+1} = s p_i + v_i dt + 0.5 g dt^2 + R_i dP_i
    are LINEAR in (s, g, v_0..v_{K-1}) — solve them by least squares
    (Martinelli-style visual-inertial alignment; replaces the reference's
    dirG accelerometer average seed, LocalMapping.cc:1208+, with the full
    linear solution so the GN refinement starts near the optimum)."""
    K = R_wb.shape[0]
    dt = pre_stack.dT
    dV = jnp.einsum("kij,kj->ki", R_wb[:-1], pre_stack.dV)
    dP = jnp.einsum("kij,kj->ki", R_wb[:-1], pre_stack.dP)
    dp_vis = p_vis[1:] - p_vis[:-1]

    n_unk = 4 + 3 * K  # [s, g(3), v_i(3K)]
    rows = []
    rhs = []
    for i in range(K - 1):
        # velocity row block
        A = jnp.zeros((3, n_unk))
        A = A.at[:, 1:4].set(-jnp.eye(3) * dt[i])
        A = A.at[:, 4 + 3 * i:7 + 3 * i].set(-jnp.eye(3))
        A = A.at[:, 4 + 3 * (i + 1):7 + 3 * (i + 1)].set(jnp.eye(3))
        rows.append(A)
        rhs.append(dV[i])
        # position row block
        B = jnp.zeros((3, n_unk))
        B = B.at[:, 0].set(dp_vis[i])
        B = B.at[:, 1:4].set(-0.5 * jnp.eye(3) * dt[i] * dt[i])
        B = B.at[:, 4 + 3 * i:7 + 3 * i].set(-jnp.eye(3) * dt[i])
        rows.append(B)
        rhs.append(dP[i])
    A = jnp.concatenate(rows)
    b = jnp.concatenate(rhs)
    if fix_scale:
        # Move the s-column to the rhs with s = 1.
        b = b - A[:, 0]
        A = A.at[:, 0].set(0.0)
    x = jnp.linalg.lstsq(A, b)[0]
    s = jnp.where(fix_scale, 1.0, x[0])
    g = x[1:4]
    v = x[4:].reshape(K, 3)
    return s, g, v


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def inertial_only_optimization(
    R_wb, p_vis, pre_stack: Preintegrated,
    prior_gyro=1e2, prior_acc=1e10, n_iters=40, fix_scale=False,
    damping=1e-4,
):
    """Estimate gravity direction, scale, biases and velocities from visual
    keyframe poses + preintegrated IMU (the core of IMU init).

    Args:
      R_wb: (K, 3, 3) body rotations from vision (rotation is scale-free).
      p_vis: (K, 3) visual body positions (to be scaled by exp(log_s)).
      pre_stack: Preintegrated with leading axis (K-1,), window i -> i+1.
      prior_gyro/prior_acc: bias prior information (the reference's
        priorG/priorA schedule: 1e2/1e10 then 1/1e5 then 0/0).
      fix_scale: True for stereo/RGB-D (scale observable already).

    Returns dict(R_wg, scale, bias (6,), v (K, 3), cost).
    """
    K = R_wb.shape[0]
    Wm = _edge_weights(pre_stack)
    g0 = GRAVITY

    # Closed-form linear alignment seeds scale, gravity and velocities —
    # without it the GN refinement must cross a 7x-scale / 70-deg-gravity
    # valley and falls into local minima on longer windows.
    s_lin, g_lin, v0 = _linear_init(R_wb, p_vis, pre_stack, fix_scale)
    ghat = g_lin / jnp.maximum(jnp.linalg.norm(g_lin), 1e-9)
    gI = jnp.asarray([0.0, 0.0, -1.0])
    axis = jnp.cross(gI, ghat)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(gI, ghat)
    angle = jnp.arctan2(sin_a, cos_a)
    theta0 = jnp.where(sin_a > 1e-6, axis / jnp.maximum(sin_a, 1e-9) * angle,
                       jnp.zeros(3))
    log_s0 = jnp.log(jnp.clip(s_lin, 1e-2, 1e2))

    def unpack(x):
        th_g = jnp.concatenate([x[:2], jnp.zeros(1, x.dtype)])
        R_wg = exp_so3(th_g)
        log_s = jnp.where(fix_scale, 0.0, x[2])
        s = jnp.exp(log_s)
        bias = x[3:9]
        v = x[9:].reshape(K, 3)
        return R_wg, s, bias, v

    def edge_block(x):
        R_wg, s, bias, v = unpack(x)
        g = R_wg @ g0
        p = p_vis * s

        def one(i):
            pre_i = jax.tree_util.tree_map(lambda a: a[i], pre_stack)
            r = _edge_residual(R_wb[i], p[i], v[i], R_wb[i + 1], p[i + 1],
                               v[i + 1], bias, pre_i, g)
            return Wm[i] @ r

        return jax.vmap(one)(jnp.arange(K - 1))  # (K-1, 9)

    def edge_weights_robust(x):
        """Self-normalizing IRLS weights: the IMU-whitened edges are
        dominated by *visual pose* noise whose floor is unknown a priori
        (it scales with the unknown map scale), so scale the Huber kernel
        by the current median edge norm instead of a fixed delta."""
        norms = jnp.linalg.norm(edge_block(x), axis=-1)
        med = jnp.median(norms)
        delta = 2.5 * med + 1e-6
        return jnp.sqrt(robust.huber_weight(norms ** 2, delta))

    def residuals(x, w_edge):
        r_edges = (edge_block(x) * w_edge[:, None]).reshape(-1)
        _, _, bias, _ = unpack(x)
        r_prior = jnp.concatenate([
            jnp.sqrt(prior_gyro) * bias[:3],
            jnp.sqrt(prior_acc) * bias[3:],
        ])
        return jnp.concatenate([r_edges, r_prior])

    # Start the bias at the preintegration reference (the current estimate)
    # so weak-prior refinement stages refine rather than re-discover it.
    bias_ref = pre_stack.bias[0]
    x0 = jnp.concatenate(
        [theta0[:2], log_s0[None], bias_ref, v0.reshape(-1)]
    ).astype(jnp.float32)

    def gn_step(carry, _):
        x, lam = carry
        w_edge = edge_weights_robust(x)
        r = residuals(x, w_edge)
        J = jax.jacfwd(lambda xx: residuals(xx, w_edge))(x)
        H = J.T @ J
        H = H + lam * (jnp.eye(H.shape[0], dtype=H.dtype) + H * jnp.eye(H.shape[0], dtype=H.dtype))
        gvec = J.T @ r
        dx = -jnp.linalg.solve(H, gvec)
        x_new = x + dx
        better = jnp.sum(residuals(x_new, w_edge) ** 2) < jnp.sum(r ** 2)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e4))
        return (x, lam), None

    (x, _), _ = jax.lax.scan(gn_step, (x0, jnp.float32(damping)), None,
                             length=n_iters)
    R_wg, s, bias, v = unpack(x)
    edge_norms = jnp.linalg.norm(edge_block(x), axis=-1)
    cost = jnp.sum(residuals(x, edge_weights_robust(x)) ** 2)
    return dict(R_wg=R_wg, scale=s, bias=bias, v=v, cost=cost,
                edge_norms=edge_norms)


@functools.partial(jax.jit,
                   static_argnames=("project_fn", "n_iters", "wide_fov"))
def pose_inertial_optimization(
    project_fn,
    R_wb0, p_wb0, v_w0, bias0,       # previous (anchor) body state — fixed
    pre: Preintegrated,              # window anchor -> current
    R_wb_init, p_wb_init, v_w_init,  # current-state initialization
    R_cb, t_cb,                      # camera <- body extrinsics
    X, uv_obs, level, obs_mask,      # visual obs of the current frame
    n_iters=10, damping=1e-3,
    wide_fov=False,                  # fisheye: |p| > 0 cheirality, not z > 0
):
    """Optimize the current frame's (R, p, v, bias) against its matched
    landmarks plus the preintegration edge from the anchor state
    (PoseInertialOptimizationLastKeyFrame semantics, visual part monocular).

    Returns (R_wb, p_wb, v_w, bias, inlier_mask)."""
    inv_sigma2 = robust.octave_inv_sigma2(level)
    Wm = _edge_weights(jax.tree_util.tree_map(lambda a: a[None], pre))[0]
    g = GRAVITY

    def unpack(x):
        dR = exp_so3(x[:3])
        R = R_wb_init @ dR
        p = p_wb_init + x[3:6]
        v = v_w_init + x[6:9]
        bias = bias0 + x[9:15]
        return R, p, v, bias

    def visual_residuals(R, p):
        # world -> camera: R_cw = R_cb @ R_bw, t = R_cb @ (-R_bw p) + t_cb
        R_bw = R.T
        R_cw = R_cb @ R_bw
        t_cw = -R_cw @ p + t_cb
        pc = X @ R_cw.T + t_cw
        r = project_fn(pc) - uv_obs
        return r, pc

    # Bias random-walk whitening from the preintegrated walk covariance
    # (EdgeGyroRW/EdgeAccRW information): over one frame the bias may move
    # only by the accumulated walk sigma.
    w_bg = 1.0 / jnp.sqrt(jnp.maximum(pre.cov[9, 9], 1e-12))
    w_ba = 1.0 / jnp.sqrt(jnp.maximum(pre.cov[12, 12], 1e-12))
    w_bias = jnp.concatenate([jnp.full(3, w_bg), jnp.full(3, w_ba)])

    def residuals(x, w_vis):
        R, p, v, bias = unpack(x)
        r_vis, _ = visual_residuals(R, p)
        r_inr = Wm @ _edge_residual(R_wb0, p_wb0, v_w0, R, p, v, bias, pre, g)
        r_bias = (bias - bias0) * w_bias
        return jnp.concatenate([
            (r_vis * w_vis[:, None]).reshape(-1), r_inr, r_bias
        ])

    def weights(x):
        R, p, v, bias = unpack(x)
        r_vis, pc = visual_residuals(R, p)
        chi2 = jnp.sum(r_vis * r_vis, -1) * inv_sigma2
        w = obs_mask * inv_sigma2 * robust.huber_weight(chi2, robust.HUBER_MONO)
        cheir = (jnp.linalg.norm(pc, axis=-1) > 1e-3) if wide_fov \
            else (pc[:, 2] > 1e-3)
        w = w * cheir
        return jnp.sqrt(jnp.maximum(w, 0.0)), chi2

    def gn_step(carry, _):
        x, lam = carry
        w_vis, _ = weights(x)
        r = residuals(x, w_vis)
        J = jax.jacfwd(lambda xx: residuals(xx, w_vis))(x)
        H = J.T @ J + lam * jnp.eye(15, dtype=x.dtype)
        gvec = J.T @ r
        dx = -jnp.linalg.solve(H, gvec)
        x_new = x + dx
        better = jnp.sum(residuals(x_new, w_vis) ** 2) < jnp.sum(r ** 2)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e4))
        return (x, lam), None

    x0 = jnp.zeros(15, jnp.float32)
    (x, _), _ = jax.lax.scan(gn_step, (x0, jnp.float32(damping)), None,
                             length=n_iters)
    R, p, v, bias = unpack(x)
    w_vis, chi2 = weights(x)
    inliers = (chi2 <= robust.CHI2_MONO) & (obs_mask > 0)
    # Gauss-Newton information of the current state at the optimum: the
    # 15-D marginal prior carried to the next frame's solve (the fixed
    # anchor makes the Schur reduction trivial — H_cc itself; reference
    # ConstraintPoseImu, G2oTypes.h:706, built at Optimizer.cc:4842-4852).
    J = jax.jacfwd(lambda xx: residuals(xx, w_vis))(x)
    info = J.T @ J
    return R, p, v, bias, inliers, info


@functools.partial(jax.jit, static_argnames=("n_iters",))
def estimate_gyro_bias(R1, R2, pre_stack, edge_mask=None, n_iters=10):
    """Robust gyro-bias-only estimation from visual rotations.

    Solves min_bg sum_e huber(|log((dR_e exp(JRg_e (bg - b_e)))^T
    R1_e^T R2_e)|) over consecutive keyframe rotation pairs — the separate
    first step of visual-inertial initialization (Mur-Artal & Tardos 2017,
    ORB-SLAM-VI; the reference folds it into InertialOptimization, which
    makes the bias estimate hostage to any single glitched keyframe
    rotation in the window).  The Huber weight re-derived from the running
    median each iteration rejects discrete mis-registration steps that a
    joint least-squares fit would average into the bias.

    R1, R2: (E, 3, 3) body rotations at the edge endpoints.
    Returns (bg (3,), edge_weights (E,)).
    """
    E = R1.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones(E, R1.dtype)

    def res(bg):
        def one(e):
            pre = jax.tree_util.tree_map(lambda a: a[e], pre_stack)
            dR = pre.dR @ exp_so3(pre.JRg @ (bg - pre.bias[:3]))
            return log_so3(dR.T @ R1[e].T @ R2[e])
        return jax.vmap(one)(jnp.arange(E))

    def step(bg, _):
        r = res(bg)                                   # (E, 3)
        nrm = jnp.linalg.norm(r, axis=1)
        big = jnp.where(edge_mask > 0, nrm, jnp.inf)
        med = jnp.nanmedian(jnp.where(jnp.isinf(big), jnp.nan, big))
        delta = 3.0 * jnp.maximum(med, 1e-5)
        w = edge_mask * jnp.minimum(1.0, delta / jnp.maximum(nrm, 1e-12))
        J = jax.jacfwd(res)(bg)                       # (E, 3, 3)
        H = jnp.einsum("eij,e,eik->jk", J, w, J)
        gvec = jnp.einsum("eij,e,ei->j", J, w, r)
        bg = bg - jnp.linalg.solve(H + 1e-9 * jnp.eye(3, dtype=bg.dtype),
                                   gvec)
        return bg, None

    bg0 = pre_stack.bias[0, :3]
    bg, _ = jax.lax.scan(step, bg0, None, length=n_iters)
    r = res(bg)
    nrm = jnp.linalg.norm(r, axis=1)
    big = jnp.where(edge_mask > 0, nrm, jnp.inf)
    med = jnp.nanmedian(jnp.where(jnp.isinf(big), jnp.nan, big))
    w = edge_mask * jnp.minimum(
        1.0, 3.0 * jnp.maximum(med, 1e-5) / jnp.maximum(nrm, 1e-12))
    return bg, w


@functools.partial(jax.jit,
                   static_argnames=("project_fn", "n_iters", "wide_fov"))
def pose_inertial_optimization_last_frame(
    project_fn,
    R_wb0, p_wb0, v_w0, bias0,       # previous-frame body state (free)
    prior_info,                      # (15, 15) marginal information on it
    pre: Preintegrated,              # window prev frame -> current
    R_wb_init, p_wb_init, v_w_init,  # current-state initialization
    R_cb, t_cb,                      # camera <- body extrinsics
    X, uv_obs, level, obs_mask,      # visual obs of the current frame
    n_iters=10, damping=1e-3,
    wide_fov=False,
):
    """PoseInertialOptimizationLastFrame (Optimizer.cc:4883): joint 30-dof
    solve over [previous frame, current frame].  The previous frame is NOT
    fixed — it carries the 15-D marginal prior (ConstraintPoseImu /
    EdgePriorPoseImu, G2oTypes.h:706,732) produced by its own solve, so
    drift-relevant uncertainty propagates frame to frame instead of being
    re-anchored at a pretended-perfect last pose.  After the solve the
    previous state is marginalized out by a Schur complement
    (Optimizer.cc:2967 Marginalize) and the reduced information on the
    current state is returned as the next frame's prior.

    Returns (R, p, v, bias, inliers, new_prior_info) for the current frame.
    """
    inv_sigma2 = robust.octave_inv_sigma2(level)
    Wm = _edge_weights(jax.tree_util.tree_map(lambda a: a[None], pre))[0]
    g = GRAVITY

    # Whiten the prior: W_prior = chol(info)^T so that
    # |W_prior dx_prev|^2 = dx_prev^T info dx_prev.
    prior_sqrt = jnp.linalg.cholesky(
        prior_info + 1e-8 * jnp.eye(15, dtype=prior_info.dtype)
    ).T

    def unpack(x):
        dRp = exp_so3(x[0:3])
        Rp = R_wb0 @ dRp
        pp = p_wb0 + x[3:6]
        vp = v_w0 + x[6:9]
        bp = bias0 + x[9:15]
        dRc = exp_so3(x[15:18])
        Rc = R_wb_init @ dRc
        pc_ = p_wb_init + x[18:21]
        vc = v_w_init + x[21:24]
        bc = bias0 + x[24:30]
        return (Rp, pp, vp, bp), (Rc, pc_, vc, bc)

    def visual_residuals(R, p):
        R_cw = R_cb @ R.T
        t_cw = -R_cw @ p + t_cb
        pcam = X @ R_cw.T + t_cw
        return project_fn(pcam) - uv_obs, pcam

    # Bias random-walk whitening between the two frames (EdgeGyroRW/AccRW).
    w_bg = 1.0 / jnp.sqrt(jnp.maximum(pre.cov[9, 9], 1e-12))
    w_ba = 1.0 / jnp.sqrt(jnp.maximum(pre.cov[12, 12], 1e-12))
    w_bias = jnp.concatenate([jnp.full(3, w_bg), jnp.full(3, w_ba)])

    def residuals(x, w_vis):
        (Rp, pp, vp, bp), (Rc, pc_, vc, bc) = unpack(x)
        r_vis, _ = visual_residuals(Rc, pc_)
        r_inr = Wm @ _edge_residual(Rp, pp, vp, Rc, pc_, vc, bp, pre, g)
        r_rw = (bc - bp) * w_bias
        r_prior = prior_sqrt @ x[0:15]
        return jnp.concatenate([
            (r_vis * w_vis[:, None]).reshape(-1), r_inr, r_rw, r_prior
        ])

    def weights(x):
        _, (Rc, pc_, _, _) = unpack(x)
        r_vis, pcam = visual_residuals(Rc, pc_)
        chi2 = jnp.sum(r_vis * r_vis, -1) * inv_sigma2
        w = obs_mask * inv_sigma2 * robust.huber_weight(chi2, robust.HUBER_MONO)
        cheir = (jnp.linalg.norm(pcam, axis=-1) > 1e-3) if wide_fov \
            else (pcam[:, 2] > 1e-3)
        w = w * cheir
        return jnp.sqrt(jnp.maximum(w, 0.0)), chi2

    def gn_step(carry, _):
        x, lam = carry
        w_vis, _ = weights(x)
        r = residuals(x, w_vis)
        J = jax.jacfwd(lambda xx: residuals(xx, w_vis))(x)
        H = J.T @ J + lam * jnp.eye(30, dtype=x.dtype)
        dx = -jnp.linalg.solve(H, J.T @ r)
        x_new = x + dx
        better = jnp.sum(residuals(x_new, w_vis) ** 2) < jnp.sum(r ** 2)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 5.0, 1e4))
        return (x, lam), None

    x0 = jnp.zeros(30, jnp.float32)
    (x, _), _ = jax.lax.scan(gn_step, (x0, jnp.float32(damping)), None,
                             length=n_iters)
    _, (R, p, v, bias) = unpack(x)
    w_vis, chi2 = weights(x)
    inliers = (chi2 <= robust.CHI2_MONO) & (obs_mask > 0)
    # Marginalize the previous state: new current-frame information is the
    # Schur complement H_cc - H_cp H_pp^{-1} H_pc of the GN Hessian at the
    # optimum (Optimizer.cc:2967 Marginalize + :5244-5260 prior update).
    J = jax.jacfwd(lambda xx: residuals(xx, w_vis))(x)
    H = J.T @ J
    H_pp = H[:15, :15] + 1e-6 * jnp.eye(15, dtype=H.dtype)
    H_pc = H[:15, 15:]
    H_cc = H[15:, 15:]
    new_info = H_cc - H_pc.T @ jnp.linalg.solve(H_pp, H_pc)
    return R, p, v, bias, inliers, new_info
