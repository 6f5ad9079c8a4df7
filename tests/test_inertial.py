"""Inertial solver tests: gravity/scale/bias recovery, pose-inertial
tracking — synthetic oracles with known states."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu import lie
from orb_slam3_study_kr_tpu.cameras import pinhole
from orb_slam3_study_kr_tpu.imu import GRAVITY, ImuCalib, preintegrate
from orb_slam3_study_kr_tpu.solvers.inertial import (
    inertial_only_optimization, pose_inertial_optimization)

CALIB = ImuCalib.make()


def _simulate_trajectory(rng, n_kf=10, hz=200, kf_dt=0.25, bias=None,
                         g_tilt=(0.05, -0.08)):
    """Body flies a smooth 3-D path; gravity tilted from world-z by g_tilt.
    Returns keyframe states + per-interval preintegration windows (stacked),
    measured with the given bias."""
    bias = np.zeros(6, np.float32) if bias is None else np.asarray(bias, np.float32)
    R_wg = np.asarray(lie.exp_so3(jnp.asarray([g_tilt[0], g_tilt[1], 0.0], jnp.float32)))
    g = R_wg @ np.asarray(GRAVITY)
    dt = 1.0 / hz
    steps_per_kf = int(round(kf_dt / dt))
    n = n_kf * steps_per_kf

    ts = np.arange(n) * dt
    w_b = np.stack([0.4 * np.sin(1.5 * ts), 0.3 * np.cos(2 * ts),
                    0.2 * np.sin(0.7 * ts)], -1)
    a_w = np.stack([0.8 * np.sin(2 * ts), 0.6 * np.cos(1.3 * ts),
                    0.5 * np.sin(1.7 * ts)], -1)
    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.3, -0.2, 0.1])
    states = [(R.copy(), p.copy(), v.copy())]
    acc_all, gyro_all = [], []
    for i in range(n):
        a_m = R.T @ (a_w[i] - g) + bias[3:]
        w_m = w_b[i] + bias[:3]
        acc_all.append(a_m)
        gyro_all.append(w_m)
        p = p + v * dt + 0.5 * a_w[i] * dt * dt
        v = v + a_w[i] * dt
        R = R @ np.asarray(lie.exp_so3(jnp.asarray(w_b[i] * dt, jnp.float32)))
        if (i + 1) % steps_per_kf == 0:
            states.append((R.copy(), p.copy(), v.copy()))
    acc_all = np.asarray(acc_all, np.float32)
    gyro_all = np.asarray(gyro_all, np.float32)

    pres = []
    for k in range(n_kf):
        s = slice(k * steps_per_kf, (k + 1) * steps_per_kf)
        pres.append(preintegrate(
            jnp.asarray(acc_all[s]), jnp.asarray(gyro_all[s]),
            jnp.full(steps_per_kf, dt, jnp.float32),
            jnp.ones(steps_per_kf, jnp.float32),
            jnp.zeros(6, jnp.float32), CALIB))
    pre_stack = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pres)
    R_kf = np.stack([s[0] for s in states])
    p_kf = np.stack([s[1] for s in states])
    v_kf = np.stack([s[2] for s in states])
    return R_kf, p_kf, v_kf, pre_stack, R_wg, bias


def test_inertial_init_recovers_gravity_scale_bias(rng):
    bias = np.asarray([0.004, -0.006, 0.003, 0.06, -0.04, 0.05], np.float32)
    R_kf, p_kf, v_kf, pre_stack, R_wg_gt, _ = _simulate_trajectory(rng, bias=bias)
    true_scale = 2.7
    p_vis = (p_kf / true_scale).astype(np.float32)  # vision sees shrunk world
    out = inertial_only_optimization(
        jnp.asarray(R_kf, jnp.float32), jnp.asarray(p_vis), pre_stack,
        prior_gyro=1e2, prior_acc=1e5,
    )
    s = float(out["scale"])
    assert abs(s - true_scale) / true_scale < 0.02, s
    R_wg = np.asarray(out["R_wg"])
    # Gravity direction error in degrees.
    g_est = R_wg @ np.asarray(GRAVITY)
    g_true = R_wg_gt @ np.asarray(GRAVITY)
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    b = np.asarray(out["bias"])
    np.testing.assert_allclose(b[:3], bias[:3], atol=2e-3)
    # Accelerometer bias is weakly observable at init (degenerate with
    # gravity/scale over short windows; the reference refines it in VI-BA) —
    # only bound it loosely here.
    np.testing.assert_allclose(b[3:], bias[3:], atol=0.12)
    v_est = np.asarray(out["v"])
    assert np.linalg.norm(v_est - v_kf, axis=1).max() < 0.05


def test_estimate_gyro_bias_rejects_glitch(rng):
    """Robust rotation-only gyro-bias solve: a single keyframe with a
    2-degree mis-registered rotation (a tracking glitch) must be rejected
    by the Huber reweighting; the recovered bias stays within 1e-3 of
    truth, where a plain least-squares average would be pulled off by the
    glitch edge."""
    from orb_slam3_study_kr_tpu.solvers.inertial import estimate_gyro_bias

    bias = np.array([0.004, -0.002, 0.003, 0.0, 0.0, 0.0], np.float32)
    R_kf, p_kf, v_kf, pre_stack, _, _ = _simulate_trajectory(
        rng, n_kf=12, bias=bias)
    R_kf = np.array(R_kf)
    # Glitch: rotate keyframe 5 by 2 degrees about y.
    glitch = np.asarray(lie.exp_so3(
        jnp.asarray([0.0, np.radians(2.0), 0.0], jnp.float32)))
    R_kf[5] = R_kf[5] @ glitch
    R1 = jnp.asarray(R_kf[:-1], jnp.float32)
    R2 = jnp.asarray(R_kf[1:], jnp.float32)
    bg, w = estimate_gyro_bias(R1, R2, pre_stack)
    bg = np.asarray(bg)
    w = np.asarray(w)
    np.testing.assert_allclose(bg, bias[:3], atol=1e-3)
    # The two edges touching the glitched keyframe are downweighted.
    assert w[4] < 0.5 and w[5] < 0.5
    assert (w[np.r_[0:4, 6:11]] > 0.9).all()


def test_inertial_init_fixed_scale(rng):
    R_kf, p_kf, v_kf, pre_stack, R_wg_gt, _ = _simulate_trajectory(rng)
    out = inertial_only_optimization(
        jnp.asarray(R_kf, jnp.float32), jnp.asarray(p_kf, jnp.float32),
        pre_stack, fix_scale=True,
    )
    assert abs(float(out["scale"]) - 1.0) < 1e-6
    g_est = np.asarray(out["R_wg"]) @ np.asarray(GRAVITY)
    g_true = R_wg_gt @ np.asarray(GRAVITY)
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5


def test_pose_inertial_optimization(rng):
    R_kf, p_kf, v_kf, pre_stack, R_wg_gt, _ = _simulate_trajectory(
        rng, n_kf=2, g_tilt=(0.0, 0.0))
    pre = jax.tree_util.tree_map(lambda a: a[0], pre_stack)
    # Landmarks observed by the current (second) body state via an identity
    # camera-body extrinsic.
    cam = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)
    project = functools.partial(pinhole.project, cam)
    N = 200
    R1, p1, v1 = R_kf[1], p_kf[1], v_kf[1]
    pc = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                   rng.uniform(4, 10, N)], -1).astype(np.float32)
    X = pc @ R1.T + p1  # world points in front of current camera (R_cb = I)
    uv = np.asarray(project(jnp.asarray(pc)))
    uv = uv + rng.normal(0, 0.4, uv.shape).astype(np.float32)

    # Perturb the initialization.
    dR = np.asarray(lie.exp_so3(jnp.asarray([0.01, -0.02, 0.01], jnp.float32)))
    R_init = R1 @ dR
    p_init = p1 + np.asarray([0.05, -0.04, 0.06], np.float32)
    v_init = v1 + np.asarray([0.2, -0.1, 0.1], np.float32)

    R_f, p_f, v_f, bias_f, inl, info = pose_inertial_optimization(
        project,
        jnp.asarray(R_kf[0], jnp.float32), jnp.asarray(p_kf[0], jnp.float32),
        jnp.asarray(v_kf[0], jnp.float32), jnp.zeros(6, jnp.float32),
        pre,
        jnp.asarray(R_init, jnp.float32), jnp.asarray(p_init, jnp.float32),
        jnp.asarray(v_init, jnp.float32),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(X), jnp.asarray(uv), jnp.zeros(N, jnp.int32),
        jnp.ones(N, jnp.float32),
        n_iters=15,
    )
    c = (np.trace(np.asarray(R_f) @ R1.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 0.1
    assert np.linalg.norm(np.asarray(p_f) - p1) < 0.01
    assert np.linalg.norm(np.asarray(v_f) - v1) < 0.1
    assert int(inl.sum()) > 180
    # The marginal information must be symmetric PSD and visibly
    # constrain the pose block (hundreds of visual observations).
    info = np.asarray(info, np.float64)
    assert np.allclose(info, info.T, atol=1e-2)
    assert np.linalg.eigvalsh(info)[0] > -1e-3
    assert np.trace(info[:6, :6]) > 1.0


def test_pose_inertial_last_frame_prior(rng):
    """PoseInertialOptimizationLastFrame: with a strong prior on the
    previous frame the joint solve must land on the same optimum as the
    fixed-anchor variant; with a weak prior the previous state is free to
    absorb inconsistency (solution still converges)."""
    from orb_slam3_study_kr_tpu.solvers.inertial import (
        pose_inertial_optimization_last_frame)

    R_kf, p_kf, v_kf, pre_stack, _, _ = _simulate_trajectory(
        rng, n_kf=2, g_tilt=(0.0, 0.0))
    pre = jax.tree_util.tree_map(lambda a: a[0], pre_stack)
    cam = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                      jnp.float32)
    project = functools.partial(pinhole.project, cam)
    N = 200
    R1, p1, v1 = R_kf[1], p_kf[1], v_kf[1]
    pc = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                   rng.uniform(4, 10, N)], -1).astype(np.float32)
    X = pc @ R1.T + p1
    uv = np.asarray(project(jnp.asarray(pc)))
    uv = uv + rng.normal(0, 0.4, uv.shape).astype(np.float32)

    dR = np.asarray(lie.exp_so3(jnp.asarray([0.01, -0.02, 0.01],
                                            jnp.float32)))
    R_init = R1 @ dR
    p_init = p1 + np.asarray([0.05, -0.04, 0.06], np.float32)
    v_init = v1 + np.asarray([0.2, -0.1, 0.1], np.float32)

    strong = jnp.eye(15, dtype=jnp.float32) * 1e8
    R_f, p_f, v_f, b_f, inl, info = pose_inertial_optimization_last_frame(
        project,
        jnp.asarray(R_kf[0], jnp.float32), jnp.asarray(p_kf[0], jnp.float32),
        jnp.asarray(v_kf[0], jnp.float32), jnp.zeros(6, jnp.float32),
        strong, pre,
        jnp.asarray(R_init, jnp.float32), jnp.asarray(p_init, jnp.float32),
        jnp.asarray(v_init, jnp.float32),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(X), jnp.asarray(uv), jnp.zeros(N, jnp.int32),
        jnp.ones(N, jnp.float32),
        n_iters=15,
    )
    c = (np.trace(np.asarray(R_f) @ R1.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 0.1
    assert np.linalg.norm(np.asarray(p_f) - p1) < 0.02
    assert np.linalg.norm(np.asarray(v_f) - v1) < 0.1
    assert int(inl.sum()) > 180
    info = np.asarray(info, np.float64)
    assert np.allclose(info, info.T, atol=1e-2)
    assert np.isfinite(info).all()
