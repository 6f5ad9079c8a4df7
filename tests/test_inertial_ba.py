"""Unit tests for the visual-inertial bundle adjustment solver
(solvers/inertial_ba.py) on a synthetic oracle with known biases —
the test the reference never had for Optimizer::FullInertialBA /
LocalInertialBA (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.imu.preintegration import ImuCalib
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline.inertial_tracking import (
    KF_BUCKETS, _preintegrate_rows)
from orb_slam3_study_kr_tpu.solvers.inertial_ba import inertial_bundle_adjust
from orb_slam3_study_kr_tpu.cameras import pinhole

CAM = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)


def _project(p):
    return pinhole.project(CAM, p)


def _project_jac(p):
    return pinhole.project_jac(CAM, p)


def _problem(rng, n_frames=41, kf_every=4, n_lm=64, px_noise=0.3,
             bias_est=None):
    """Build a VI BA problem from the analytic trajectory (gravity-aligned
    world, body == camera)."""
    traj = synthetic.inertial_trajectory(
        n_frames, fps=10.0, imu_freq=200.0, gravity_w=(0.0, 0.0, -9.81),
        rng=rng)
    calib = ImuCalib.make(freq=200.0)
    kf_idx = np.arange(0, n_frames, kf_every)
    K = kf_idx.size
    R_wb = np.stack([traj["R_cw"][i].T for i in kf_idx]).astype(np.float32)
    p_wb = np.stack([-traj["R_cw"][i].T @ traj["t_cw"][i]
                     for i in kf_idx]).astype(np.float32)
    v_w = traj["vel_w"][kf_idx].astype(np.float32)

    # Landmarks in front of the (roughly +z looking) camera.
    X = np.stack([
        rng.uniform(-3, 3, n_lm), rng.uniform(-2, 2, n_lm),
        rng.uniform(4, 8, n_lm)
    ], axis=1).astype(np.float32)

    obs_pose, obs_lm, obs_uv = [], [], []
    for k, i in enumerate(kf_idx):
        pc = X @ traj["R_cw"][i].T + traj["t_cw"][i]
        uv = np.asarray(_project(jnp.asarray(pc, jnp.float32)))
        uv = uv + rng.normal(0, px_noise, uv.shape)
        obs_pose.append(np.full(n_lm, k, np.int32))
        obs_lm.append(np.arange(n_lm, dtype=np.int32))
        obs_uv.append(uv.astype(np.float32))
    obs_pose = np.concatenate(obs_pose)
    obs_lm = np.concatenate(obs_lm)
    obs_uv = np.concatenate(obs_uv)

    b_est = np.zeros(6, np.float32) if bias_est is None else bias_est
    pres = []
    for a, b in zip(kf_idx[:-1], kf_idx[1:]):
        rows = np.concatenate([traj["imu"][j] for j in range(a + 1, b + 1)])
        pres.append(_preintegrate_rows(rows, b_est, calib, KF_BUCKETS))
    pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    edge_i = np.arange(K - 1, dtype=np.int32)
    edge_j = edge_i + 1
    return dict(traj=traj, K=K, R_wb=R_wb, p_wb=p_wb, v_w=v_w, X=X,
                obs_pose=obs_pose, obs_lm=obs_lm, obs_uv=obs_uv,
                pre_stack=pre_stack, edge_i=edge_i, edge_j=edge_j,
                bias_true=traj["bias"].astype(np.float32))


def _perturb(rng, prob, rot=0.01, pos=0.03, vel=0.08, lm=0.03,
             keep_first=1):
    from orb_slam3_study_kr_tpu.lie.so3 import exp_so3
    K = prob["K"]
    R = prob["R_wb"].copy()
    p = prob["p_wb"].copy()
    v = prob["v_w"].copy()
    X = prob["X"].copy()
    for k in range(keep_first, K):
        R[k] = R[k] @ np.asarray(exp_so3(jnp.asarray(
            rng.normal(0, rot, 3), jnp.float32)))
        p[k] += rng.normal(0, pos, 3)
        v[k] += rng.normal(0, vel, 3)
    X += rng.normal(0, lm, X.shape).astype(np.float32)
    return R.astype(np.float32), p, v, X.astype(np.float32)


def test_full_inertial_ba_shared_bias_recovers_bias_and_poses():
    """FullInertialBA bInit mode (Optimizer.cc:393, bInit=true): shared
    bias vertex + priors; starting from zero bias and perturbed states the
    solve must recover the true gyro/acc bias and the trajectory."""
    rng = np.random.default_rng(3)
    prob = _problem(rng)
    K = prob["K"]
    R0, p0, v0, X0 = _perturb(rng, prob)
    fixed = np.zeros(K, np.float32)
    fixed[0] = 1.0

    out = inertial_bundle_adjust(
        _project, _project_jac,
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
        jnp.zeros((K, 6), jnp.float32),
        jnp.asarray(fixed),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(X0), jnp.ones(X0.shape[0], jnp.float32),
        jnp.asarray(prob["obs_pose"]), jnp.asarray(prob["obs_lm"]),
        jnp.asarray(prob["obs_uv"]),
        jnp.zeros(prob["obs_pose"].shape[0], jnp.int32),
        jnp.ones(prob["obs_pose"].shape[0], jnp.float32),
        jnp.asarray(prob["edge_i"]), jnp.asarray(prob["edge_j"]),
        prob["pre_stack"], jnp.ones(K - 1, jnp.float32),
        n_iters=15, shared_bias=True, bias_src=K - 1,
        prior_gyro=1e2, prior_acc=1e10,
    )
    R_f, p_f, v_f, b_f, X_f, chi2, cost = out
    b1 = np.asarray(b_f)[K - 1]
    # Stage 1 pins the acc bias (priorA=1e10); the unmodelled acc bias
    # leaks ~1e-3 into the gyro estimate — same as the reference, which
    # refines with VIBA2 priors afterwards (LocalMapping.cc:187-249).
    np.testing.assert_allclose(b1[:3], prob["bias_true"][:3], atol=4e-3)

    out2 = inertial_bundle_adjust(
        _project, _project_jac,
        R_f, p_f, v_f, jnp.tile(jnp.asarray(b1), (K, 1)),
        jnp.asarray(fixed),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        X_f, jnp.ones(X0.shape[0], jnp.float32),
        jnp.asarray(prob["obs_pose"]), jnp.asarray(prob["obs_lm"]),
        jnp.asarray(prob["obs_uv"]),
        jnp.zeros(prob["obs_pose"].shape[0], jnp.int32),
        jnp.ones(prob["obs_pose"].shape[0], jnp.float32),
        jnp.asarray(prob["edge_i"]), jnp.asarray(prob["edge_j"]),
        prob["pre_stack"], jnp.ones(K - 1, jnp.float32),
        n_iters=15, shared_bias=True, bias_src=K - 1,
        prior_gyro=0.0, prior_acc=0.0,
    )
    R_f, p_f, v_f, b_f, X_f, chi2, cost = out2
    b2 = np.asarray(b_f)[K - 1]
    np.testing.assert_allclose(b2[:3], prob["bias_true"][:3], atol=1e-3)
    np.testing.assert_allclose(b2[3:], prob["bias_true"][3:], atol=8e-3)
    err_p = np.linalg.norm(np.asarray(p_f) - prob["p_wb"], axis=1)
    assert err_p.max() < 0.01, err_p
    err_v = np.linalg.norm(np.asarray(v_f) - prob["v_w"], axis=1)
    assert err_v.max() < 0.05, err_v


def test_full_inertial_ba_per_kf_bias_refines():
    """Non-init mode (per-KF bias + random-walk edges): with the anchor
    bias near truth, poses/velocities converge and biases stay consistent
    across the chain."""
    rng = np.random.default_rng(4)
    b_anchor = np.array([0.004, -0.002, 0.003, 0.03, -0.05, 0.02],
                        np.float32)  # true bias
    prob = _problem(rng, bias_est=b_anchor)
    K = prob["K"]
    R0, p0, v0, X0 = _perturb(rng, prob)
    fixed = np.zeros(K, np.float32)
    fixed[0] = 1.0
    bias0 = np.tile(b_anchor, (K, 1)) + rng.normal(
        0, 2e-4, (K, 6)).astype(np.float32)
    bias0[0] = b_anchor

    out = inertial_bundle_adjust(
        _project, _project_jac,
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
        jnp.asarray(bias0),
        jnp.asarray(fixed),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(X0), jnp.ones(X0.shape[0], jnp.float32),
        jnp.asarray(prob["obs_pose"]), jnp.asarray(prob["obs_lm"]),
        jnp.asarray(prob["obs_uv"]),
        jnp.zeros(prob["obs_pose"].shape[0], jnp.int32),
        jnp.ones(prob["obs_pose"].shape[0], jnp.float32),
        jnp.asarray(prob["edge_i"]), jnp.asarray(prob["edge_j"]),
        prob["pre_stack"], jnp.ones(K - 1, jnp.float32),
        n_iters=12, shared_bias=False,
    )
    R_f, p_f, v_f, b_f, X_f, chi2, cost = out
    err_p = np.linalg.norm(np.asarray(p_f) - prob["p_wb"], axis=1)
    assert err_p.max() < 0.01, err_p
    err_v = np.linalg.norm(np.asarray(v_f) - prob["v_w"], axis=1)
    assert err_v.max() < 0.05, err_v
    b_f = np.asarray(b_f)
    np.testing.assert_allclose(
        b_f[1:, :3], np.tile(prob["bias_true"][:3], (K - 1, 1)), atol=2e-3)


def test_local_inertial_ba_window_fixed_anchor():
    """LocalInertialBA shape (Optimizer.cc:2387): only the last W states
    free, anchor state before the window fixed, landmarks shared.  The
    window states must converge; fixed states must not move."""
    rng = np.random.default_rng(5)
    b_true = np.array([0.004, -0.002, 0.003, 0.03, -0.05, 0.02], np.float32)
    prob = _problem(rng, bias_est=b_true)
    K = prob["K"]
    W = 5
    fixed = np.ones(K, np.float32)
    fixed[-W:] = 0.0
    R0, p0, v0, X0 = _perturb(rng, prob, keep_first=K - W, lm=0.01)
    bias0 = np.tile(b_true, (K, 1))

    out = inertial_bundle_adjust(
        _project, _project_jac,
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
        jnp.asarray(bias0),
        jnp.asarray(fixed),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.asarray(X0), jnp.ones(X0.shape[0], jnp.float32),
        jnp.asarray(prob["obs_pose"]), jnp.asarray(prob["obs_lm"]),
        jnp.asarray(prob["obs_uv"]),
        jnp.zeros(prob["obs_pose"].shape[0], jnp.int32),
        jnp.ones(prob["obs_pose"].shape[0], jnp.float32),
        jnp.asarray(prob["edge_i"]), jnp.asarray(prob["edge_j"]),
        prob["pre_stack"], jnp.ones(K - 1, jnp.float32),
        n_iters=10, shared_bias=False,
    )
    R_f, p_f, v_f, b_f, X_f, chi2, cost = out
    p_f = np.asarray(p_f)
    # Fixed states untouched.
    np.testing.assert_array_equal(p_f[: K - W], p0[: K - W])
    err_p = np.linalg.norm(p_f[K - W:] - prob["p_wb"][K - W:], axis=1)
    assert err_p.max() < 0.01, err_p
