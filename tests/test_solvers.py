"""Solver tests on synthetic problems with known optima (the oracle the
reference never had — SURVEY.md section 4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_study_kr_tpu import cameras, lie
from orb_slam3_study_kr_tpu.cameras import pinhole
from orb_slam3_study_kr_tpu.solvers import bundle_adjust, optimize_pose

CAM_PARAMS = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)
PROJECT = functools.partial(pinhole.project, CAM_PARAMS)
PROJECT_JAC = functools.partial(pinhole.project_jac, CAM_PARAMS)


def _make_pose_problem(rng, n=200, outlier_frac=0.0, noise=0.5):
    X = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n)], -1
    ).astype(np.float32)
    xi_gt = np.array([0.05, -0.08, 0.03, 0.2, -0.1, 0.15], np.float32)
    R_gt, t_gt = lie.exp_se3(jnp.asarray(xi_gt))
    p = np.asarray(lie.se3_apply(R_gt, t_gt, jnp.asarray(X)))
    uv = np.array(PROJECT(jnp.asarray(p)))
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(uv), R_gt, t_gt, n_out


def test_pose_optimization_converges(rng):
    X, uv, R_gt, t_gt, _ = _make_pose_problem(rng)
    # Start from a perturbed pose.
    dR, dt = lie.exp_se3(jnp.asarray([0.05, -0.03, 0.04, 0.2, 0.1, -0.15], jnp.float32))
    R0, t0 = lie.se3_compose(dR, dt, R_gt, t_gt)
    level = jnp.zeros(X.shape[0], jnp.int32)
    mask = jnp.ones(X.shape[0])
    R, t, inl, n_inl = optimize_pose(PROJECT, PROJECT_JAC, R0, t0, X, uv, level, mask)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(R) @ np.asarray(R_gt).T) - 1) / 2, -1, 1))
    )
    assert ang < 0.05, f"rotation error {ang} deg"
    assert np.linalg.norm(np.asarray(t) - np.asarray(t_gt)) < 0.01
    assert int(n_inl) > 190


def test_pose_optimization_rejects_outliers(rng):
    X, uv, R_gt, t_gt, n_out = _make_pose_problem(rng, outlier_frac=0.3)
    dR, dt = lie.exp_se3(jnp.asarray([0.02, 0.02, -0.02, 0.1, -0.05, 0.05], jnp.float32))
    R0, t0 = lie.se3_compose(dR, dt, R_gt, t_gt)
    level = jnp.zeros(X.shape[0], jnp.int32)
    mask = jnp.ones(X.shape[0])
    R, t, inl, n_inl = optimize_pose(PROJECT, PROJECT_JAC, R0, t0, X, uv, level, mask)
    inl = np.asarray(inl)
    # Outliers occupy the first n_out slots.
    assert inl[:n_out].mean() < 0.1, "outliers retained"
    assert inl[n_out:].mean() > 0.9, "inliers rejected"
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(R) @ np.asarray(R_gt).T) - 1) / 2, -1, 1))
    )
    assert ang < 0.1
    assert np.linalg.norm(np.asarray(t) - np.asarray(t_gt)) < 0.02


def _make_ba_problem(rng, n_poses=6, n_points=400, noise=0.5):
    X = np.stack(
        [rng.uniform(-5, 5, n_points), rng.uniform(-4, 4, n_points),
         rng.uniform(6, 14, n_points)], -1,
    ).astype(np.float32)
    Rs, ts = [], []
    for k in range(n_poses):
        xi = np.array([0.02 * k, -0.01 * k, 0.005 * k, 0.4 * k, 0.02 * k, 0.0], np.float32)
        R, t = lie.exp_se3(jnp.asarray(xi))
        Rs.append(np.asarray(R))
        ts.append(np.asarray(t))
    R_gt = np.stack(Rs)
    t_gt = np.stack(ts)
    obs_pose, obs_lm, obs_uv = [], [], []
    for k in range(n_poses):
        p = X @ R_gt[k].T + t_gt[k]
        uv = np.asarray(PROJECT(jnp.asarray(p)))
        vis = (
            (p[:, 2] > 0.5)
            & (uv[:, 0] > 0) & (uv[:, 0] < 752) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        )
        for j in np.nonzero(vis)[0]:
            obs_pose.append(k)
            obs_lm.append(j)
            obs_uv.append(uv[j] + rng.normal(0, noise, 2))
    return (
        R_gt, t_gt, X,
        np.array(obs_pose, np.int32), np.array(obs_lm, np.int32),
        np.array(obs_uv, np.float32),
    )


def test_bundle_adjust_converges(rng):
    R_gt, t_gt, X_gt, op, ol, ouv = _make_ba_problem(rng)
    K, M, O = R_gt.shape[0], X_gt.shape[0], op.shape[0]
    # Perturb everything except pose 0 (gauge anchor).
    pert = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
    pert[0] = 0
    dR, dt = lie.exp_se3(jnp.asarray(pert))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    X0 = jnp.asarray(X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32))
    fixed = jnp.zeros(K).at[0].set(1.0)

    R, t, X, chi2, cost = bundle_adjust(
        PROJECT, PROJECT_JAC,
        R0, t0, fixed,
        X0, jnp.ones(M),
        jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O),
        n_iters=12,
    )
    # Pose errors (pose 0 fixed at ground truth -> no gauge ambiguity except
    # scale, which is fixed by the fixed landmark-free depth... in practice
    # mono BA with one fixed pose retains scale gauge; compare up-to-scale).
    t_np = np.asarray(t)
    s = np.linalg.norm(t_gt[1:], axis=1).sum() / max(np.linalg.norm(t_np[1:], axis=1).sum(), 1e-9)
    for k in range(1, K):
        ang = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(R)[k] @ R_gt[k].T) - 1) / 2, -1, 1))
        )
        assert ang < 0.1, f"pose {k} rot err {ang}"
        assert np.linalg.norm(t_np[k] * s - t_gt[k]) < 0.02, f"pose {k} trans"
    # Reprojection chi2 should be at noise level.
    med = np.median(np.asarray(chi2))
    assert med < 3.0, f"median chi2 {med}"


def test_bundle_adjust_masked_slots_stay_put(rng):
    """Dead landmark slots and masked observations must not move or corrupt
    the solve (fixed-shape padding semantics)."""
    R_gt, t_gt, X_gt, op, ol, ouv = _make_ba_problem(rng, n_poses=4, n_points=150)
    K, M = 4, X_gt.shape[0] + 50
    X0 = np.concatenate([X_gt, np.full((50, 3), 7.0, np.float32)])
    lm_mask = np.concatenate([np.ones(X_gt.shape[0]), np.zeros(50)]).astype(np.float32)
    O = op.shape[0] + 30
    op_p = np.concatenate([op, np.zeros(30, np.int32)])
    ol_p = np.concatenate([ol, np.full(30, X_gt.shape[0] + 5, np.int32)])
    ouv_p = np.concatenate([ouv, np.full((30, 2), 1e5, np.float32)])
    obs_mask = np.concatenate([np.ones(op.shape[0]), np.zeros(30)]).astype(np.float32)

    fixed = jnp.zeros(K).at[0].set(1.0)
    R, t, X, chi2, cost = bundle_adjust(
        PROJECT, PROJECT_JAC,
        jnp.asarray(R_gt), jnp.asarray(t_gt), fixed,
        jnp.asarray(X0), jnp.asarray(lm_mask),
        jnp.asarray(op_p), jnp.asarray(ol_p), jnp.asarray(ouv_p),
        jnp.zeros(O, jnp.int32), jnp.asarray(obs_mask),
        n_iters=5,
    )
    X = np.asarray(X)
    np.testing.assert_array_equal(X[X_gt.shape[0]:], X0[X_gt.shape[0]:])
    assert np.all(np.isfinite(np.asarray(R)))
    assert np.all(np.isfinite(X))


def test_fixed_poses_do_not_move(rng):
    R_gt, t_gt, X_gt, op, ol, ouv = _make_ba_problem(rng, n_poses=4, n_points=150)
    K, M, O = 4, X_gt.shape[0], op.shape[0]
    fixed = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    pert = np.zeros((K, 6), np.float32)
    pert[2:] = rng.normal(0, 0.01, (2, 6))
    dR, dt = lie.exp_se3(jnp.asarray(pert))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    R, t, X, chi2, cost = bundle_adjust(
        PROJECT, PROJECT_JAC, R0, t0, fixed,
        jnp.asarray(X_gt), jnp.ones(M),
        jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O), n_iters=6,
    )
    np.testing.assert_array_equal(np.asarray(R)[:2], np.asarray(R0)[:2])
    np.testing.assert_array_equal(np.asarray(t)[:2], np.asarray(t0)[:2])
    for k in range(2, K):
        ang = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(R)[k] @ R_gt[k].T) - 1) / 2, -1, 1))
        )
        assert ang < 0.1


def test_bundle_adjust_pcg_matches_dense(rng):
    """assembly='pcg' (matrix-free reduced camera system) must reach the
    same optimum as the dense-Schur path."""
    R_gt, t_gt, X_gt, op, ol, ouv = _make_ba_problem(rng)
    K, M, O = R_gt.shape[0], X_gt.shape[0], op.shape[0]
    pert = rng.normal(0, 0.01, (K, 6)).astype(np.float32)
    pert[0] = 0
    dR, dt = lie.exp_se3(jnp.asarray(pert))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    X0 = jnp.asarray(X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32))
    fixed = jnp.zeros(K).at[0].set(1.0)
    args = (R0, t0, fixed, X0, jnp.ones(M),
            jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
            jnp.zeros(O, jnp.int32), jnp.ones(O))
    Rd, td, Xd, chi2d, costd = bundle_adjust(
        PROJECT, PROJECT_JAC, *args, n_iters=12, assembly="dense")
    Rp, tp, Xp, chi2p, costp = bundle_adjust(
        PROJECT, PROJECT_JAC, *args, n_iters=12, assembly="pcg")
    assert abs(float(costp) - float(costd)) / max(float(costd), 1e-9) < 0.02
    np.testing.assert_allclose(np.asarray(tp), np.asarray(td), atol=2e-3)
    med = np.median(np.asarray(chi2p))
    assert med < 3.0, f"median chi2 {med}"
