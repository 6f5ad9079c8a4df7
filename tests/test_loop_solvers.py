"""Loop-closing solver tests: Sim3 RANSAC, essential-graph optimization
(Sim3 + 4-DoF), and RANSAC PnP — all on synthetic problems with exact
ground truth."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu import lie
from orb_slam3_study_kr_tpu.cameras import pinhole
from orb_slam3_study_kr_tpu.solvers.pnp import ransac_pnp
from orb_slam3_study_kr_tpu.solvers.pose_graph import (optimize_pose_graph,
                                                       relative_sim3)
from orb_slam3_study_kr_tpu.solvers.sim3_solver import horn_sim3, ransac_sim3

K_MAT = np.array([[458.0, 0, 376.0], [0, 457.0, 240.0], [0, 0, 1.0]], np.float32)
CAM = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)
PROJECT = functools.partial(pinhole.project, CAM)
PROJECT_JAC = functools.partial(pinhole.project_jac, CAM)


def test_horn_sim3_exact(rng):
    P = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    z = jnp.asarray([0.2, -0.1, 0.3, 1.0, -2.0, 0.5, 0.4], jnp.float32)
    R, t, s = lie.exp_sim3(z)
    Q = lie.sim3_apply(R, t, s, P)
    R_e, t_e, s_e = horn_sim3(P, Q)
    np.testing.assert_allclose(np.asarray(R_e), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_e), np.asarray(t), atol=1e-5)
    np.testing.assert_allclose(float(s_e), float(s), rtol=1e-5)


def test_ransac_sim3_with_outliers(rng):
    n = 120
    # Landmarks in KF2's camera frame; KF1 sees them through a Sim3.
    P2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4, 9, n)], -1).astype(np.float32)
    z = jnp.asarray([0.1, -0.05, 0.15, 0.5, -0.3, 0.2, 0.3], jnp.float32)
    R12, t12, s12 = lie.exp_sim3(z)
    P1 = np.array(lie.sim3_apply(R12, t12, s12, jnp.asarray(P2)))
    # 25% outliers in the association.
    n_out = n // 4
    P1[:n_out] = rng.permutation(P1[:n_out])
    uv1 = np.asarray(PROJECT(jnp.asarray(P1)))
    uv2 = np.asarray(PROJECT(jnp.asarray(P2)))
    out = ransac_sim3(
        jax.random.PRNGKey(0), jnp.asarray(P1), jnp.asarray(P2),
        jnp.ones(n), jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(K_MAT),
    )
    assert bool(out["success"]), int(out["n_inliers"])
    np.testing.assert_allclose(np.asarray(out["R12"]), np.asarray(R12), atol=1e-3)
    np.testing.assert_allclose(float(out["s12"]), float(s12), rtol=1e-3)
    assert int(out["n_inliers"]) >= n - n_out - 5


def _ring_pose_graph(rng, K=12, drift_per_step=0.02):
    """Simulated loop: true poses on a ring; odometry edges accumulate scale
    drift; one loop edge carries the true constraint."""
    true = []
    for k in range(K):
        a = 2 * np.pi * k / K
        z = jnp.asarray([0, 0.5 * a, 0, np.cos(a), 0, np.sin(a), 0.0], jnp.float32)
        true.append(lie.exp_sim3(z))
    R_t = jnp.stack([x[0] for x in true])
    t_t = jnp.stack([x[1] for x in true])
    s_t = jnp.stack([x[2] for x in true])
    # Noisy/drifting estimates: compose sequential relatives with drift.
    R_e = [np.asarray(R_t[0])]
    t_e = [np.asarray(t_t[0])]
    s_e = [1.0]
    for k in range(1, K):
        Rm, tm, sm = relative_sim3(R_t[k], t_t[k], s_t[k],
                                   R_t[k - 1], t_t[k - 1], s_t[k - 1])
        # drift: inflate scale and perturb rotation slightly
        dz = jnp.asarray(np.concatenate([
            rng.normal(0, 0.004, 3), rng.normal(0, 0.01, 3),
            [drift_per_step]]), jnp.float32)
        dR, dt, ds = lie.exp_sim3(dz)
        Rm, tm, sm = lie.sim3_compose(dR, dt, ds, Rm, tm, sm)
        Rk, tk, sk = lie.sim3_compose(Rm, tm, sm, jnp.asarray(R_e[-1]),
                                      jnp.asarray(t_e[-1]),
                                      jnp.asarray(s_e[-1], jnp.float32))
        R_e.append(np.asarray(Rk)); t_e.append(np.asarray(tk)); s_e.append(float(sk))
    return (R_t, t_t, s_t), (jnp.asarray(np.stack(R_e)),
                             jnp.asarray(np.stack(t_e)),
                             jnp.asarray(np.asarray(s_e, np.float32)))


def test_pose_graph_closes_loop(rng):
    K = 12
    (R_t, t_t, s_t), (R_0, t_0, s_0) = _ring_pose_graph(rng, K)
    # Edges: sequential (from drifted estimates) + the loop edge (true).
    ei, ej, Rm, tm, sm = [], [], [], [], []
    for k in range(1, K):
        ei.append(k); ej.append(k - 1)
        r = relative_sim3(R_0[k], t_0[k], s_0[k], R_0[k-1], t_0[k-1], s_0[k-1])
        Rm.append(r[0]); tm.append(r[1]); sm.append(r[2])
    # loop edge K-1 -> 0 with TRUE relative
    ei.append(K - 1); ej.append(0)
    r = relative_sim3(R_t[K-1], t_t[K-1], s_t[K-1], R_t[0], t_t[0], s_t[0])
    Rm.append(r[0]); tm.append(r[1]); sm.append(r[2])

    fixed = jnp.zeros(K).at[0].set(1.0)
    R_f, t_f, s_f = optimize_pose_graph(
        R_0, t_0, s_0,
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.stack(Rm), jnp.stack(tm), jnp.stack(sm),
        jnp.ones(len(ei)), fixed, n_iters=25,
    )
    # Drifted end pose was far off; after optimization every pose should be
    # much closer to truth than before.
    def err(Ra, ta, sa):
        e = 0.0
        for k in range(K):
            c_est = np.asarray(lie.sim3_inverse(Ra[k], ta[k], sa[k])[1])
            c_true = np.asarray(lie.sim3_inverse(R_t[k], t_t[k], s_t[k])[1])
            e += np.linalg.norm(c_est - c_true)
        return e / K

    e0 = err(R_0, t_0, s_0)
    e1 = err(R_f, t_f, s_f)
    assert e1 < 0.25 * e0, (e0, e1)
    # Scales should return to ~1.
    assert np.abs(np.asarray(s_f) - 1.0).max() < 0.05, np.asarray(s_f)


def test_pose_graph_4dof(rng):
    K = 10
    (R_t, t_t, s_t), (R_0, t_0, s_0) = _ring_pose_graph(rng, K, drift_per_step=0.0)
    s_0 = jnp.ones(K)  # inertial: scale known
    ei, ej, Rm, tm, sm = [], [], [], [], []
    for k in range(1, K):
        ei.append(k); ej.append(k - 1)
        r = relative_sim3(R_0[k], t_0[k], s_0[k], R_0[k-1], t_0[k-1], s_0[k-1])
        Rm.append(r[0]); tm.append(r[1]); sm.append(r[2])
    ei.append(K - 1); ej.append(0)
    r = relative_sim3(R_t[K-1], t_t[K-1], s_t[K-1], R_t[0], t_t[0], s_t[0])
    Rm.append(r[0]); tm.append(r[1]); sm.append(r[2])
    fixed = jnp.zeros(K).at[0].set(1.0)
    R_f, t_f, s_f = optimize_pose_graph(
        R_0, t_0, s_0,
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.stack(Rm), jnp.stack(tm), jnp.stack(sm),
        jnp.ones(len(ei)), fixed, n_iters=25, dof=4,
    )
    np.testing.assert_allclose(np.asarray(s_f), np.ones(K), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(R_f)))


def test_ransac_pnp(rng):
    n = 150
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                  rng.uniform(4, 12, n)], -1).astype(np.float32)
    xi = jnp.asarray([0.2, -0.3, 0.1, 0.4, 0.2, -0.3], jnp.float32)
    R_gt, t_gt = lie.exp_se3(xi)
    p = np.asarray(lie.se3_apply(R_gt, t_gt, jnp.asarray(X)))
    uv = np.array(PROJECT(jnp.asarray(p)))
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # 30% outliers.
    n_out = int(0.3 * n)
    uv[:n_out] = rng.uniform(0, 700, (n_out, 2))
    out = ransac_pnp(
        jax.random.PRNGKey(1), PROJECT, PROJECT_JAC, jnp.asarray(K_MAT),
        jnp.asarray(X), jnp.asarray(uv), jnp.zeros(n, jnp.int32), jnp.ones(n),
    )
    assert bool(out["success"]), int(out["n_inliers"])
    c = (np.trace(np.asarray(out["R"]) @ np.asarray(R_gt).T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 0.2
    assert np.linalg.norm(np.asarray(out["t"]) - np.asarray(t_gt)) < 0.05
    assert int(out["n_inliers"]) > n - n_out - 10


def test_optimize_sim3_refines_coarse_estimate(rng):
    """OptimizeSim3 parity: a coarse (perturbed) Sim3 with 20% outliers must
    refine to the true transform and gate the outliers (Optimizer.cc:2118)."""
    from orb_slam3_study_kr_tpu.solvers.sim3_solver import optimize_sim3

    n = 150
    P2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4, 9, n)], -1).astype(np.float32)
    z = jnp.asarray([0.08, -0.04, 0.12, 0.4, -0.25, 0.15, 0.25], jnp.float32)
    R12, t12, s12 = lie.exp_sim3(z)
    P1 = np.array(lie.sim3_apply(R12, t12, s12, jnp.asarray(P2)))
    n_out = n // 5
    P1_obs = P1.copy()
    P1_obs[:n_out] = rng.permutation(P1_obs[:n_out]) + rng.normal(0, 1.0, (n_out, 3))
    uv1 = np.asarray(PROJECT(jnp.asarray(P1)))  # true image-1 observations
    uv2 = np.asarray(PROJECT(jnp.asarray(P2)))
    # Coarse start: perturb the true Sim3.
    dz = jnp.asarray([0.02, -0.015, 0.01, 0.05, 0.03, -0.04, 0.05], jnp.float32)
    dR, dt, ds = lie.exp_sim3(dz)
    R0 = np.asarray(R12) @ np.asarray(dR)
    t0 = np.asarray(t12) + np.asarray(dt)
    s0 = float(s12) * float(ds)
    out = optimize_sim3(
        jnp.asarray(P1_obs), jnp.asarray(P2), jnp.ones(n),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(K_MAT),
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(s0, jnp.float32), n_iters=12,
    )
    np.testing.assert_allclose(np.asarray(out["R12"]), np.asarray(R12), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["t12"]), np.asarray(t12), atol=2e-2)
    np.testing.assert_allclose(float(out["s12"]), float(s12), rtol=5e-3)
    inl = np.asarray(out["inliers"])
    assert inl[n_out:].mean() > 0.95            # inliers survive
    assert int(out["n_inliers"]) <= n - n_out // 2  # most outliers gated


def test_optimize_sim3_fix_scale(rng):
    from orb_slam3_study_kr_tpu.solvers.sim3_solver import optimize_sim3

    n = 80
    P2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(4, 9, n)], -1).astype(np.float32)
    z = jnp.asarray([0.05, -0.03, 0.08, 0.3, -0.2, 0.1, 0.0], jnp.float32)
    R12, t12, s12 = lie.exp_sim3(z)
    P1 = np.array(lie.sim3_apply(R12, t12, s12, jnp.asarray(P2)))
    uv1 = np.asarray(PROJECT(jnp.asarray(P1)))
    uv2 = np.asarray(PROJECT(jnp.asarray(P2)))
    out = optimize_sim3(
        jnp.asarray(P1), jnp.asarray(P2), jnp.ones(n),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(K_MAT),
        jnp.asarray(np.asarray(R12), jnp.float32),
        jnp.asarray(np.asarray(t12) + 0.05, jnp.float32),
        jnp.asarray(1.0, jnp.float32), fix_scale=True,
    )
    assert float(out["s12"]) == 1.0
    np.testing.assert_allclose(np.asarray(out["t12"]), np.asarray(t12), atol=1e-2)
