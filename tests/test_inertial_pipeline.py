"""Visual-inertial pipeline tests.

Layered like the reference's implicit validation (SURVEY.md section 4):
the IMU generator is checked against the preintegration oracle, the
inertial-only initialization against known scale/gravity/bias, and the
mono-inertial pipeline end-to-end for mechanical soundness (staged init
fires, gravity-aligned rescale applied, tracking survives).  End-to-end
*accuracy* bounds stay loose until the association layer reaches the
consistency the init physics needs (NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.imu.preintegration import ImuCalib
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.inertial_tracking import (
    KF_BUCKETS, _preintegrate_rows)
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState
from orb_slam3_study_kr_tpu.solvers.inertial import inertial_only_optimization


def test_synthetic_imu_matches_preintegration():
    """The analytic IMU generator and the preintegration scan must agree:
    gt relative states reproduce the preintegrated deltas (noise-free)."""
    traj = synthetic.inertial_trajectory(10, fps=10.0, imu_freq=200.0,
                                         rng=None)
    calib = ImuCalib.make(freq=200.0)
    g_w = traj["gravity_w"]
    bias = traj["bias"]
    R_cw, t_cw, vel = traj["R_cw"], traj["t_cw"], traj["vel_w"]
    for i in range(1, 8):
        pre = _preintegrate_rows(traj["imu"][i], bias, calib, (64,))
        R1, R2 = R_cw[i - 1].T, R_cw[i].T
        p1 = -R1 @ t_cw[i - 1]
        p2 = -R2 @ t_cw[i]
        dt = float(pre.dT)
        assert abs(dt - 0.1) < 1e-3
        dR_gt = R1.T @ R2
        dV_gt = R1.T @ (vel[i] - vel[i - 1] - g_w * dt)
        dP_gt = R1.T @ (p2 - p1 - vel[i - 1] * dt - 0.5 * g_w * dt * dt)
        np.testing.assert_allclose(np.asarray(pre.dR), dR_gt, atol=2e-5)
        np.testing.assert_allclose(np.asarray(pre.dV), dV_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pre.dP), dP_gt, atol=1e-4)


def test_inertial_init_recovers_scale_gravity_bias():
    """Inertial-only init (linear seed + robust GN) on oracle poses scaled
    by an unknown factor: recovers scale, gravity direction and gyro bias
    (InertialOptimization's role in LocalMapping::InitializeIMU)."""
    rng = np.random.default_rng(0)
    traj = synthetic.inertial_trajectory(45, fps=10.0, imu_freq=200.0,
                                         rng=rng)
    calib = ImuCalib.make(freq=200.0)
    s_true = 5.3
    kf_idx = np.arange(0, 45, 8)  # 0.8 s spacing
    R_wb = np.stack([traj["R_cw"][i].T for i in kf_idx])
    p_wb = np.stack([-traj["R_cw"][i].T @ traj["t_cw"][i] for i in kf_idx])
    p_vis = p_wb / s_true
    pres = []
    for a, b in zip(kf_idx[:-1], kf_idx[1:]):
        rows = np.concatenate([traj["imu"][j] for j in range(a + 1, b + 1)])
        pres.append(_preintegrate_rows(rows, np.zeros(6, np.float32), calib,
                                       KF_BUCKETS))
    pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    out = inertial_only_optimization(
        jnp.asarray(R_wb), jnp.asarray(p_vis), pre_stack,
        prior_gyro=1e2, prior_acc=1e10)
    s = float(out["scale"])
    assert abs(s / s_true - 1.0) < 0.05, f"scale {s} vs {s_true}"
    g_est = np.asarray(out["R_wg"]) @ np.array([0, 0, -9.81])
    cosang = g_est @ traj["gravity_w"] / (
        np.linalg.norm(g_est) * 9.81)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 3.0
    np.testing.assert_allclose(np.asarray(out["bias"][:3]), traj["bias"][:3],
                               atol=2e-3)
    # Consistency diagnostic exposed for the init gate.
    assert float(np.median(np.asarray(out["edge_norms"]))) < 100.0


@pytest.mark.slow
def test_rgbd_inertial_pipeline():
    """End-to-end RGB-D-inertial (System.h:93 IMU_RGBD): depth gives metric
    scale from frame one, the staged fix-scale IMU init must accept with a
    scale factor near 1, and the unaligned (metric) ATE must stay small."""
    rng = np.random.default_rng(13)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 50
    traj = synthetic.inertial_trajectory(
        n, fps=10.0, imu_freq=200.0, rng=rng,
        amp=(0.45, 0.18, 0.0), omega=(1.5, 0.9, 0.0),
        rot_amp=(0.0, 0.0, 0.0))
    R_gt, t_gt = traj["R_cw"], traj["t_cw"]
    slam = SlamSystem(SystemConfig(
        sensor="rgbd-inertial", imu_init_times=(2.5, 4.0, 5.0),
        tracker=TrackerConfig(fps=10)))
    for i in range(n):
        img, depth = synthetic.render_textured(world, R_gt[i], t_gt[i],
                                               rng=rng, return_depth=True)
        depth = np.where(np.isfinite(depth), depth, 0.0)
        slam.track_rgbd(img, depth, traj["timestamps"][i],
                        imu=traj["imu"][i])
    tr = slam.tracker
    assert slam.state in (TrackState.OK, TrackState.RECENTLY_LOST)
    assert tr.imu_stage >= 1, "IMU initialization never accepted"
    # Depth already fixes metric scale; the fix-scale init must keep it.
    s_init = tr.stats.get("imu_init_scale")
    assert s_init is not None and 0.8 < s_init < 1.25
    rows = slam.trajectory()
    cen = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], traj["timestamps"], cen,
                           with_scale=False)
    assert nm > 35
    assert rmse < 0.25, f"metric ATE {rmse:.3f}"


@pytest.mark.slow
def test_mono_inertial_pipeline():
    """End-to-end monocular-inertial: the staged IMU init must fire on a
    clean-vision excited trajectory, apply a gravity-aligned metric rescale,
    and keep tracking with the pose-inertial optimizer."""
    rng = np.random.default_rng(11)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 60
    traj = synthetic.inertial_trajectory(
        n, fps=10.0, imu_freq=200.0, rng=rng,
        amp=(0.45, 0.18, 0.0), omega=(1.5, 0.9, 0.0),
        rot_amp=(0.0, 0.0, 0.0))
    R_gt, t_gt = traj["R_cw"], traj["t_cw"]
    slam = SlamSystem(SystemConfig(
        sensor="mono-inertial", imu_init_times=(2.5, 4.0, 5.0),
        tracker=TrackerConfig(fps=10)))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, traj["timestamps"][i], imu=traj["imu"][i])
    tr = slam.tracker
    assert slam.state in (TrackState.OK, TrackState.RECENTLY_LOST)
    assert tr.imu_stage >= 1, "IMU initialization never accepted"
    s_init = tr.stats.get("imu_init_scale")
    assert s_init is not None and 1.5 < s_init < 30.0
    # Gyro bias is strongly observable from vision rotations + gyro.
    np.testing.assert_allclose(tr.bias[:3], traj["bias"][:3], atol=3e-3)
    rows = slam.trajectory()
    cen = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], traj["timestamps"], cen,
                           with_scale=True)
    assert nm > 40
    assert rmse < 0.35, f"scaled ATE {rmse:.3f}"
