"""Robustness guards around time and sensor failure.

Reference parity targets: the timestamp-jump map reset
(/root/reference/src/Tracking.cc:1837-1865), IMU-only pose survival while
RECENTLY_LOST (Tracking.cc:2000-2012), and the bad-IMU watchdog
(LocalMapping.cc:139-148)."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState


def test_timestamp_jump_resets():
    """A >1 s gap in the frame stream invalidates the motion model; the
    session must store/reset the current map and re-initialize instead of
    tracking across the discontinuity."""
    rng = np.random.default_rng(2)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 24
    R_gt, t_gt = synthetic.lateral_trajectory(2 * n, x_span=1.6, z_span=0.0,
                                              y_amp=0.05)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.state == TrackState.OK
    n_maps_before = len(slam.atlas.maps)

    # 10-second stream gap, camera far along the trajectory.
    for j, i in enumerate(range(n, 2 * n)):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, 10.0 + i * 0.1)
    assert slam.sys_stats.get("n_ts_resets", 0) == 1
    # The pre-gap map was either stored (spawn) or reset; either way the
    # post-gap frames re-initialized a working session.
    assert slam.state == TrackState.OK, slam.tracker.stats
    assert len(slam.atlas.maps) >= n_maps_before


def test_backward_timestamp_resets():
    rng = np.random.default_rng(3)
    world = synthetic.make_textured_world(rng, depth=6.0)
    R_gt, t_gt = synthetic.lateral_trajectory(20, x_span=1.2, z_span=0.0,
                                              y_amp=0.05)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    for i in range(12):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.state == TrackState.OK
    img = synthetic.render_textured(world, R_gt[12], t_gt[12], rng=rng)
    slam.track_monocular(img, 0.05)  # clock went backward
    assert slam.sys_stats.get("n_ts_resets", 0) == 1


@pytest.mark.slow
def test_imu_only_survival_while_recently_lost():
    """With an initialized IMU, a visual blackout keeps a dead-reckoned
    pose and stays RECENTLY_LOST well past the visual-only give-up point
    (~1 s); no map spawn happens inside the 5 s survival window."""
    rng = np.random.default_rng(11)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 60
    traj = synthetic.inertial_trajectory(
        n + 16, fps=10.0, imu_freq=200.0, rng=rng,
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
    assert slam.state == TrackState.OK and tr.imu_stage >= 1
    n_maps = len(slam.atlas.maps)

    # 1.6 s of pure-noise frames: descriptor tracking has nothing to match.
    for i in range(n, n + 16):
        img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
        slam.track_monocular(img, traj["timestamps"][i], imu=traj["imu"][i])
    assert slam.state == TrackState.RECENTLY_LOST, slam.state
    assert len(slam.atlas.maps) == n_maps, "map spawned inside survival window"
    assert tr.stats.get("imu_only_frames", 0) >= 10
    f = tr.last_frame
    assert f.R_cw is not None and np.isfinite(f.t_cw).all()
    # Dead-reckoned position stays near ground truth over the blackout.
    c_est = -f.R_cw.T @ f.t_cw
    c_gt = -R_gt[n + 15].T @ t_gt[n + 15]
    s = tr.stats.get("imu_init_scale", 1.0)
    drift = np.linalg.norm(c_est - c_gt * s)
    assert drift < 1.5 * s, f"IMU dead-reckoning drifted {drift / s:.2f} gt-u"


@pytest.mark.slow
def test_bad_imu_watchdog_resets():
    """An inertial session whose IMU never initializes (all-zero samples:
    no gravity, no excitation) must reset the map once it is clearly
    overdue rather than keep growing an unaligned, unscaled map."""
    rng = np.random.default_rng(4)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 130
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=2.2, z_span=0.0,
                                              y_amp=0.08)
    slam = SlamSystem(SystemConfig(
        sensor="mono-inertial", imu_init_times=(1.0, 2.0, 3.0),
        tracker=TrackerConfig(fps=10)))
    dead_imu = np.zeros((20, 7), np.float32)
    dead_imu[:, 0] = 1.0 / 200.0
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1, imu=dead_imu)
        if slam.sys_stats.get("n_bad_imu_resets", 0):
            break
    assert slam.sys_stats.get("n_bad_imu_resets", 0) >= 1, (
        slam.tracker.stats, len(slam.atlas.maps))
