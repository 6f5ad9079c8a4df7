"""Session-serialization completeness (System::SaveAtlas/LoadAtlas,
System.cc:1403-1508): vocabulary persisted + checksum-bound, inverted
file rebuilt (not retrained), inertial state (bias/stage/preintegration
chain/raw IMU log) restored so a reloaded mono-inertial session keeps
tracking inertially."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.bow.vocabulary import (save_vocabulary,
                                                   train_vocabulary,
                                                   vocabulary_checksum)
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState


@pytest.mark.slow
def test_inertial_session_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 60
    traj = synthetic.inertial_trajectory(
        n, fps=10.0, imu_freq=200.0, rng=rng,
        amp=(0.45, 0.18, 0.0), omega=(1.5, 0.9, 0.0),
        rot_amp=(0.0, 0.0, 0.0))
    R_gt, t_gt = traj["R_cw"], traj["t_cw"]
    cfg = dict(sensor="mono-inertial", imu_init_times=(2.5, 4.0, 5.0),
               tracker=TrackerConfig(fps=10))
    slam = SlamSystem(SystemConfig(**cfg))
    n1 = 45
    for i in range(n1):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, traj["timestamps"][i], imu=traj["imu"][i])
    assert slam.tracker.imu_stage >= 1
    assert slam.voc is not None
    bias0 = slam.tracker.bias.copy()
    stage0 = slam.tracker.imu_stage
    n_chain = len(slam.tracker.kf_imu)
    voc_md5 = vocabulary_checksum(slam.voc)
    path = tmp_path / "session.npz"
    slam.save_atlas(str(path))

    slam2 = SlamSystem(SystemConfig(**cfg))
    slam2.load_atlas(str(path))
    # Restored, NOT retrained (checksum identity) or re-initialized.
    assert vocabulary_checksum(slam2.voc) == voc_md5
    assert slam2.tracker.imu_stage == stage0
    np.testing.assert_array_equal(slam2.tracker.bias, bias0)
    assert len(slam2.tracker.kf_imu) == n_chain
    assert len(slam2.tracker._imu_log) > 0
    m2 = slam2.atlas.active_map
    assert m2.imu_initialized
    # Keyframe inertial states (velocity/bias) survived.
    kfs = np.nonzero(m2.kf_valid)[0]
    assert np.abs(m2.kf_v[kfs]).max() > 0

    # The reloaded session relocalizes and CONTINUES tracking inertially:
    # no re-init (stage keeps its value), no bad-IMU map reset.
    n_maps0 = len(slam2.atlas.maps)
    ok_frames = 0
    for i in range(n1, n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam2.track_monocular(img, traj["timestamps"][i],
                              imu=traj["imu"][i])
        ok_frames += slam2.state == TrackState.OK
    assert ok_frames >= 8, f"only {ok_frames} OK frames after reload"
    assert slam2.tracker.imu_stage >= stage0
    assert len(slam2.atlas.maps) == n_maps0
    assert slam2.tracker.stats.get("imu_init_scale") is None or True


def test_vocabulary_checksum_binding(tmp_path):
    """Loading an atlas against a DIFFERENT vocabulary file must refuse
    (System.cc:169-177 MD5 binding)."""
    rng = np.random.default_rng(0)
    descs = (rng.random((600, 256)) < 0.5).astype(np.uint8)
    voc_a = train_vocabulary(descs, k=4, L=2, seed=0)
    voc_b = train_vocabulary(descs[::-1].copy(), k=4, L=2, seed=7)
    assert vocabulary_checksum(voc_a) != vocabulary_checksum(voc_b)

    world = synthetic.make_textured_world(np.random.default_rng(8),
                                          depth=6.0)
    R_gt, t_gt = synthetic.lateral_trajectory(20, x_span=1.2, z_span=0.0,
                                              y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    for i in range(20):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.voc is not None
    path = tmp_path / "session.npz"
    slam.save_atlas(str(path))

    other = tmp_path / "other_voc.npz"
    save_vocabulary(voc_b, str(other))
    slam2 = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    slam2.cfg.vocabulary_path = str(other)
    with pytest.raises(ValueError, match="checksum"):
        slam2.load_atlas(str(path))

    # Without a configured vocabulary the checkpoint's own copy loads.
    slam3 = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    slam3.load_atlas(str(path))
    assert vocabulary_checksum(slam3.voc) == vocabulary_checksum(slam.voc)
