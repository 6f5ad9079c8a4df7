"""System-level features: relocalization, loop correction, atlas
save/load, new-map spawning."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.ops import orb
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.frame import Frame
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState


@pytest.fixture(scope="module")
def built_system():
    """A system that has mapped a short textured sequence."""
    rng = np.random.default_rng(4)
    world = synthetic.make_textured_world(np.random.default_rng(8), depth=6.0)
    n = 26
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.2, z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.state == TrackState.OK
    return slam, world, R_gt, t_gt


def _make_frame(slam, world, R, t, seed=123):
    rng = np.random.default_rng(seed)
    img = synthetic.render_textured(world, R, t, rng=rng)
    cfg = slam.cfg.tracker
    feats = orb.extract_orb(jnp.asarray(img, jnp.float32), cfg.orb_config)
    return Frame(
        frame_id=999, timestamp=99.0,
        uv=np.asarray(feats.uv), level=np.asarray(feats.level),
        angle=np.asarray(feats.angle), response=np.asarray(feats.response),
        desc=np.asarray(feats.desc), valid=np.asarray(feats.valid),
    )


def test_vocabulary_and_database_built(built_system):
    slam, *_ = built_system
    assert slam.voc is not None
    assert slam.db is not None and len(slam.db.vectors) >= 5
    assert slam.loop_closer is not None
    assert slam.loop_closer.stats["n_queries"] > 0


def test_relocalization_recovers_pose(built_system):
    slam, world, R_gt, t_gt = built_system
    # A fresh view near the middle of the mapped sequence.
    frame = _make_frame(slam, world, R_gt[12], t_gt[12])
    ok = slam._relocalize(frame)
    assert ok, "relocalization failed"
    # Compare against the nearby keyframe chain: position must be within the
    # map's local scale of the expected place.  Use the tracked keyframe at
    # the same source frame if present.
    m = slam.atlas.active_map
    fid = np.nonzero(m.kf_valid)[0]
    src = m.kf_frame_id[fid]
    if (src == 12).any():
        k = fid[src == 12][0]
        c_kf = m.kf_center(k)
        c_fr = -(frame.R_cw.T @ frame.t_cw)
        assert np.linalg.norm(c_kf - c_fr) < 0.05, (c_kf, c_fr)


def test_atlas_save_load_and_reloc(tmp_path, built_system):
    slam, world, R_gt, t_gt = built_system
    p = tmp_path / "session.npz"
    slam.save_atlas(p)

    slam2 = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    slam2.load_atlas(p)
    m1 = slam.atlas.active_map
    m2 = slam2.atlas.active_map
    assert m2.n_kf == m1.n_kf
    np.testing.assert_array_equal(m1.kf_R[m1.kf_valid], m2.kf_R[m2.kf_valid])
    np.testing.assert_array_equal(m1.lm_pos[m1.lm_valid], m2.lm_pos[m2.lm_valid])
    # The loaded session can relocalize a frame against the restored map.
    frame = _make_frame(slam2, world, R_gt[6], t_gt[6])
    assert slam2._relocalize(frame)


def test_lost_spawns_new_map():
    """Blinding the camera long enough must spawn a fresh map in the Atlas
    once the old one is established."""
    rng = np.random.default_rng(4)
    world = synthetic.make_textured_world(np.random.default_rng(8), depth=6.0)
    n = 26
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.2, z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=4)))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    kfs_before = slam.stats()["n_kf"]
    assert kfs_before >= 10
    blank = np.full((480, 752), 80.0, np.float32)
    for j in range(8):
        slam.track_monocular(blank, 10.0 + j * 0.1)
    assert len(slam.atlas.maps) == 2, slam.stats()
    assert slam.state in (TrackState.NOT_INITIALIZED, TrackState.LOST)
    # Old map retained with its keyframes.
    assert int(slam.atlas.maps[0].kf_valid.sum()) == kfs_before


def test_localization_only_mode(built_system):
    """ActivateLocalizationMode freezes the map: tracking continues but no
    keyframes/landmarks are created (System.h:118 mbActivateLocalizationMode)."""
    slam, world, R_gt, t_gt = built_system
    m = slam.atlas.active_map
    slam.activate_localization_mode()
    try:
        n_kf = int(m.kf_valid.sum())
        n_lm = int(m.lm_valid.sum())
        rng = np.random.default_rng(77)
        n_ok = 0
        for i in range(8, 18):
            img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
            f = slam.track_monocular(img, 100.0 + 0.1 * i)
            n_ok += bool(f.pose_ok)
        assert n_ok >= 8, "localization mode lost tracking"
        assert int(m.kf_valid.sum()) == n_kf
        assert int(m.lm_valid.sum()) == n_lm
    finally:
        slam.deactivate_localization_mode()


def test_relocalization_cascade_strong_acceptance(built_system):
    """Kidnapped camera: the widening SearchByProjection re-optimization
    cascade (Tracking.cc:3781-3797) must reach the reference's FULL
    50-inlier acceptance — not just the thin PnP-seeded match set the old
    single-shot path returned (which survives only via the documented
    weak fallback)."""
    slam, world, R_gt, t_gt = built_system
    slam.sys_stats.pop("n_reloc", None)
    slam.sys_stats.pop("n_reloc_weak", None)
    # A view from the middle of the mapped span, with no motion-model
    # continuity (fresh frame, no last-frame state used by _relocalize).
    frame = _make_frame(slam, world, R_gt[14], t_gt[14], seed=321)
    ok = slam._relocalize(frame)
    assert ok, "cascade relocalization failed"
    assert slam.sys_stats.get("n_reloc", 0) >= 1, (
        "relocalization only succeeded through the weak PnP fallback; "
        f"stats={slam.sys_stats}")
    # The accepted pose must carry a full local-map-grade inlier set.
    from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM
    assert int((frame.kp_lm != NO_LM).sum()) >= 50
