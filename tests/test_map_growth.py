"""Unbounded-session capacity: the SoA map tables grow geometrically
instead of raising (reference lifecycle is delete-based std containers
with no caps, KeyFrame.cc SetBadFlag).  Round-4 VERDICT #5."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState


def _add_kf(m, i, n_kp=16):
    return m.add_keyframe(
        np.eye(3, dtype=np.float32), np.asarray([0.01 * i, 0, 0], np.float32),
        np.random.default_rng(i).uniform(0, 100, (n_kp, 2)).astype(np.float32),
        np.zeros(n_kp, np.int32), np.zeros(n_kp, np.float32),
        np.ones(n_kp, bool), np.zeros((n_kp, 256), np.uint8), i, float(i))


def test_long_session_growth_with_culling():
    """Thousands of keyframe/landmark allocations with interleaved culling
    never raise; ids stay monotonic; redirects survive growth."""
    rng = np.random.default_rng(0)
    m = MapState(max_kf=4, max_kp=16, max_lm=32)
    kfs = []
    for i in range(600):
        kf = _add_kf(m, i)
        kfs.append(kf)
        ids = m.add_landmarks(
            rng.uniform(-1, 1, (8, 3)).astype(np.float32),
            np.zeros((8, 256), np.uint8), kf)
        m.bind(kf, np.arange(8), ids)
        if i % 3 == 2 and len(kfs) > 4:
            victim = kfs[-3]
            if m.kf_valid[victim]:
                m.cull_keyframe(victim, kfs[-1])
        if i % 5 == 4:
            lms = np.nonzero(m.lm_valid)[0]
            m.remove_landmarks(lms[: lms.size // 3])
    assert m.next_kf == 600
    assert m.max_kf >= 600 and m.max_lm >= m.next_lm
    # Ids were never recycled: every allocated keyframe slot belongs to
    # the keyframe that allocated it.
    assert m.kf_frame_id[kfs[100]] == 100
    # Redirect chains resolve through culled keyframes after growth.
    culled = np.nonzero(~m.kf_valid[: m.next_kf] & (m.kf_redirect[: m.next_kf] >= 0))[0]
    assert culled.size > 0
    ref, _, _ = m.resolve_kf(int(culled[-1]), np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32))
    assert ref >= 0 and m.kf_valid[ref]


@pytest.mark.slow
def test_pipeline_growth_under_tiny_caps():
    """A full pipeline session started with deliberately tiny map tables
    must grow through them transparently (no capacity crash, tracking
    stays alive)."""
    from orb_slam3_study_kr_tpu.io import synthetic
    from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
    from orb_slam3_study_kr_tpu.pipeline.tracking import (TrackerConfig,
                                                          TrackState)

    rng = np.random.default_rng(9)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 24
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=0.9, z_span=0.0,
                                              y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10),
                                   max_kf=3, max_lm=400))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    m = slam.atlas.active_map
    assert m.max_kf > 3 and m.max_lm > 400, "tables never grew"
    assert slam.state in (TrackState.OK, TrackState.RECENTLY_LOST)
    assert slam.stats()["n_kf"] >= 4
