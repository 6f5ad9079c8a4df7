"""Headless visualization (viz/): shapes, file outputs, no GUI needed."""

import numpy as np

from orb_slam3_study_kr_tpu.pipeline.frame import Frame
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackState
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState
from orb_slam3_study_kr_tpu.viz import FrameDrawer, MapDrawer


def _tiny_map(rng):
    m = MapState(max_kf=8, max_kp=64, max_lm=256)
    uv = rng.uniform(10, 100, (64, 2)).astype(np.float32)
    valid = np.ones(64, bool)
    desc = (rng.random((64, 256)) > 0.5).astype(np.uint8)
    for k in range(3):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.1 * k, 0, 0], np.float32)
        m.add_keyframe(R, t, uv, np.zeros(64, np.int32),
                       np.zeros(64, np.float32), valid, desc, k, float(k))
    pts = rng.uniform(-1, 1, (32, 3)).astype(np.float32) + [0, 0, 3]
    ids = m.add_landmarks(pts, desc[:32], 0)
    m.bind(0, np.arange(32, dtype=np.int32), ids)
    m.bind(1, np.arange(32, dtype=np.int32), ids)
    return m, ids


def test_frame_drawer_overlay():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    f = Frame(frame_id=0, timestamp=0.0,
              uv=rng.uniform(5, 110, (40, 2)).astype(np.float32),
              level=np.zeros(40, np.int32), angle=np.zeros(40, np.float32),
              response=np.zeros(40, np.float32),
              desc=np.zeros((40, 256), np.uint8), valid=np.ones(40, bool))
    f.kp_lm[:10] = np.arange(10)
    out = FrameDrawer().draw(img, f, state=TrackState.OK,
                             stats={"n_maps": 1, "n_kf": 3, "n_lm": 32})
    assert out.dtype == np.uint8
    assert out.shape[0] > 120 and out.shape[1] == 160 and out.shape[2] == 3
    # Tracked keypoints must leave green marks somewhere.
    assert (out[:120, :, 1].astype(int) - out[:120, :, 0].astype(int) > 100).any()


def test_map_drawer_saves_png(tmp_path):
    rng = np.random.default_rng(1)
    m, _ = _tiny_map(rng)
    path = tmp_path / "map.png"
    MapDrawer(m).save(str(path), current_pose=(np.eye(3, dtype=np.float32),
                                               np.zeros(3, np.float32)),
                      trajectory=np.zeros((5, 3), np.float32))
    assert path.exists() and path.stat().st_size > 1000
