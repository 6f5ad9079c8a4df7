"""Keyframe culling (LocalMapping::KeyFrameCulling, LocalMapping.cc:932) and
culled-keyframe trajectory redirects (System.cc:595-627 spanning-tree climb)."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.pipeline.local_mapping import LocalMapper
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _build_map(n_kf=6, n_lm=120, max_kp=256):
    """Every keyframe observes every landmark at level 0 -> all middle
    keyframes are fully redundant under the 90% rule."""
    rng = np.random.default_rng(3)
    m = MapState(max_kf=16, max_kp=max_kp, max_lm=4096)
    X = rng.uniform([-2, -2, 4], [2, 2, 8], (n_lm, 3)).astype(np.float32)
    lm_ids = m.add_landmarks(X, rng.integers(0, 2, (n_lm, 256)).astype(np.uint8),
                             first_kf=0)
    for k in range(n_kf):
        R = _rot_y(0.02 * k)
        t = np.array([0.1 * k, 0, 0], np.float32)
        uv = rng.uniform(0, 400, (max_kp, 2)).astype(np.float32)
        valid = np.zeros(max_kp, bool)
        valid[:n_lm] = True
        kp_lm = np.full(max_kp, NO_LM, np.int32)
        kp_lm[:n_lm] = lm_ids
        m.add_keyframe(R, t, uv, np.zeros(max_kp, np.int32),
                       np.zeros(max_kp, np.float32), valid,
                       rng.integers(0, 2, (max_kp, 256)).astype(np.uint8),
                       frame_id=k, timestamp=0.1 * k, kp_lm=kp_lm)
    return m


def test_redundant_keyframes_are_culled():
    m = _build_map()
    culled = []
    mapper = LocalMapper(cfg=None, map=m, on_kf_culled=culled.append)
    n_before = m.n_kf
    mapper._cull_keyframes(m.next_kf - 1)
    assert mapper.stats["n_kf_culled"] > 0
    assert m.n_kf == n_before - mapper.stats["n_kf_culled"]
    # Gauge anchors and the processed keyframe survive.
    assert m.kf_valid[0] and m.kf_valid[1] and m.kf_valid[m.next_kf - 1]
    for c in culled:
        assert not m.kf_valid[c]
        assert m.kf_redirect[c] >= 0
        # All landmark bindings erased.
        assert (m.kf_kp_lm[c] == NO_LM).all()


def test_redirect_replay_is_exact():
    m = _build_map()
    c = 3
    # A "frame" expressed relative to keyframe c before the cull.
    R_f = _rot_y(0.3)
    t_f = np.array([0.5, 0.1, -0.2], np.float32)
    Rrel = (R_f @ m.kf_R[c].T).astype(np.float32)
    trel = (t_f - Rrel @ m.kf_t[c]).astype(np.float32)

    mapper = LocalMapper(cfg=None, map=m)
    mapper._cull_keyframes(m.next_kf - 1)
    assert not m.kf_valid[c], "expected keyframe 3 to be redundant"

    ref, Rr, tr = m.resolve_kf(c, Rrel, trel)
    assert ref >= 0 and m.kf_valid[ref]
    R_re = Rr @ m.kf_R[ref]
    t_re = Rr @ m.kf_t[ref] + tr
    np.testing.assert_allclose(R_re, R_f, atol=1e-5)
    np.testing.assert_allclose(t_re, t_f, atol=1e-5)


def test_redirect_chain_composes():
    m = _build_map()
    # Manually cull a chain 4 -> 3 -> 2 and resolve through both hops.
    R_f = _rot_y(-0.15)
    t_f = np.array([0.0, 0.3, 0.7], np.float32)
    Rrel = (R_f @ m.kf_R[4].T).astype(np.float32)
    trel = (t_f - Rrel @ m.kf_t[4]).astype(np.float32)
    m.cull_keyframe(3, 2)
    m.cull_keyframe(4, 3)
    ref, Rr, tr = m.resolve_kf(4, Rrel, trel)
    assert ref == 2
    np.testing.assert_allclose(Rr @ m.kf_R[2], R_f, atol=1e-5)
    np.testing.assert_allclose(Rr @ m.kf_t[2] + tr, t_f, atol=1e-5)


def test_dead_end_chain_returns_invalid():
    m = _build_map()
    m.kf_valid[2] = False  # destroyed without redirect (map reset)
    m.cull_keyframe(3, 2)
    ref, _, _ = m.resolve_kf(3, np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32))
    assert ref == -1


def test_inertial_culling_gap_gate():
    """Inertial-mode culling: endpoints of the temporal chain are never
    cullable, and a keyframe whose removal would stretch the welded IMU
    interval past the gap bound is kept (LocalMapping.cc:1023 density)."""
    from orb_slam3_study_kr_tpu.pipeline.local_mapping import LocalMapper
    from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig
    from orb_slam3_study_kr_tpu.slam_map.map_state import MapState

    m = MapState(max_kf=8, max_kp=4, max_lm=16)
    ts = [0.0, 0.5, 1.0, 4.0, 4.5]
    for i, t in enumerate(ts):
        uv = np.zeros((4, 2), np.float32)
        m.add_keyframe(np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32), uv,
                       np.zeros(4, np.int32), np.zeros(4, np.float32),
                       np.ones(4, bool), np.zeros((4, 256), np.uint8),
                       i, t)
    lm = LocalMapper(cfg=TrackerConfig(), map=m, inertial_mode=True)
    # Before the final inertial refinement (VIBA2): tight 0.5 s bound.
    assert not lm._inertial_cullable(1)   # 0.0 -> 1.0 weld: 1.0 s > 0.5
    m.imu_ba2 = True                      # mature bias: 3 s bound
    assert not lm._inertial_cullable(0)   # chain start
    assert not lm._inertial_cullable(4)   # chain end
    assert lm._inertial_cullable(1)       # 0.0 -> 1.0 weld: 1.0 s gap, ok
    assert not lm._inertial_cullable(2)   # 0.5 -> 4.0 weld: 3.5 s, too wide
    assert not lm._inertial_cullable(3)   # 1.0 -> 4.5 weld: 3.5 s, too wide
