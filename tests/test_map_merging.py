"""Atlas map merging (pipeline/map_merging.py).

Oracle: two MapStates describe the same synthetic scene in different world
gauges (known Sim3 apart).  Shared landmarks carry identical descriptors, so
cross-map place verification must recover the Sim3, and the weld must bring
map A's keyframes/landmarks into map B's gauge with bindings remapped and
verified duplicates fused.
"""

import numpy as np

from orb_slam3_study_kr_tpu.pipeline.map_merging import MapMerger
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _project(K, R, t, X):
    p = X @ R.T + t
    return (p[:, :2] / p[:, 2:3]) @ K[:2, :2].T + K[:2, 2]


def _build_pair(rng, sigma=0.7, n_pts=120):
    cfg = TrackerConfig()
    K = np.asarray(cfg.K)
    X = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                  rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    desc = (rng.random((n_pts, 256)) > 0.5).astype(np.uint8)

    # Gauge of map B: world_B = sigma * Rg @ world_A + tg.
    Rg = _rot_z(0.4)
    tg = np.array([0.3, -0.2, 0.1], np.float32)
    X_B = sigma * X @ Rg.T + tg

    # Physical cameras in gauge A; gauge-B poses are the same cameras
    # re-expressed: R_B = R_A Rg^T, c_B = sigma Rg c_A + tg (identical
    # projections up to the uniform camera-frame scale sigma).
    def cams(n_kf):
        out = []
        for k in range(n_kf):
            R = _rot_z(0.03 * k).astype(np.float32)
            c = np.array([0.2 * k, 0.05 * k, -0.1 * k], np.float32)
            out.append((R, c))
        return out

    def make_map(Xw, poses):
        m = MapState(max_kf=16, max_kp=n_pts, max_lm=1024)
        ids = m.add_landmarks(Xw, desc, 0)
        for k, (R, c) in enumerate(poses):
            t = (-R @ c).astype(np.float32)
            uv = _project(K, R, t, Xw).astype(np.float32)
            m.add_keyframe(R, t, uv, np.zeros(n_pts, np.int32),
                           np.zeros(n_pts, np.float32),
                           np.ones(n_pts, bool), desc, k, float(k),
                           kp_lm=ids.astype(np.int32))
        return m, ids

    poses_A = cams(3)
    poses_B = [((R @ Rg.T).astype(np.float32),
                (sigma * Rg @ c + tg).astype(np.float32))
               for R, c in poses_A]
    mA, idsA = make_map(X, poses_A)
    mB, idsB = make_map(X_B, poses_B)
    return cfg, mA, mB, idsA, idsB, sigma, Rg, tg


def test_merge_recovers_gauge_and_transfers():
    rng = np.random.default_rng(0)
    cfg, mA, mB, idsA, idsB, sigma, Rg, tg = _build_pair(rng)
    merger = MapMerger(cfg=cfg)

    sim3 = merger.verify(mA, 0, mB, 0, fix_scale=False)
    assert sim3 is not None, "cross-map verification failed"

    n_kf_B0, n_lm_B0 = mB.n_kf, int(mB.lm_valid.sum())
    res = merger.merge(mA, 0, mB, 0, sim3)
    assert res is not None
    assert abs(res.sigma - sigma) < 0.05 * sigma, res.sigma

    # All of A's keyframes transferred.
    assert mB.n_kf == n_kf_B0 + 3
    # Verified duplicates fused: the landmark count must grow by (almost)
    # nothing since every A landmark has a B counterpart.
    assert int(mB.lm_valid.sum()) <= n_lm_B0 + 12

    # Transferred keyframe poses agree with B's own keyframes observing the
    # same scene: compare camera centers of A-kf0 (transferred) and B-kf0.
    jA = res.kf_map[0]
    cA = -mB.kf_R[jA].T @ mB.kf_t[jA]
    cB = -mB.kf_R[0].T @ mB.kf_t[0]
    assert np.linalg.norm(cA - cB) < 0.05 * max(np.linalg.norm(cB), 1.0), (cA, cB)

    # Bindings of transferred keyframes point at live B landmarks.
    lm = mB.kf_kp_lm[jA]
    ok = lm != NO_LM
    assert ok.sum() > 100
    assert mB.lm_valid[lm[ok]].all()


def test_merge_grows_capacity():
    """A merge into a full target map grows the SoA tables instead of
    refusing (reference semantics: dynamic containers never refuse,
    KeyFrame.cc lifecycle; VERDICT round 4 #5)."""
    rng = np.random.default_rng(1)
    cfg, mA, mB, *_ = _build_pair(rng)
    merger = MapMerger(cfg=cfg)
    sim3 = merger.verify(mA, 0, mB, 0)
    assert sim3 is not None
    mB.next_kf = mB.max_kf  # no headroom left in the target allocator
    old_cap = mB.max_kf
    res = merger.merge(mA, 0, mB, 0, sim3)
    assert res is not None
    assert res.target_map.max_kf > old_cap
    # Every transferred keyframe landed in a live slot.
    assert all(res.target_map.kf_valid[j] for j in res.kf_map.values())


def test_inertial_merge_preserves_gravity():
    """MergeLocal2 semantics: welding two IMU-initialized (gravity-aligned,
    metric) maps must use a yaw-only rotation at unit scale
    (/root/reference/src/LoopClosing.cc:1786-2069), whatever small off-yaw
    component the Sim3 RANSAC estimate carries."""
    rng = np.random.default_rng(7)
    cfg, mA, mB, idsA, idsB, sigma, Rg, tg = _build_pair(rng, sigma=1.0)
    mA.imu_initialized = True
    mB.imu_initialized = True
    merger = MapMerger(cfg=cfg)

    sim3 = merger.verify(mA, 0, mB, 0, fix_scale=True)
    assert sim3 is not None
    res = merger.merge(mA, 0, mB, 0, sim3)
    assert res is not None
    # Yaw-only about the (gravity-aligned) z axis, metric scale kept.
    assert res.sigma == 1.0
    R = res.R_BA
    np.testing.assert_allclose(R[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # The weld still lands map A's keyframes on their map-B counterparts.
    mBm = res.target_map
    for a, j in res.kf_map.items():
        cA_new = -mBm.kf_R[j].T @ mBm.kf_t[j]
        cB_ref = -mB.kf_R[a].T @ mB.kf_t[a]  # B's own copy of the same cam
        np.testing.assert_allclose(cA_new, cB_ref, atol=0.05)
