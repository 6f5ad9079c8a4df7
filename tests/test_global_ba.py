"""Global bundle adjustment (Optimizer::GlobalBundleAdjustemnt role,
pipeline/global_ba.py): whole-map refinement must pull noisy keyframe poses
and landmarks back to the ground truth from pixel observations."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_study_kr_tpu.pipeline.global_ba import global_bundle_adjustment
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


@pytest.fixture()
def noisy_map():
    cfg = TrackerConfig()
    rng = np.random.default_rng(7)
    n_kf, n_lm, max_kp = 8, 400, 512
    X_gt = rng.uniform([-3, -2, 5], [3, 2, 10], (n_lm, 3)).astype(np.float32)
    m = MapState(max_kf=16, max_kp=max_kp, max_lm=4096)
    lm_ids = m.add_landmarks(
        X_gt + rng.normal(0, 0.05, X_gt.shape).astype(np.float32),
        rng.integers(0, 2, (n_lm, 256)).astype(np.uint8), first_kf=0)
    R_gt, t_gt = [], []
    for k in range(n_kf):
        R = _rot_y(0.03 * k)
        t = np.array([0.25 * k, 0.02 * k, 0], np.float32)
        R_gt.append(R)
        t_gt.append(t)
        # Noisy pose for every keyframe but the two gauge anchors.
        Rn, tn = R, t
        if k >= 2:
            dR = _rot_y(rng.normal(0, 0.01))
            Rn = (dR @ R).astype(np.float32)
            tn = (t + rng.normal(0, 0.03, 3)).astype(np.float32)
        # Observations: exact projections of the TRUE geometry.
        pc = X_gt @ R.T + t
        uv = np.stack([cfg.fx * pc[:, 0] / pc[:, 2] + cfg.cx,
                       cfg.fy * pc[:, 1] / pc[:, 2] + cfg.cy], -1)
        uv_full = np.zeros((max_kp, 2), np.float32)
        uv_full[:n_lm] = uv
        valid = np.zeros(max_kp, bool)
        valid[:n_lm] = True
        kp_lm = np.full(max_kp, NO_LM, np.int32)
        kp_lm[:n_lm] = lm_ids
        m.add_keyframe(Rn, tn, uv_full, np.zeros(max_kp, np.int32),
                       np.zeros(max_kp, np.float32), valid,
                       rng.integers(0, 2, (max_kp, 256)).astype(np.uint8),
                       frame_id=k, timestamp=0.1 * k, kp_lm=kp_lm)
    return cfg, m, np.stack(R_gt), np.stack(t_gt), X_gt, lm_ids


def test_global_ba_recovers_geometry(noisy_map):
    cfg, m, R_gt, t_gt, X_gt, lm_ids = noisy_map
    err_before = np.linalg.norm(m.kf_t[: R_gt.shape[0]] - t_gt, axis=1).max()
    assert global_bundle_adjustment(cfg, m, n_iters=12)
    kfs = np.arange(R_gt.shape[0])
    t_err = np.linalg.norm(m.kf_t[kfs] - t_gt, axis=1).max()
    R_err = np.array([np.linalg.norm(m.kf_R[k] - R_gt[k]) for k in kfs]).max()
    assert t_err < 1e-3, f"pose error {t_err} (before {err_before})"
    assert R_err < 1e-3
    lm_err = np.linalg.norm(m.lm_pos[lm_ids] - X_gt, axis=1)
    assert np.median(lm_err) < 1e-3


def test_global_ba_skips_tiny():
    cfg = TrackerConfig()
    m = MapState(max_kf=8, max_kp=64, max_lm=256)
    assert not global_bundle_adjustment(cfg, m)  # empty map


def test_global_ba_large_map_uses_pcg(noisy_map):
    """Maps past the dense cross-block budget no longer skip GBA: the
    matrix-free PCG assembly must recover the same geometry."""
    from orb_slam3_study_kr_tpu.pipeline import global_ba as gba
    cfg, m, R_gt, t_gt, X_gt, lm_ids = noisy_map
    old = gba.DENSE_CROSS_BLOCK_FLOATS
    try:
        gba.DENSE_CROSS_BLOCK_FLOATS = 1  # force the PCG path
        assert global_bundle_adjustment(cfg, m, n_iters=12)
    finally:
        gba.DENSE_CROSS_BLOCK_FLOATS = old
    kfs = np.arange(R_gt.shape[0])
    t_err = np.linalg.norm(m.kf_t[kfs] - t_gt, axis=1).max()
    assert t_err < 1e-3, f"pose error {t_err}"
    lm_err = np.linalg.norm(m.lm_pos[lm_ids] - X_gt, axis=1)
    assert np.median(lm_err) < 1e-3
