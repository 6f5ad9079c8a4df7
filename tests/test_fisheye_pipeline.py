"""Monocular fisheye (Kannala-Brandt) SLAM end to end — fisheye-NATIVE.

Keypoints stay in raw fisheye pixels, matching gates / pose-only GN / BA
edges project through the KB8 model, and triangulation runs on bearing
rays, so features past the old 75-degree virtual-pinhole crop contribute.
Reference parity target: KannalaBrandt8 support in Frame/Tracking/BA
(/root/reference/src/CameraModels/KannalaBrandt8.cpp,
OptimizableTypes.h:31-117)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_study_kr_tpu.cameras import kb8
from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import (TrackerConfig,
                                                      TrackState,
                                                      _kb8_central_virtual,
                                                      _ray_roundtrip_ok)

# TUM-VI 512x512 fisheye calibration (Examples/Monocular/TUM_512.yaml scale).
KB8 = (190.978, 190.973, 254.932, 256.897,
       0.00348238, 0.000715035, -0.00205323, 0.000202936)


def _cfg(**kw):
    return TrackerConfig(width=512, height=512, fx=KB8[0], fy=KB8[1],
                         cx=KB8[2], cy=KB8[3], dist=KB8[4:],
                         camera_model="kb8", **kw)


def test_kb8_native_config():
    cfg = _cfg()
    # project_fn is the KB8 model itself: it must round-trip raw pixels.
    uv = jnp.asarray([[256.0, 256.0], [300.0, 220.0], [40.0, 470.0]],
                     jnp.float32)
    rays = cfg.unproject_fn(uv)
    back = np.asarray(cfg.project_fn(rays))
    np.testing.assert_allclose(back, np.asarray(uv), atol=0.1)
    assert cfg.max_theta_deg is not None and cfg.max_theta_deg > 90.0


def test_kb8_central_virtual_mask():
    cfg = _cfg()
    # Pixels near the centre are inside the bootstrap cone; the extreme
    # corner (beyond 75 deg) is excluded from init but NOT from tracking.
    uv = jnp.asarray([[256.0, 256.0], [300.0, 220.0], [2.0, 2.0]],
                     jnp.float32)
    und, ok = _kb8_central_virtual(cfg.cam_params, cfg.ideal_params, uv,
                                   jnp.float32(cfg.fov_max_deg))
    ok = np.asarray(ok)
    assert ok[0] and ok[1]
    assert not ok[2]
    np.testing.assert_allclose(np.asarray(und)[0], [256.0, 256.0], atol=2.0)
    # The same corner pixel still unprojects consistently (stays a live
    # keypoint in the native pipeline).
    rt = np.asarray(_ray_roundtrip_ok(cfg.cam_params, uv))
    assert rt.all()


def test_wide_fov_projection_gate():
    """Landmarks >90 deg off-axis are visible to the fisheye frustum gate."""
    from orb_slam3_study_kr_tpu.ops.track_match import project_landmarks
    cfg = _cfg()
    # One landmark in front, one 95 deg off-axis (z < 0, toward the image
    # corner where the 512x512 sensor still sees it), one fully behind.
    th = np.radians(95.0)
    lm = jnp.asarray([
        [0.0, 0.0, 3.0],
        [3.0 * np.sin(th) * np.cos(np.pi / 4),
         3.0 * np.sin(th) * np.sin(np.pi / 4), 3.0 * np.cos(th)],
        [0.0, 0.0, -3.0]], jnp.float32)
    normal = lm / jnp.linalg.norm(lm, axis=-1, keepdims=True)
    ones = jnp.ones(3, jnp.float32)
    uv, vis, _, _ = project_landmarks(
        cfg.project_fn, jnp.eye(3), jnp.zeros(3),
        lm, normal, 0.1 * ones, 100.0 * ones, ones,
        cfg.width, cfg.height, max_theta_deg=cfg.max_theta_deg)
    vis = np.asarray(vis)
    assert vis[0] and vis[1]      # 100-deg point survives the theta gate
    assert not vis[2]             # 180-deg point does not


def test_triangulate_rays_wide_angle():
    """Ray DLT recovers a point at ~100 deg off-axis (x/z coords blow up)."""
    from orb_slam3_study_kr_tpu.ops.geometry import triangulate_rays
    rng = np.random.default_rng(0)
    X = np.array([[4.0, 0.3, -0.7], [0.2, 0.1, 5.0], [2.0, -2.0, 0.05]],
                 np.float32)
    R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    # Second camera translated along x.
    R2 = np.eye(3, dtype=np.float32)
    t2 = np.array([-0.5, 0.0, 0.0], np.float32)
    b1 = X @ R1.T + t1
    b2 = X @ R2.T + t2
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = b2 / np.linalg.norm(b2, axis=-1, keepdims=True)
    out = np.asarray(triangulate_rays(
        jnp.asarray(b1), jnp.asarray(b2),
        jnp.asarray(R1)[None], jnp.asarray(t1)[None],
        jnp.asarray(R2)[None], jnp.asarray(t2)[None]))
    np.testing.assert_allclose(out, X, atol=1e-3)


def test_fisheye_stereo_matching():
    """ComputeStereoFishEyeMatches parity: synthetic KB8 rig, known depth."""
    from orb_slam3_study_kr_tpu.ops.fisheye_stereo import match_stereo_fisheye
    rng = np.random.default_rng(3)
    n = 128
    params = jnp.asarray(KB8 + (0.0,), jnp.float32)
    # Points across the full FOV, including >90 deg off-axis.
    theta = rng.uniform(0.0, np.radians(95.0), n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(1.0, 6.0, n)
    X = np.stack([np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
                  np.cos(theta)], -1) * r[:, None]
    X = X.astype(np.float32)
    R_rl = np.eye(3, dtype=np.float32)
    t_rl = np.array([-0.1, 0.0, 0.0], np.float32)
    uv_l = np.asarray(kb8.project(params, jnp.asarray(X)))
    p_r = X @ R_rl.T + t_rl
    uv_r = np.asarray(kb8.project(params, jnp.asarray(p_r)))
    in_l = ((uv_l > 2) & (uv_l < 510)).all(-1)
    in_r = ((uv_r > 2) & (uv_r < 510)).all(-1)
    valid = in_l & in_r
    desc = (rng.random((n, 256)) < 0.5).astype(np.uint8)
    level = np.zeros(n, np.int32)
    angle = np.zeros(n, np.float32)
    b_l = kb8.unproject(params, jnp.asarray(uv_l))
    b_r = kb8.unproject(params, jnp.asarray(uv_r))
    import functools
    proj = functools.partial(kb8.project, params)
    out = match_stereo_fisheye(
        proj, proj, jnp.float32(KB8[0]),
        jnp.asarray(R_rl), jnp.asarray(t_rl),
        jnp.asarray(uv_l), b_l, jnp.asarray(level), jnp.asarray(desc),
        jnp.asarray(valid), jnp.asarray(angle),
        jnp.asarray(uv_r), b_r, jnp.asarray(level), jnp.asarray(desc),
        jnp.asarray(valid), jnp.asarray(angle),
    )
    ok = np.asarray(out["ok"])
    idx = np.asarray(out["idx_r"])
    Xh = np.asarray(out["X"])
    assert ok.sum() >= 0.8 * valid.sum(), (ok.sum(), valid.sum())
    assert (idx[ok] == np.nonzero(ok)[0]).mean() > 0.95  # identity matching
    err = np.linalg.norm(Xh[ok] - X[ok], axis=-1)
    assert np.median(err) < 0.05, np.median(err)
    # Wide-angle points (>90 deg) are among the accepted set.
    wide = ok & (theta > np.radians(90.0))
    assert wide.any()


@pytest.mark.slow
def test_mono_fisheye_slam():
    rng = np.random.default_rng(5)
    world = synthetic.make_textured_world(
        np.random.default_rng(8), width=512, height=512, depth=6.0,
        kb8_params=KB8)
    n = 30
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.0, z_span=0.0,
                                              y_amp=0.05)
    cfg = _cfg(fps=10)
    slam = SlamSystem(SystemConfig(tracker=cfg))
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.state == TrackState.OK, slam.stats()
    rows = slam.trajectory()
    cen = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n) * 0.1,
                           cen, with_scale=True)
    assert nm > 20
    assert rmse < 0.2, f"fisheye ATE {rmse:.4f} over {nm} frames"
    # Native FOV: at least one bound observation sits beyond the old
    # 75-degree virtual-pinhole crop.
    m = slam.atlas.active_map
    tr = slam.tracker
    max_theta = 0.0
    for kf in np.nonzero(m.kf_valid)[0]:
        sel = m.kf_kp_lm[kf] != -1
        if not sel.any():
            continue
        rays = np.asarray(tr.cfg.unproject_fn(
            jnp.asarray(m.kf_kp_uv[kf][sel])))
        th = np.degrees(np.arctan2(
            np.linalg.norm(rays[:, :2], axis=-1), rays[:, 2]))
        max_theta = max(max_theta, float(th.max()))
    assert max_theta > 75.0, f"no observation beyond 75 deg ({max_theta:.1f})"


@pytest.mark.slow
def test_stereo_fisheye_slam():
    """Non-rectified KB8 stereo rig end to end (the TUM-VI configuration):
    FisheyeStereoTracker initializes immediately from triangulated stereo
    points and tracks at metric scale."""
    rng = np.random.default_rng(9)
    world = synthetic.make_textured_world(
        np.random.default_rng(8), width=512, height=512, depth=6.0,
        kb8_params=KB8)
    n = 25
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=0.9, z_span=0.0,
                                              y_amp=0.05)
    t_rl = np.array([-0.10, 0.0, 0.0], np.float32)
    cfg = _cfg(fps=10)
    slam = SlamSystem(SystemConfig(
        sensor="stereo", tracker=cfg, stereo_t_rl=tuple(t_rl)))
    for i in range(n):
        img_l = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        img_r = synthetic.render_textured(
            world, R_gt[i], t_gt[i] + t_rl, rng=rng)
        slam.track_stereo(img_l, img_r, i * 0.1)
    assert slam.state == TrackState.OK, slam.stats()
    rows = slam.trajectory()
    cen = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    # Metric: no scale alignment allowed.
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n) * 0.1,
                           cen, with_scale=False)
    assert nm > 15
    assert rmse < 0.25, f"fisheye stereo ATE {rmse:.4f} over {nm} frames"
