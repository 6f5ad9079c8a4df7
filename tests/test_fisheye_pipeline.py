"""Monocular fisheye (Kannala-Brandt) SLAM end to end.

The tracker unprojects KB8 keypoints onto a virtual ideal-pinhole image
(TrackerConfig.camera_model="kb8"); the whole downstream pipeline then runs
on ideal coordinates.  Reference parity target: KannalaBrandt8 support in
Frame/Tracking (/root/reference/src/CameraModels/KannalaBrandt8.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import (TrackerConfig,
                                                      TrackState,
                                                      _undistort_kb8)

# TUM-VI 512x512 fisheye calibration (Examples/Monocular/TUM_512.yaml scale).
KB8 = (190.978, 190.973, 254.932, 256.897,
       0.00348238, 0.000715035, -0.00205323, 0.000202936)


def test_kb8_undistortion_validity():
    cfg = TrackerConfig(width=512, height=512, fx=KB8[0], fy=KB8[1],
                        cx=KB8[2], cy=KB8[3], dist=KB8[4:],
                        camera_model="kb8")
    # Pixels near the centre are valid; the extreme corner (far beyond the
    # 75 deg gate) is rejected.
    uv = jnp.asarray([[256.0, 256.0], [300.0, 220.0], [2.0, 2.0]],
                     jnp.float32)
    und, ok = _undistort_kb8(cfg.cam_params, cfg.ideal_params, uv,
                             jnp.float32(cfg.fov_max_deg))
    ok = np.asarray(ok)
    assert ok[0] and ok[1]
    assert not ok[2]
    # The centre pixel maps to the ideal principal point.
    np.testing.assert_allclose(np.asarray(und)[0], [256.0, 256.0], atol=2.0)


@pytest.mark.slow
def test_mono_fisheye_slam():
    rng = np.random.default_rng(5)
    world = synthetic.make_textured_world(
        np.random.default_rng(8), width=512, height=512, depth=6.0,
        kb8_params=KB8)
    n = 30
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.0, z_span=0.0,
                                              y_amp=0.05)
    cfg = TrackerConfig(width=512, height=512, fx=KB8[0], fy=KB8[1],
                        cx=KB8[2], cy=KB8[3], dist=KB8[4:],
                        camera_model="kb8", fps=10)
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
