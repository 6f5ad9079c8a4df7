"""End-to-end stereo and RGB-D SLAM integration tests.

The stereo/RGB-D paths (reference Tracking::GrabImageStereo / GrabImageRGBD,
StereoInitialization Tracking.cc:2356) recover *metric* scale, so ATE is
scored WITHOUT Horn scale correction and the recovered scale factor itself
is asserted close to 1.
"""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState

BASELINE = 0.11


def _gt_centers(R_gt, t_gt):
    return -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)


@pytest.mark.slow
def test_stereo_slam_textured_lateral(tmp_path):
    """Rectified stereo through the textured corridor corner: immediate
    metric initialization, scale factor ~1, metric ATE bound."""
    rng = np.random.default_rng(3)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n_frames = 30
    R_gt, t_gt = synthetic.lateral_trajectory(n_frames, x_span=1.0,
                                              z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(
        sensor="stereo", baseline=BASELINE,
        tracker=TrackerConfig(fps=10)))
    for i in range(n_frames):
        imgL = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        _, t_r = synthetic.stereo_right_pose(R_gt[i], t_gt[i], BASELINE)
        imgR = synthetic.render_textured(world, R_gt[i], t_r, rng=rng)
        slam.track_stereo(imgL, imgR, i * 0.1)
    stats = slam.stats()
    assert slam.state == TrackState.OK, stats

    rows = slam.trajectory()
    rmse, nm, s = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n_frames) * 0.1,
                           _gt_centers(R_gt, t_gt), with_scale=False)
    assert nm > 20
    assert rmse < 0.15, f"metric ATE {rmse:.4f} m over {nm} frames ({stats})"
    # The recovered map scale must be metric (within ~5%).
    _, _, s_fit = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n_frames) * 0.1,
                           _gt_centers(R_gt, t_gt), with_scale=True)
    assert abs(s_fit - 1.0) < 0.10, f"scale {s_fit:.3f} not metric"

    path = tmp_path / "traj.txt"
    slam.save_trajectory_tum(path)
    assert len(path.read_text().strip().splitlines()) == rows.shape[0]


@pytest.mark.slow
def test_rgbd_slam_textured():
    """RGB-D: rendered depth maps stand in for the depth sensor."""
    rng = np.random.default_rng(7)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n_frames = 20
    R_gt, t_gt = synthetic.lateral_trajectory(n_frames, x_span=0.7,
                                              z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(
        sensor="rgbd", baseline=BASELINE,
        tracker=TrackerConfig(fps=10)))
    for i in range(n_frames):
        img, depth = synthetic.render_textured(world, R_gt[i], t_gt[i],
                                               rng=rng, return_depth=True)
        depth = np.where(np.isfinite(depth), depth, 0.0)
        slam.track_rgbd(img, depth, i * 0.1)
    stats = slam.stats()
    assert slam.state == TrackState.OK, stats
    rows = slam.trajectory()
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n_frames) * 0.1,
                           _gt_centers(R_gt, t_gt), with_scale=False)
    assert nm > 12
    assert rmse < 0.15, f"metric ATE {rmse:.4f} m over {nm} frames ({stats})"
