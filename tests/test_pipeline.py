"""End-to-end monocular SLAM integration tests (SURVEY.md section 4 oracle:
run a sequence, save the trajectory, score RMS ATE).

Thresholds reflect measured round-5 behavior on these synthetic worlds
(see NOTES.md): the flow-anchored pose pre-solve + tight sanity gate cut
the lateral-world scale-aligned ATE to 0.016-0.037 over 6 seeds (the
round-1 association layer cost ~10% relative drift); oracle-association
runs score at the millimeter level, so the walls tighten further as the
matcher improves."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig, TrackState


def _run(slam, world_or_scene, R_gt, t_gt, textured, rng):
    n = R_gt.shape[0]
    for i in range(n):
        if textured:
            img = synthetic.render_textured(world_or_scene, R_gt[i], t_gt[i], rng=rng)
        else:
            img, _, _ = synthetic.render(world_or_scene, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    rows = slam.trajectory()
    centers = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    rmse, nm, s = ate_rmse(rows[:, 0], rows[:, 1:4], np.arange(n) * 0.1, centers, True)
    return rows, rmse, nm


def test_mono_slam_smoke():
    """QUICK-tier end-to-end wall (runs in `-m "not slow"`): a short mono
    sequence must initialize, track every frame, and stay under a loose
    scale-aligned ATE bound.  The tight walls live in the slow tier."""
    rng = np.random.default_rng(1)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n_frames = 18
    R_gt, t_gt = synthetic.lateral_trajectory(n_frames, x_span=0.5,
                                              z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    _, rmse, nm = _run(slam, world, R_gt, t_gt, True, rng)
    assert slam.state == TrackState.OK, slam.stats()
    assert nm > 10
    assert rmse < 0.05, f"smoke ATE {rmse:.4f}"


@pytest.mark.slow
def test_mono_slam_textured_lateral(tmp_path):
    """Viewpoint-stable lateral translation through a textured corridor
    corner — the representative mono-SLAM regime."""
    rng = np.random.default_rng(1)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n_frames = 40
    R_gt, t_gt = synthetic.lateral_trajectory(n_frames, x_span=1.0, z_span=0.0,
                                              y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    rows, rmse, nm = _run(slam, world, R_gt, t_gt, True, rng)
    stats = slam.stats()
    assert slam.state == TrackState.OK, stats
    assert stats["n_kf"] >= 3, stats
    assert nm > 25
    # Tightened round 5 (flow pre-solve + tight sanity gate): measured
    # 0.016-0.037 scale-aligned over 6 seeds (mean 0.023, NOTES.md).
    assert rmse < 0.06, f"ATE {rmse:.4f} m over {nm} frames ({stats})"

    path = tmp_path / "traj.txt"
    slam.save_trajectory_tum(path)
    lines = path.read_text().strip().splitlines()
    assert len(lines) == rows.shape[0]
    assert len(lines[0].split()) == 8


@pytest.mark.slow
def test_mono_slam_blob_orbit_robustness():
    """Adversarial blob-field orbit (low parallax, then strong viewpoint
    rotation): the system must keep tracking or recover — never end LOST —
    and stay within loose accuracy bounds."""
    rng = np.random.default_rng(5)
    scene = synthetic.make_scene(rng, n_points=700)
    n_frames = 30
    R_gt, t_gt = synthetic.circular_trajectory(n_frames, radius=1.2, span=0.35)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    rows, rmse, nm = _run(slam, scene, R_gt, t_gt, False, rng)
    stats = slam.stats()
    assert slam.state in (TrackState.OK, TrackState.RECENTLY_LOST), stats
    assert stats["n_kf"] >= 2
    assert nm >= 15, f"only {nm} evaluated frames"
    assert rmse < 0.25, f"ATE {rmse:.4f} over {nm} frames ({stats})"
