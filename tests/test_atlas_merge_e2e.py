"""End-to-end Atlas merge: lose tracking (blackout), spawn a second map,
revisit the first map's region, and verify the maps weld back together
(reference behavior: CreateMapInAtlas on loss + MergeLocal on revisit).
"""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig


@pytest.mark.slow
def test_blackout_spawns_map_then_merge():
    rng = np.random.default_rng(3)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n_seg = 26
    R_gt, t_gt = synthetic.lateral_trajectory(n_seg, x_span=1.0, z_span=0.0,
                                              y_amp=0.0)
    blackout = 14

    slam = SlamSystem(SystemConfig(
        tracker=TrackerConfig(fps=10), vocab_min_kfs=4, min_kf_spawn=6))
    ts = 0.0
    # Segment 1: frames 0..n_seg-1.
    for i in range(n_seg):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, ts)
        ts += 0.1
    assert len(slam.atlas.maps) == 1
    n_kf_1 = slam.atlas.active_map.n_kf
    assert n_kf_1 >= 4

    # Blackout: featureless noise until sustained loss spawns a new map.
    for _ in range(blackout):
        img = rng.uniform(0, 8, (480, 752)).astype(np.float32)
        slam.track_monocular(img, ts)
        ts += 0.1
    assert len(slam.atlas.maps) >= 2, "blackout must spawn a fresh map"

    # Segment 2: replay the same path — the new map initializes on the same
    # scene, and place recognition against the stored map must weld them.
    merged = False
    for i in range(n_seg):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, ts)
        ts += 0.1
        if len(slam.atlas.maps) == 1:
            merged = True
    stats = slam.stats()
    assert merged, (
        f"maps never merged: {len(slam.atlas.maps)} maps, "
        f"merger={slam.merger.stats if slam.merger else None}, {stats}")
    # The merged map must retain both sessions' keyframes.
    assert slam.atlas.active_map.n_kf > n_kf_1

    # Trajectory replay spans both segments in one gauge; ATE stays sane.
    rows = slam.trajectory()
    gt_ts = np.concatenate([np.arange(n_seg) * 0.1,
                            (n_seg + blackout) * 0.1 + np.arange(n_seg) * 0.1])
    centers = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    gt_xyz = np.concatenate([centers, centers])
    rmse, nm, _ = ate_rmse(rows[:, 0], rows[:, 1:4], gt_ts, gt_xyz,
                           with_scale=True)
    assert nm > 25
    assert rmse < 0.25, f"post-merge ATE {rmse:.3f} over {nm}"
