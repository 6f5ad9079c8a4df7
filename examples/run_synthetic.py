"""End-to-end monocular SLAM demo on a synthetic textured world.

The offline stand-in for the reference's Examples/Monocular/mono_euroc
driver: render a sequence, run the full pipeline (ORB -> tracking ->
mapping -> loop machinery), save a TUM trajectory, and score RMS ATE
against ground truth.

    python examples/run_synthetic.py [n_frames] [out.txt] [--viz DIR]
"""

import sys

import numpy as np

from orb_slam3_study_kr_tpu.evaluation import ate_rmse
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 40
    out_path = args[1] if len(args) > 1 else "trajectory_tum.txt"
    viz_dir = None
    if "--viz" in sys.argv:
        viz_dir = sys.argv[sys.argv.index("--viz") + 1]

    rng = np.random.default_rng(1)
    world = synthetic.make_textured_world(rng, depth=6.0)
    R_gt, t_gt = synthetic.lateral_trajectory(n_frames, x_span=1.0,
                                              z_span=0.0, y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    viewer = None
    if viz_dir:
        from orb_slam3_study_kr_tpu.viz import SessionViewer
        viewer = SessionViewer(slam, viz_dir, stride=5)
    for i in range(n_frames):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        f = slam.track_monocular(img, i * 0.1)
        if viewer is not None:
            viewer.update(img, f)
        print(f"frame {i:3d}  {slam.state.name:15s} matches={f.n_matches:4d} "
              f"kf={slam.stats()['n_kf']:3d} lm={slam.stats()['n_lm']:5d}")

    slam.save_trajectory_tum(out_path)
    rows = slam.trajectory()
    centers = -np.einsum("nij,nj->ni", R_gt.transpose(0, 2, 1), t_gt)
    rmse, n, s = ate_rmse(rows[:, 0], rows[:, 1:4],
                          np.arange(n_frames) * 0.1, centers, with_scale=True)
    print(f"\ntrajectory: {out_path} ({rows.shape[0]} poses)")
    print(f"RMS ATE: {rmse:.4f} m over {n} frames (scale {s:.3f})")
    print()
    slam.print_time_stats()
    print()
    print("stats:", slam.stats())


if __name__ == "__main__":
    main()
