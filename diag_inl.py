import sys, numpy as np
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
from test_pipeline import _run
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
import orb_slam3_study_kr_tpu.pipeline.tracking as tmod
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig

fused = sys.argv[1] == "1"
seed = 1
log = []
orig = tmod.MonoTracker._track
def patched(self, frame):
    r = orig(self, frame)
    log.append((frame.frame_id, int((frame.kp_lm != -1).sum()), frame.pose_ok))
    return r
tmod.MonoTracker._track = patched
rng = np.random.default_rng(seed)
world = synthetic.make_textured_world(rng, depth=6.0)
n = 40
R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.0, z_span=0.0, y_amp=0.0)
slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10, fused_frame=fused)))
rows, rmse, nm = _run(slam, world, R_gt, t_gt, True, rng)
print("fused" if fused else "split", "ATE", round(float(rmse),4))
print([x[1] for x in log])
print("stats", {k:v for k,v in slam.tracker.stats.items() if v and k not in ("n_frames",)})
