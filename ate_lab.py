import sys, numpy as np
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
from test_pipeline import _run
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig

kw = eval(sys.argv[1]) if len(sys.argv) > 1 else {}
mapper_kw = eval(sys.argv[2]) if len(sys.argv) > 2 else {}
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1
rng = np.random.default_rng(seed)
world = synthetic.make_textured_world(rng, depth=6.0)
n = 40
R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.0, z_span=0.0, y_amp=0.0)
slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10, **kw)))
for k, v in mapper_kw.items():
    setattr(slam.local_mapper, k, v)
rows, rmse, nm = _run(slam, world, R_gt, t_gt, True, rng)
print("ATE", round(float(rmse),4), "frames", nm, "kf", slam.stats()["n_kf"], "kw", kw, mapper_kw, "seed", seed)
