import time, numpy as np, sys
sys.path.insert(0, "tests")
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
import orb_slam3_study_kr_tpu.pipeline.tracking as tmod
import collections
acc = collections.defaultdict(list)
def wrap(cls, name):
    orig = getattr(cls, name)
    def f(self, *a, **k):
        t0 = time.perf_counter(); r = orig(self, *a, **k)
        acc[name].append(time.perf_counter()-t0); return r
    setattr(cls, name, f)
for n in ("_track_fused_frame","_track_motion_model","_track_local_map","_track_reference_kf"):
    wrap(tmod.MonoTracker, n)
rng = np.random.default_rng(5)
world = synthetic.make_textured_world(rng)
n = 48
R, t = synthetic.lateral_trajectory(n, x_span=1.0)
slam = SlamSystem(SystemConfig(sensor="mono", async_mapping=False))
for i in range(n):
    img = synthetic.render_textured(world, R[i], t[i], rng=rng)
    slam.track_monocular(img, i * 0.05)
print("stats", {k:v for k,v in slam.tracker.stats.items() if v})
for k, v in sorted(acc.items(), key=lambda kv: -sum(kv[1])):
    v=np.array(v)*1e3; h=v[len(v)//2:]
    print(f"{k:22s} n={len(v):3d} med={np.median(v):7.1f} warm_med={np.median(h):7.1f} max={v.max():8.1f}")
