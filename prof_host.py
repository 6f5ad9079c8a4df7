import time, collections, numpy as np
import orb_slam3_study_kr_tpu.pipeline.local_mapping as lmod
import orb_slam3_study_kr_tpu.slam_map.map_state as msmod
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
acc = collections.defaultdict(list)
def wrap(cls, name):
    orig = getattr(cls, name)
    def f(self, *a, **k):
        t0 = time.perf_counter(); r = orig(self, *a, **k)
        acc[name].append(time.perf_counter()-t0); return r
    setattr(cls, name, f)
for n in ("_triangulation_dispatch","_triangulation_apply","_fuse_dispatch","_fuse_apply","_local_ba_assemble","_local_ba_apply"):
    wrap(lmod.LocalMapper, n)
wrap(msmod.MapState, "update_landmark_stats")
rng = np.random.default_rng(5)
world = synthetic.make_textured_world(rng)
n = 40
R, t = synthetic.lateral_trajectory(n, x_span=0.9)
slam = SlamSystem(SystemConfig(sensor="mono", async_mapping=False))
for i in range(n):
    img = synthetic.render_textured(world, R[i], t[i], rng=rng)
    slam.track_monocular(img, i * 0.05)
for k, v in sorted(acc.items(), key=lambda kv: -sum(kv[1])):
    v=np.array(v)*1e3; h=v[len(v)//2:]
    print(f"{k:24s} n={len(v):3d} med={np.median(v):7.1f} warm_med={np.median(h):7.1f} total={v.sum():7.0f}")
