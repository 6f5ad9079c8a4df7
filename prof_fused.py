"""Split the fused-frame cost into host-prep / dispatch / fetch / post."""
import time, collections, numpy as np
import jax
import orb_slam3_study_kr_tpu.pipeline.tracking as tmod
import orb_slam3_study_kr_tpu.pipeline.fused_round as frmod
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig

acc = collections.defaultdict(list)

orig_fused = frmod.fused_track_frame
def timed_fused(*a, **k):
    t0 = time.perf_counter()
    r = orig_fused(*a, **k)
    acc["dispatch"].append(time.perf_counter() - t0)
    return r

orig_get = jax.device_get
def timed_get(x):
    t0 = time.perf_counter()
    r = orig_get(x)
    acc["device_get"].append(time.perf_counter() - t0)
    return r

orig_tff = tmod.MonoTracker._track_fused_frame
def timed_tff(self, frame):
    import orb_slam3_study_kr_tpu.pipeline.tracking as T
    T.fused_track_frame_patch = None
    t0 = time.perf_counter()
    r = orig_tff(self, frame)
    acc["tff_total"].append(time.perf_counter() - t0)
    return r
tmod.MonoTracker._track_fused_frame = timed_tff

# patch the symbol the tracker imports (it imports inside the function)
frmod.fused_track_frame = timed_fused
tmod.jax.device_get = timed_get

rng = np.random.default_rng(5)
world = synthetic.make_textured_world(rng)
n = 48
R, t = synthetic.lateral_trajectory(n, x_span=1.0)
slam = SlamSystem(SystemConfig(sensor="mono", async_mapping=True))
for i in range(n):
    img = synthetic.render_textured(world, R[i], t[i], rng=rng)
    slam.track_monocular(img, i * 0.05)
slam.flush()
for k, v in sorted(acc.items()):
    v = np.array(v) * 1e3
    h = v[len(v) // 2:]
    print(f"{k:12s} n={len(v):3d} med={np.median(v):7.1f} "
          f"warm_med={np.median(h):7.1f} p90={np.percentile(h,90):8.1f} "
          f"max={v.max():8.1f}")
slam.shutdown()
