"""Per-frame phase profiler for the full-system bench configuration.

Prints a per-frame table (frame id, wall ms, path taken, sub-phase ms)
plus warm medians, to locate where a median frame's time goes and which
frames own the multi-second tail.
"""
import time, collections, numpy as np
import orb_slam3_study_kr_tpu.pipeline.tracking as tmod
import orb_slam3_study_kr_tpu.pipeline.local_mapping as lmod
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig

acc = collections.defaultdict(list)
cur = {}

def wrap(cls, name):
    orig = getattr(cls, name)
    def f(self, *a, **k):
        t0 = time.perf_counter()
        r = orig(self, *a, **k)
        dt = time.perf_counter() - t0
        acc[name].append(dt)
        cur[name] = cur.get(name, 0.0) + dt
        return r
    setattr(cls, name, f)

for n in ("_track_fused_frame", "_track_motion_model", "_track_local_map",
          "_track_reference_kf", "_update_last_frame", "_need_new_keyframe",
          "_create_keyframe", "_build_lm_block"):
    wrap(tmod.MonoTracker, n)

import orb_slam3_study_kr_tpu.pipeline.frame as fmod
wrap(fmod.Frame, "_materialize")  # lazy extractor fetch

rng = np.random.default_rng(5)
world = synthetic.make_textured_world(rng)
n = 48
R, t = synthetic.lateral_trajectory(n, x_span=1.0)
slam = SlamSystem(SystemConfig(sensor="mono", async_mapping=True))
imgs = [synthetic.render_textured(world, R[i], t[i], rng=rng)
        .clip(0, 255).astype(np.uint8) for i in range(n)]
rows = []
handle = slam.upload_image(imgs[0])
for i in range(n):
    nxt = slam.upload_image(imgs[i + 1]) if i + 1 < n else None
    cur.clear()
    t0 = time.perf_counter()
    slam.track_monocular(handle, i * 0.05)
    dt = (time.perf_counter() - t0) * 1e3
    rows.append((i, dt, dict(cur)))
    handle = nxt
slam.flush()

for i, dt, c in rows:
    det = " ".join(f"{k.lstrip('_')}={v*1e3:.0f}" for k, v in
                   sorted(c.items(), key=lambda kv: -kv[1]) if v > 1e-3)
    print(f"f{i:02d} {dt:8.1f} ms  {det}")
print()
warm = rows[n // 2:]
tot = np.array([r[1] for r in warm])
print(f"warm median {np.median(tot):.1f} p90 {np.percentile(tot, 90):.1f} "
      f"max {tot.max():.1f}")
for k, v in sorted(acc.items(), key=lambda kv: -sum(kv[1])):
    v = np.array(v) * 1e3
    h = v[len(v) // 2:]
    print(f"{k:24s} n={len(v):3d} med={np.median(v):7.1f} "
          f"warm_med={np.median(h):7.1f} max={v.max():8.1f} tot={v.sum():8.0f}")
print("stats", {k: v for k, v in slam.tracker.stats.items() if v})
slam.shutdown()
