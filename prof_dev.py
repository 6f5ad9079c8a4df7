"""Pure device time of the fused whole-frame program and its pieces,
measured by queueing reps back-to-back and fetching one scalar (NOTES:
block_until_ready returns immediately over the tunnel)."""
import functools, time, numpy as np
import jax, jax.numpy as jnp
from orb_slam3_study_kr_tpu.cameras import pinhole
from orb_slam3_study_kr_tpu.pipeline.fused_round import fused_track_frame
from orb_slam3_study_kr_tpu.ops.klt import klt_refine
from orb_slam3_study_kr_tpu.ops import track_match, orb
from orb_slam3_study_kr_tpu.solvers.pose_opt import optimize_pose

rng = np.random.default_rng(3)
N, L, NLEV = 1024, 4096, 8
params = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)
project_fn = functools.partial(pinhole.project, params)
project_jac_fn = functools.partial(pinhole.project_jac, params)
undistort_fn = None  # identity handled via static arg in pipeline; use lambda
undistort_fn = lambda uv: uv

lm_pos = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                   rng.uniform(3, 9, L)], -1).astype(np.float32)
nrm = (lm_pos / np.linalg.norm(lm_pos, axis=1, keepdims=True)).astype(np.float32)
gid = np.arange(L, dtype=np.int32)
wh = []
w0, h0 = 752, 480
for lev in range(NLEV):
    wh.append((round(w0 / 1.2**lev), round(h0 / 1.2**lev)))
level_wh = jnp.asarray(np.array(wh, np.float32))
pyr = jnp.asarray(rng.uniform(0, 255, (NLEV, 480, 752)).astype(np.float32))

args = dict(
    R0=jnp.eye(3), t0=jnp.zeros(3),
    lm_pos=jnp.asarray(lm_pos),
    lm_desc=jnp.asarray((rng.random((L, 256)) < .5).astype(np.uint8)),
    lm_gid=jnp.asarray(gid),
    lm_patch=jnp.asarray(rng.uniform(0, 255, (L, 11, 11)).astype(np.float32)),
    lm_normal=jnp.asarray(-nrm), lm_min_dist=jnp.full(L, 0.5),
    lm_max_dist=jnp.full(L, 20.0),
    mask_all=jnp.ones(L), mask_wide=jnp.ones(L),
    kp_lm=jnp.full(N, -1, jnp.int32), kp_lm_pos=jnp.zeros((N, 3)),
    f_uv=jnp.asarray(rng.uniform(0, 752, (N, 2)).astype(np.float32)),
    f_level=jnp.asarray(rng.integers(0, NLEV, N).astype(np.int32)),
    f_desc=jnp.asarray((rng.random((N, 256)) < .5).astype(np.uint8)),
    f_valid=jnp.ones(N, bool),
    f_uv_raw=jnp.asarray(rng.uniform(0, 752, (N, 2)).astype(np.float32)),
    f_angle=jnp.zeros(N),
    pyr=pyr, level_wh=level_wh,
    width=752, height=480, min_track_matches=jnp.int32(12),
)
flow = (args["f_uv"], args["f_desc"], args["f_angle"],
        jnp.ones(N, bool), jnp.asarray(rng.integers(0, L, N).astype(np.int32)),
        jnp.asarray(rng.integers(0, L, N).astype(np.int32)))


def timeit(label, fn, *a, reps=20, **k):
    out = fn(*a, **k)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:8.2f} ms")
    return dt


for label, kws in [
    ("fused_frame klt+flow (deploy)", dict(use_klt=True, use_pallas=True, flow=flow)),
    ("fused_frame no-flow", dict(use_klt=True, use_pallas=True, flow=None)),
    ("fused_frame no-klt", dict(use_klt=False, use_pallas=True, flow=None)),
    ("fused_frame 1 local round", dict(use_klt=True, use_pallas=True, flow=flow, n_local_rounds=1)),
    ("fused_frame xla matcher", dict(use_klt=True, use_pallas=False, flow=flow)),
]:
    timeit(label, fused_track_frame, project_fn, project_jac_fn,
           undistort_fn, *args.values(), **kws)

# pieces
m = functools.partial(track_match.match_local_map_pallas, project_fn)
timeit("matcher alone", m, args["R0"], args["t0"], args["lm_pos"],
       args["lm_normal"], args["lm_min_dist"], args["lm_max_dist"],
       args["lm_desc"], args["mask_all"], args["f_uv"], args["f_level"],
       args["f_desc"], args["f_valid"], 752, 480)
timeit("klt_refine alone", klt_refine, pyr, level_wh, args["f_uv_raw"],
       args["f_level"], args["f_angle"], args["lm_patch"][:N],
       jnp.ones(N, bool))
timeit("pose_opt alone", optimize_pose, project_fn, project_jac_fn,
       args["R0"], args["t0"], jnp.asarray(lm_pos[:N]), args["f_uv"],
       args["f_level"], jnp.ones(N))
img = jnp.asarray(rng.integers(0, 255, (480, 752)).astype(np.uint8))
ocfg = orb.OrbConfig(n_features=1000, height=480, width=752)
timeit("extract_orb alone", orb.extract_orb, img, ocfg)
