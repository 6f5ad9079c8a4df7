"""Benchmark harness: one JSON line for the driver.

Primary metric (headline): FULL-SYSTEM throughput — frames/s of the whole
SLAM session (extraction + tracking + background mapping/loop worker) on a
synthetic mono sequence, against the reference's real-time bar
(vs_baseline = system frames/s / 20 fps dataset pacing; the reference
claims real-time on an i7, BASELINE.md).

Also measured (inside the same JSON object): the jitted tracking-slice
frames/s (SURVEY.md section 3.2 hot path), BA iterations/s (dense Schur +
matrix-free PCG), the fused Pallas matcher A/B, the per-stage
REGISTER_TIMES-style breakdown, the virtual-mesh BA scaling table, and
the multi-process (jax.distributed) BA table.
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)
    out = step(*args)
    jax.block_until_ready(out)

    n_warm, n_iter = 3, 30
    for _ in range(n_warm):
        jax.block_until_ready(step(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    # --- BA iterations/s ---
    from orb_slam3_study_kr_tpu.cameras import pinhole
    from orb_slam3_study_kr_tpu import lie
    from orb_slam3_study_kr_tpu.solvers import bundle_adjust

    cam = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)
    project_fn = functools.partial(pinhole.project, cam)
    project_jac_fn = functools.partial(pinhole.project_jac, cam)
    rng = np.random.default_rng(0)
    K, M, O = 16, 8192, 32768
    X = np.stack([rng.uniform(-5, 5, M), rng.uniform(-4, 4, M),
                  rng.uniform(5, 15, M)], -1).astype(np.float32)
    Rs, ts = [], []
    for k in range(K):
        R, t = lie.exp_se3(jnp.asarray(
            np.array([0.01 * k, -0.005 * k, 0, 0.2 * k, 0, 0], np.float32)))
        Rs.append(np.asarray(R))
        ts.append(np.asarray(t))
    R0, t0_ = np.stack(Rs), np.stack(ts)
    op = rng.integers(0, K, O).astype(np.int32)
    ol = rng.integers(0, M, O).astype(np.int32)
    p = np.einsum("oij,oj->oi", R0[op], X[ol]) + t0_[op]
    ouv = np.asarray(project_fn(jnp.asarray(p))) + rng.normal(0, 0.5, (O, 2)).astype(np.float32)
    fixed = np.zeros(K, np.float32)
    fixed[0] = 1.0

    ba_args = (
        project_fn, project_jac_fn,
        jnp.asarray(R0), jnp.asarray(t0_), jnp.asarray(fixed),
        jnp.asarray(X), jnp.ones(M),
        jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.zeros(O, jnp.int32), jnp.ones(O),
    )
    n_ba_iters = 10
    out = bundle_adjust(*ba_args, n_iters=n_ba_iters)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = bundle_adjust(*ba_args, n_iters=n_ba_iters)
    jax.block_until_ready(out)
    ba_dt = time.perf_counter() - t0
    ba_iters_per_s = n_ba_iters / ba_dt

    # --- PCG (matrix-free) assembly on the same problem ---
    out = bundle_adjust(*ba_args, n_iters=n_ba_iters, assembly="pcg")
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = bundle_adjust(*ba_args, n_iters=n_ba_iters, assembly="pcg")
    jax.block_until_ready(out)
    ba_pcg_iters_per_s = n_ba_iters / (time.perf_counter() - t0)

    # --- full-system frames/s (host orchestration + async mapping/loops) ---
    sys_fps, sys_detail = _system_fps()

    # --- fused Pallas gated-NN matcher vs the HBM matrix path ---
    match_ms = _matcher_ab()

    # --- speed-of-light accounting: XLA cost model vs measured time ---
    roofline = _roofline(ba_args, n_ba_iters)

    # --- BA scaling table (virtual CPU mesh; real multi-chip when available)
    scaling = _ba_scaling((1, 2, 4, 8))

    # --- multi-process (jax.distributed) BA: 1 proc vs 2 procs ---
    multihost = _multihost_ba()

    # Sharding overhead efficiency: N-device sharded runtime vs the same
    # TOTAL problem on 1 device.  On this 2-core host, virtual devices
    # share cores, so compute speedup is physically impossible — what this
    # measures is the overhead the sharded path (shard_map + psum) adds,
    # the component that is actually in our control; on a real N-chip
    # slice the per-chip compute is 1/N and parallel.
    eff = None
    if scaling.get("1") and scaling.get("8"):
        eff = round(scaling["8"] / scaling["1"], 3)

    print(json.dumps({
        "metric": "system_frames_per_s",
        "value": round(sys_fps, 2),
        "unit": "frames/s, full system (752x480, 1000 feat, async mapping)",
        "vs_baseline": round(sys_fps / 20.0, 3),
        "baseline_def": "reference real-time bar: EuRoC dataset pacing "
                        "20 fps on an i7 (BASELINE.md); note every "
                        "device<->host sync on this box pays a ~24 ms "
                        "tunnel RTT the reference does not",
        "system_detail": sys_detail,
        "tracking_frames_per_s": round(fps, 2),
        "tracking_vs_pacing": round(fps / 20.0, 3),
        "ba_iters_per_s": round(ba_iters_per_s, 2),
        "ba_pcg_iters_per_s": round(ba_pcg_iters_per_s, 2),
        "ba_problem": f"K={K} M={M} O={O}",
        "matcher_ms": match_ms,
        "roofline": roofline,
        "ba_scaling_cpu_mesh": scaling,
        "ba_sharding_overhead_efficiency": eff,
        "multihost_ba": multihost,
        "ba_collectives_per_iter": _collectives(),
        "host_cores": __import__("os").cpu_count(),
        "device": str(jax.devices()[0]),
    }))


def _system_fps(n_frames: int = 48):
    """Full SlamSystem throughput on a synthetic mono sequence with the
    background mapping/loop worker on (the deployment configuration);
    median of the warm second half (the first frames pay jit compilation).
    Also returns the per-stage REGISTER_TIMES-style breakdown and the
    keyframe-frame stall percentiles."""
    import numpy as np
    from orb_slam3_study_kr_tpu.io import synthetic
    from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig

    rng = np.random.default_rng(5)
    world = synthetic.make_textured_world(rng)
    R, t = synthetic.lateral_trajectory(n_frames, x_span=1.0)
    slam = SlamSystem(SystemConfig(sensor="mono", async_mapping=True))
    # Camera-pipeline model: frames arrive as uint8 and are prefetched to
    # the device during the next frame's render/IO time (upload_image), so
    # the H2D transfer overlaps host work as it would in a real capture
    # loop; the per-frame timing covers extraction + tracking + mapping.
    imgs = [synthetic.render_textured(world, R[i], t[i], rng=rng)
            .clip(0, 255).astype(np.uint8) for i in range(n_frames)]
    handle = slam.upload_image(imgs[0])
    for i in range(n_frames):
        nxt = slam.upload_image(imgs[i + 1]) if i + 1 < n_frames else None
        slam.track_monocular(handle, i * 0.05)
        handle = nxt
    slam.flush()
    warm = np.sort(np.asarray(slam.timings[n_frames // 2:]))
    med = float(np.median(warm))
    detail = {
        "frame_ms_median": round(med * 1e3, 1),
        "frame_ms_p90": round(float(np.percentile(warm, 90)) * 1e3, 1),
        "frame_ms_max_warm": round(float(warm[-1]) * 1e3, 1),
        "n_keyframes": int(slam.tracker.stats["n_kf"]),
        "async_tasks": dict(slam.async_map.stats),
        "stages_ms": {
            k: {kk: round(vv, 1) for kk, vv in v.items()}
            for k, v in slam.tracker.timers.summary().items()},
    }
    slam.shutdown()
    return 1.0 / max(med, 1e-9), detail


# Documented peaks for the bench chip (TPU v5e / v5 lite): 197 TFLOP/s
# bf16 MXU (f32 programs run below this by construction) and 819 GB/s HBM.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BYTES = 819e9


def _time_compiled(compiled, args, reps=20):
    """Median seconds per call: queue `reps` async dispatches back-to-back
    and sync once (block_until_ready is unreliable over the chip tunnel;
    serial device execution amortizes the round trip across reps)."""
    import jax

    out = compiled(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                           jax.tree_util.tree_leaves(out))
    _sync = lambda o: np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(o)[0]))
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _roofline(ba_args, n_ba_iters):
    """Speed-of-light accounting for the three hot kernels: XLA's own cost
    model (flops + bytes accessed from compiled.cost_analysis()) against
    measured wall time, expressed as fractions of the chip's bf16-MXU and
    HBM-bandwidth peaks.  `optimal_seconds` is XLA's own roofline bound
    for the program on this chip."""
    import functools
    import jax
    import jax.numpy as jnp

    from orb_slam3_study_kr_tpu.ops.orb import OrbConfig, extract_orb
    from orb_slam3_study_kr_tpu.solvers import bundle_adjust

    rng = np.random.default_rng(11)
    out = {}

    def entry(compiled, args):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        secs = _time_compiled(compiled, args)
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return {
            "ms": round(secs * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(byts / 1e9, 3),
            "mfu_bf16_peak": round(flops / secs / PEAK_FLOPS_BF16, 4),
            "hbm_bw_util": round(byts / secs / PEAK_HBM_BYTES, 4),
        }

    try:
        cfg = OrbConfig()
        img = jnp.asarray(rng.integers(0, 255, (cfg.height, cfg.width))
                          .astype(np.float32))
        comp = extract_orb.lower(img, cfg).compile()
        out["extract"] = entry(comp, (img,))
    except Exception as e:  # pragma: no cover - bench resilience
        out["extract"] = {"error": str(e)[:120]}

    try:
        from orb_slam3_study_kr_tpu.ops import track_match
        margs = _matcher_args(rng)
        fn = (track_match.match_local_map_pallas
              if jax.default_backend() == "tpu"
              else track_match.match_local_map)
        comp = fn.lower(*margs).compile()
        e = entry(comp, margs[1:])   # drop the static fn arg
        # XLA's cost model cannot see inside the Pallas custom call: add
        # the analytic count (the (L, N) Hamming matrix is one
        # (L,256)x(256,N) contraction + ~10 gate ops per pair).
        L, N = 4096, 1024
        aflops = 2.0 * L * N * 256 + 10.0 * L * N
        e["analytic_gflops"] = round(aflops / 1e9, 2)
        e["analytic_mfu_bf16_peak"] = round(
            aflops / (e["ms"] / 1e3) / PEAK_FLOPS_BF16, 4)
        out["matcher"] = e
    except Exception as e:
        out["matcher"] = {"error": str(e)[:120]}

    try:
        comp = functools.partial(bundle_adjust, n_iters=n_ba_iters)
        comp = jax.jit(comp, static_argnums=(0, 1)).lower(*ba_args).compile()
        e = entry(comp, ba_args[2:])
        e["note"] = f"per solve of {n_ba_iters} LM iterations"
        out["ba"] = e
    except Exception as e:
        out["ba"] = {"error": str(e)[:120]}
    return out


def _collectives():
    """psum count per distributed-BA LM iteration, per assembly (the
    dense assemblies are communication-avoiding: constant 5)."""
    from orb_slam3_study_kr_tpu.parallel.dist_ba import collectives_per_iter
    return {"dense_chunked": collectives_per_iter("dense_chunked"),
            "pcg_60cg": collectives_per_iter("pcg", 60)}


def _matcher_args(rng, L=4096, N=1024):
    import functools
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.cameras import pinhole

    params = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                         jnp.float32)
    project_fn = functools.partial(pinhole.project, params)
    lm_pos = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                       rng.uniform(3, 9, L)], -1).astype(np.float32)
    dirs = (lm_pos / np.linalg.norm(lm_pos, axis=-1, keepdims=True)
            ).astype(np.float32)
    return (project_fn, jnp.eye(3), jnp.zeros(3),
            jnp.asarray(lm_pos), jnp.asarray(dirs),
            jnp.asarray(rng.uniform(0.5, 1, L).astype(np.float32)),
            jnp.asarray(rng.uniform(8, 20, L).astype(np.float32)),
            jnp.asarray((rng.random((L, 256)) < 0.5).astype(np.uint8)),
            jnp.ones(L, jnp.float32),
            jnp.asarray(rng.uniform(0, 752, (N, 2)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 8, N).astype(np.int32)),
            jnp.asarray((rng.random((N, 256)) < 0.5).astype(np.uint8)),
            jnp.ones(N, bool), 752, 480)


def _matcher_ab(L=4096, N=1024, reps=30):
    """Local-map matcher A/B at tracking scale: plain-XLA (L, N) Hamming
    matrix in HBM vs the fused Pallas gated-NN (tile-resident).  Pallas
    only runs on a real TPU backend."""
    import functools
    import numpy as np
    import jax
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.cameras import pinhole
    from orb_slam3_study_kr_tpu.ops import track_match

    rng = np.random.default_rng(7)
    params = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                         jnp.float32)
    project_fn = functools.partial(pinhole.project, params)
    lm_pos = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                       rng.uniform(3, 9, L)], -1).astype(np.float32)
    dirs = (lm_pos / np.linalg.norm(lm_pos, axis=-1, keepdims=True)
            ).astype(np.float32)
    args = (project_fn, jnp.eye(3), jnp.zeros(3),
            jnp.asarray(lm_pos), jnp.asarray(dirs),
            jnp.asarray(rng.uniform(0.5, 1, L).astype(np.float32)),
            jnp.asarray(rng.uniform(8, 20, L).astype(np.float32)),
            jnp.asarray((rng.random((L, 256)) < 0.5).astype(np.uint8)),
            jnp.ones(L, jnp.float32),
            jnp.asarray(rng.uniform(0, 752, (N, 2)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 8, N).astype(np.int32)),
            jnp.asarray((rng.random((N, 256)) < 0.5).astype(np.uint8)),
            jnp.ones(N, bool), 752, 480)

    def time_fn(fn):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    res = {"jnp": round(time_fn(track_match.match_local_map), 3)}
    if jax.default_backend() == "tpu":
        res["pallas"] = round(time_fn(track_match.match_local_map_pallas), 3)
    return res


def _multihost_ba():
    """Multi-process (jax.distributed) BA table: the same seeded problem at
    1 process x 2 virtual CPU devices and 2 processes x 1 device each (the
    psums cross process boundaries in the latter).  On this 2-core host the
    numbers measure the multi-process runtime's overhead, not parallel
    speedup — on a real multi-host slice each process owns its own chips."""
    import os
    import socket
    import subprocess
    import sys

    def free_port():
        s = socket.socket()
        s.bind(("localhost", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    def run(num_procs, ndev):
        port = free_port()
        procs = []
        for pid in range(num_procs):
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = \
                f"--xla_force_host_platform_device_count={ndev}"
            env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
            procs.append(subprocess.Popen(
                [sys.executable, "-m",
                 "orb_slam3_study_kr_tpu.parallel.multihost_worker",
                 str(pid), str(num_procs), str(port), "10", "dense_chunked"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True))
        outs = [p.communicate(timeout=600) for p in procs]
        if any(p.returncode != 0 for p in procs):
            return None
        return json.loads(outs[0][0].strip().splitlines()[-1])

    table = {}
    for label, (np_, nd) in {"1proc_x2dev": (1, 2),
                             "2proc_x1dev": (2, 1)}.items():
        try:
            res = run(np_, nd)
            table[label] = None if res is None else {
                "ba_iters_per_s": res["ba_iters_per_s"],
                "pose_err": res["pose_err"]}
        except Exception:
            table[label] = None
    return table


def _ba_scaling(device_counts):
    """Run the distributed-BA micro-bench per device count in clean CPU
    subprocesses (the real chip is single; the virtual mesh validates the
    sharded path and measures its overhead)."""
    import os
    import subprocess
    import sys

    out = {}
    for n in device_counts:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        try:
            res = subprocess.run(
                [sys.executable, "-m",
                 "orb_slam3_study_kr_tpu.parallel.bench_scaling", str(n)],
                capture_output=True, text=True, timeout=600, env=env)
            out[str(n)] = json.loads(
                res.stdout.strip().splitlines()[-1])["ba_iters_per_s"]
        except Exception:
            out[str(n)] = None
    return out


if __name__ == "__main__":
    main()
