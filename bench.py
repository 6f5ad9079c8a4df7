"""Benchmark harness: one JSON line for the driver.

Primary metric: tracking-step throughput (full ORB pyramid extraction +
local-map projection matching + pose-only GN solve per frame, the per-frame
hot path of SURVEY.md section 3.2) on one chip, in frames/s.

Baseline: the reference paces EuRoC examples at dataset rate — 20 fps — and
claims real-time on an i7-class desktop (BASELINE.md); vs_baseline is
frames/s / 20.

Also measured (reported inside the same JSON object): bundle-adjustment
iterations/s on a local-BA-sized Schur problem (K=16 poses, M=8192
landmarks, O=32768 observations).
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

    print(json.dumps({
        "metric": "tracking_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s (752x480, 1000 feat, 2048-landmark local map)",
        "vs_baseline": round(fps / 20.0, 3),
        "ba_iters_per_s": round(ba_iters_per_s, 2),
        "ba_problem": f"K={K} M={M} O={O}",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
