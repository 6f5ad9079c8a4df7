"""Multi-process BA worker: one process of a jax.distributed cluster.

Launched N times (tests/test_multihost.py, bench.py) with a shared
coordinator; every process builds the SAME synthetic bundle-adjustment
problem (seeded), joins the cluster, shards it by landmark over the
GLOBAL mesh, runs `distributed_bundle_adjust` (shard_map + psum — the
psums cross process boundaries), checks convergence against ground truth,
and process 0 prints one JSON line with timings.

Usage:
  python -m orb_slam3_study_kr_tpu.parallel.multihost_worker \
      <process_id> <num_processes> <coordinator_port> [n_iters] [assembly]

The caller must set JAX_PLATFORMS/XLA_FLAGS per process (e.g.
--xla_force_host_platform_device_count=2 for 2 virtual CPU devices per
process — SURVEY.md section 4's multi-host recipe without a pod).
"""

import functools
import json
import sys
import time

import numpy as np


def build_problem(K=12, M=4096, O=16384, noise=0.3, seed=0):
    """Synthetic GBA problem with known ground truth (same on every
    process)."""
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu import lie
    from orb_slam3_study_kr_tpu.cameras import pinhole

    cam = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                      jnp.float32)
    project_fn = functools.partial(pinhole.project, cam)
    project_jac_fn = functools.partial(pinhole.project_jac, cam)
    rng = np.random.default_rng(seed)
    X_gt = np.stack([rng.uniform(-5, 5, M), rng.uniform(-4, 4, M),
                     rng.uniform(6, 14, M)], -1).astype(np.float32)
    Rs, ts = [], []
    for k in range(K):
        R, t = lie.exp_se3(jnp.asarray(np.array(
            [0.01 * k, -0.004 * k, 0.002 * k, 0.25 * k, 0.01 * k, 0],
            np.float32)))
        Rs.append(np.asarray(R))
        ts.append(np.asarray(t))
    R_gt, t_gt = np.stack(Rs), np.stack(ts)
    op = rng.integers(0, K, O).astype(np.int32)
    ol = rng.integers(0, M, O).astype(np.int32)
    p = np.einsum("oij,oj->oi", R_gt[op], X_gt[ol]) + t_gt[op]
    ouv = np.asarray(project_fn(jnp.asarray(p)))
    ouv = ouv + rng.normal(0, 0.5, ouv.shape).astype(np.float32)
    # Perturb the initial state; BA must pull it back.
    R0, t0 = [], []
    for k in range(K):
        d = np.zeros(6, np.float32)
        if k > 0:
            d[:3] = rng.normal(0, noise * 0.02, 3)
            d[3:] = rng.normal(0, noise * 0.2, 3)
        dR, dt = lie.exp_se3(jnp.asarray(d))
        R0.append(np.asarray(dR) @ R_gt[k])
        t0.append(np.asarray(dR) @ t_gt[k] + np.asarray(dt))
    fixed = np.zeros(K, np.float32)
    fixed[0] = 1.0
    X0 = X_gt + rng.normal(0, noise * 0.05, X_gt.shape).astype(np.float32)
    return dict(project_fn=project_fn, project_jac_fn=project_jac_fn,
                R_gt=R_gt, t_gt=t_gt, R0=np.stack(R0), t0=np.stack(t0),
                fixed=fixed, X0=X0.astype(np.float32), op=op, ol=ol,
                ouv=ouv.astype(np.float32),
                olev=np.zeros(O, np.int32), omask=np.ones(O, np.float32))


def main(argv):
    process_id = int(argv[0])
    num_processes = int(argv[1])
    port = int(argv[2])
    n_iters = int(argv[3]) if len(argv) > 3 else 10
    assembly = argv[4] if len(argv) > 4 else "pcg"

    from orb_slam3_study_kr_tpu.parallel import multihost
    if num_processes > 1:
        multihost.initialize(f"localhost:{port}", num_processes, process_id)
    import jax
    from jax.sharding import PartitionSpec as P
    from orb_slam3_study_kr_tpu.parallel.dist_ba import (
        distributed_bundle_adjust, shard_ba_problem)

    mesh = multihost.global_mesh()
    n_dev = int(mesh.devices.size)
    prob = build_problem()

    (X_sh, lmm_sh, op_sh, ol_sh, ouv_sh, olev_sh, om_sh,
     dev_of_lm, local_of_lm, Mb, obs_slot) = shard_ba_problem(
        mesh, n_dev, prob["X0"], np.ones(prob["X0"].shape[0], np.float32),
        prob["op"], prob["ol"], prob["ouv"], prob["olev"], prob["omask"])

    shd, rep = P("data"), P()
    g = lambda a, s: multihost.put_global(a, mesh, s)
    args = (mesh, prob["project_fn"], prob["project_jac_fn"],
            g(prob["R0"], rep), g(prob["t0"], rep), g(prob["fixed"], rep),
            g(X_sh, shd), g(lmm_sh, shd), g(op_sh, shd), g(ol_sh, shd),
            g(ouv_sh, shd), g(olev_sh, shd), g(om_sh, shd))

    out = distributed_bundle_adjust(*args, n_iters=n_iters,
                                    assembly=assembly)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = distributed_bundle_adjust(*args, n_iters=n_iters,
                                    assembly=assembly)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    R_f = multihost.fetch_replicated(out[0])
    t_f = multihost.fetch_replicated(out[1])
    X_f = multihost.gather_sharded(out[2], mesh)

    # Convergence vs ground truth (the first pose anchors the gauge).
    pose_err = float(np.max(np.linalg.norm(t_f - prob["t_gt"], axis=1)))
    rot_err = float(np.max(np.linalg.norm(
        R_f - prob["R_gt"], axis=(1, 2))))
    if process_id == 0:
        print(json.dumps({
            "ba_iters_per_s": round(n_iters / dt, 3),
            "wall_s": round(dt, 4),
            "pose_err": round(pose_err, 5),
            "rot_err": round(rot_err, 5),
            "n_processes": num_processes,
            "n_devices_global": n_dev,
            "assembly": assembly,
            "X_shape": list(np.asarray(X_f).shape),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
