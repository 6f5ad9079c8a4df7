"""BA scaling micro-bench: distributed Schur BA iterations/s vs device
count.  Run as a module in a clean environment; prints one JSON line:

  python -m orb_slam3_study_kr_tpu.parallel.bench_scaling [n_devices]

On a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
the numbers measure sharding/communication overhead, not real speedup —
the devices share host cores.  On a real slice they measure scaling
(BASELINE.md target: >= 80% efficiency).
"""

import functools
import json
import sys
import time

import numpy as np


def run(n_devices: int, K=64, M=32768, O=131072, n_iters=10,
        assembly="pcg"):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from orb_slam3_study_kr_tpu import lie
    from orb_slam3_study_kr_tpu.cameras import pinhole
    from orb_slam3_study_kr_tpu.parallel import (distributed_bundle_adjust,
                                                 make_ba_mesh)
    from orb_slam3_study_kr_tpu.parallel.dist_ba import shard_ba_problem

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (len(devices), n_devices)
    mesh = make_ba_mesh(devices)

    cam = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                      jnp.float32)
    project_fn = functools.partial(pinhole.project, cam)
    project_jac_fn = functools.partial(pinhole.project_jac, cam)

    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-5, 5, M), rng.uniform(-4, 4, M),
                  rng.uniform(5, 15, M)], -1).astype(np.float32)
    Rs, ts = [], []
    for k in range(K):
        R, t = lie.exp_se3(jnp.asarray(
            np.array([0.01 * k, -0.005 * k, 0, 0.2 * k, 0, 0], np.float32)))
        Rs.append(np.asarray(R))
        ts.append(np.asarray(t))
    R0, t0 = np.stack(Rs), np.stack(ts)
    op = rng.integers(0, K, O).astype(np.int32)
    ol = rng.integers(0, M, O).astype(np.int32)
    p = np.einsum("oij,oj->oi", R0[op], X[ol]) + t0[op]
    ouv = (np.asarray(project_fn(jnp.asarray(p)))
           + rng.normal(0, 0.5, (O, 2)).astype(np.float32))
    olev = np.zeros(O, np.int32)
    om = np.ones(O, np.float32)
    fixed = np.zeros(K, np.float32)
    fixed[0] = 1.0

    (X_sh, lmm_sh, op_sh, ol_sh, ouv_sh, olev_sh, om_sh,
     _, _, _, _) = shard_ba_problem(mesh, n_devices, X,
                                    np.ones(M, np.float32),
                                    op, ol, ouv, olev, om)
    shd = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    put = lambda a, s: jax.device_put(jnp.asarray(a), s)
    args = (mesh, project_fn, project_jac_fn,
            put(R0, rep), put(t0, rep), put(fixed, rep),
            put(X_sh, shd), put(lmm_sh, shd),
            put(op_sh, shd), put(ol_sh, shd), put(ouv_sh, shd),
            put(olev_sh, shd), put(om_sh, shd))

    out = distributed_bundle_adjust(*args, n_iters=n_iters,
                                    assembly=assembly)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0_ = time.perf_counter()
        out = distributed_bundle_adjust(*args, n_iters=n_iters,
                                        assembly=assembly)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0_)
    return n_iters / best


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    ips = run(n)
    print(json.dumps({"n_devices": n, "ba_iters_per_s": round(ips, 2)}))
