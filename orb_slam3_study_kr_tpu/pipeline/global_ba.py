"""Global bundle adjustment over a whole map.

Replaces Optimizer::GlobalBundleAdjustemnt (/root/reference/src/
Optimizer.cc:53) + LoopClosing::RunGlobalBundleAdjustment
(/root/reference/src/LoopClosing.cc:2273): after a loop correction the
entire map (all keyframes + landmarks) is refined with a bounded-iteration
LM solve.  The reference runs this in a transient thread and then
propagates corrections down the spanning tree to keyframes created
meanwhile; the array-state pipeline is synchronous, so every keyframe is in
the solve and no propagation pass is needed.

Large maps switch from the dense-Schur assembly to the matrix-free PCG
reduced-camera solve (no (K, M, 6, 3) cross block), so GBA never has to be
skipped for memory.  With a device mesh configured, the solve is sharded
by landmark across devices (parallel/dist_ba.py) with psum-combined
reduced systems — the distributed path of SURVEY.md section 2.4.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState
from orb_slam3_study_kr_tpu.solvers import bundle_adjust
from orb_slam3_study_kr_tpu.solvers.robust import CHI2_MONO, CHI2_STEREO

# Above this dense cross-block size the single-device solve switches to the
# matrix-free PCG assembly (it no longer skips — see module docstring).
DENSE_CROSS_BLOCK_FLOATS = 1 << 27


def _bucket(n, step):
    return max(step, -(-n // step) * step)


def _padr(a, n, fill=0):
    if a.shape[0] >= n:
        return a[:n]
    return np.concatenate(
        [a, np.full((n - a.shape[0], *a.shape[1:]), fill, a.dtype)])


def global_bundle_adjustment(cfg, m: MapState, n_iters: int = 10,
                             cull_outliers: bool = True, mesh=None) -> bool:
    """Full-map BA.  Returns False only for degenerate maps.

    Gauge: the two oldest keyframes are frozen (the reference fixes the
    origin keyframe; monocular scale needs a second anchor).  With `mesh`
    (jax.sharding.Mesh) the solve is landmark-sharded across its devices."""
    kfs = np.nonzero(m.kf_valid)[0].astype(np.int32)
    if kfs.size < 3:
        return False
    obs_cnt = m.landmark_obs_count()
    lms = np.nonzero(m.lm_valid & (obs_cnt >= 2))[0].astype(np.int32)
    if lms.size < 20:
        return False

    okf, okp, olm = m.observations(kfs)
    sel = np.zeros(m.max_lm, bool)
    sel[lms] = True
    keep = sel[olm]
    okf, okp, olm = okf[keep], okp[keep], olm[keep]

    K = _bucket(kfs.size, 8)
    M = _bucket(lms.size, 2048)
    O = _bucket(okf.size, 8192)

    kf_index = np.full(m.max_kf, -1, np.int64)
    kf_index[kfs] = np.arange(kfs.size)
    lm_index = np.full(m.max_lm, -1, np.int64)
    lm_index[lms] = np.arange(lms.size)

    order = np.argsort(m.kf_timestamp[kfs], kind="stable")
    fixed = np.zeros(kfs.size, np.float32)
    fixed[order[:2]] = 1.0

    R_all = _padr(m.kf_R[kfs], K)
    R_all[kfs.size:] = np.eye(3)
    t_all = _padr(m.kf_t[kfs], K)
    fixed_p = _padr(fixed, K, 1.0)
    X = _padr(m.lm_pos[lms], M)
    lm_mask = _padr(np.ones(lms.size, np.float32), M)
    op = _padr(kf_index[okf].astype(np.int32), O)
    ol = _padr(lm_index[olm].astype(np.int32), O)
    ouv = _padr(m.kf_kp_uv[okf, okp], O)
    olev = _padr(m.kf_kp_level[okf, okp], O)
    omask = _padr(np.ones(okf.size, np.float32), O)
    our = (_padr(m.kf_kp_ur[okf, okp], O, -1.0) if cfg.bf > 0 else None)

    if mesh is not None and mesh.devices.size > 1:
        chi2 = _distributed_gba(cfg, m, mesh, lms, R_all, t_all, fixed_p,
                                X, lm_mask, op, ol, ouv, olev, omask, our,
                                kfs, kf_index, n_iters)
    else:
        assembly = ("dense" if K * M * 18 <= DENSE_CROSS_BLOCK_FLOATS
                    else "pcg")
        stereo_kw = {}
        if cfg.bf > 0:
            stereo_kw = dict(obs_ur=jnp.asarray(our), bf=jnp.float32(cfg.bf))
        R, t, X_new, chi2, _ = bundle_adjust(
            cfg.project_fn, cfg.project_jac_fn,
            jnp.asarray(R_all), jnp.asarray(t_all), jnp.asarray(fixed_p),
            jnp.asarray(X), jnp.asarray(lm_mask),
            jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
            jnp.asarray(olev), jnp.asarray(omask),
            n_iters=n_iters, assembly=assembly,
            wide_fov=cfg.camera_model == "kb8", **stereo_kw,
        )
        upd = kfs[fixed == 0]
        m.kf_R[upd] = np.asarray(R)[kf_index[upd]]
        m.kf_t[upd] = np.asarray(t)[kf_index[upd]]
        m.lm_pos[lms] = np.asarray(X_new)[: lms.size]
        chi2 = np.asarray(chi2)

    if cull_outliers:
        chi2 = chi2[: okf.size]
        if cfg.bf > 0:
            gate = np.where(m.kf_kp_ur[okf, okp] >= 0, CHI2_STEREO, CHI2_MONO)
        else:
            gate = CHI2_MONO
        bad = chi2 > gate
        m.kf_kp_lm[okf[bad], okp[bad]] = NO_LM
        orphan = np.nonzero(m.lm_valid & (m.landmark_obs_count() < 2))[0]
        if orphan.size:
            m.remove_landmarks(orphan)
    m.change_idx += 1
    return True


def _distributed_gba(cfg, m, mesh, lms, R_all, t_all, fixed_p, X, lm_mask,
                     op, ol, ouv, olev, omask, our, kfs, kf_index, n_iters):
    """Landmark-sharded GBA over the mesh; writes poses/landmarks back and
    returns per-observation chi2 in the caller's (unsharded) order."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from orb_slam3_study_kr_tpu.parallel.dist_ba import (
        distributed_bundle_adjust, shard_ba_problem)

    n_dev = int(mesh.devices.size)
    parts = shard_ba_problem(mesh, n_dev, X, lm_mask, op, ol, ouv, olev,
                             omask, obs_ur=our)
    if our is not None:
        (X_sh, lmm_sh, op_sh, ol_sh, ouv_sh, olev_sh, om_sh, our_sh,
         dev_of_lm, local_of_lm, Mb, obs_slot) = parts
    else:
        (X_sh, lmm_sh, op_sh, ol_sh, ouv_sh, olev_sh, om_sh,
         dev_of_lm, local_of_lm, Mb, obs_slot) = parts
        our_sh = None

    axis = mesh.axis_names[0]
    shd = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = lambda a, s: jax.device_put(jnp.asarray(a), s)

    kw = {}
    if our is not None:
        kw = dict(obs_ur=put(our_sh, shd), bf=jnp.float32(cfg.bf))
    R_f, t_f, X_f, chi2_sh = distributed_bundle_adjust(
        mesh, cfg.project_fn, cfg.project_jac_fn,
        put(R_all, rep), put(t_all, rep), put(fixed_p, rep),
        put(X_sh, shd), put(lmm_sh, shd),
        put(op_sh, shd), put(ol_sh, shd), put(ouv_sh, shd),
        put(olev_sh, shd), put(om_sh, shd),
        n_iters=n_iters, assembly="pcg",
        wide_fov=cfg.camera_model == "kb8", **kw,
    )
    fixed = np.asarray(fixed_p)[: kfs.size]
    upd = kfs[fixed == 0]
    m.kf_R[upd] = np.asarray(R_f)[kf_index[upd]]
    m.kf_t[upd] = np.asarray(t_f)[kf_index[upd]]
    X_out = np.asarray(X_f)
    m.lm_pos[lms] = X_out[dev_of_lm[: lms.size] * Mb
                          + local_of_lm[: lms.size]]
    # Chi2 back to the caller's observation order.
    chi2_sh = np.asarray(chi2_sh)
    chi2 = np.zeros(op.shape[0], np.float32)
    live = obs_slot >= 0
    chi2[obs_slot[live]] = chi2_sh[live]
    return chi2
