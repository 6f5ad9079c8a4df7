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
                             cull_outliers: bool = True, mesh=None,
                             use_lock: bool = False) -> bool:
    """Full-map BA.  Returns False only for degenerate maps.

    Gauge: the two oldest keyframes are frozen (the reference fixes the
    origin keyframe; monocular scale needs a second anchor).  With `mesh`
    (jax.sharding.Mesh) the solve is landmark-sharded across its devices.

    With ``use_lock`` the assembly snapshots the map under ``m.lock``, the
    LM solve runs lock-free (the tracker thread interleaves), and the
    write-back re-acquires the lock — propagating the correction to any
    keyframes/landmarks created DURING the solve through their reference
    keyframe, the role of RunGlobalBundleAdjustment's spanning-tree
    mTcwGBA propagation (/root/reference/src/LoopClosing.cc:2345-2413)."""
    import contextlib
    lock = m.lock if use_lock else contextlib.nullcontext()
    with lock:
        snap = _assemble_gba(cfg, m, mesh)
    if snap is None:
        return False
    out = _solve_gba(cfg, m, mesh, snap, n_iters)
    with lock:
        _apply_gba(cfg, m, snap, out, cull_outliers)
    return True


def _assemble_gba(cfg, m: MapState, mesh):
    kfs = np.nonzero(m.kf_valid)[0].astype(np.int32)
    if kfs.size < 3:
        return None
    obs_cnt = m.landmark_obs_count()
    lms = np.nonzero(m.lm_valid & (obs_cnt >= 2))[0].astype(np.int32)
    if lms.size < 20:
        return None

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

    return dict(kfs=kfs, lms=lms, okf=okf, okp=okp, fixed=fixed,
                kf_index=kf_index, K=K, M=M,
                R_all=R_all, t_all=t_all, fixed_p=fixed_p, X=X,
                lm_mask=lm_mask, op=op, ol=ol, ouv=ouv, olev=olev,
                omask=omask, our=our,
                # pre-solve poses for propagating corrections to rows
                # created during a lock-free solve
                R_old=m.kf_R[kfs].copy(), t_old=m.kf_t[kfs].copy(),
                snap_next_kf=m.next_kf, snap_next_lm=m.next_lm)


def _solve_gba(cfg, m, mesh, s, n_iters):
    kfs, lms = s["kfs"], s["lms"]
    if mesh is not None and mesh.devices.size > 1:
        R, t, X_new, chi2 = _distributed_gba(
            cfg, m, mesh, lms, s["R_all"], s["t_all"], s["fixed_p"],
            s["X"], s["lm_mask"], s["op"], s["ol"], s["ouv"], s["olev"],
            s["omask"], s["our"], kfs, s["kf_index"], n_iters)
    else:
        assembly = ("dense" if s["K"] * s["M"] * 18 <= DENSE_CROSS_BLOCK_FLOATS
                    else "pcg")
        stereo_kw = {}
        if cfg.bf > 0:
            stereo_kw = dict(obs_ur=jnp.asarray(s["our"]),
                             bf=jnp.float32(cfg.bf))
        R, t, X_new, chi2, _ = bundle_adjust(
            cfg.project_fn, cfg.project_jac_fn,
            jnp.asarray(s["R_all"]), jnp.asarray(s["t_all"]),
            jnp.asarray(s["fixed_p"]),
            jnp.asarray(s["X"]), jnp.asarray(s["lm_mask"]),
            jnp.asarray(s["op"]), jnp.asarray(s["ol"]), jnp.asarray(s["ouv"]),
            jnp.asarray(s["olev"]), jnp.asarray(s["omask"]),
            n_iters=n_iters, assembly=assembly,
            wide_fov=cfg.camera_model == "kb8", **stereo_kw,
        )
        R, t, X_new, chi2 = jax.device_get((R, t, X_new, chi2))
    return dict(R=np.asarray(R), t=np.asarray(t), X_new=np.asarray(X_new),
                chi2=np.asarray(chi2))


def _apply_gba(cfg, m, s, out, cull_outliers):
    kfs, lms, okf, okp = s["kfs"], s["lms"], s["okf"], s["okp"]
    fixed, kf_index = s["fixed"], s["kf_index"]
    upd = kfs[fixed == 0]
    upd = upd[m.kf_valid[upd]]           # culled during a lock-free solve
    m.kf_R[upd] = out["R"][kf_index[upd]]
    m.kf_t[upd] = out["t"][kf_index[upd]]
    live = lms[m.lm_valid[lms]]
    lm_index = np.full(m.max_lm, -1, np.int64)
    lm_index[lms] = np.arange(lms.size)
    m.lm_pos[live] = out["X_new"][lm_index[live]]

    # Rows created while the solve ran lock-free: correct through the
    # newest snapshot keyframe (reference: spanning-tree mTcwGBA
    # propagation, LoopClosing.cc:2345-2392).  T_child_new =
    # T_child_old . T_ref_old^-1 . T_ref_new keeps the child's relative
    # pose to the (moved) map.
    if m.next_kf > s["snap_next_kf"] or m.next_lm > s["snap_next_lm"]:
        snap_pos = {int(k): i for i, k in enumerate(kfs)}
        ref = int(kfs[-1])
        i = snap_pos[ref]
        # T_ref_old^-1 . T_ref_new as one rigid correction D.
        R_d = s["R_old"][i].T @ out["R"][i]
        t_d = s["R_old"][i].T @ (out["t"][i] - s["t_old"][i])
        new_kfs = np.arange(s["snap_next_kf"], m.next_kf)
        new_kfs = new_kfs[m.kf_valid[new_kfs]]
        for c in new_kfs:
            m.kf_R[c] = (m.kf_R[c] @ R_d).astype(np.float32)
            m.kf_t[c] = (m.kf_t[c] + m.kf_R[c] @ (R_d.T @ t_d)).astype(
                np.float32)
        new_lms = np.arange(s["snap_next_lm"], m.next_lm)
        new_lms = new_lms[m.lm_valid[new_lms]]
        if new_lms.size:
            # X_new = D^-1 applied in world: push through old ref pose,
            # pull back through the corrected one.
            Ro, to = s["R_old"][i], s["t_old"][i]
            Rn, tn = out["R"][i], out["t"][i]
            pc = m.lm_pos[new_lms] @ Ro.T + to
            m.lm_pos[new_lms] = (pc - tn) @ Rn

    if cull_outliers:
        chi2 = out["chi2"][: okf.size]
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


def _distributed_gba(cfg, m, mesh, lms, R_all, t_all, fixed_p, X, lm_mask,
                     op, ol, ouv, olev, omask, our, kfs, kf_index, n_iters):
    """Landmark-sharded GBA over the mesh; returns (R, t, X in lms order,
    chi2 in the caller's unsharded order) — the write-back happens in
    _apply_gba under the map lock."""
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
        n_iters=n_iters,
        # Constant-collective assembly while the replicated (6K, 6K)
        # reduced solve stays cheap; matrix-free PCG beyond that.
        assembly="dense_chunked" if kfs.size <= 512 else "pcg",
        wide_fov=cfg.camera_model == "kb8", **kw,
    )
    X_out = np.asarray(X_f)
    X_lms = X_out[dev_of_lm[: lms.size] * Mb + local_of_lm[: lms.size]]
    # Chi2 back to the caller's observation order.
    chi2_sh = np.asarray(chi2_sh)
    chi2 = np.zeros(op.shape[0], np.float32)
    live = obs_slot >= 0
    chi2[obs_slot[live]] = chi2_sh[live]
    return np.asarray(R_f), np.asarray(t_f), X_lms, chi2
