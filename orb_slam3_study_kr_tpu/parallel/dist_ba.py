"""Distributed bundle adjustment over a device mesh.

The TPU-native replacement for what the reference cannot do at all (its BA
is one g2o solve on one thread).  Decomposition, following the standard
distributed-Schur structure (BASELINE.json north star):

- landmarks (and their observations) are sharded across devices along a
  `data` mesh axis — each landmark's full observation set lives on exactly
  one device, so the 3x3 elimination blocks are device-local;
- camera poses are replicated;
- each device builds its partial reduced camera system
  S_d = Hpp_d - W_d Hll_d^-1 W_d^T and partial rhs from its observations;
- one psum over ICI yields the global (6K, 6K) reduced system, solved
  replicated (K is a window; the dense solve is tiny next to the matmuls);
- landmark updates back-substitute locally with zero communication.

Communication per GN iteration is exactly one psum of (6K x 6K + 6K)
floats — independent of landmark and observation count, which is what makes
the scheme scale.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from orb_slam3_study_kr_tpu.lie.se3 import exp_se3, se3_compose
from orb_slam3_study_kr_tpu.solvers import robust
from orb_slam3_study_kr_tpu.solvers.reproj import residual_and_jacobians


def make_ba_mesh(devices=None, axis="data"):
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))


def distributed_bundle_adjust(
    mesh,
    project_fn, project_jac_fn,
    R_cw, t_cw, fixed,          # (K,3,3), (K,3), (K,)  — replicated
    X, lm_mask,                 # (Msh,3), (Msh,)       — sharded by landmark
    obs_pose, obs_lm, obs_uv, obs_level, obs_mask,  # (Osh,) — sharded with
                                # obs_lm indexing into the LOCAL landmark block
    n_iters: int = 10,
    damping: float = 1e-4,
):
    """Run GN/LM-damped iterations of Schur-complement BA over the mesh.

    Shapes: X/lm_mask sharded on axis 0 into equal per-device blocks; the
    obs_* arrays sharded on axis 0 such that each observation lives with its
    landmark's device, and obs_lm holds *local* (per-shard) landmark indices.
    Poses are replicated.  Returns (R_cw, t_cw, X) with the same shardings.
    """
    K = R_cw.shape[0]
    axis = mesh.axis_names[0]

    rep = P()
    shd = P(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, shd, shd, shd, shd, shd, shd, shd),
        out_specs=(rep, rep, shd),
        check_rep=False,
    )
    def solve(R_all, t_all, fixed, X_blk, lmm_blk, op, ol, ouv, olev, om):
        inv_sigma2 = robust.octave_inv_sigma2(olev)
        M_blk = X_blk.shape[0]

        def gn_iter(carry, _):
            R_all, t_all, X_blk = carry
            Ro = R_all[op]
            to = t_all[op]
            Xo = X_blk[ol]
            r, J_pose, J_point, p = residual_and_jacobians(
                project_jac_fn, project_fn, Ro, to, Xo, ouv
            )
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w = inv_sigma2 * om * lmm_blk[ol] * (p[:, 2] > 1e-3)
            w = w * robust.huber_weight(chi2, robust.HUBER_MONO)
            free = (1.0 - fixed)[op]
            Jp = J_pose * free[:, None, None]

            Hpp = jnp.zeros((K, 6, 6), R_all.dtype).at[op].add(
                jnp.einsum("nia,n,nib->nab", Jp, w, Jp)
            )
            bp = jnp.zeros((K, 6), R_all.dtype).at[op].add(
                jnp.einsum("nia,n,ni->na", Jp, w, r)
            )
            Hll = jnp.zeros((M_blk, 3, 3), R_all.dtype).at[ol].add(
                jnp.einsum("nia,n,nib->nab", J_point, w, J_point)
            )
            bl = jnp.zeros((M_blk, 3), R_all.dtype).at[ol].add(
                jnp.einsum("nia,n,ni->na", J_point, w, r)
            )
            E = jnp.einsum("nia,n,nib->nab", Jp, w, J_point)  # (O, 6, 3)

            eye3 = jnp.eye(3, dtype=R_all.dtype)
            Hll_d = Hll + damping * (eye3[None] + Hll * eye3[None])
            Hll_inv = jnp.linalg.inv(Hll_d) * lmm_blk[:, None, None]

            W = jnp.zeros((K, M_blk, 6, 3), R_all.dtype).at[op, ol].add(E)
            Wi = jnp.einsum("kmab,mbc->kmac", W, Hll_inv)
            S_part = -jnp.einsum("kmac,lmbc->kalb", Wi, W).reshape(6 * K, 6 * K)
            rhs_part = -(bp - jnp.einsum("kmab,mb->ka", Wi, bl)).reshape(6 * K)

            # The only cross-device communication of the iteration.
            Hpp = jax.lax.psum(Hpp, axis)
            S = jax.lax.psum(S_part, axis)
            rhs = jax.lax.psum(rhs_part, axis)

            eye6 = jnp.eye(6, dtype=R_all.dtype)
            Hpp_d = Hpp + damping * (eye6[None] + Hpp * eye6[None])
            Sd = S + _blockdiag6(Hpp_d, K)
            fixd = jnp.repeat(fixed, 6)
            Sd = Sd * (1 - fixd)[:, None] * (1 - fixd)[None, :] + jnp.diag(fixd)
            dp = jnp.linalg.solve(Sd, rhs).reshape(K, 6)

            dl = -jnp.einsum(
                "mab,mb->ma", Hll_inv,
                bl + jnp.einsum("kmab,ka->mb", W, dp),
            )
            dR, dt = exp_se3(dp)
            R_new, t_new = se3_compose(dR, dt, R_all, t_all)
            X_new = X_blk + dl * lmm_blk[:, None]
            return (R_new, t_new, X_new), None

        (R_f, t_f, X_f), _ = jax.lax.scan(
            gn_iter, (R_all, t_all, X_blk), None, length=n_iters
        )
        return R_f, t_f, X_f

    def _blockdiag6(Hb, K):
        out = jnp.zeros((K, 6, K, 6), Hb.dtype)
        out = out.at[jnp.arange(K), :, jnp.arange(K), :].set(Hb)
        return out.reshape(6 * K, 6 * K)

    return solve(R_cw, t_cw, fixed, X, lm_mask, obs_pose, obs_lm, obs_uv,
                 obs_level, obs_mask)


def shard_ba_problem(mesh, n_devices, X, lm_mask, obs_pose, obs_lm, obs_uv,
                     obs_level, obs_mask):
    """Host-side partitioner: round-robin landmarks into equal blocks, route
    each observation to its landmark's device, convert obs_lm to local
    indices, and pad every shard to a common size.

    Returns device-ready (X, lm_mask, obs_*) numpy arrays (concatenated
    shards — apply jax.device_put with a NamedSharding over axis 0).
    """
    import numpy as np

    M = X.shape[0]
    Mb = -(-M // n_devices)
    dev_of_lm = np.arange(M) % n_devices
    local_of_lm = np.arange(M) // n_devices

    X_sh = np.zeros((n_devices, Mb, 3), X.dtype)
    lmm_sh = np.zeros((n_devices, Mb), lm_mask.dtype)
    for d in range(n_devices):
        sel = dev_of_lm == d
        X_sh[d, : sel.sum()] = X[sel]
        lmm_sh[d, : sel.sum()] = lm_mask[sel]

    dev_of_obs = dev_of_lm[obs_lm]
    per_dev = [np.nonzero(dev_of_obs == d)[0] for d in range(n_devices)]
    Ob = max(max(len(p) for p in per_dev), 1)
    op_sh = np.zeros((n_devices, Ob), obs_pose.dtype)
    ol_sh = np.zeros((n_devices, Ob), obs_lm.dtype)
    ouv_sh = np.zeros((n_devices, Ob, 2), obs_uv.dtype)
    olev_sh = np.zeros((n_devices, Ob), obs_level.dtype)
    om_sh = np.zeros((n_devices, Ob), obs_mask.dtype)
    for d, idx in enumerate(per_dev):
        n = len(idx)
        op_sh[d, :n] = obs_pose[idx]
        ol_sh[d, :n] = local_of_lm[obs_lm[idx]]
        ouv_sh[d, :n] = obs_uv[idx]
        olev_sh[d, :n] = obs_level[idx]
        om_sh[d, :n] = obs_mask[idx]
    return (
        X_sh.reshape(-1, 3), lmm_sh.reshape(-1),
        op_sh.reshape(-1), ol_sh.reshape(-1), ouv_sh.reshape(-1, 2),
        olev_sh.reshape(-1), om_sh.reshape(-1),
        dev_of_lm, local_of_lm, Mb,
    )
