"""Pose-graph (essential-graph) optimization over Sim3 / 4-DoF vertices.

Replaces Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:1501, the Sim3
BlockSolver_7_3 solve that spreads a loop correction over the covisibility
skeleton) and OptimizeEssentialGraph4DoF (:5300, the inertial variant where
roll/pitch are observable and only yaw + translation deform).

Vertices are (R, t, s) world->keyframe; an edge (i, j) constrains the
relative similarity S_ij = S_i . S_j^-1 to its measured value with residual
log_sim3(S_meas^-1 . S_i . S_j^-1).  Per-edge 7x14 Jacobians come from
autodiff of the two touched tangents and scatter-add into the dense normal
equations — K keyframes give a (7K, 7K) system, tiny next to BA.
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.sim3 import (exp_sim3, log_sim3, sim3_compose,
                                             sim3_inverse)


def _apply_tangent(d, R, t, s, dof):
    """Left-multiplicative update exp(d) . (R, t, s)."""
    if dof == 7:
        dR, dt, ds = exp_sim3(d)
    elif dof == 4:
        # yaw + translation (z-axis rotation only), scale fixed.
        yaw = d[..., 0]
        z = jnp.zeros_like(yaw)
        phi = jnp.stack([z, z, yaw], -1)
        zeta = jnp.concatenate([phi, d[..., 1:4], z[..., None]], -1)
        dR, dt, ds = exp_sim3(zeta)
    else:
        raise ValueError(dof)
    return sim3_compose(dR, dt, ds, R, t, s)


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """log( S_meas^-1 . S_i . S_j^-1 )."""
    Rji, tji, sji = sim3_inverse(Rj, tj, sj)
    R_ij, t_ij, s_ij = sim3_compose(Ri, ti, si, Rji, tji, sji)
    Rmi, tmi, smi = sim3_inverse(Rm, tm, sm)
    Re, te, se = sim3_compose(Rmi, tmi, smi, R_ij, t_ij, s_ij)
    return log_sim3(Re, te, se)


@functools.partial(jax.jit, static_argnames=("n_iters", "dof"))
def optimize_pose_graph(
    R, t, s,                  # (K,3,3), (K,3), (K,)
    edge_i, edge_j,           # (E,) int32
    Rm, tm, sm,               # (E,...) measured relative Sim3 i<-j
    edge_w,                   # (E,) weight (0 masks an edge)
    fixed,                    # (K,) 1.0 = frozen vertex
    n_iters: int = 20,
    dof: int = 7,
    damping: float = 1e-6,
):
    """Returns optimized (R, t, s)."""
    K = R.shape[0]
    D = dof

    def gn_step(carry, _):
        R, t, s, lam = carry

        def one_edge(e):
            i, j = edge_i[e], edge_j[e]

            def f(dij):
                di, dj = dij[:D], dij[D:]
                Ri, ti, si = _apply_tangent(di, R[i], t[i], s[i], dof)
                Rj, tj, sj = _apply_tangent(dj, R[j], t[j], s[j], dof)
                return _edge_residual(Ri, ti, si, Rj, tj, sj,
                                      Rm[e], tm[e], sm[e])

            z = jnp.zeros(2 * D, R.dtype)
            r = f(z)
            J = jax.jacfwd(f)(z)  # (7, 2D)
            return r, J

        r_all, J_all = jax.vmap(one_edge)(jnp.arange(edge_i.shape[0]))
        w = edge_w
        Ji = J_all[:, :, :D]
        Jj = J_all[:, :, D:]
        # Assemble dense normal equations with scatter-adds.
        H = jnp.zeros((K, D, K, D), R.dtype)
        H = H.at[edge_i, :, edge_i, :].add(
            jnp.einsum("eri,e,erj->eij", Ji, w, Ji))
        H = H.at[edge_j, :, edge_j, :].add(
            jnp.einsum("eri,e,erj->eij", Jj, w, Jj))
        H = H.at[edge_i, :, edge_j, :].add(
            jnp.einsum("eri,e,erj->eij", Ji, w, Jj))
        H = H.at[edge_j, :, edge_i, :].add(
            jnp.einsum("eri,e,erj->eij", Jj, w, Ji))
        b = jnp.zeros((K, D), R.dtype)
        b = b.at[edge_i].add(jnp.einsum("eri,e,er->ei", Ji, w, r_all))
        b = b.at[edge_j].add(jnp.einsum("eri,e,er->ei", Jj, w, r_all))

        Hf = H.reshape(K * D, K * D)
        bf = b.reshape(K * D)
        fixd = jnp.repeat(fixed, D)
        Hf = Hf * (1 - fixd)[:, None] * (1 - fixd)[None, :] + jnp.diag(fixd)
        Hf = Hf + lam * jnp.eye(K * D, dtype=R.dtype)
        d = -jnp.linalg.solve(Hf, bf).reshape(K, D)
        d = d * (1 - fixed)[:, None]

        R_n, t_n, s_n = _apply_tangent(d, R, t, s, dof)

        def cost(R, t, s):
            def ce(e):
                return _edge_residual(R[edge_i[e]], t[edge_i[e]], s[edge_i[e]],
                                      R[edge_j[e]], t[edge_j[e]], s[edge_j[e]],
                                      Rm[e], tm[e], sm[e])
            r = jax.vmap(ce)(jnp.arange(edge_i.shape[0]))
            return jnp.sum(w[:, None] * r * r)

        better = cost(R_n, t_n, s_n) < cost(R, t, s)
        R = jnp.where(better, R_n, R)
        t = jnp.where(better, t_n, t)
        s = jnp.where(better, s_n, s)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 10.0, 1e2))
        return (R, t, s, lam), None

    (R, t, s, _), _ = jax.lax.scan(
        gn_step, (R, t, s, jnp.asarray(damping, R.dtype)), None, length=n_iters)
    return R, t, s


def relative_sim3(Ri, ti, si, Rj, tj, sj):
    """Measured S_ij = S_i . S_j^-1 from current estimates (how the
    reference builds non-loop edges of the essential graph)."""
    Rji, tji, sji = sim3_inverse(Rj, tj, sj)
    return sim3_compose(Ri, ti, si, Rji, tji, sji)
