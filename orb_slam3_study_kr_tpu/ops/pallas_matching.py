"""Fused Hamming nearest-neighbor as a Pallas TPU kernel.

The jnp matcher (ops/matching.py) materializes the full (Q, T) distance
matrix in HBM before reducing it; for tracking-scale problems
(Q, T ~ 1-4k) that is megabytes of HBM round-trip per call.  This kernel
tiles the target set: each grid step computes one distance tile with an
in-kernel MXU dot (the popcount(xor) = sq + st - 2 q.t identity), masks it,
and folds it into running (best, second-best, argmin) accumulators in VMEM
scratch — the distance matrix never exists in memory.

All per-query vectors are kept 2-D (Q, 1) / (1, T) to satisfy Mosaic's
layout rules for TPU operands.  Interpret mode keeps the kernel testable on
CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _nn_kernel(q_ref, qs_ref, t_ref, ts_ref, tv_ref,
               best_ref, second_ref, idx_ref,
               acc_best, acc_second, acc_idx):
    j = pl.program_id(0)
    n_j = pl.num_programs(0)
    tile_t = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_best[:] = jnp.full_like(acc_best, BIG)
        acc_second[:] = jnp.full_like(acc_second, BIG)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # Distance tile on the MXU: (Q, 256) . (256, tile_t).
    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = qs_ref[:] + ts_ref[:] - 2.0 * dot  # (Q,1) + (1,tile) broadcast
    dist = jnp.where(tv_ref[:] > 0, dist, BIG)

    # Tile-local best/second/argmin (second = min with argmin column masked).
    loc_best = jnp.min(dist, axis=1, keepdims=True)          # (Q, 1)
    loc_arg_local = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)
    loc_arg = loc_arg_local + j * tile_t
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(col == loc_arg_local, BIG, dist)
    loc_second = jnp.min(masked, axis=1, keepdims=True)

    # Fold: of the candidates {best, second, loc_best, loc_second} the two
    # smallest are min(b, lb) and min(max(b, lb), s, ls).
    b = acc_best[:]
    s = acc_second[:]
    ix = acc_idx[:]
    acc_best[:] = jnp.minimum(b, loc_best)
    acc_second[:] = jnp.minimum(jnp.maximum(b, loc_best),
                                jnp.minimum(s, loc_second))
    acc_idx[:] = jnp.where(loc_best < b, loc_arg, ix)

    @pl.when(j == n_j - 1)
    def _():
        best_ref[:] = acc_best[:]
        second_ref[:] = acc_second[:]
        idx_ref[:] = acc_idx[:]


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def hamming_nn_pallas(q_desc, t_desc, t_valid, tile_t=512, interpret=False):
    """Row-wise (best, second, argmin) of the masked Hamming matrix.

    q_desc (Q, 256) uint8 {0,1}; t_desc (T, 256); t_valid (T,).
    T must be a multiple of tile_t (pad with t_valid = 0)."""
    Q = q_desc.shape[0]
    T = t_desc.shape[0]
    assert T % tile_t == 0, (T, tile_t)
    q = q_desc.astype(jnp.bfloat16)
    t = t_desc.astype(jnp.bfloat16)
    qs = jnp.sum(q_desc, axis=1).astype(jnp.float32)[:, None]   # (Q, 1)
    ts = jnp.sum(t_desc, axis=1).astype(jnp.float32)[None, :]   # (1, T)
    tv = t_valid.astype(jnp.float32)[None, :]                   # (1, T)

    grid = (T // tile_t,)
    best, second, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, 256), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 256), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, 1), jnp.float32),
            pltpu.VMEM((Q, 1), jnp.float32),
            pltpu.VMEM((Q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, qs, t, ts, tv)
    return best[:, 0], second[:, 0], idx[:, 0]
