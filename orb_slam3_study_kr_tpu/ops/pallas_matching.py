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
# Key packing for the in-kernel argmin: gated entries carry this distance
# (> any real Hamming distance, keeps dist * n_targets + col exact in f32).
KEY_GATE = 512.0
KEY_HUGE = 3e7


def _nn_kernel(q_ref, qs_ref, t_ref, ts_ref, tv_ref,
               best_ref, second_ref, idx_ref,
               acc_best, acc_second):
    j = pl.program_id(0)
    n_j = pl.num_programs(0)
    tile_t = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_best[:] = jnp.full_like(acc_best, KEY_HUGE)
        acc_second[:] = jnp.full_like(acc_second, KEY_HUGE)

    # Distance tile on the MXU: (Q, 256) . (256, tile_t).
    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = qs_ref[:] + ts_ref[:] - 2.0 * dot  # (Q,1) + (1,tile) broadcast

    # Packed (distance, index) f32 keys — see _gated_nn_kernel.
    n_total = jnp.float32(n_j * tile_t)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1).astype(
        jnp.float32) + jnp.float32(j * tile_t)
    key = jnp.where(tv_ref[:] > 0, dist, KEY_GATE) * n_total + col
    loc_kb = jnp.min(key, axis=1, keepdims=True)
    masked = jnp.where(key == loc_kb, KEY_HUGE, key)
    loc_ks = jnp.min(masked, axis=1, keepdims=True)

    b = acc_best[:]
    s = acc_second[:]
    acc_best[:] = jnp.minimum(b, loc_kb)
    acc_second[:] = jnp.minimum(jnp.maximum(b, loc_kb),
                                jnp.minimum(s, loc_ks))

    @pl.when(j == n_j - 1)
    def _():
        kb = acc_best[:]
        ks = acc_second[:]
        db = jnp.floor(kb / n_total)
        ds = jnp.floor(ks / n_total)
        best_ref[:] = jnp.where(db >= KEY_GATE, BIG, db)
        second_ref[:] = jnp.where(ds >= KEY_GATE, BIG, ds)
        idx_ref[:] = (kb - db * n_total).astype(jnp.int32)


def _gated_nn_kernel(q_ref, qs_ref, qx_ref, qy_ref, ql_ref, qv_ref,
                     t_ref, ts_ref, tx_ref, ty_ref, tr_ref, tl_ref, tv_ref,
                     best_ref, second_ref, idx_ref,
                     acc_best, acc_second, *, level_slack):
    """One target tile of the fused projection-gated Hamming NN.

    The (Q, tile) distance tile is computed on the MXU, the search-window /
    scale / visibility gates are evaluated IN VMEM on the same tile, and
    only the (best, second, argmin) running reduction survives — neither
    the distance matrix nor the gate mask ever reaches HBM."""
    j = pl.program_id(0)
    n_j = pl.num_programs(0)
    tile_t = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_best[:] = jnp.full_like(acc_best, KEY_HUGE)
        acc_second[:] = jnp.full_like(acc_second, KEY_HUGE)

    # (Q, 256) x (256, tile) MXU contraction in f32 (this Mosaic build
    # rejects bf16/int8 matmul operands — "Bad lhs type").
    dot = jax.lax.dot_general(
        q_ref[:], t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = qs_ref[:] + ts_ref[:] - 2.0 * dot

    # Gate stack (ORBmatcher::SearchByProjection window/scale gates),
    # evaluated as (Q,1) x (1,tile) broadcasts.
    du = jnp.abs(qx_ref[:] - tx_ref[:])
    dv = jnp.abs(qy_ref[:] - ty_ref[:])
    in_win = (du <= tr_ref[:]) & (dv <= tr_ref[:])
    dl = ql_ref[:] - tl_ref[:]
    lvl_ok = (dl >= -float(level_slack)) & (dl <= float(level_slack))
    ok = in_win & lvl_ok & (tv_ref[:] > 0) & (qv_ref[:] > 0)

    # (distance, index) packed into ONE exact f32 key: Hamming distances
    # are integers <= 256 (gated -> KEY_GATE) and dist * n_total + global
    # column stays < 2^24, so a plain f32 min-reduce IS first-index argmin.
    # (Mosaic's argmin / int-min lowerings mis-compose lane indices for
    # rows wider than 256 lanes — measured off-by-256k results, so only
    # f32 min reductions are trusted here.)
    n_total = jnp.float32(n_j * tile_t)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1).astype(
        jnp.float32) + jnp.float32(j * tile_t)
    key = jnp.where(ok, dist, KEY_GATE) * n_total + col
    loc_kb = jnp.min(key, axis=1, keepdims=True)
    masked = jnp.where(key == loc_kb, KEY_HUGE, key)
    loc_ks = jnp.min(masked, axis=1, keepdims=True)

    b = acc_best[:]
    s = acc_second[:]
    acc_best[:] = jnp.minimum(b, loc_kb)
    acc_second[:] = jnp.minimum(jnp.maximum(b, loc_kb),
                                jnp.minimum(s, loc_ks))

    @pl.when(j == n_j - 1)
    def _():
        kb = acc_best[:]
        ks = acc_second[:]
        db = jnp.floor(kb / n_total)
        ds = jnp.floor(ks / n_total)
        best_ref[:] = jnp.where(db >= KEY_GATE, BIG, db)
        second_ref[:] = jnp.where(ds >= KEY_GATE, BIG, ds)
        idx_ref[:] = (kb - db * n_total).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_t", "level_slack",
                                             "interpret"))
def gated_nn_pallas(q_desc, q_uv, q_level, q_valid,
                    t_desc, t_uv, t_radius, t_level, t_valid,
                    tile_t=256, level_slack=1, interpret=False):
    """Fused projection-gated Hamming NN: for each query keypoint, the
    (best, second, argmin) over all targets (projected landmarks) passing
    the window/level/visibility gates.  The jnp path materializes a
    (T, Q) distance matrix plus a boolean gate mask in HBM; here both live
    only tile-by-tile in VMEM.

    q_desc (Q, 256) {0,1}; q_uv (Q, 2); q_level (Q,); q_valid (Q,)
    t_desc (T, 256); t_uv (T, 2) projected; t_radius (T,); t_level (T,)
    predicted octave; t_valid (T,) visibility.  T % tile_t == 0.
    Returns (best (Q,), second (Q,), idx (Q,))."""
    Q = q_desc.shape[0]
    T = t_desc.shape[0]
    assert T % tile_t == 0, (T, tile_t)
    assert T * KEY_GATE < 2 ** 24, T  # key packing must stay exact in f32
    assert tile_t <= 256, "Mosaic iota mis-composes past 256 lanes"
    q = q_desc.astype(jnp.float32)
    t = t_desc.astype(jnp.float32).T  # (256, T), K-major for the MXU
    qs = jnp.sum(q_desc, axis=1).astype(jnp.float32)[:, None]
    ts = jnp.sum(t_desc, axis=1).astype(jnp.float32)[None, :]
    f32 = jnp.float32
    args = (
        q, qs,
        q_uv[:, 0].astype(f32)[:, None], q_uv[:, 1].astype(f32)[:, None],
        q_level.astype(f32)[:, None], q_valid.astype(f32)[:, None],
        t, ts,
        t_uv[:, 0].astype(f32)[None, :], t_uv[:, 1].astype(f32)[None, :],
        t_radius.astype(f32)[None, :], t_level.astype(f32)[None, :],
        t_valid.astype(f32)[None, :],
    )
    grid = (T // tile_t,)
    qcol = pl.BlockSpec((Q, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    trow = pl.BlockSpec((1, tile_t), lambda j: (0, j),
                        memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        functools.partial(_gated_nn_kernel, level_slack=level_slack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, 256), lambda j: (0, 0), memory_space=pltpu.VMEM),
            qcol, qcol, qcol, qcol, qcol,
            pl.BlockSpec((256, tile_t), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            trow, trow, trow, trow, trow, trow,
        ],
        out_specs=[qcol, qcol, qcol],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q, 1), jnp.float32),
            pltpu.VMEM((Q, 1), jnp.float32),
        ],
        # The target-tile grid dim carries the running reduction in scratch:
        # it must execute sequentially, never be parallelized.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return best[:, 0], second[:, 0], idx[:, 0]


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def hamming_nn_pallas(q_desc, t_desc, t_valid, tile_t=256, interpret=False):
    """Row-wise (best, second, argmin) of the masked Hamming matrix.

    q_desc (Q, 256) uint8 {0,1}; t_desc (T, 256); t_valid (T,).
    T must be a multiple of tile_t (pad with t_valid = 0)."""
    Q = q_desc.shape[0]
    T = t_desc.shape[0]
    assert T % tile_t == 0, (T, tile_t)
    assert tile_t <= 256, "Mosaic iota mis-composes past 256 lanes"
    assert T * KEY_GATE < 2 ** 24, T  # key packing must stay exact in f32
    q = q_desc.astype(jnp.float32)
    t = t_desc.astype(jnp.float32)
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
        ],
        # The target-tile grid dim carries the running reduction in scratch:
        # it must execute sequentially, never be parallelized.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q, qs, t, ts, tv)
    return best[:, 0], second[:, 0], idx[:, 0]
