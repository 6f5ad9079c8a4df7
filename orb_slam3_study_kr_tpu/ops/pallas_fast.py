"""Fused FAST-9/16 score + NMS + Gaussian blur as one Pallas TPU kernel.

The per-level dense stage of ORB extraction (ops/orb.py) reads the level
image several times from HBM under XLA fusion choices (score rolls, NMS
rolls, two-threshold maps, separable blur).  This kernel tiles the level
into ROW STRIPS: each grid step DMAs one (BH+8, W) halo'd strip from HBM
into VMEM and emits all four dense products for its BH core rows in a
single fused pass (the strip plus every intermediate stays far under the
16 MB VMEM budget — a whole-level variant OOM'd the scoped vmem
allocator at 60 MB):

  s_raw   — FAST corner score at the low threshold (subpixel refinement
            reads this),
  s20_nms — 3x3-NMS'd score at the high (ini) threshold,
  s7_nms  — 3x3-NMS'd score at the low (min) threshold,
  blur    — 7x7 sigma-2 separable Gaussian (descriptor sampling input).

Matches ops/orb.fast_score_map + _nms3x3 + gaussian_blur7 semantics
bit-for-bit EXCEPT at the image border: shifts here CLAMP at the edges
(edge-padded rows / clamped columns) where the jnp path wraps around
(jnp.roll) — both are discarded by the extractor's EDGE_MARGIN border
mask, so extracted keypoints are identical.  (reference:
ORBextractor.cc:781-1138 computes FAST + blur per level with OpenCV.)

The last dimension must be a multiple of 128 (f32 lane width): callers
pad the level width; the padded columns never produce keypoints because
the border mask excludes them.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_study_kr_tpu.ops.orb import FAST_OFFSETS

# 7-tap sigma-2 Gaussian (matches ops/orb.gaussian_blur7).
_G7 = np.exp(-0.5 * (np.arange(-3, 4) / 2.0) ** 2)
_G7 = (_G7 / _G7.sum()).astype(np.float32)

HALO = 4          # rows of context a core row needs (FAST 3 + NMS 1)
BH = 64           # core rows per grid step


def _shift(a, dy, dx):
    """Static shift with edge clamping: out[y, x] = a[y+dy, x+dx]."""
    if dy > 0:
        a = jnp.concatenate([a[dy:], jnp.repeat(a[-1:], dy, 0)], 0)
    elif dy < 0:
        a = jnp.concatenate([jnp.repeat(a[:1], -dy, 0), a[:dy]], 0)
    if dx > 0:
        a = jnp.concatenate([a[:, dx:], jnp.repeat(a[:, -1:], dx, 1)], 1)
    elif dx < 0:
        a = jnp.concatenate([jnp.repeat(a[:, :1], -dx, 1), a[:, :dx]], 1)
    return a


def _kernel(img_hbm, s_raw_ref, s20_ref, s7_ref, blur_ref, strip, sem,
            *, th_min, th_ini):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * BH, BH + 2 * HALO)], strip, sem)
    cp.start()
    cp.wait()
    img = strip[...]                       # (BH + 8, W)

    # --- FAST-9/16 score (max threshold at which the pixel stays a
    # corner: max over the 16 contiguous 9-arcs of the arc-min margin,
    # for both polarities) ---
    circle = [_shift(img, int(dy), int(dx)) for dy, dx in FAST_OFFSETS]

    def arc_score(margins):
        ext = margins + margins[:8]
        m = list(ext[:16])
        for k in range(1, 9):
            for j in range(16):
                m[j] = jnp.minimum(m[j], ext[j + k])
        out = m[0]
        for j in range(1, 16):
            out = jnp.maximum(out, m[j])
        return out

    bright = [c - img for c in circle]
    dark = [img - c for c in circle]
    score = jnp.maximum(arc_score(bright), arc_score(dark))
    s_raw = jnp.where(score > th_min, score, 0.0)
    core = slice(HALO, HALO + BH)
    s_raw_ref[...] = s_raw[core]

    # --- 3x3 NMS at both thresholds (score valid on rows
    # [HALO-1, HALO+BH+1) — the strip halo covers the NMS neighborhood) ---
    s20 = jnp.where(s_raw > th_ini, s_raw, 0.0)

    def nms(s):
        neigh = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                v = _shift(s, dy, dx)
                neigh = v if neigh is None else jnp.maximum(neigh, v)
        return jnp.where((s >= neigh) & (s > 0), s, 0.0)

    s20_ref[...] = nms(s20)[core]
    s7_ref[...] = nms(s_raw)[core]

    # --- separable 7x7 Gaussian ---
    h = _G7[3] * img
    for j in range(1, 4):
        h = h + _G7[3 + j] * (_shift(img, 0, j) + _shift(img, 0, -j))
    v = _G7[3] * h
    for j in range(1, 4):
        v = v + _G7[3 + j] * (_shift(h, j, 0) + _shift(h, -j, 0))
    blur_ref[...] = v[core]


@functools.partial(jax.jit,
                   static_argnames=("th_min", "th_ini", "interpret"))
def fast_nms_blur_pallas(img, th_min: float, th_ini: float,
                         interpret: bool = False):
    """(H, Wp) f32 level image (Wp % 128 == 0) ->
    (s_raw, s20_nms, s7_nms, blur), all (H, Wp) f32."""
    H, W = img.shape
    n_blk = -(-H // BH)
    Hp = n_blk * BH
    # Edge-pad rows: HALO of context on top, HALO + core padding below.
    imgp = jnp.pad(img.astype(jnp.float32),
                   ((HALO, Hp - H + HALO), (0, 0)), mode="edge")
    out = pl.pallas_call(
        functools.partial(_kernel, th_min=float(th_min),
                          th_ini=float(th_ini)),
        grid=(n_blk,),
        out_shape=[jax.ShapeDtypeStruct((Hp, W), jnp.float32)] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((BH, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.VMEM((BH + 2 * HALO, W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(imgp)
    return tuple(o[:H] for o in out)
