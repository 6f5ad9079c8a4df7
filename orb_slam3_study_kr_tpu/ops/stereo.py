"""Rectified stereo keypoint matching with sub-pixel disparity refinement.

Replaces Frame::ComputeStereoMatches (/root/reference/src/Frame.cc:816): for
each left keypoint, right candidates within a +-2-sigma row band are scored
by Hamming distance (gate (TH_HIGH + TH_LOW)/2 = 75 as the reference), and
the best match's column is refined by an 11x11 SAD parabola over a +-5 px
slide on the pyramid level image — all as one masked (NL, NR) problem plus
one batched gather/SAD sweep.

Outputs per left keypoint: u_r (refined right column at level 0) and depth
(z = fx * baseline / disparity), -1 where unmatched — the same contract as
the reference's mvuRight / mvDepth.
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.ops.matching import BIG, hamming_matrix

DESC_GATE = 75.0   # (TH_HIGH + TH_LOW) / 2
SAD_WIN = 5        # 11x11 window
SLIDE = 5          # +-5 px sub-pixel search


@functools.partial(jax.jit, static_argnames=())
def match_stereo(
    uvL, levelL, descL, validL,
    uvR, levelR, descR, validR,
    imgL, imgR,
    fx, baseline,
    min_disp=0.0, max_disp=200.0,
    scale_factor=1.2,
):
    """Args: keypoint tables of both images (level-0 coords), the *level-0*
    images (the SAD refinement samples level 0 for simplicity; the reference
    uses each keypoint's level image), intrinsics.

    Returns (u_r (NL,), depth (NL,), ok (NL,))."""
    # Row band: |vL - vR| <= 2 * 1.2^level (reference uses per-level band).
    band = 2.0 * scale_factor ** levelL.astype(jnp.float32)
    dv = jnp.abs(uvL[:, 1:2] - uvR[None, :, 1])
    row_ok = dv <= band[:, None]
    # Disparity range: uR in [uL - max_disp, uL - min_disp].
    disp = uvL[:, 0:1] - uvR[None, :, 0]
    disp_ok = (disp >= min_disp) & (disp <= max_disp)
    # Level agreement +-1.
    dl = jnp.abs(levelL[:, None] - levelR[None, :])
    mask = row_ok & disp_ok & (dl <= 1) & validL[:, None] & validR[None, :]

    dist = hamming_matrix(descL, descR)
    d = jnp.where(mask, dist, BIG)
    idxR = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    ok = best <= DESC_GATE
    # Left-right mutual consistency: the chosen right keypoint's own nearest
    # left keypoint must be this one (kills repeated-texture mismatches that
    # produce the heavy depth-error tail).
    bestL_of_R = jnp.argmin(d, axis=0)          # (NR,)
    ok = ok & (bestL_of_R[idxR] == jnp.arange(d.shape[0]))

    # --- SAD sub-pixel refinement around the matched right column ---
    W = 2 * SAD_WIN + 1
    H, Wimg = imgL.shape
    uL = jnp.clip(jnp.round(uvL[:, 0]).astype(jnp.int32), SAD_WIN + SLIDE,
                  Wimg - SAD_WIN - SLIDE - 1)
    vL = jnp.clip(jnp.round(uvL[:, 1]).astype(jnp.int32), SAD_WIN,
                  H - SAD_WIN - 1)
    uR0 = jnp.clip(jnp.round(uvR[idxR, 0]).astype(jnp.int32),
                   SAD_WIN + SLIDE, Wimg - SAD_WIN - SLIDE - 1)

    padL = jnp.pad(imgL, SAD_WIN + SLIDE)
    padR = jnp.pad(imgR, SAD_WIN + SLIDE)

    def sad_one(u_l, v, u_r):
        # Left template (W x W) and right strip (W x (W + 2*SLIDE)).
        tl = jax.lax.dynamic_slice(padL, (v + SLIDE, u_l + SLIDE), (W, W))
        strip = jax.lax.dynamic_slice(padR, (v + SLIDE, u_r), (W, W + 2 * SLIDE))
        # Normalize by center intensity like the reference (IL - center).
        tl = tl - tl[SAD_WIN, SAD_WIN]

        def sad_at(o):
            win = jax.lax.dynamic_slice(strip, (0, o), (W, W))
            win = win - win[SAD_WIN, SAD_WIN]
            return jnp.sum(jnp.abs(tl - win))

        sads = jax.vmap(sad_at)(jnp.arange(2 * SLIDE + 1))
        k = jnp.argmin(sads)
        # Parabola over the SAD minimum (reference deltaR formula).
        km = jnp.clip(k, 1, 2 * SLIDE - 1)
        c, l, r = sads[km], sads[km - 1], sads[km + 1]
        denom = 2.0 * c - l - r
        delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (r - l) / denom, 0.0)
        delta = jnp.clip(delta, -1.0, 1.0)
        u_ref = (u_r + SLIDE).astype(jnp.float32) - SLIDE + (km - SLIDE) + delta
        # Border minimum = ambiguous correlation (reference rejects
        # bestincR at +-L); |delta| at the clip limit likewise.
        sharp = (k > 0) & (k < 2 * SLIDE) & (jnp.abs(delta) < 1.0)
        return u_ref, sads[km], sharp

    u_r_ref, sad_best, sharp = jax.vmap(sad_one)(uL, vL, uR0)
    ok = ok & sharp
    # Reference tail cull: drop matches whose SAD exceeds 1.5 * 1.4 * median
    # of accepted SADs (ComputeStereoMatches' final loop).
    med = jnp.nanmedian(jnp.where(ok, sad_best, jnp.nan))
    med = jnp.nan_to_num(med, nan=jnp.inf)
    ok = ok & (sad_best <= 1.5 * 1.4 * med)
    disparity = uvL[:, 0] - u_r_ref
    ok = ok & (disparity > jnp.maximum(min_disp, 1e-3)) & (disparity < max_disp)
    depth = jnp.where(ok, fx * baseline / jnp.maximum(disparity, 1e-6), -1.0)
    u_r_out = jnp.where(ok, u_r_ref, -1.0)
    return u_r_out, depth, ok


def depth_to_virtual_right(u, depth, fx, baseline):
    """RGB-D path: synthesize the virtual right coordinate from measured
    depth (Frame::ComputeStereoFromRGBD)."""
    ok = depth > 0
    u_r = jnp.where(ok, u - fx * baseline / jnp.maximum(depth, 1e-6), -1.0)
    return u_r, ok
