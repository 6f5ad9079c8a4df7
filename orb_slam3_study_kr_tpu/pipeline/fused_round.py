"""Fused track-local-map round: match + KLT verify + bind + pose-opt in
ONE jitted program.

The split pipeline pays a host sync (full link round trip on a
remote-attached chip) after each stage; a tracking frame runs 2-3 rounds
of (projection match -> photometric verify -> pose GN), i.e. ~9 sync
boundaries.  This program keeps the whole round on device: the only host
exchange per round is one argument upload batch and one fetched result
cluster.

Semantics match tracking.MonoTracker's split path
(_match_against_landmarks + _klt_refine_matches + _optimize_frame_pose)
with one deliberate difference: the KLT observation write-back
(klt_move_obs) is returned to the host and applied AFTER the round, so a
moved observation benefits the NEXT round's matching/solve instead of the
same round's (sub-pixel lag, measured neutral).
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.ops import track_match
from orb_slam3_study_kr_tpu.ops.klt import klt_refine
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM
from orb_slam3_study_kr_tpu.solvers.pose_opt import optimize_pose


@functools.partial(jax.jit, static_argnames=(
    "project_fn", "project_jac_fn", "n_levels", "level_slack", "wide_fov",
    "use_klt", "use_pallas"))
def fused_track_round(
    project_fn, project_jac_fn,
    R0, t0,
    lm_pos, lm_normal, lm_min_dist, lm_max_dist, lm_desc, lm_mask, lm_gid,
    lm_patch,
    kp_lm, kp_lm_pos,
    f_uv, f_level, f_desc, f_valid, f_uv_raw, f_angle,
    pyr, level_wh,
    width, height,
    th=1.0, nn_ratio=0.8, scale_factor=1.2, n_levels=8, level_slack=1,
    max_theta_deg=None,
    klt_zncc_min=0.5, klt_max_shift=3.0,
    wide_fov=False, use_klt=True, use_pallas=False,
    ur_obs=None, bf=None,
):
    """One round.  Inputs: a padded landmark block (lm_*, with lm_gid the
    global landmark id per row), the frame's current bindings kp_lm
    (global ids) with their positions kp_lm_pos, and the frame feature
    arrays.  Returns (R, t, kp_lm', inliers, visible, klt_move) where
    klt_move = (uv_ref, win, zncc, shift, distinct, newly_bound)."""
    matcher = (track_match.match_local_map_pallas if use_pallas
               else track_match.match_local_map)
    lm_slot, ok, visible = matcher(
        project_fn, R0, t0,
        lm_pos, lm_normal, lm_min_dist, lm_max_dist, lm_desc, lm_mask,
        f_uv, f_level, f_desc, f_valid,
        width, height, th=th, nn_ratio=nn_ratio, scale_factor=scale_factor,
        n_levels=n_levels, level_slack=level_slack,
        max_theta_deg=max_theta_deg,
    )
    free = kp_lm == NO_LM
    cand_ok = ok & free

    tmpl = lm_patch[lm_slot]
    if use_klt:
        uv_ref, zncc, shift, _win, distinct = klt_refine(
            pyr, level_wh, f_uv_raw, f_level, f_angle, tmpl, cand_ok,
            max_shift=klt_max_shift)
        good = cand_ok & (zncc >= klt_zncc_min) & (shift < klt_max_shift)
    else:
        n = f_uv.shape[0]
        uv_ref = f_uv_raw
        zncc = jnp.full((n,), -1.0, jnp.float32)
        shift = jnp.full((n,), klt_max_shift + 1.0, jnp.float32)
        distinct = jnp.full((n,), -1.0, jnp.float32)
        good = cand_ok

    new_gid = lm_gid[lm_slot]
    kp_lm_new = jnp.where(good, new_gid, kp_lm)
    X = jnp.where(good[:, None], lm_pos[lm_slot], kp_lm_pos)
    bound = (kp_lm_new != NO_LM) & f_valid
    stereo_kw = {}
    if ur_obs is not None:
        stereo_kw = dict(ur_obs=ur_obs, bf=bf)
    R, t, inl, _ = optimize_pose(
        project_fn, project_jac_fn, R0, t0, X, f_uv, f_level,
        bound.astype(jnp.float32), wide_fov=wide_fov, **stereo_kw)
    inl = inl & bound
    kp_lm_out = jnp.where(inl, kp_lm_new, NO_LM).astype(kp_lm.dtype)
    # The aligned intensity window is deliberately NOT returned: it is the
    # one large (N, P, P) output and only feeds the stored-patch refresh;
    # in fused mode the template keeps its original detection appearance
    # (the KLT verifier tolerates the <= max_shift offset).
    return (R, t, kp_lm_out, inl, visible,
            (uv_ref, zncc, shift, distinct, good))
