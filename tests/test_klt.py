"""KLT patch-alignment verification (ops/klt.py).

Self-consistency oracle: extract ORB features (+ blurred pyramid) from a
textured rendering, use each keypoint's own stored canonical patch as the
template, perturb the keypoint coordinates, and require the alignment to
recover the true positions.  This exercises the full coordinate plumbing
(level <-> level-0 mapping, orientation convention, bilinear sampling).
"""

import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.ops import klt, orb


def _frame_with_pyramid(seed=0):
    rng = np.random.default_rng(seed)
    world = synthetic.make_textured_world(rng, depth=6.0)
    R, t = synthetic.lateral_trajectory(3)
    img = synthetic.render_textured(world, R[0], t[0], rng=rng)
    cfg = orb.OrbConfig(n_features=600, height=480, width=752)
    feats, pyr = orb.extract_orb(jnp.asarray(img, jnp.float32), cfg,
                                 with_pyramid=True)
    return cfg, feats, pyr


def test_klt_recovers_perturbed_positions():
    cfg, feats, pyr = _frame_with_pyramid()
    valid = np.asarray(feats.valid)
    uv = np.asarray(feats.uv)
    level = np.asarray(feats.level)
    n = uv.shape[0]

    rng = np.random.default_rng(1)
    # Perturb by up to ~1.5 px *at the keypoint's level* (scaled to level-0).
    scale = 1.2 ** level
    pert = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32) * scale[:, None]
    uv_pert = uv + pert

    level_wh = jnp.asarray(klt.make_level_wh(cfg))
    uv_ref, zncc, shift, _win, _dist = klt.klt_refine(
        pyr, level_wh, jnp.asarray(uv_pert), feats.level, feats.angle,
        feats.patch, jnp.asarray(valid))
    uv_ref = np.asarray(uv_ref)
    zncc = np.asarray(zncc)
    shift = np.asarray(shift)

    ok = valid & (zncc > 0.5) & (shift < 3.0)
    assert ok.sum() > 0.6 * valid.sum(), (ok.sum(), valid.sum())
    err = np.linalg.norm((uv_ref - uv)[ok], axis=1) / scale[ok]
    # Median recovery well under the 0.3 px that descriptor matching alone
    # cannot reach (detection drift is ~0.9 px, NOTES.md).
    assert np.median(err) < 0.3, np.median(err)
    # And the refinement must beat the perturbation it was given.
    pert_err = np.linalg.norm(pert[ok], axis=1) / scale[ok]
    assert np.median(err) < 0.5 * np.median(pert_err)


def test_klt_rejects_wrong_content():
    cfg, feats, pyr = _frame_with_pyramid()
    valid = np.asarray(feats.valid)
    n = valid.shape[0]
    # Shuffle templates so each keypoint is verified against some *other*
    # keypoint's patch: aligned ZNCC should stay low for most.
    rng = np.random.default_rng(2)
    perm = rng.permutation(n)
    tmpl_wrong = np.asarray(feats.patch)[perm]

    level_wh = jnp.asarray(klt.make_level_wh(cfg))
    _uv, zncc, _s, _w, _d = klt.klt_refine(
        pyr, level_wh, feats.uv, feats.level, feats.angle,
        jnp.asarray(tmpl_wrong), jnp.asarray(valid))
    zncc = np.asarray(zncc)[valid & (perm != np.arange(n))]
    # Wrong content separates clearly from the >0.99 self-alignment score
    # (the multi-octave texture is self-similar, so some wrong pairs still
    # correlate; the gate removes the blatant mismatches).
    assert np.median(zncc) < 0.85, np.median(zncc)
    assert (zncc < 0.5).mean() > 0.4, (zncc < 0.5).mean()


def test_klt_distinctiveness_flags_periodic_texture():
    """The alias-ambiguity probe: a keypoint on strictly periodic texture
    (period ~= the probe offset) must report a near-zero distinctiveness
    margin, while keypoints on broadband texture keep a clear margin."""
    import jax
    import jax.numpy as jnp

    H, W = 128, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    period = 2.5
    periodic = 127.5 + 100.0 * np.sin(2 * np.pi * xx / period)
    rng = np.random.default_rng(5)
    broadband = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # Smooth the broadband noise a little so gradients are sane.
    k = np.array([0.25, 0.5, 0.25])
    for axis in (0, 1):
        broadband = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), axis, broadband)

    def run(img):
        pyr = jnp.asarray(img)[None]            # single-level pyramid
        level_wh = jnp.asarray([[W, H]], jnp.float32)
        uv = jnp.asarray([[64.0, 64.0]], jnp.float32)
        level = jnp.zeros(1, jnp.int32)
        angle = jnp.zeros(1, jnp.float32)
        # Template = the true content at the keypoint.
        from orb_slam3_study_kr_tpu.ops.orb import PATCH_R
        P = 2 * PATCH_R + 1
        tmpl = img[64 - PATCH_R: 64 + PATCH_R + 1,
                   64 - PATCH_R: 64 + PATCH_R + 1][None]
        out = klt.klt_refine(pyr, level_wh, uv, level, angle,
                             jnp.asarray(tmpl), jnp.ones(1, bool))
        return float(np.asarray(out[1])[0]), float(np.asarray(out[4])[0])

    z_per, d_per = run(periodic)
    z_bb, d_bb = run(broadband)
    assert z_per > 0.9 and z_bb > 0.9          # both align perfectly...
    assert d_per < 0.05, d_per                 # ...but periodic is ambiguous
    assert d_bb > 0.3, d_bb                    # noise texture is distinctive
