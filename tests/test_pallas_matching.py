"""Fused Hamming-NN Pallas kernel vs the dense jnp reference (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.ops.matching import BIG, hamming_matrix
from orb_slam3_study_kr_tpu.ops.pallas_matching import hamming_nn_pallas


def test_pallas_nn_matches_dense(rng):
    Q, T = 128, 1024
    q = (rng.random((Q, 256)) > 0.5).astype(np.uint8)
    t = (rng.random((T, 256)) > 0.5).astype(np.uint8)
    tv = (rng.random(T) > 0.2).astype(np.float32)
    best, second, idx = hamming_nn_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
        tile_t=256, interpret=True)
    D = np.asarray(hamming_matrix(jnp.asarray(q), jnp.asarray(t)))
    D = np.where(tv[None, :] > 0, D, BIG)
    ref_idx = D.argmin(1)
    ref_best = D.min(1)
    D2 = D.copy()
    D2[np.arange(Q), ref_idx] = BIG
    ref_second = D2.min(1)
    np.testing.assert_allclose(np.asarray(best), ref_best, atol=1e-3)
    np.testing.assert_allclose(np.asarray(second), ref_second, atol=1e-3)
    # Hamming distances are integers, so exact ties happen; the kernel's
    # tile-sequential fold may break them differently than a flat argmin.
    # Any true minimizer is a correct answer.
    idx = np.asarray(idx)
    assert (D[np.arange(Q), idx] == ref_best).all()


def test_pallas_nn_all_invalid(rng):
    Q, T = 16, 256
    q = (rng.random((Q, 256)) > 0.5).astype(np.uint8)
    t = (rng.random((T, 256)) > 0.5).astype(np.uint8)
    tv = np.zeros(T, np.float32)
    best, second, idx = hamming_nn_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
        tile_t=128, interpret=True)
    assert float(jnp.min(best)) >= BIG * 0.99


def test_gated_nn_matches_jnp_matcher():
    """A/B: the fused Pallas gated-NN local-map matcher (interpret mode)
    must reproduce the plain-XLA match_local_map outputs exactly."""
    import functools
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.cameras import pinhole
    from orb_slam3_study_kr_tpu.ops.track_match import (match_local_map,
                                                        match_local_map_pallas)

    rng = np.random.default_rng(5)
    L, N = 256, 128
    params = jnp.asarray([458.0, 457.0, 376.0, 240.0, 0, 0, 0, 0, 0],
                         jnp.float32)
    project_fn = functools.partial(pinhole.project, params)
    lm_pos = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                       rng.uniform(3, 9, L)], -1).astype(np.float32)
    dirs = lm_pos / np.linalg.norm(lm_pos, axis=-1, keepdims=True)
    lm_min = rng.uniform(0.5, 1.0, L).astype(np.float32)
    lm_max = rng.uniform(8, 20, L).astype(np.float32)
    lm_desc = (rng.random((L, 256)) < 0.5).astype(np.uint8)
    lm_mask = (rng.random(L) < 0.9).astype(np.float32)
    # Frame keypoints: half are projections of landmarks (so real matches
    # exist inside the window gate), half random.
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    uv_lm = np.asarray(project_fn(jnp.asarray(lm_pos)))
    f_uv = uv_lm[:N] + rng.normal(0, 1.0, (N, 2)).astype(np.float32)
    f_desc = lm_desc[:N].copy()
    flip = rng.random((N, 256)) < 0.02
    f_desc = np.where(flip, 1 - f_desc, f_desc).astype(np.uint8)
    f_level = rng.integers(0, 3, N).astype(np.int32)
    f_valid = (rng.random(N) < 0.95)

    args = (project_fn, jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(lm_pos), jnp.asarray(dirs.astype(np.float32)),
            jnp.asarray(lm_min), jnp.asarray(lm_max),
            jnp.asarray(lm_desc), jnp.asarray(lm_mask),
            jnp.asarray(f_uv), jnp.asarray(f_level), jnp.asarray(f_desc),
            jnp.asarray(f_valid), 752, 480)
    kw = dict(th=3.0, level_slack=7)
    slot_a, ok_a, vis_a = match_local_map(*args, **kw)
    slot_b, ok_b, vis_b = match_local_map_pallas(*args, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(vis_a), np.asarray(vis_b))
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
    ok = np.asarray(ok_a)
    np.testing.assert_array_equal(np.asarray(slot_a)[ok],
                                  np.asarray(slot_b)[ok])
