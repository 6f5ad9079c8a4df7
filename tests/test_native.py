"""Native map-index engine: build, correctness vs numpy fallback, perf."""

import time

import numpy as np
import pytest

from orb_slam3_study_kr_tpu import native


@pytest.fixture(scope="module")
def built():
    native.build()
    assert native.available()
    return True


def _random_map(rng, n_kf=60, max_kp=512, max_lm=6000, fill=0.4):
    kf_kp_lm = np.full((n_kf, max_kp), -1, np.int32)
    mask = rng.random((n_kf, max_kp)) < fill
    kf_kp_lm[mask] = rng.integers(0, max_lm, mask.sum())
    kf_valid = np.zeros(n_kf, bool)
    kf_valid[: n_kf - 5] = True
    return kf_kp_lm, kf_valid, max_lm


def _numpy_covis(kf_kp_lm, kf_valid, kf_id, max_lm):
    lms = kf_kp_lm[kf_id]
    lms = lms[lms >= 0]
    seen = np.zeros(max_lm, bool)
    seen[lms] = True
    shared = (seen[np.maximum(kf_kp_lm, 0)] & (kf_kp_lm >= 0)).sum(axis=1)
    shared[kf_id] = 0
    shared[~kf_valid] = 0
    return shared.astype(np.int32)


def test_covisibility_matches_numpy(built, rng):
    kf_kp_lm, kf_valid, max_lm = _random_map(rng)
    for kf_id in (0, 3, 17):
        ours = native.covisibility_counts(kf_kp_lm, kf_valid.astype(np.uint8),
                                          kf_id, max_lm)
        ref = _numpy_covis(kf_kp_lm, kf_valid, kf_id, max_lm)
        np.testing.assert_array_equal(ours, ref)


def test_obs_counts_match_numpy(built, rng):
    kf_kp_lm, kf_valid, max_lm = _random_map(rng)
    ours = native.landmark_obs_counts(kf_kp_lm, kf_valid.astype(np.uint8), max_lm)
    flat = kf_kp_lm[kf_valid].ravel()
    flat = flat[flat >= 0]
    ref = np.bincount(flat, minlength=max_lm)
    np.testing.assert_array_equal(ours, ref)


def test_observations_coo(built, rng):
    kf_kp_lm, kf_valid, max_lm = _random_map(rng)
    sel = np.asarray([1, 4, 9], np.int32)
    okf, okp, olm = native.observations_coo(kf_kp_lm, sel)
    sub = kf_kp_lm[sel]
    r, c = np.nonzero(sub >= 0)
    np.testing.assert_array_equal(okf, sel[r])
    np.testing.assert_array_equal(okp, c.astype(np.int32))
    np.testing.assert_array_equal(olm, sub[r, c])


def test_replace_landmark(built, rng):
    kf_kp_lm, _, _ = _random_map(rng)
    target = int(kf_kp_lm[kf_kp_lm >= 0][0])
    expect = int((kf_kp_lm == target).sum())
    n = native.replace_landmark(kf_kp_lm, target, 99999)
    assert n == expect
    assert (kf_kp_lm == target).sum() == 0
    assert (kf_kp_lm == 99999).sum() == expect


def test_native_not_slower(built, rng):
    kf_kp_lm, kf_valid, max_lm = _random_map(rng, n_kf=200, max_kp=1024,
                                             max_lm=40000)
    u8 = kf_valid.astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(20):
        native.covisibility_counts(kf_kp_lm, u8, 10, max_lm)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        _numpy_covis(kf_kp_lm, kf_valid, 10, max_lm)
    t_numpy = time.perf_counter() - t0
    # The native loop must at least be in the same ballpark (it is usually
    # several times faster; guard only against a pathological regression).
    assert t_native < 3.0 * t_numpy, (t_native, t_numpy)
