"""Place-recognition tests: vocabulary descent sanity, same-place vs
different-place discrimination, database candidate retrieval."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_study_kr_tpu.bow import (BinaryVocabulary, KeyframeDatabase,
                                        train_vocabulary)
from orb_slam3_study_kr_tpu.bow.vocabulary import bow_vector, l1_score, transform
from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.ops import orb

CFG = orb.OrbConfig()


@pytest.fixture(scope="module")
def voc_and_frames():
    rng = np.random.default_rng(7)
    world = synthetic.make_textured_world(np.random.default_rng(3), depth=6.0)
    n = 10
    R, t = synthetic.lateral_trajectory(n, x_span=2.5)
    frames = []
    descs = []
    for i in range(n):
        img = synthetic.render_textured(world, R[i], t[i], rng=rng)
        f = orb.extract_orb(jnp.asarray(img), CFG)
        frames.append(f)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    train = np.concatenate(descs[::2])
    voc = train_vocabulary(train, k=8, L=3, seed=0)
    return voc, frames


def test_transform_word_range(voc_and_frames):
    voc, frames = voc_and_frames
    words, w = transform(voc, frames[0].desc, frames[0].valid)
    words = np.asarray(words)
    assert words.min() >= 0 and words.max() < voc.n_words
    # A decent spread of words must be in use.
    assert len(np.unique(words)) > 50


def test_same_place_scores_higher(voc_and_frames):
    voc, frames = voc_and_frames
    # Frames 0 and 1 overlap almost fully; frame 9 is far away.
    v0 = bow_vector(voc, frames[0].desc, frames[0].valid)
    v1 = bow_vector(voc, frames[1].desc, frames[1].valid)
    v9 = bow_vector(voc, frames[9].desc, frames[9].valid)
    s_near = float(l1_score(v0, v1))
    s_far = float(l1_score(v0, v9))
    assert s_near > s_far + 0.05, (s_near, s_far)


def test_database_retrieval(voc_and_frames):
    voc, frames = voc_and_frames
    db = KeyframeDatabase(voc)
    for i, f in enumerate(frames[1:], start=1):
        db.add(i, np.asarray(f.desc), np.asarray(f.valid))
    cands = db.detect_candidates(
        np.asarray(frames[0].desc), np.asarray(frames[0].valid), n_best=3)
    assert cands, "no candidates"
    assert cands[0] in (1, 2), f"best candidate {cands} should be a neighbor"
    # Excluding the neighbors must not return them.
    cands2 = db.detect_candidates(
        np.asarray(frames[0].desc), np.asarray(frames[0].valid),
        exclude=(1, 2, 3), n_best=3)
    assert all(c not in (1, 2, 3) for c in cands2)


def test_database_erase(voc_and_frames):
    voc, frames = voc_and_frames
    db = KeyframeDatabase(voc)
    db.add(1, np.asarray(frames[1].desc), np.asarray(frames[1].valid))
    db.erase(1)
    assert db.detect_candidates(
        np.asarray(frames[0].desc), np.asarray(frames[0].valid)) == []
