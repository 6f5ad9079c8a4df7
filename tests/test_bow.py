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


# ---------------------------------------------------------------------------
# TreeVocabulary / DBoW2 text loader
# ---------------------------------------------------------------------------


def _write_dbow2_text(path, k, L, nodes):
    """nodes: list of (parent, is_leaf, bytes(32,), weight) in id order."""
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        for p, leaf, b, w in nodes:
            f.write(f"{p} {int(leaf)} " + " ".join(str(int(x)) for x in b)
                    + f" {w}\n")


def _unbalanced_nodes(rng):
    """k=3, L=3 tree: a depth-1 leaf, a node with 2 (<k) children, and
    depth-2/-3 leaves."""
    b = lambda: rng.integers(0, 256, 32)
    return [
        (0, 0, b(), 0.0),   # 1: A (internal)
        (0, 0, b(), 0.0),   # 2: B (internal)
        (0, 1, b(), 0.7),   # 3: C leaf, depth 1
        (1, 1, b(), 1.1),   # 4: a1 leaf, depth 2
        (1, 1, b(), 1.2),   # 5: a2
        (1, 1, b(), 1.3),   # 6: a3
        (2, 0, b(), 0.0),   # 7: b1 (internal, B has only 2 children)
        (2, 1, b(), 2.1),   # 8: b2 leaf, depth 2
        (7, 1, b(), 3.1),   # 9-11: leaves, depth 3
        (7, 1, b(), 3.2),
        (7, 1, b(), 3.3),
    ]


def _descend_reference(nodes, bits):
    """Plain descend-until-leaf matching TemplatedVocabulary::transform."""
    children = {}
    for nid, (p, *_ ) in enumerate(nodes, start=1):
        children.setdefault(p, []).append(nid)
    centers = {nid: np.unpackbits(np.asarray(n[2], np.uint8))
               for nid, n in enumerate(nodes, start=1)}
    leaves = [nid for nid, n in enumerate(nodes, start=1) if n[1]]
    word_of = {nid: i for i, nid in enumerate(leaves)}
    node = 0
    while node not in word_of:
        ch = children[node]
        node = min(ch, key=lambda c: int((centers[c] != bits).sum()))
    return word_of[node], nodes[node - 1][3]


def test_load_dbow2_text_unbalanced(tmp_path):
    from orb_slam3_study_kr_tpu.bow.vocabulary import (load_dbow2_text,
                                                       transform_tree)
    rng = np.random.default_rng(5)
    nodes = _unbalanced_nodes(rng)
    p = tmp_path / "voc.txt"
    _write_dbow2_text(p, 3, 3, nodes)
    voc = load_dbow2_text(p)
    assert voc.n_words == 8
    assert voc.depth == 3
    desc = rng.integers(0, 2, (64, 256)).astype(np.uint8)
    words, w = transform_tree(voc, jnp.asarray(desc),
                              jnp.ones(64, bool))
    for i in range(64):
        ref_word, ref_weight = _descend_reference(nodes, desc[i])
        assert int(words[i]) == ref_word, i
        np.testing.assert_allclose(float(w[i]), ref_weight, rtol=1e-6)


def test_dbow2_depth_guard(tmp_path):
    """Leaves deeper than the header L must be rejected, not silently
    truncated to an internal node."""
    from orb_slam3_study_kr_tpu.bow.vocabulary import load_dbow2_text
    rng = np.random.default_rng(6)
    b = lambda: rng.integers(0, 256, 32)
    nodes = [(0, 0, b(), 0.0), (1, 0, b(), 0.0), (2, 1, b(), 1.0)]
    p = tmp_path / "bad.txt"
    _write_dbow2_text(p, 2, 2, nodes)  # leaf at depth 3, header L=2
    with pytest.raises(ValueError, match="depth"):
        load_dbow2_text(p)


def test_vocabulary_roundtrip(tmp_path, voc_and_frames):
    from orb_slam3_study_kr_tpu.bow.vocabulary import (load_dbow2_text,
                                                       load_vocabulary,
                                                       save_vocabulary,
                                                       transform_tree,
                                                       words_and_weights)
    voc, frames = voc_and_frames
    d = frames[0].desc
    v = frames[0].valid
    # Complete (trained) vocabulary.
    p1 = tmp_path / "complete.npz"
    save_vocabulary(voc, p1)
    voc2 = load_vocabulary(p1)
    w_a, x_a = words_and_weights(voc, d, v)
    w_b, x_b = words_and_weights(voc2, d, v)
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b))
    # Tree vocabulary.
    rng = np.random.default_rng(5)
    pt = tmp_path / "voc.txt"
    _write_dbow2_text(pt, 3, 3, _unbalanced_nodes(rng))
    tv = load_dbow2_text(pt)
    p2 = tmp_path / "tree.npz"
    save_vocabulary(tv, p2)
    tv2 = load_vocabulary(p2)
    w_a, x_a = transform_tree(tv, d, v)
    w_b, x_b = transform_tree(tv2, d, v)
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b))


@pytest.mark.slow
def test_inverted_file_at_orbvoc_scale():
    """k=10, L=6 (1M words, ~1.1M nodes): packed centers keep the tree small
    (~35 MB), queries stay fast through the inverted file."""
    import time
    from orb_slam3_study_kr_tpu.bow.vocabulary import TreeVocabulary

    k, L = 10, 6
    sizes = [k ** (l + 1) for l in range(L)]   # nodes per level
    n_nodes = 1 + sum(sizes)
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 256, (n_nodes, 32), dtype=np.uint8)
    children = np.tile(np.arange(n_nodes, dtype=np.int32)[:, None], (1, k))
    child_valid = np.zeros((n_nodes, k), bool)
    # Balanced complete tree: parents of level-l nodes are level l-1.
    ptr = 1
    prev = np.array([0])
    for l in range(L):
        cur = np.arange(ptr, ptr + sizes[l], dtype=np.int32)
        children[np.repeat(prev, k), np.tile(np.arange(k), prev.size)] = cur
        child_valid[prev] = True
        prev = cur
        ptr += sizes[l]
    node_word = np.full(n_nodes, -1, np.int32)
    node_word[prev] = np.arange(prev.size, dtype=np.int32)
    node_weight = np.zeros(n_nodes, np.float32)
    node_weight[prev] = 1.0
    voc = TreeVocabulary(
        centers=jnp.asarray(centers), children=jnp.asarray(children),
        child_valid=jnp.asarray(child_valid),
        node_word=jnp.asarray(node_word),
        node_weight=jnp.asarray(node_weight),
        k=k, L=L, n_words_static=prev.size, depth=L)
    assert voc.centers.nbytes < 40_000_000

    db = KeyframeDatabase(voc)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 2, (500, 256)).astype(np.uint8)
    for kf in range(20):
        d = base.copy()
        flip = rng.integers(0, 256, (500, 4))
        for j in range(500):
            d[j, flip[j]] ^= 1
        db.add(kf, jnp.asarray(d), jnp.ones(500, bool))
    # Sparse vectors: ~500 words per KF, not 1M.
    words, vals = db.vectors[0]
    assert words.size <= 500
    t0 = time.perf_counter()
    cands = db.detect_candidates(jnp.asarray(base), jnp.ones(500, bool),
                                 n_best=3)
    dt = time.perf_counter() - t0
    assert cands, "no candidates at scale"
    assert dt < 5.0, f"query took {dt:.2f}s"
