"""Hierarchical binary vocabulary (TemplatedVocabulary equivalent).

Training is offline host-side numpy (hierarchical k-means with majority-bit
medians and Hamming assignment — the same construction DBoW2 uses, fitted
to our own descriptors since the pattern differs from the reference's).
The transform is fully batched jnp: descriptors descend the complete k-ary
tree one level at a time; at scale (k <= 10, L <= 4) the per-level candidate
gather plus Hamming argmin is a handful of small matmuls.

Word weights are idf over the training corpus (DBoW2 TF_IDF default).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BinaryVocabulary:
    # Complete k-ary tree stored per level: level l in [0, L) has k^(l+1)
    # centers; centers[level_offsets[l] + parent*k + j].
    centers: jnp.ndarray       # flat (n_internal, 256)
    word_weights: jnp.ndarray  # (k^L,)
    level_offsets: tuple = field(metadata=dict(static=True), default=())
    k: int = field(metadata=dict(static=True), default=10)
    L: int = field(metadata=dict(static=True), default=3)

    @property
    def n_words(self):
        return self.k ** self.L


def _kmeans_binary(desc, k, iters=8, rng=None):
    """Binary k-means: Hamming assignment, majority-bit centers."""
    n = desc.shape[0]
    if n <= k:
        centers = np.zeros((k, desc.shape[1]), np.uint8)
        centers[:n] = desc
        return centers
    idx = rng.choice(n, k, replace=False)
    centers = desc[idx].copy()
    for _ in range(iters):
        d = (desc[:, None, :] != centers[None, :, :]).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = desc[assign == j]
            if len(sel):
                centers[j] = (sel.mean(0) > 0.5).astype(np.uint8)
    return centers


def train_vocabulary(descriptors, k=10, L=3, seed=0) -> BinaryVocabulary:
    """Hierarchical k-means over (N, 256) uint8 {0,1} descriptors."""
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, np.uint8)
    levels = []
    # Build level by level: at level l there are k^(l+1) centers.
    groups = [desc]  # descriptor sets per node of previous level
    for l in range(L):
        centers_l = np.zeros((k ** (l + 1), desc.shape[1]), np.uint8)
        next_groups = []
        for gi, g in enumerate(groups):
            c = _kmeans_binary(g, k, rng=rng)
            centers_l[gi * k : (gi + 1) * k] = c
            if l < L - 1:
                if len(g):
                    d = (g[:, None, :] != c[None, :, :]).sum(-1)
                    a = d.argmin(1)
                    next_groups.extend(g[a == j] for j in range(k))
                else:
                    next_groups.extend([g] * k)
        levels.append(centers_l)
        groups = next_groups
    flat = np.concatenate(levels, axis=0)
    offsets = []
    off = 0
    for l in range(L):
        offsets.append(off)
        off += k ** (l + 1)

    voc = BinaryVocabulary(
        centers=jnp.asarray(flat),
        word_weights=jnp.ones(k ** L, jnp.float32),
        level_offsets=tuple(offsets),
        k=k, L=L,
    )
    # idf weights from the training corpus.
    words = np.asarray(transform(voc, jnp.asarray(desc),
                                 jnp.ones(desc.shape[0], bool))[0])
    counts = np.bincount(words, minlength=k ** L).astype(np.float64)
    idf = np.log(max(desc.shape[0], 1) / np.maximum(counts, 1.0))
    return BinaryVocabulary(
        centers=voc.centers,
        word_weights=jnp.asarray(idf, jnp.float32),
        level_offsets=tuple(offsets), k=k, L=L,
    )


@jax.jit
def transform(voc: BinaryVocabulary, desc, valid):
    """(N, 256) descriptors -> (word_id (N,), weight (N,)).

    Batched tree descent; invalid slots get word 0 / weight 0."""
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)  # parent index within its level
    d16 = desc.astype(jnp.int16)
    for l in range(voc.L):
        base = voc.level_offsets[l] + node * voc.k  # (N,)
        cand = voc.centers[base[:, None] + jnp.arange(voc.k)[None, :]]  # (N, k, 256)
        ham = jnp.sum(cand.astype(jnp.int16) != d16[:, None, :], axis=-1)
        j = jnp.argmin(ham, axis=1).astype(jnp.int32)
        node = node * voc.k + j
    w = voc.word_weights[node] * valid
    return node, w


def bow_vector(voc: BinaryVocabulary, desc, valid):
    """Dense L1-normalized tf-idf vector (n_words,)."""
    words, w = transform(voc, desc, valid)
    v = jnp.zeros(voc.n_words, jnp.float32).at[words].add(w)
    s = jnp.sum(jnp.abs(v))
    return v / jnp.maximum(s, 1e-9)


def l1_score(v1, v2):
    """DBoW2 L1 scoring: 1 - 0.5 |v1 - v2|_1 for L1-normalized vectors."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)
