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


# ---------------------------------------------------------------------------
# General (possibly unbalanced) vocabulary trees — the shape of DBoW2's
# TemplatedVocabulary when loaded from ORBvoc.txt
# (reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h loadFromTextFile).
# Unlike BinaryVocabulary's complete k-ary layout, nodes here carry explicit
# child tables, so clusters that produced < k children still descend
# correctly.  Leaves self-loop, so the batched descent is a fixed
# `depth`-step gather/argmin regardless of where each branch bottoms out.
# Centers are stored bit-packed ((n_nodes, 32) uint8) with XOR+popcount
# Hamming — at ORBvoc scale (~1.1M nodes) this is ~35 MB instead of 280 MB.
# ---------------------------------------------------------------------------


def pack_bits(desc):
    """(N, 256) {0,1} -> (N, 32) packed uint8 (big-endian bit order, matching
    np.packbits)."""
    d = jnp.reshape(desc.astype(jnp.uint8), (*desc.shape[:-1], 32, 8))
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(d * w, axis=-1, dtype=jnp.uint8)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TreeVocabulary:
    centers: jnp.ndarray      # (n_nodes, 32) packed uint8; root row unused
    children: jnp.ndarray     # (n_nodes, k) int32; missing -> self-loop
    child_valid: jnp.ndarray  # (n_nodes, k) bool
    node_word: jnp.ndarray    # (n_nodes,) int32; -1 for internal nodes
    node_weight: jnp.ndarray  # (n_nodes,) float32; leaf idf weight
    k: int = field(metadata=dict(static=True), default=10)
    L: int = field(metadata=dict(static=True), default=6)
    n_words_static: int = field(metadata=dict(static=True), default=0)
    # Actual max leaf depth from the parent chains; the descent runs this
    # many steps (the reference descends until a leaf, so a file whose
    # leaves sit deeper than the header L must be caught at load).
    depth: int = field(metadata=dict(static=True), default=0)

    @property
    def n_words(self):
        return self.n_words_static


@jax.jit
def transform_tree(voc: TreeVocabulary, desc, valid):
    """Batched descent of a general tree: (N, 256) -> (word (N,), weight (N,))."""
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)  # root
    dp = pack_bits(desc)            # (N, 32)
    big = jnp.int32(512)
    for _ in range(voc.depth or voc.L):
        cand = voc.children[node]                       # (N, k)
        cc = voc.centers[cand]                          # (N, k, 32) packed
        ham = jnp.sum(
            jax.lax.population_count(cc ^ dp[:, None, :]).astype(jnp.int32),
            axis=-1)
        ham = jnp.where(voc.child_valid[node], ham, big)
        j = jnp.argmin(ham, axis=1).astype(jnp.int32)
        node = cand[jnp.arange(n), j]
    word = jnp.maximum(voc.node_word[node], 0)
    w = voc.node_weight[node] * valid
    return word, w


def words_and_weights(voc, desc, valid):
    """Dispatch transform over either vocabulary class."""
    if isinstance(voc, TreeVocabulary):
        return transform_tree(voc, desc, valid)
    return transform(voc, desc, valid)


def bow_vector_any(voc, desc, valid):
    """Dense L1-normalized tf-idf vector for either vocabulary class."""
    words, w = words_and_weights(voc, desc, valid)
    v = jnp.zeros(voc.n_words, jnp.float32).at[words].add(w)
    s = jnp.sum(jnp.abs(v))
    return v / jnp.maximum(s, 1e-9)


def load_dbow2_text(path) -> TreeVocabulary:
    """Load a DBoW2 text vocabulary (the ORBvoc.txt format).

    Format (TemplatedVocabulary<FORB>::loadFromTextFile): header line
    ``k L scoring weighting``; then one line per non-root node in id order
    (ids start at 1, root is 0): ``parent_id is_leaf b0 .. b31 weight`` where
    b* are the 32 descriptor bytes.  Word ids are assigned to leaves in file
    order, as in the reference loader.

    First load of a big vocabulary is text-parse-bound; cache the result
    with save_vocabulary and reload the .npz thereafter."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        body = np.loadtxt(f, dtype=np.float64, ndmin=2)
    n_nodes = body.shape[0] + 1
    parent = body[:, 0].astype(np.int64)
    is_leaf = body[:, 1] != 0
    desc_bytes = body[:, 2:34].astype(np.uint8)
    weight = body[:, 34].astype(np.float32)

    centers = np.zeros((n_nodes, 32), np.uint8)
    centers[1:] = desc_bytes
    node_ids = np.arange(1, n_nodes, dtype=np.int32)

    # Child tables, vectorized: group node ids by parent (stable order keeps
    # the file's child order, as the reference's push_back does).
    order = np.argsort(parent, kind="stable")
    p_s = parent[order]
    n_s = node_ids[order]
    starts = np.r_[0, np.flatnonzero(np.diff(p_s)) + 1]
    group_len = np.diff(np.r_[starts, p_s.size])
    rank = np.arange(p_s.size) - np.repeat(starts, group_len)
    if rank.size and rank.max() >= k:
        raise ValueError(
            f"vocabulary node has {rank.max() + 1} children, header k={k}")
    children = np.tile(np.arange(n_nodes, dtype=np.int32)[:, None], (1, k))
    child_valid = np.zeros((n_nodes, k), bool)
    children[p_s, rank] = n_s
    child_valid[p_s, rank] = True

    # Leaf depth via vectorized parent-chain climbing (O(depth) passes).
    # The descent must reach every leaf: reject files whose leaves sit
    # deeper than the header L rather than silently landing on an internal
    # node (word 0 / weight 0).
    d = np.ones(node_ids.size, np.int64)
    anc = parent.copy()
    for _ in range(256):
        m = anc > 0
        if not m.any():
            break
        d[m] += 1
        anc = np.where(m, parent[np.maximum(anc, 1) - 1], 0)
    else:
        raise ValueError("vocabulary parent chain does not terminate")
    max_depth = int(d[is_leaf].max()) if is_leaf.any() else 0
    if max_depth > L:
        raise ValueError(
            f"vocabulary leaves at depth {max_depth} exceed header L={L}")

    node_word = np.full(n_nodes, -1, np.int32)
    leaf_ids = node_ids[is_leaf]
    node_word[leaf_ids] = np.arange(leaf_ids.size, dtype=np.int32)
    node_weight = np.zeros(n_nodes, np.float32)
    node_weight[1:] = np.where(is_leaf, weight, 0.0)

    return TreeVocabulary(
        centers=jnp.asarray(centers),
        children=jnp.asarray(children),
        child_valid=jnp.asarray(child_valid),
        node_word=jnp.asarray(node_word),
        node_weight=jnp.asarray(node_weight),
        k=k, L=L, n_words_static=int(leaf_ids.size), depth=max_depth,
    )


def vocabulary_arrays(voc) -> dict:
    """Canonical array form of either vocabulary class (serialization +
    checksum input)."""
    if isinstance(voc, TreeVocabulary):
        return dict(
            kind="tree", centers=np.asarray(voc.centers),
            children=np.asarray(voc.children),
            child_valid=np.asarray(voc.child_valid),
            node_word=np.asarray(voc.node_word),
            node_weight=np.asarray(voc.node_weight),
            k=voc.k, L=voc.L, n_words=voc.n_words_static, depth=voc.depth)
    return dict(
        kind="complete", centers=np.asarray(voc.centers),
        word_weights=np.asarray(voc.word_weights),
        level_offsets=np.asarray(voc.level_offsets),
        k=voc.k, L=voc.L)


def vocabulary_checksum(voc) -> str:
    """Content digest binding a session to its vocabulary (the role of the
    reference's MD5 of the ORBvoc file, System.cc:1508 CalculateCheckSum —
    computed over the decoded content so text/.npz carriers of the same
    tree agree)."""
    import hashlib
    h = hashlib.md5()
    arrs = vocabulary_arrays(voc)
    for key in sorted(arrs):
        v = arrs[key]
        h.update(key.encode())
        if isinstance(v, np.ndarray):
            h.update(np.ascontiguousarray(v).tobytes())
        else:
            h.update(str(v).encode())
    return h.hexdigest()


def vocabulary_from_arrays(z) -> "TreeVocabulary | BinaryVocabulary":
    """Inverse of vocabulary_arrays (also accepts an npz mapping)."""
    if str(z["kind"]) == "tree":
        centers = np.asarray(z["centers"])
        if centers.shape[-1] == 256:  # legacy unpacked bits
            centers = np.packbits(centers, axis=-1)
        return TreeVocabulary(
            centers=jnp.asarray(centers),
            children=jnp.asarray(z["children"]),
            child_valid=jnp.asarray(z["child_valid"]),
            node_word=jnp.asarray(z["node_word"]),
            node_weight=jnp.asarray(z["node_weight"]),
            k=int(z["k"]), L=int(z["L"]), n_words_static=int(z["n_words"]),
            depth=int(z["depth"]) if "depth" in z else int(z["L"]))
    return BinaryVocabulary(
        centers=jnp.asarray(z["centers"]),
        word_weights=jnp.asarray(z["word_weights"]),
        level_offsets=tuple(int(o) for o in np.asarray(z["level_offsets"])),
        k=int(z["k"]), L=int(z["L"]))


def save_vocabulary(voc, path):
    """Serialize either vocabulary class to one .npz (System save parity)."""
    np.savez_compressed(path, **vocabulary_arrays(voc))


def load_vocabulary(path):
    return vocabulary_from_arrays(np.load(path, allow_pickle=False))
