"""Keyframe recognition database (replaces src/KeyFrameDatabase.cc).

Stores one dense BoW vector per keyframe; a query scores the whole database
with one matvec.  Candidate selection reproduces the reference's logic
(KeyFrameDatabase.cc:432-517): only keyframes sharing enough words compete
(>= 0.8x the best common-word count), scores accumulate over covisibility
groups, and candidates within 0.75x of the best accumulated score survive.
"""

from dataclasses import dataclass, field

import numpy as np

from orb_slam3_study_kr_tpu.bow.vocabulary import bow_vector_any


@dataclass
class KeyframeDatabase:
    voc: object  # BinaryVocabulary | TreeVocabulary
    vectors: dict = field(default_factory=dict)  # kf_id -> np (n_words,)

    def add(self, kf_id, desc, valid):
        import jax.numpy as jnp
        self.vectors[kf_id] = np.asarray(
            bow_vector_any(self.voc, jnp.asarray(desc), jnp.asarray(valid)))

    def erase(self, kf_id):
        self.vectors.pop(kf_id, None)

    def clear(self):
        self.vectors.clear()

    def _scores(self, v_query, exclude):
        ids = [k for k in self.vectors if k not in exclude]
        if not ids:
            return np.empty(0, np.int64), np.empty(0), np.empty(0)
        M = np.stack([self.vectors[k] for k in ids])
        scores = 1.0 - 0.5 * np.abs(M - v_query[None]).sum(axis=1)
        common = ((M > 0) & (v_query[None] > 0)).sum(axis=1)
        return np.asarray(ids), scores, common

    def detect_candidates(self, desc, valid, exclude=(), covisibility=None,
                          n_best=3, min_common_ratio=0.8, retain_ratio=0.75):
        """Loop/merge candidates for a query image (DetectNBestCandidates).

        covisibility: optional callable kf_id -> iterable of covisible kf ids
        used for group score accumulation.  Returns up to n_best kf ids,
        best first."""
        import jax.numpy as jnp
        v = np.asarray(bow_vector_any(self.voc, jnp.asarray(desc), jnp.asarray(valid)))
        ids, scores, common = self._scores(v, set(exclude))
        if ids.size == 0:
            return []
        max_common = common.max()
        keep = common >= max(min_common_ratio * max_common, 1)
        ids, scores = ids[keep], scores[keep]
        if ids.size == 0:
            return []
        # Accumulate scores over covisibility groups.
        acc = scores.copy()
        if covisibility is not None:
            id_to_pos = {int(k): i for i, k in enumerate(ids)}
            for i, k in enumerate(ids):
                for nb in covisibility(int(k)):
                    j = id_to_pos.get(int(nb))
                    if j is not None and j != i:
                        acc[i] += scores[j]
        best = acc.max()
        order = np.argsort(-acc)
        out = [int(ids[i]) for i in order if acc[i] >= retain_ratio * best]
        return out[:n_best]

    def detect_relocalization_candidates(self, desc, valid, n_best=5):
        return self.detect_candidates(desc, valid, exclude=(),
                                      n_best=n_best, retain_ratio=0.5)
