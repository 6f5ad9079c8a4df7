"""Real-data parity kit tests.

1. The constants-parity audit (orb_slam3_study_kr_tpu/parity.py) must
   show no undocumented divergence from the reference's thresholds —
   SURVEY.md section 7 ranks threshold drift the #1 risk to ATE parity.
2. The DBoW2-text vocabulary path (the configuration every real-data run
   uses: System.cc:117 loadFromTextFile of ORBvoc.txt) must work end to
   end: detection + relocalization through a loaded ORBvoc-format file,
   not just the unit-level parser.
"""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu import parity


def test_constants_parity_audit():
    mismatches, deviations = parity.audit()
    assert not mismatches, "undocumented threshold drift vs reference:\n" + \
        "\n".join(f"{r.name}: ours={r.ours} ref={r.reference} ({r.citation})"
                  for r in mismatches)
    rows = parity.audit_rows()
    assert len(rows) >= 40
    # Every row cites a reference location; every deviation has a reason.
    assert all(":" in r.citation for r in rows)
    assert all(len(r.deviation) > 20 for r in deviations)


def _write_orbvoc_text(path, k=10, L=3, seed=3):
    """Emit a small vocabulary in the DBoW2 ORBvoc.txt format
    (TemplatedVocabulary::loadFromTextFile layout: header `k L s w`, then
    one `parent is_leaf b0..b31 weight` line per non-root node in id
    order)."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {L} 0 0"]
    next_id = 1
    frontier = [0]          # node ids of the previous level
    for depth in range(1, L + 1):
        new_frontier = []
        for parent in frontier:
            for _ in range(k):
                is_leaf = 1 if depth == L else 0
                b = rng.integers(0, 256, 32)
                w = 1.0 if is_leaf else 0.0
                lines.append(
                    f"{parent} {is_leaf} "
                    + " ".join(str(int(x)) for x in b) + f" {w}")
                new_frontier.append(next_id)
                next_id += 1
        frontier = new_frontier
    path.write_text("\n".join(lines) + "\n")
    return k ** L


@pytest.mark.slow
def test_orbvoc_pipeline_relocalization(tmp_path):
    """Pipeline configured with a DBoW2-format text vocabulary: the file
    loads at first keyframe, the recognition database indexes through it,
    and relocalization succeeds against it (the stock-ORBvoc real-data
    configuration, exercised end to end)."""
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.bow.vocabulary import TreeVocabulary
    from orb_slam3_study_kr_tpu.io import synthetic
    from orb_slam3_study_kr_tpu.ops import orb
    from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
    from orb_slam3_study_kr_tpu.pipeline.frame import Frame
    from orb_slam3_study_kr_tpu.pipeline.tracking import (TrackerConfig,
                                                          TrackState)

    voc_path = tmp_path / "voc.txt"
    n_words = _write_orbvoc_text(voc_path)

    rng = np.random.default_rng(4)
    world = synthetic.make_textured_world(np.random.default_rng(8),
                                          depth=6.0)
    n = 26
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=1.2, z_span=0.0,
                                              y_amp=0.0)
    slam = SlamSystem(SystemConfig(tracker=TrackerConfig(fps=10)))
    slam.cfg.vocabulary_path = str(voc_path)
    for i in range(n):
        img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
        slam.track_monocular(img, i * 0.1)
    assert slam.state == TrackState.OK
    # The session used the LOADED tree, not a trained one.
    assert isinstance(slam.voc, TreeVocabulary)
    assert slam.voc.n_words_static == n_words
    assert slam.db is not None and len(slam.db.vectors) >= 5
    assert slam.loop_closer.stats["n_queries"] > 0

    # Relocalize a fresh mid-sequence view through the ORBvoc index.
    img = synthetic.render_textured(world, R_gt[12], t_gt[12],
                                    rng=np.random.default_rng(123))
    cfg = slam.cfg.tracker
    feats = orb.extract_orb(jnp.asarray(img, jnp.float32), cfg.orb_config)
    frame = Frame(
        frame_id=999, timestamp=99.0,
        uv=np.asarray(feats.uv), level=np.asarray(feats.level),
        angle=np.asarray(feats.angle), response=np.asarray(feats.response),
        desc=np.asarray(feats.desc), valid=np.asarray(feats.valid),
    )
    assert slam._relocalize(frame), \
        "relocalization through the DBoW2-format vocabulary failed"
