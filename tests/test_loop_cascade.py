"""Loop-verification cascade tests (LoopClosing.cc:325-820 behavior).

A synthetic ring world: cameras on a circle looking outward at a landmark
cylinder.  The first pass binds true landmark entries; a drifted revisit
binds duplicate entries whose positions/poses carry an accumulated Sim3
drift — exactly the monocular loop-closure situation.  Verifies:

  * the cascade corrects a genuine loop only after >= 3 consecutive
    keyframes confirm it (temporal consistency),
  * a one-off detection (round 1 would have corrected immediately) is
    rejected when subsequent keyframes fail to re-verify,
  * appearance aliasing (same descriptors, different geometry) is stopped
    by the geometric stages,
  * SearchAndFuse welds the duplicate landmarks after correction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_study_kr_tpu.bow.database import KeyframeDatabase
from orb_slam3_study_kr_tpu.bow.vocabulary import train_vocabulary
from orb_slam3_study_kr_tpu.pipeline.loop_closing import LoopCloser
from orb_slam3_study_kr_tpu.pipeline.tracking import TrackerConfig
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState

CFG = TrackerConfig(fps=10)

N_FIRST = 18            # first-pass keyframes around the ring
R_CAM = 3.0             # camera circle radius
R_LM = 9.0              # landmark cylinder radius
N_LM = 1200


def _ring_pose(theta):
    """Outward-looking camera on the circle (world->cam)."""
    u = np.array([np.cos(theta), 0.0, np.sin(theta)])        # cam z (look)
    xh = np.array([-np.sin(theta), 0.0, np.cos(theta)])      # cam x
    yh = np.array([0.0, 1.0, 0.0])                           # cam y
    R_cw = np.stack([xh, yh, u]).astype(np.float32)
    c = (R_CAM * u).astype(np.float32)
    return R_cw, (-R_cw @ c).astype(np.float32)


def _project(R, t, X):
    p = X @ R.T + t
    z = p[:, 2]
    uv = np.stack([CFG.fx * p[:, 0] / z + CFG.cx,
                   CFG.fy * p[:, 1] / z + CFG.cy], -1)
    vis = (z > 0.2) & (uv[:, 0] > 10) & (uv[:, 0] < CFG.width - 10) \
        & (uv[:, 1] > 10) & (uv[:, 1] < CFG.height - 10)
    return uv.astype(np.float32), vis


def _flip_bits(rng, d, k=6):
    d = d.copy()
    idx = rng.integers(0, 256, k)
    d[idx] ^= 1
    return d


def _build_ring(rng, revisit_thetas=(), drift=None, alias_opposite=False):
    """Map with N_FIRST first-pass KFs; optional drifted revisit KFs.

    Returns (map, dup_ids dict true->dup, gt list of (R, t) for every KF)."""
    phi = rng.uniform(0, 2 * np.pi, N_LM)
    y = rng.uniform(-1.5, 1.5, N_LM)
    X = np.stack([R_LM * np.cos(phi), y, R_LM * np.sin(phi)], -1).astype(np.float32)
    desc = rng.integers(0, 2, (N_LM, 256)).astype(np.uint8)
    if alias_opposite:
        # Copy region-A (theta ~ 0) descriptors onto the opposite side:
        # same appearance, unrelated geometry.
        a = np.nonzero(np.cos(phi) > np.cos(np.deg2rad(25)))[0]
        b = np.nonzero(np.cos(phi) < -np.cos(np.deg2rad(25)))[0]
        n = min(a.size, b.size)
        desc[b[:n]] = desc[a[:n]]

    m = MapState(max_kf=32, max_kp=512, max_lm=4096)
    lm_ids = m.add_landmarks(X, desc, first_kf=0)
    gt = []

    def add_kf(R, t, R_gt=None, t_gt=None, bind_ids=None):
        """bind_ids: per-true-landmark target entry (defaults to originals)."""
        Rg = R if R_gt is None else R_gt
        tg = t if t_gt is None else t_gt
        uv, vis = _project(Rg, tg, X)
        sel = np.nonzero(vis)[0][: m.max_kp]
        d = np.stack([_flip_bits(rng, desc[j]) for j in sel])
        tgt = lm_ids[sel] if bind_ids is None else bind_ids[sel]
        kf = m.add_keyframe(
            R, t, uv[sel] + rng.normal(0, 0.3, (sel.size, 2)).astype(np.float32),
            np.zeros(sel.size, np.int32), np.zeros(sel.size, np.float32),
            np.ones(sel.size, bool), d, frame_id=m.next_kf,
            timestamp=float(m.next_kf), kp_lm=tgt)
        gt.append((Rg, tg))
        return kf

    for k in range(N_FIRST):
        add_kf(*_ring_pose(2 * np.pi * k / N_FIRST))

    dup_of = {}
    if revisit_thetas:
        Rd, td, sd = drift
        X_est = (sd * X @ Rd.T + td).astype(np.float32)
        bind_ids = lm_ids.copy()
        # Duplicate every landmark visible from any revisit pose.
        vis_any = np.zeros(N_LM, bool)
        for th in revisit_thetas:
            _, v = _project(*_ring_pose(th), X)
            vis_any |= v
        need = np.nonzero(vis_any)[0]
        dups = m.add_landmarks(X_est[need], desc[need], first_kf=N_FIRST)
        bind_ids[need] = dups
        dup_of = {int(lm_ids[j]): int(d) for j, d in zip(need, dups)}
        for th in revisit_thetas:
            Rg, tg = _ring_pose(th)
            R_est = (Rg @ Rd.T).astype(np.float32)
            t_est = (sd * tg - R_est @ td).astype(np.float32)
            add_kf(R_est, t_est, R_gt=Rg, t_gt=tg, bind_ids=bind_ids)

    m.update_landmark_stats(np.nonzero(m.lm_valid)[0])
    return m, dup_of, gt


def _closer(m, **kw):
    valid = np.nonzero(m.kf_valid)[0]
    descs = m.kf_desc[valid][m.kf_kp_valid[valid]]
    voc = train_vocabulary(jnp.asarray(descs[:4000]), k=8, L=3, seed=0)
    kw.setdefault("run_gba", False)
    return LoopCloser(cfg=CFG, map=m, db=KeyframeDatabase(voc=voc), **kw)


DRIFT = None


def _drift():
    from orb_slam3_study_kr_tpu import lie
    z = jnp.asarray([0.0, 0.05, 0.0, 0.15, 0.05, -0.1, np.log(1.06)],
                    jnp.float32)
    R, t, s = lie.exp_sim3(z)
    return np.asarray(R), np.asarray(t), float(s)


@pytest.mark.slow
def test_cascade_corrects_after_temporal_consistency():
    rng = np.random.default_rng(11)
    thetas = [0.0, 2 * np.pi / N_FIRST, 4 * np.pi / N_FIRST]
    m, dup_of, gt = _build_ring(rng, revisit_thetas=thetas, drift=_drift())
    lc = _closer(m)
    corrected_at = None
    for kf in range(m.next_kf):
        if lc.process_keyframe(kf):
            corrected_at = kf
    assert lc.stats["n_corrected"] == 1, lc.stats
    # Consistency: the FIRST revisit KF must not correct; the third may.
    assert corrected_at == N_FIRST + 2, (corrected_at, lc.stats)
    assert lc.loop_edges, "accepted loop edge must be recorded"

    # Poses of the revisit segment pulled back to ground truth.
    for i, kf in enumerate(range(N_FIRST, N_FIRST + 3)):
        Rg, tg = gt[kf]
        c_est = m.kf_center(kf)
        c_gt = -Rg.T @ tg
        assert np.linalg.norm(c_est - c_gt) < 0.25, (kf, c_est, c_gt)

    # SearchAndFuse welded the duplicates: most duplicate entries are dead
    # and their bindings now point at the originals.
    dups = np.array(list(dup_of.values()))
    alive = m.lm_valid[dups].mean()
    assert alive < 0.5, f"{alive:.2f} of duplicates still alive"
    assert lc.stats["n_fused_loop"] > 50, lc.stats


@pytest.mark.slow
def test_single_detection_rejected_without_consistency():
    """A loop region seen in ONE keyframe (then the camera moves elsewhere)
    must not correct — round 1's single-stage closer would have."""
    rng = np.random.default_rng(12)
    # One revisit at theta=0, then the drifted segment continues far away.
    thetas = [0.0, np.deg2rad(140.0), np.deg2rad(160.0)]
    m, _, _ = _build_ring(rng, revisit_thetas=thetas, drift=_drift())
    lc = _closer(m)
    for kf in range(m.next_kf):
        lc.process_keyframe(kf)
    assert lc.stats["n_corrected"] == 0, lc.stats
    if lc.stats["n_pending"]:
        assert lc.stats["n_rejected_temporal"] >= 1, lc.stats


@pytest.mark.slow
def test_appearance_alias_rejected_by_geometry():
    """Descriptors duplicated on the far side of the ring (same appearance,
    different geometry) must be stopped by the Sim3/projection stages."""
    rng = np.random.default_rng(13)
    m, _, _ = _build_ring(rng, alias_opposite=True)
    lc = _closer(m)
    for kf in range(m.next_kf):
        lc.process_keyframe(kf)
    assert lc.stats["n_corrected"] == 0, lc.stats
    assert lc.stats["n_pending"] == 0, lc.stats


def test_scw_composition_roundtrip():
    rng = np.random.default_rng(14)
    from orb_slam3_study_kr_tpu import lie
    z = jnp.asarray(rng.normal(0, 0.3, 7), jnp.float32)
    R12, t12, s12 = (np.asarray(a) for a in lie.exp_sim3(z))
    R_c, t_c = _ring_pose(0.7)
    Scw = LoopCloser._compose_scw(R12, t12, float(s12), R_c, t_c)
    R_b, t_b, s_b = LoopCloser._s12_from_scw(*Scw, R_c, t_c)
    np.testing.assert_allclose(R_b, R12, atol=1e-5)
    np.testing.assert_allclose(t_b, t12, atol=1e-5)
    np.testing.assert_allclose(s_b, float(s12), rtol=1e-6)


@pytest.mark.slow
def test_bow_window_aggregation_recalls_marginal_loop():
    """Stage-2 matching aggregates over the candidate's covisible window
    (LoopClosing.cc:620-692): a revisit viewed BETWEEN two first-pass
    keyframes splits its matches across them, so the window aggregate
    must strictly beat matching the candidate keyframe alone — the
    marginal-loop recall the single-KF stage missed (round-4 VERDICT)."""
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.ops.track_match import match_by_descriptor
    from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM

    rng = np.random.default_rng(15)
    # Revisit halfway between the keyframes at 0 and 20 degrees.
    theta_mid = np.pi / N_FIRST
    m, _, _ = _build_ring(rng, revisit_thetas=[theta_mid], drift=_drift())
    lc = _closer(m)
    kf = m.next_kf - 1              # the revisit keyframe
    for k in range(N_FIRST):
        lc.db.add(k, m.kf_desc[k, : m.max_kp], m.kf_kp_valid[k])
    cands = lc._detect(kf)
    assert len(cands) > 0
    cand = int(cands[0])

    kp1, lm2, win = lc._bow_window_match(kf, cand)
    assert len(win) > 1, "candidate window must include covisibles"

    b1 = m.kf_kp_lm[kf] != NO_LM
    b2 = m.kf_kp_lm[cand] != NO_LM
    _, ok, _ = match_by_descriptor(
        jnp.asarray(m.kf_desc[kf]), jnp.asarray(m.kf_kp_valid[kf] & b1),
        jnp.asarray(m.kf_desc[cand]), jnp.asarray(m.kf_kp_valid[cand] & b2))
    single = int(np.asarray(ok).sum())
    assert kp1.size > single, (kp1.size, single)
    assert kp1.size >= lc.min_bow_matches
