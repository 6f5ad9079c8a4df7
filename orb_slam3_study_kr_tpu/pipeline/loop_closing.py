"""Loop detection and correction (replaces src/LoopClosing.cc, visual path).

Per keyframe: query the BoW database (excluding the covisible group),
geometrically verify candidates with dense descriptor matching + Sim3 RANSAC
(the reference's nBoWMatches=20 / nSim3Inliers=20 gates, LoopClosing.cc:
583-587), and on acceptance correct the loop: build the essential graph
(sequential chain + strong-covisibility edges + the loop edge), run the
Sim3 pose-graph solve, and re-express landmarks through their reference
keyframe's correction.  Map merging across Atlas maps reuses the same
verification (round-2 scope).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.bow.database import KeyframeDatabase
from orb_slam3_study_kr_tpu.ops.track_match import match_by_descriptor
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState
from orb_slam3_study_kr_tpu.solvers.pose_graph import (optimize_pose_graph,
                                                       relative_sim3)
from orb_slam3_study_kr_tpu.solvers.sim3_solver import ransac_sim3

MIN_MAP_KFS = 12        # reference skips loop detection below 12 KFs
MIN_BOW_MATCHES = 20
MIN_SIM3_INLIERS = 20
COVIS_EDGE_WEIGHT = 100


@dataclass
class LoopCloser:
    cfg: "TrackerConfig"
    map: MapState
    db: KeyframeDatabase
    inertial: bool = False
    run_gba: bool = True    # full-map BA after the pose-graph correction
    gba_iters: int = 10     # LoopClosing.cc:2289 nIterations=10
    ba_mesh: object = None  # jax.sharding.Mesh -> landmark-sharded GBA
    stats: dict = field(default_factory=lambda: {
        "n_queries": 0, "n_candidates": 0, "n_verified": 0, "n_corrected": 0,
        "n_gba": 0})
    _key: object = None

    def __post_init__(self):
        if self._key is None:
            self._key = jax.random.PRNGKey(17)

    # ------------------------------------------------------------------
    def process_keyframe(self, kf: int):
        """Detect + correct; then index the keyframe.  Returns True if a
        loop was corrected."""
        m = self.map
        corrected = False
        if m.n_kf >= MIN_MAP_KFS:
            self.stats["n_queries"] += 1
            cands = self._detect(kf)
            self.stats["n_candidates"] += len(cands)
            for cand in cands:
                sim3 = self._verify(kf, cand)
                if sim3 is not None:
                    self.stats["n_verified"] += 1
                    self._correct(kf, cand, sim3)
                    self.stats["n_corrected"] += 1
                    corrected = True
                    break
        self.db.add(kf, m.kf_desc[kf, : m.max_kp], m.kf_kp_valid[kf])
        return corrected

    # ------------------------------------------------------------------
    def _detect(self, kf: int):
        m = self.map
        covis, _ = m.covisibility(kf, min_shared=5)
        exclude = set(covis.tolist()) | {kf}
        return self.db.detect_candidates(
            m.kf_desc[kf], m.kf_kp_valid[kf],
            exclude=exclude,
            covisibility=lambda k: m.covisibility(k, min_shared=15)[0][:5],
            n_best=3,
        )

    # ------------------------------------------------------------------
    def _verify(self, kf: int, cand: int):
        """Descriptor matching between landmark-bound keypoints, then Sim3
        RANSAC in the two camera frames."""
        m = self.map
        b1 = m.kf_kp_lm[kf] != NO_LM
        b2 = m.kf_kp_lm[cand] != NO_LM
        idx, ok, _ = match_by_descriptor(
            jnp.asarray(m.kf_desc[kf]), jnp.asarray(m.kf_kp_valid[kf] & b1),
            jnp.asarray(m.kf_desc[cand]), jnp.asarray(m.kf_kp_valid[cand] & b2),
        )
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        if ok.sum() < MIN_BOW_MATCHES:
            return None
        kp1 = np.nonzero(ok)[0]
        kp2 = idx[kp1]
        lm1 = m.kf_kp_lm[kf, kp1]
        lm2 = m.kf_kp_lm[cand, kp2]
        # Camera-frame positions of each side's landmark.
        P1 = m.lm_pos[lm1] @ m.kf_R[kf].T + m.kf_t[kf]
        P2 = m.lm_pos[lm2] @ m.kf_R[cand].T + m.kf_t[cand]
        uv1 = m.kf_kp_uv[kf, kp1]
        uv2 = m.kf_kp_uv[cand, kp2]
        N = 256
        def pad(a, fill=0):
            out = np.full((N, *a.shape[1:]), fill, a.dtype)
            out[: min(len(a), N)] = a[:N]
            return out
        mask = pad(np.ones(len(kp1), np.float32))
        self._key, sub = jax.random.split(self._key)
        out = ransac_sim3(
            sub, jnp.asarray(pad(P1)), jnp.asarray(pad(P2)), jnp.asarray(mask),
            jnp.asarray(pad(uv1)), jnp.asarray(pad(uv2)),
            self.cfg.K, fix_scale=self.inertial,
        )
        if int(out["n_inliers"]) < MIN_SIM3_INLIERS:
            return None
        return out

    # ------------------------------------------------------------------
    def _correct(self, kf: int, cand: int, sim3):
        """Essential-graph correction: the loop edge constrains
        S_kf = S12 . S_cand (S maps world -> camera, Sim3 with the
        estimated scale)."""
        m = self.map
        kfs = np.nonzero(m.kf_valid)[0]
        K = kfs.size
        pos = {int(k): i for i, k in enumerate(kfs)}
        R = jnp.asarray(m.kf_R[kfs])
        t = jnp.asarray(m.kf_t[kfs])
        s = jnp.ones(K)

        # Record old poses for landmark correction.
        R_old = m.kf_R[kfs].copy()
        t_old = m.kf_t[kfs].copy()

        ei, ej, Rm, tm, sm, w = [], [], [], [], [], []

        def add_edge(i, j, Rrel, trel, srel, weight=1.0):
            ei.append(pos[i]); ej.append(pos[j])
            Rm.append(Rrel); tm.append(trel); sm.append(srel); w.append(weight)

        # Sequential chain (the spanning-tree stand-in).
        for a, b in zip(kfs[1:], kfs[:-1]):
            r = relative_sim3(R[pos[a]], t[pos[a]], s[pos[a]],
                              R[pos[b]], t[pos[b]], s[pos[b]])
            add_edge(int(a), int(b), *r)
        # Strong covisibility edges.
        for i in kfs:
            nb, wts = m.covisibility(int(i), min_shared=COVIS_EDGE_WEIGHT)
            for j, _ in zip(nb[:5], wts):
                if int(j) > int(i) + 1:
                    r = relative_sim3(R[pos[int(i)]], t[pos[int(i)]], s[pos[int(i)]],
                                      R[pos[int(j)]], t[pos[int(j)]], s[pos[int(j)]])
                    add_edge(int(i), int(j), *r)
        # The loop edge: S_kf_corrected = S12 . S_cand  =>  relative
        # S_kf . S_cand^-1 measured as S12.
        add_edge(kf, cand,
                 jnp.asarray(np.asarray(sim3["R12"])),
                 jnp.asarray(np.asarray(sim3["t12"])),
                 jnp.asarray(float(sim3["s12"])), weight=5.0)

        fixed = np.zeros(K, np.float32)
        fixed[pos[int(kfs[0])]] = 1.0
        dof = 4 if self.inertial else 7
        R_f, t_f, s_f = optimize_pose_graph(
            R, t, s,
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.stack(Rm), jnp.stack(tm),
            jnp.stack([jnp.asarray(x, jnp.float32) for x in sm]),
            jnp.asarray(w, jnp.float32), jnp.asarray(fixed),
            n_iters=20, dof=dof,
        )
        R_f = np.asarray(R_f)
        t_f = np.asarray(t_f)
        s_f = np.asarray(s_f)

        # Apply: scaled-rigid per keyframe (divide translation by scale to
        # keep SE3 poses, the reference's [R | t/s] normalization).
        m.kf_R[kfs] = R_f
        m.kf_t[kfs] = t_f / s_f[:, None]

        # Landmarks: re-express through the keyframe that first observed
        # them (CorrectLoop's reference-KF correction).
        lms = np.nonzero(m.lm_valid)[0]
        if lms.size:
            ref_kf = m.lm_first_kf[lms]
            ref_kf = np.clip(ref_kf, 0, m.max_kf - 1)
            ref_idx = np.array([pos.get(int(k), 0) for k in ref_kf])
            Ro = R_old[ref_idx]
            to = t_old[ref_idx]
            Rn = R_f[ref_idx]
            tn = t_f[ref_idx]
            sn = s_f[ref_idx]
            # X_new = S_new^-1( S_old(X) ): push through the old SE3, pull
            # back through the corrected Sim3 (CorrectLoop's
            # correctedSwc.map(Siw.map(P3Dw))).
            pc = np.einsum("nij,nj->ni", Ro, m.lm_pos[lms]) + to
            m.lm_pos[lms] = np.einsum(
                "nji,nj->ni", Rn, pc - tn) / sn[:, None]
        m.change_idx += 1
        # Global BA refines the pose-graph solution over the whole map
        # (RunGlobalBundleAdjustment, LoopClosing.cc:2273).
        if self.run_gba:
            from orb_slam3_study_kr_tpu.pipeline.global_ba import (
                global_bundle_adjustment)
            if global_bundle_adjustment(self.cfg, m, n_iters=self.gba_iters,
                                        mesh=self.ba_mesh):
                self.stats["n_gba"] += 1
