"""Atlas map merging (reference src/LoopClosing.cc MergeLocal :1218 /
MergeLocal2 :1786).

When place recognition matches the current keyframe against a keyframe of a
*stored* map, the active map is welded into it:

1. Sim3 verification (same gates as loop closing) between the current KF
   (active map A) and the candidate KF (stored map B) gives S12 with
   q_kf = s12 R12 q_cand + t12 in camera frames.
2. The world transform  X_B = sigma R_BA X_A + t_BA  (sigma = 1/s12) is
   composed from S12 and the two keyframe poses, and applied wholesale to
   map A (keyframes, landmarks, normals, scale bands, velocities) — the
   MergeLocal2 strategy, which suits SoA tables better than the reference's
   visual-path incremental welding window.
3. Map A's rows are appended into map B's tables with landmark/keyframe id
   remapping; the Sim3 inlier pairs are fused (A-landmark replaced by its
   verified B duplicate — SearchAndFuse's role for the welding window).
4. A welding local BA runs around the current keyframe in the merged map
   (MergeLocal's mini-BA).

The merged map becomes the active map; the tracker is transplanted onto it
(bindings, reference keyframe, velocity and speed history re-scaled by
sigma).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.ops.track_match import match_by_descriptor
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState
from orb_slam3_study_kr_tpu.solvers.sim3_solver import ransac_sim3

MIN_BOW_MATCHES = 20
MIN_SIM3_INLIERS = 20


@dataclass
class MergeResult:
    target_map: MapState
    kf_map: dict      # old A kf id -> new B kf id
    lm_map: np.ndarray  # (A.max_lm,) old lm id -> new B lm id (or NO_LM)
    sigma: float
    R_BA: np.ndarray
    t_BA: np.ndarray
    target_kf: int = -1   # matched keyframe on the TARGET-map side


@dataclass
class MapMerger:
    cfg: "TrackerConfig"
    stats: dict = field(default_factory=lambda: {
        "n_attempts": 0, "n_verified": 0, "n_merged": 0})
    _key: object = None

    def __post_init__(self):
        if self._key is None:
            self._key = jax.random.PRNGKey(23)

    # ------------------------------------------------------------------
    def verify(self, mA: MapState, kf: int, mB: MapState, cand: int,
               fix_scale=False):
        """Cross-map Sim3 verification (DetectCommonRegionsFromBoW gates)."""
        self.stats["n_attempts"] += 1
        b1 = mA.kf_kp_lm[kf] != NO_LM
        b2 = mB.kf_kp_lm[cand] != NO_LM
        idx, ok, _ = match_by_descriptor(
            jnp.asarray(mA.kf_desc[kf]), jnp.asarray(mA.kf_kp_valid[kf] & b1),
            jnp.asarray(mB.kf_desc[cand]),
            jnp.asarray(mB.kf_kp_valid[cand] & b2),
        )
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        if ok.sum() < MIN_BOW_MATCHES:
            return None
        N = 256
        kp1 = np.nonzero(ok)[0][:N]  # RANSAC problem is padded to N pairs
        kp2 = idx[kp1]
        lm1 = mA.kf_kp_lm[kf, kp1]
        lm2 = mB.kf_kp_lm[cand, kp2]
        P1 = mA.lm_pos[lm1] @ mA.kf_R[kf].T + mA.kf_t[kf]
        P2 = mB.lm_pos[lm2] @ mB.kf_R[cand].T + mB.kf_t[cand]

        def pad(a, fill=0):
            out = np.full((N, *a.shape[1:]), fill, a.dtype)
            out[: min(len(a), N)] = a[:N]
            return out

        self._key, sub = jax.random.split(self._key)
        out = ransac_sim3(
            sub, jnp.asarray(pad(P1)), jnp.asarray(pad(P2)),
            jnp.asarray(pad(np.ones(len(kp1), np.float32))),
            jnp.asarray(pad(mA.kf_kp_uv[kf, kp1])),
            jnp.asarray(pad(mB.kf_kp_uv[cand, kp2])),
            self.cfg.K, fix_scale=fix_scale,
            project_fn=self.cfg.project_fn,
        )
        if int(out["n_inliers"]) < MIN_SIM3_INLIERS:
            return None
        self.stats["n_verified"] += 1
        inl = np.asarray(out["inliers"])[: len(kp1)].astype(bool)
        return dict(R12=np.asarray(out["R12"]), t12=np.asarray(out["t12"]),
                    s12=float(out["s12"]),
                    pairs=(lm1[inl], lm2[inl]))

    # ------------------------------------------------------------------
    def merge(self, mA: MapState, kf: int, mB: MapState, cand: int,
              sim3) -> MergeResult | None:
        """Weld active map A into stored map B.  The target map's tables
        grow on demand (MapState._ensure_*_capacity), so a merge never
        has to be refused for capacity."""
        kfsA = np.nonzero(mA.kf_valid)[0]
        lmsA = np.nonzero(mA.lm_valid)[0]

        # World transform  X_B = sigma R_BA X_A + t_BA  from
        # T_candB^-1 . S12^-1 . T_kfA  (q_kf = S12(q_cand)).
        R12, t12, s12 = sim3["R12"], sim3["t12"], sim3["s12"]
        sigma = 1.0 / s12
        Rk, tk = mA.kf_R[kf], mA.kf_t[kf]
        Rc, tc = mB.kf_R[cand], mB.kf_t[cand]
        R_BA = (Rc.T @ R12.T @ Rk).astype(np.float32)
        t_BA = (sigma * Rc.T @ R12.T @ (tk - t12) - Rc.T @ tc).astype(
            np.float32)

        # Inertial weld (MergeLocal2, /root/reference/src/LoopClosing.cc:
        # 1786-2069): both worlds are gravity-aligned (-z) and metric after
        # IMU initialization, so the TRUE relative transform is a yaw-only
        # rotation at unit scale.  Project R_BA onto a rotation about z,
        # keeping the current keyframe's camera center on its Sim3-verified
        # target so the weld point does not move.
        if mA.imu_initialized and mB.imu_initialized:
            cA = (-Rk.T @ tk).astype(np.float32)          # weld anchor in A
            target = sigma * R_BA @ cA + t_BA
            yaw = np.arctan2(R_BA[1, 0] - R_BA[0, 1],
                             R_BA[0, 0] + R_BA[1, 1])
            cy, sy = np.cos(yaw), np.sin(yaw)
            R_BA = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                            np.float32)
            sigma = 1.0
            t_BA = (target - sigma * R_BA @ cA).astype(np.float32)

        # ---- transform map A in place (frozen rows stay consistent with
        # the merged world for trajectory replay) ----
        k = mA.kf_valid
        mA.kf_R[k] = mA.kf_R[k] @ R_BA.T
        mA.kf_t[k] = (sigma * mA.kf_t[k]
                      - np.einsum("nij,j->ni", mA.kf_R[k], t_BA))
        mA.kf_v[k] = sigma * mA.kf_v[k] @ R_BA.T
        l = mA.lm_valid
        mA.lm_pos[l] = sigma * mA.lm_pos[l] @ R_BA.T + t_BA
        mA.lm_normal[l] = mA.lm_normal[l] @ R_BA.T
        mA.lm_min_dist[l] *= sigma
        mA.lm_max_dist[l] *= sigma
        mA.change_idx += 1

        # ---- landmark transfer with id remap ----
        lm_map = np.full(mA.max_lm, NO_LM, np.int32)
        new_ids = mB.add_landmarks(
            mA.lm_pos[lmsA], mA.lm_desc[lmsA], first_kf=0,
            patches=mA.lm_patch[lmsA])
        lm_map[lmsA] = new_ids
        mB.lm_normal[new_ids] = mA.lm_normal[lmsA]
        mB.lm_min_dist[new_ids] = mA.lm_min_dist[lmsA]
        mB.lm_max_dist[new_ids] = mA.lm_max_dist[lmsA]
        mB.lm_visible[new_ids] = mA.lm_visible[lmsA]
        mB.lm_found[new_ids] = mA.lm_found[lmsA]

        # ---- keyframe transfer (timestamp order) ----
        kf_map = {}
        order = kfsA[np.argsort(mA.kf_timestamp[kfsA])]
        for a in order:
            old = mA.kf_kp_lm[a]
            remapped = np.where(old != NO_LM,
                                lm_map[np.clip(old, 0, mA.max_lm - 1)], NO_LM)
            j = mB.add_keyframe(
                mA.kf_R[a], mA.kf_t[a], mA.kf_kp_uv[a], mA.kf_kp_level[a],
                mA.kf_kp_angle[a], mA.kf_kp_valid[a], mA.kf_desc[a],
                mA.kf_frame_id[a], mA.kf_timestamp[a],
                kp_lm=remapped.astype(np.int32), patch=mA.kf_kp_patch[a],
                ur=mA.kf_kp_ur[a])
            mB.kf_v[j] = mA.kf_v[a]
            mB.kf_bias[j] = mA.kf_bias[a]
            kf_map[int(a)] = j
        mB.lm_first_kf[new_ids] = np.array(
            [kf_map.get(int(f), kf_map[int(order[0])])
             for f in mA.lm_first_kf[lmsA]], np.int32)

        # ---- fuse the Sim3-verified duplicates (SearchAndFuse role) ----
        lm1, lm2 = sim3["pairs"]
        dup_new = lm_map[lm1]            # A landmarks, as B ids
        keep = lm2                       # their verified B counterparts
        sel = (dup_new != NO_LM) & mB.lm_valid[np.clip(keep, 0, mB.max_lm - 1)]
        if sel.any():
            repl = np.full(mB.max_lm, -1, np.int64)
            repl[dup_new[sel]] = keep[sel]
            bound = mB.kf_kp_lm[mB.kf_valid]
            hit = (bound != NO_LM) & (repl[np.clip(bound, 0, mB.max_lm - 1)] >= 0)
            bound[hit] = repl[np.clip(bound, 0, mB.max_lm - 1)][hit]
            mB.kf_kp_lm[mB.kf_valid] = bound
            mB.lm_valid[dup_new[sel]] = False
            mB.n_lm = int(mB.lm_valid.sum())
            # Point the remap at the kept duplicate so callers translating
            # frame bindings land on live landmarks.
            lm_map[lm1[sel]] = keep[sel]
        mB.change_idx += 1
        self.stats["n_merged"] += 1
        return MergeResult(target_map=mB, kf_map=kf_map, lm_map=lm_map,
                           sigma=sigma, R_BA=R_BA, t_BA=t_BA,
                           target_kf=int(cand))
