"""Local mapping: triangulation of new landmarks, duplicate fusion, recent-
landmark culling, and windowed bundle adjustment.

Deterministic, synchronous re-design of the reference's LocalMapping thread
(/root/reference/src/LocalMapping.cc): `run_once` performs one queue drain —
ProcessNewKeyFrame (:306), MapPointCulling (:354), CreateNewMapPoints
(:398), SearchInNeighbors fusion (:743), local BA (:154) — with the same
acceptance gates, but each step is a fixed-shape jit op over the SoA map.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.ops import track_match, triangulation_match
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM, MapState
from orb_slam3_study_kr_tpu.solvers import bundle_adjust
from orb_slam3_study_kr_tpu.solvers.robust import CHI2_MONO, CHI2_STEREO


# MapPointCulling acceptance (LocalMapping.cc:375): recent landmarks
# matched in under this fraction of the frames that predicted them are
# dropped.  Module-level so the parity audit reads the live value.
CULL_FOUND_RATIO = 0.25


def _bucket(n, step):
    return max(step, -(-n // step) * step)


def _nb_bucket(n, caps):
    """Smallest bucket >= n from `caps` (bounds batched-program variants)."""
    for c in caps:
        if n <= c:
            return c
    return caps[-1]


@dataclass
class LocalMapper:
    cfg: "TrackerConfig"
    map: MapState
    n_neighbors: int = 20        # covisible keyframes used for triangulation
    # Optimized keyframes in local BA.  20 anchors the window over longer
    # baselines than the round-3 value of 12: on lateral synthetic worlds
    # the wider window cuts scale-aligned mono ATE ~13% (0.087 -> 0.076,
    # NOTES round 4) by keeping older, better-anchored poses in the solve;
    # beyond 20 the gain saturates.
    ba_window: int = 20
    ba_iters: int = 8
    # KeyFrameCulling (LocalMapping.cc:932): a covisible keyframe whose
    # observations are >= redundancy_th covered by >= 3 other keyframes at
    # the same-or-finer scale is removed.
    enable_kf_culling: bool = True
    kf_redundancy_th: float = 0.9
    # Inertial sessions: culling is allowed (temporal preintegration
    # intervals are re-built from the raw IMU log by timestamp, so erasing
    # a keyframe merges its intervals automatically — the role of the
    # reference's Preintegrated::MergePrevious), but only where the merged
    # temporal gap stays below the staged bound of LocalMapping.cc:1018-1027:
    # 0.5 s until the final inertial refinement (VIBA2) has run, 3 s after
    # (an immature bias estimate needs the dense chain).
    inertial_mode: bool = False
    inertial_max_gap_s: float = 3.0
    inertial_max_gap_early_s: float = 0.5
    on_kf_culled: "callable" = None  # callback(kf_id) for index maintenance
    # Inertial sessions: LocalInertialBA entry point (ImuMixin.
    # local_inertial_ba).  When set and the map's IMU is initialized, the
    # temporal-window visual-inertial solve replaces the visual local BA
    # (reference LocalMapping.cc:154-160 dispatch).
    inertial_ba: "callable" = None
    # Optional StageTimers: phases report as mapping/<phase> next to the
    # tracker's stages in the bench breakdown.
    timers: object = None
    recent: list = field(default_factory=list)  # (lm_id, created_kf)
    queue: list = field(default_factory=list)
    stats: dict = field(default_factory=lambda: {"n_created": 0, "n_culled": 0,
                                                 "n_fused": 0, "n_ba": 0,
                                                 "n_kf_culled": 0})

    def note_new_keyframe(self, kf_id: int):
        self.queue.append(kf_id)

    def run_once(self):
        while self.queue:
            kf = self.queue.pop(0)
            self._process(kf)

    # ------------------------------------------------------------------
    def _process(self, kf: int):
        import contextlib
        m = self.map
        if m.n_kf < 2:
            return
        stage = (self.timers.stage if self.timers is not None
                 else (lambda name: contextlib.nullcontext()))
        with stage("mapping/cull_recent"), m.lock:
            self._cull_recent(kf)
        with stage("mapping/triangulate"):
            self._create_new_landmarks(kf)
        with stage("mapping/fuse"):
            self._fuse_neighbors(kf)
        if m.n_kf >= 3:
            with stage("mapping/local_ba"):
                if self.inertial_ba is not None and m.imu_initialized:
                    with m.lock:
                        ok = self.inertial_ba(kf)
                    if not ok:
                        self._local_ba(kf)
                else:
                    self._local_ba(kf)
        if self.enable_kf_culling and m.n_kf >= 5:
            with stage("mapping/cull_kf"), m.lock:
                self._cull_keyframes(kf)

    # ------------------------------------------------------------------
    def _cull_recent(self, kf: int):
        """MapPointCulling: drop recent landmarks with found/visible < 0.25
        or too few observations a couple of keyframes after creation."""
        m = self.map
        obs = m.landmark_obs_count()
        keep, kill = [], []
        for lm, born in self.recent:
            if not m.lm_valid[lm]:
                continue
            ratio = m.lm_found[lm] / max(m.lm_visible[lm], 1)
            age = kf - born
            if ratio < CULL_FOUND_RATIO:
                kill.append(lm)
            elif age >= 2 and obs[lm] <= 2:
                kill.append(lm)
            elif age >= 3:
                pass  # graduated
            else:
                keep.append((lm, born))
        self.recent = keep
        if kill:
            m.remove_landmarks(np.array(kill))
            self.stats["n_culled"] += len(kill)

    # ------------------------------------------------------------------
    def _create_new_landmarks(self, kf: int):
        m = self.map
        # Snapshot numpy inputs under the lock; trace/upload/dispatch and
        # fetch OUTSIDE it — a new shape-bucket variant costs seconds of
        # trace+lower per process, and holding the map lock through that
        # stalls the tracker for the whole duration (round-5 profiling:
        # multi-second _update_last_frame waits).
        with m.lock:
            pending = self._triangulation_prepare(kf)
        if pending is None:
            return
        nbs, call_args, sel1p, sel2p = pending
        out = self._triangulation_dispatch(call_args)
        good, idx2, X = jax.device_get((out["good"], out["idx2"], out["X"]))
        with m.lock:
            self._triangulation_apply(kf, nbs, good, idx2, X, sel1p, sel2p)

    def _triangulation_prepare(self, kf: int):
        """ALL neighbors' matching+triangulation in ONE batched program
        (vmap over the neighbor axis): one dispatch + one fetch instead of
        a per-neighbor program chain; the neighbor count is bucketed and
        padded with no-match rows to bound recompilation.  This half only
        gathers numpy snapshots (call it under the map lock); the traced
        call happens in _triangulation_dispatch outside it."""
        cfg, m = self.cfg, self.map
        neighbors, _ = m.covisibility(kf, min_shared=10)
        neighbors = neighbors[: self.n_neighbors]
        if neighbors.size == 0 and m.n_kf >= 2:
            neighbors = np.array([kf - 1], np.int32)
        center1 = m.kf_center(kf)
        nbs = []
        for nb in neighbors:
            nb = int(nb)
            # Baseline / median-depth ratio gate (CreateNewMapPoints skips
            # neighbors closer than 1% of scene depth).
            baseline = np.linalg.norm(m.kf_center(nb) - center1)
            lms_nb = m.kf_kp_lm[nb]
            lms_nb = lms_nb[lms_nb != NO_LM]
            if lms_nb.size:
                p = m.lm_pos[lms_nb] @ m.kf_R[nb].T + m.kf_t[nb]
                med_depth = np.median(p[:, 2])
                if baseline / max(med_depth, 1e-9) < 0.01:
                    continue
            nbs.append(nb)
        if not nbs:
            return None
        # Two bucket sizes only: every (NB, F1, F2) combination is a
        # separate XLA program, and on this box each program variant costs
        # seconds of trace+lower+cache-load per process — far more than
        # the padded FLOPs it saves (profiled round 5: keyframe mean 2.2 s
        # against a 0.23 s median, all variant tax).
        NB = _nb_bucket(len(nbs), (8, self.n_neighbors))
        sl = np.asarray(nbs + [0] * (NB - len(nbs)), np.int32)
        # Compact both sides to their FREE (unbound, valid) keypoints,
        # bucketed: the Hamming/epipolar problem is quadratic in keypoint
        # count and most keypoints of a tracked keyframe are already bound
        # — compaction cuts the mapper's device FLOPs several-fold.
        free1 = m.kf_kp_valid[kf] & (m.kf_kp_lm[kf] == NO_LM)
        sel1 = np.nonzero(free1)[0]
        F1 = _nb_bucket(max(sel1.size, 1), (512, m.max_kp))
        sel1p = np.zeros(F1, np.int64)
        sel1p[: sel1.size] = sel1
        mask1 = np.zeros(F1, bool)
        mask1[: sel1.size] = True
        free2s = m.kf_kp_valid[sl] & (m.kf_kp_lm[sl] == NO_LM)
        free2s[len(nbs):] = False      # padded slots produce no matches
        F2 = _nb_bucket(max(int(free2s.sum(1).max()), 1),
                        (512, m.max_kp))
        sel2p = np.zeros((NB, F2), np.int64)
        mask2 = np.zeros((NB, F2), bool)
        for i in range(NB):
            s = np.nonzero(free2s[i])[0][:F2]
            sel2p[i, : s.size] = s
            mask2[i, : s.size] = True
        call_args = (
            m.kf_R[kf].copy(), m.kf_t[kf].copy(),
            m.kf_R[sl], m.kf_t[sl],
            m.kf_kp_uv[kf, sel1p], m.kf_kp_uv[sl[:, None], sel2p],
            m.kf_kp_level[kf, sel1p], m.kf_desc[kf, sel1p], mask1,
            m.kf_kp_level[sl[:, None], sel2p], m.kf_desc[sl[:, None], sel2p],
            mask2,
            m.kf_kp_angle[kf, sel1p], m.kf_kp_angle[sl[:, None], sel2p],
        )
        return nbs, call_args, sel1p, sel2p

    def _triangulation_dispatch(self, call_args):
        """Upload + trace + dispatch half (outside the map lock)."""
        cfg = self.cfg
        (R1, t1, R2s, t2s, uv_a, uv2s, lev1, desc1, mask1,
         lev2, desc2, mask2, ang1, ang2) = call_args
        uv_a = jnp.asarray(uv_a)
        uv2s = jnp.asarray(uv2s)
        return triangulation_match.match_and_triangulate_batch(
            jnp.asarray(R1), jnp.asarray(t1),
            jnp.asarray(R2s), jnp.asarray(t2s),
            cfg.project_fn, jnp.float32(cfg.focal),
            uv_a, cfg.unproject_fn(uv_a),
            jnp.asarray(lev1), jnp.asarray(desc1), jnp.asarray(mask1),
            uv2s, cfg.unproject_fn(uv2s),
            jnp.asarray(lev2), jnp.asarray(desc2), jnp.asarray(mask2),
            jnp.asarray(ang1), jnp.asarray(ang2),
        )

    def _triangulation_apply(self, kf: int, nbs, good_all, idx2_all, X_all,
                             sel1p, sel2p):
        """Host-side binding; earlier neighbors take precedence on
        contested keypoints of kf.  Rows arrive in COMPACTED (free-
        keypoint) coordinates; sel1p/sel2p translate back."""
        m = self.map
        free1 = m.kf_kp_valid[kf] & (m.kf_kp_lm[kf] == NO_LM)
        created = []
        for i, nb in enumerate(nbs):
            good, idx2 = good_all[i], idx2_all[i]
            Xall = X_all[i]
            good = good & free1[sel1p]
            if not good.any():
                continue
            c1 = np.nonzero(good)[0]
            kp1 = sel1p[c1].astype(np.int32)
            kp2 = sel2p[i][idx2[c1]].astype(np.int32)
            X = Xall[c1]
            lm_ids = m.add_landmarks(X, m.kf_desc[kf, kp1], kf,
                                     patches=m.kf_kp_patch[kf, kp1])
            m.bind(kf, kp1, lm_ids)
            m.bind(nb, kp2, lm_ids)
            created.append(lm_ids)
            self.recent.extend((int(l), kf) for l in lm_ids)
            self.stats["n_created"] += lm_ids.size
            free1 = m.kf_kp_valid[kf] & (m.kf_kp_lm[kf] == NO_LM)
        if created:
            m.update_landmark_stats(np.concatenate(created))

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, kf: int):
        """SearchInNeighbors: project this keyframe's landmarks into its
        covisible neighbors; bind free keypoints, and resolve duplicates in
        favor of the landmark with more observations."""
        m = self.map
        with m.lock:
            state = self._fuse_prepare(kf)
        if state is None:
            return
        nbs, cand, call_args, lms_kf, obs = state
        out = self._fuse_dispatch(call_args)
        lm_slot, ok = jax.device_get(out)
        with m.lock:
            self._fuse_apply(nbs, cand, lm_slot, ok, lms_kf, obs)

    def _fuse_prepare(self, kf: int):
        """ALL neighbors' fusion matching in ONE batched program: the
        keyframe's landmark block is shared, each neighbor gets its own
        exclusion mask row (landmarks it already binds).  Numpy snapshot
        half (under the map lock); the traced call runs lock-free in
        _fuse_dispatch."""
        cfg, m = self.cfg, self.map
        neighbors, _ = m.covisibility(kf, min_shared=10)
        neighbors = neighbors[:10]
        lms_kf = m.kf_kp_lm[kf]
        lms_kf = np.unique(lms_kf[lms_kf != NO_LM])
        if lms_kf.size == 0 or neighbors.size == 0:
            return None
        obs = m.landmark_obs_count()
        L = 1024
        if lms_kf.size > L:
            # The window is capped at L rows; prefer landmarks not yet
            # bound in any neighbor (those are the ones fusion can act
            # on) so the tail is not systematically starved.
            nb_arr = np.asarray([int(nb) for nb in neighbors])
            unbound = ~np.isin(lms_kf, m.kf_kp_lm[nb_arr])
            cand = np.concatenate([lms_kf[unbound], lms_kf[~unbound]])[:L]
        else:
            cand = lms_kf

        def pad(a, fill=0):
            if a.shape[0] >= L:
                return a[:L]
            return np.concatenate(
                [a, np.full((L - a.shape[0], *a.shape[1:]), fill, a.dtype)]
            )

        nbs = [int(nb) for nb in neighbors]
        NB = _nb_bucket(len(nbs), (10,))   # one program variant (see above)
        sl = np.asarray(nbs + [0] * (NB - len(nbs)), np.int32)
        base = pad(np.ones(cand.size, np.float32))
        masks = np.zeros((NB, L), np.float32)
        for i, nb in enumerate(nbs):
            masks[i] = base * ~np.isin(
                np.pad(cand, (0, L - cand.size)), m.kf_kp_lm[nb])
        valids = m.kf_kp_valid[sl].copy()
        valids[len(nbs):] = False      # padded slots produce no matches
        call_args = (
            m.kf_R[sl], m.kf_t[sl],
            pad(m.lm_pos[cand]), pad(m.lm_normal[cand]),
            pad(m.lm_min_dist[cand]), pad(m.lm_max_dist[cand]),
            pad(m.lm_desc[cand]), masks,
            m.kf_kp_uv[sl], m.kf_kp_level[sl], m.kf_desc[sl], valids,
        )
        return nbs, cand, call_args, lms_kf, obs

    def _fuse_dispatch(self, call_args):
        """Upload + trace + dispatch half (outside the map lock)."""
        cfg = self.cfg
        (Rs, ts, pos, normal, min_d, max_d, desc, masks,
         uv, lev, fdesc, valids) = call_args
        out = track_match.match_local_map_batch(
            cfg.project_fn, jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(pos), jnp.asarray(normal),
            jnp.asarray(min_d), jnp.asarray(max_d),
            jnp.asarray(desc), jnp.asarray(masks),
            jnp.asarray(uv), jnp.asarray(lev),
            jnp.asarray(fdesc), jnp.asarray(valids),
            cfg.width, cfg.height, th=3.0, max_dist=50.0,
            max_theta_deg=cfg.max_theta_deg,
        )
        return out[:2]

    def _fuse_apply(self, nbs, cand, lm_slot_all, ok_all, lms_kf, obs):
        """Host-side binding / duplicate resolution.  A Replace in an
        earlier neighbor can invalidate a landmark a later result still
        names; those are skipped (lm_valid check)."""
        m = self.map
        for i, nb in enumerate(nbs):
            lm_slot, ok = lm_slot_all[i], ok_all[i]
            kps = np.nonzero(ok)[0]
            if kps.size == 0:
                continue
            lm_new = cand[np.minimum(lm_slot[kps], cand.size - 1)]
            live = m.lm_valid[lm_new]
            kps, lm_new = kps[live], lm_new[live]
            lm_old = m.kf_kp_lm[nb, kps]
            # Free keypoints bind in bulk; only true conflicts loop.
            free = lm_old == NO_LM
            m.kf_kp_lm[nb, kps[free]] = lm_new[free]
            self.stats["n_fused"] += int(free.sum())
            for kp, ln, lo in zip(kps[~free], lm_new[~free], lm_old[~free]):
                ln, lo = int(ln), int(lo)
                if ln == lo or not m.lm_valid[ln] or not m.lm_valid[lo]:
                    continue
                # Keep the landmark with more observations, replace the
                # other everywhere (MapPoint::Replace).
                from orb_slam3_study_kr_tpu import native
                a, b = (ln, lo) if obs[ln] >= obs[lo] else (lo, ln)
                native.replace_landmark(m.kf_kp_lm, b, a)
                m.lm_valid[b] = False
                self.stats["n_fused"] += 1
        m.n_lm = int(m.lm_valid.sum())
        m.update_landmark_stats(lms_kf)
        # Fusion binds/replaces/invalidates landmarks through direct table
        # writes: bump the change index so the tracker's cached candidate
        # block refreshes validity/normals/obs next frame.
        m.change_idx += 1

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling (LocalMapping.cc:932): erase covisible keyframes
        whose landmarks (with > 3 total observations) are at least
        `kf_redundancy_th` observed by >= 3 other keyframes at pyramid level
        <= own level + 1.  Culled frames leave a redirect to their best
        covisible neighbor so trajectory replay stays exact."""
        m = self.map
        neighbors, _ = m.covisibility(kf, min_shared=15)
        if neighbors.size == 0:
            return
        obs = m.landmark_obs_count()
        okf_all, okp_all, olm_all = m.observations()
        for c in neighbors:
            c = int(c)
            # Never the map-origin keyframes (gauge anchors / GBA roots) or
            # the keyframe under processing.
            if c <= 1 or c == kf or not m.kf_valid[c]:
                continue
            if self.inertial_mode and not self._inertial_cullable(c):
                continue
            kp = np.nonzero(m.kf_kp_valid[c] & (m.kf_kp_lm[c] != NO_LM))[0]
            lms = m.kf_kp_lm[c, kp]
            live = m.lm_valid[lms]
            kp, lms = kp[live], lms[live]
            if lms.size == 0:
                continue
            lvl = m.kf_kp_level[c, kp]
            # Scale-aware observer counts from every other keyframe.
            lm_index = np.full(m.max_lm, -1, np.int64)
            lm_index[lms] = np.arange(lms.size)
            sel = (okf_all != c) & (lm_index[olm_all] >= 0)
            oi = lm_index[olm_all[sel]]
            finer = (m.kf_kp_level[okf_all[sel], okp_all[sel]]
                     <= lvl[oi] + 1)
            cnt = np.bincount(oi[finer], minlength=lms.size)
            redundant = (obs[lms] > 3) & (cnt >= 3)
            if redundant.sum() <= self.kf_redundancy_th * lms.size:
                continue
            parents, _ = m.covisibility(c, min_shared=1)
            parents = parents[parents != c]
            if parents.size == 0:
                continue
            m.cull_keyframe(c, int(parents[0]))
            # Keep the COO view in sync for subsequent candidates.
            dead = okf_all == c
            okf_all, okp_all, olm_all = (okf_all[~dead], okp_all[~dead],
                                         olm_all[~dead])
            obs = m.landmark_obs_count()
            self.stats["n_kf_culled"] += 1
            if self.on_kf_culled is not None:
                self.on_kf_culled(c)

    def _inertial_cullable(self, c: int) -> bool:
        """Erasing `c` must not stretch the temporal IMU chain beyond the
        gap bound (its prev/next keyframes by timestamp get welded)."""
        m = self.map
        kfs = np.nonzero(m.kf_valid)[0]
        ts = m.kf_timestamp[kfs]
        order = np.argsort(ts, kind="stable")
        kfs, ts = kfs[order], ts[order]
        i = int(np.nonzero(kfs == c)[0][0])
        if i == 0 or i == kfs.size - 1:
            return False  # chain endpoints anchor the inertial solve
        bound = (self.inertial_max_gap_s if m.imu_ba2
                 else self.inertial_max_gap_early_s)
        return (ts[i + 1] - ts[i - 1]) < bound

    # ------------------------------------------------------------------
    def _local_ba(self, kf: int, window=None):
        m = self.map
        with m.lock:
            prob = self._local_ba_assemble(kf, window=window)
        if prob is None:
            return
        # Trace + dispatch + solve run while the lock is free (the tracker
        # interleaves — and a new shape-bucket variant's multi-second
        # trace must never happen under the lock); only the write-back
        # re-acquires it.
        out = bundle_adjust(*prob["args"], n_iters=self.ba_iters,
                            wide_fov=self.cfg.camera_model == "kb8",
                            **prob["stereo_kw"])
        R, t, X_new, chi2 = jax.device_get(out[:4])
        with m.lock:
            self._local_ba_apply(prob, R, t, X_new, chi2)

    def welding_ba(self, window_a, window_b, fix_b: bool = False):
        """Two-map welding BA (MergeLocal's welding problem,
        /root/reference/src/LoopClosing.cc:1220-1785): the current
        keyframe's neighborhood (window_a, from the absorbed map) plus the
        target map's neighborhood around the matched keyframe (window_b)
        form one problem; every OTHER observer of the window's landmarks —
        the far sides of both maps — enters as a fixed pose.  With fix_b
        the target-map window is also held fixed (the inertial weld keeps
        the target's gravity-consistent structure rigid,
        Optimizer.cc:3956 MergeInertialBA's fixed side)."""
        window_a = np.asarray(window_a, np.int32)
        window_b = np.asarray(window_b, np.int32)
        window_b = window_b[~np.isin(window_b, window_a)]
        if fix_b:
            # Any observer outside the optimized window enters as a fixed
            # pose in the assembler, so holding the target side rigid is
            # simply excluding it from the window.
            window = window_a
        else:
            window = np.concatenate([window_a, window_b])
        self._local_ba(int(window_a[0]), window=window)
        self.stats["n_welding_ba"] = self.stats.get("n_welding_ba", 0) + 1

    def _local_ba_assemble(self, kf: int, window=None):
        cfg, m = self.cfg, self.map
        if window is None:
            neighbors, _ = m.covisibility(kf, min_shared=1)
            window = np.concatenate(
                [[kf], neighbors[: self.ba_window - 1]]).astype(np.int32)
        else:
            window = np.asarray(window, np.int32)
            window = window[m.kf_valid[window]]
            if window.size == 0:
                return None
        # Landmarks seen from the window.
        lms = np.unique(m.kf_kp_lm[window])
        lms = lms[(lms != NO_LM) & m.lm_valid[np.maximum(lms, 0)]]
        if lms.size < 20:
            return
        # Fixed keyframes: any other keyframe observing those landmarks.
        seen = np.zeros(m.max_lm, bool)
        seen[lms] = True
        observing = (seen[m.kf_kp_lm] & (m.kf_kp_lm != NO_LM)).any(axis=1)
        observing &= m.kf_valid
        fixed_ids = np.nonzero(observing)[0]
        fixed_ids = fixed_ids[~np.isin(fixed_ids, window)]
        all_kf = np.concatenate([window, fixed_ids]).astype(np.int32)
        fixed = np.concatenate(
            [np.zeros(window.size), np.ones(fixed_ids.size)]
        ).astype(np.float32)
        # The oldest two keyframes anchor the gauge (reference fixes kf 0/1).
        anchor = np.nonzero(np.isin(window, [0, 1]))[0]
        fixed[anchor] = 1.0
        if fixed.sum() < 2:
            # Monocular scale is a gauge direction: with fewer than two
            # anchored poses the window's scale is free and drifts under LM
            # damping.  Freeze the two oldest window keyframes (their
            # baseline pins the scale).
            order = np.argsort(window)
            need = 2 - int(fixed.sum())
            for o in order:
                if fixed[o] == 0 and need > 0:
                    fixed[o] = 1.0
                    need -= 1

        okf, okp, olm = m.observations(all_kf)
        keep = seen[olm]
        okf, okp, olm = okf[keep], okp[keep], olm[keep]

        kf_index = np.full(m.max_kf, -1, np.int64)
        kf_index[all_kf] = np.arange(all_kf.size)
        lm_index = np.full(m.max_lm, -1, np.int64)
        lm_index[lms] = np.arange(lms.size)

        # Bucketed padding to bound recompilation (coarse buckets: each
        # (K, M, O) combination is a separate multi-second program-variant
        # cost — see _triangulation_dispatch).
        K = _bucket(all_kf.size, 16)
        M = _bucket(lms.size, 2048)
        O = _bucket(okf.size, 8192)

        def padr(a, n, fill=0):
            return np.concatenate(
                [a, np.full((n - a.shape[0], *a.shape[1:]), fill, a.dtype)]
            ) if a.shape[0] < n else a[:n]

        R_all = padr(m.kf_R[all_kf], K, 0)
        R_all[all_kf.size:] = np.eye(3)
        t_all = padr(m.kf_t[all_kf], K)
        fixed_p = padr(fixed, K, 1.0)
        X = padr(m.lm_pos[lms], M)
        lm_mask = padr(np.ones(lms.size, np.float32), M)
        op = padr(kf_index[okf].astype(np.int32), O)
        ol = padr(lm_index[olm].astype(np.int32), O)
        ouv = padr(m.kf_kp_uv[okf, okp], O)
        olev = padr(m.kf_kp_level[okf, okp], O)
        omask = padr(np.ones(okf.size, np.float32), O)
        stereo_kw = {}
        if cfg.bf > 0:
            # Stereo observations add the third residual row in BA.
            stereo_kw = dict(
                obs_ur=jnp.asarray(padr(m.kf_kp_ur[okf, okp], O, -1.0)),
                bf=jnp.float32(cfg.bf),
            )

        return dict(
            args=(cfg.project_fn, cfg.project_jac_fn,
                  jnp.asarray(R_all), jnp.asarray(t_all),
                  jnp.asarray(fixed_p),
                  jnp.asarray(X), jnp.asarray(lm_mask),
                  jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
                  jnp.asarray(olev), jnp.asarray(omask)),
            stereo_kw=stereo_kw,
            window=window, fixed=fixed, lms=lms, kf_index=kf_index,
            okf=okf, okp=okp,
        )

    def _local_ba_apply(self, prob, R, t, X_new, chi2):
        cfg, m = self.cfg, self.map
        window, fixed, lms = prob["window"], prob["fixed"], prob["lms"]
        kf_index, okf, okp = prob["kf_index"], prob["okf"], prob["okp"]
        upd = window[fixed[: window.size] == 0]
        sel = kf_index[upd].astype(np.int64)
        m.kf_R[upd] = R[sel]
        m.kf_t[upd] = t[sel]
        m.lm_pos[lms] = X_new[: lms.size]
        # Cull outlier observations at the chi2 gate (post-BA erase loop).
        # bundle_adjust returns sigma-normalized chi2 already.
        chi2 = chi2[: okf.size]
        if cfg.bf > 0:
            gate = np.where(m.kf_kp_ur[okf, okp] >= 0, CHI2_STEREO, CHI2_MONO)
        else:
            gate = CHI2_MONO
        bad = chi2 > gate
        m.kf_kp_lm[okf[bad], okp[bad]] = NO_LM
        # Landmarks left with < 2 observations are dead (the reference's
        # MapPoint::EraseObservation -> SetBadFlag cascade), and landmarks
        # the solve launched to absurd range are degenerate — both poison
        # future matching if left in the map.
        obs_after = m.landmark_obs_count()
        centers = -np.einsum("kij,kj->ki", m.kf_R[window].transpose(0, 2, 1),
                             m.kf_t[window])
        scene_scale = max(float(np.linalg.norm(
            m.lm_pos[lms] - centers.mean(0), axis=1).mean()), 1e-6)
        dist = np.linalg.norm(m.lm_pos - centers.mean(0), axis=1)
        insane = m.lm_valid & (
            (dist > 50.0 * scene_scale) | ~np.isfinite(m.lm_pos).all(axis=1)
        )
        orphan = m.lm_valid & (obs_after < 2)
        kill = np.nonzero(orphan | insane)[0]
        if kill.size:
            m.remove_landmarks(kill)
            self.stats["n_culled"] += int(kill.size)
        m.change_idx += 1
        self.stats["n_ba"] += 1
        self.stats["n_obs_culled"] = self.stats.get("n_obs_culled", 0) + int(bad.sum())
        self.stats["n_obs_kept"] = self.stats.get("n_obs_kept", 0) + int((~bad).sum())
