"""Visual-inertial tracking: IMU preintegration between frames, IMU-based
pose prediction, pose-inertial frame optimization, and the staged IMU
initialization that rescales + gravity-aligns the map.

Mirrors the reference's inertial paths: Tracking::PreintegrateIMU
(/root/reference/src/Tracking.cc:1624), PredictStateIMU (:1744),
PoseInertialOptimizationLastFrame (Optimizer.cc:4883), and
LocalMapping::InitializeIMU's 3-stage priorG/priorA schedule
(LocalMapping.cc:1208-1463: 1e2/1e10 at t1, 1/1e5 at t2, 0/0 at t3) with
Map::ApplyScaledRotation gravity/scale alignment.

The mixin composes with both the monocular and stereo front ends; stereo
fixes scale during IMU init (fix_scale), monocular estimates it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.imu import preintegration as pre_mod
from orb_slam3_study_kr_tpu.imu.preintegration import (ImuCalib, predict_state,
                                                       preintegrate)
from orb_slam3_study_kr_tpu.pipeline.stereo_tracking import (
    FisheyeStereoTracker, StereoTracker)
from orb_slam3_study_kr_tpu.pipeline.tracking import MonoTracker, TrackState
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM
from orb_slam3_study_kr_tpu.solvers.inertial import (
    estimate_gyro_bias, inertial_only_optimization,
    pose_inertial_optimization, pose_inertial_optimization_last_frame)
from orb_slam3_study_kr_tpu.solvers.inertial_ba import inertial_bundle_adjust
from orb_slam3_study_kr_tpu.solvers.robust import CHI2_MONO, CHI2_STEREO

# Padded sample-window buckets (bounds recompilation across frame gaps).
FRAME_BUCKETS = (64, 256, 1024)
KF_BUCKETS = (256, 1024, 4096)

# Staged (priorG, priorA) of the 3 IMU-init stages (LocalMapping.cc:
# 1302-1343; stage 1 at t1, VIBA1 at t2, VIBA2 at t3).  Module-level so
# the parity audit reads the live schedule.
IMU_PRIOR_SCHEDULE = {1: (1e2, 1e10), 2: (1.0, 1e5), 3: (0.0, 0.0)}


def _bucket_pad(rows, buckets):
    n = rows.shape[0]
    for b in buckets:
        if n <= b:
            break
    else:
        rows = rows[-buckets[-1]:]
        n, b = buckets[-1], buckets[-1]
    out = np.zeros((b, 7), np.float32)
    out[:n] = rows
    mask = np.zeros(b, np.float32)
    mask[:n] = 1.0
    return out, mask


def _preintegrate_rows(rows, bias, calib, buckets):
    """rows: (M, 7) [dt, ax ay az, gx gy gz] -> Preintegrated."""
    padded, mask = _bucket_pad(np.asarray(rows, np.float32), buckets)
    return preintegrate(
        jnp.asarray(padded[:, 1:4]), jnp.asarray(padded[:, 4:7]),
        jnp.asarray(padded[:, 0]), jnp.asarray(mask),
        jnp.asarray(bias, jnp.float32), calib,
    )


def _body_from_cam(R_cw, t_cw, R_bc, t_bc):
    """Camera pose (world->cam) -> body pose (R_wb, p_wb) given Tbc."""
    R_bw = R_bc @ R_cw
    t_bw = R_bc @ t_cw + t_bc
    R_wb = R_bw.T
    p_wb = -R_wb @ t_bw
    return R_wb, p_wb


def _cam_from_body(R_wb, p_wb, R_bc, t_bc):
    R_cb = R_bc.T
    t_cb = -R_cb @ t_bc
    R_cw = R_cb @ R_wb.T
    t_cw = -R_cw @ p_wb + t_cb
    return R_cw, t_cw


class ImuMixin:
    """IMU state + hooks shared by mono- and stereo-inertial trackers."""

    def _init_imu_state(self, calib: ImuCalib,
                        init_times=(2.0, 5.0, 15.0), init_spacing=0.7):
        self.calib = calib
        self.imu_init_times = init_times
        # Min keyframe spacing inside the init solve: the scale signal is
        # the dt^2 accelerometer term, so short intervals are drowned by
        # visual pose noise (measured: 0.2 s spacing -> 50%+ scale error,
        # 0.8 s -> <1% on the synthetic oracle).
        self.imu_init_spacing = init_spacing
        # Starvation deadline past t1 before the first init force-accepts
        # a best-effort solve (see _maybe_imu_init).
        self.imu_init_starve_patience = 1.5
        self.imu_stage = 0            # 0 = vision only; 1/2/3 = init stages
        self.bias = np.zeros(6, np.float32)
        self._imu_log = []            # (frame_ts, rows): samples ending at ts
        self.kf_imu = {}              # kf_id -> (prev_kf_id, rows (M,7))
        self._pre_frame = None        # Preintegrated last frame -> current
        self._pred_v = None
        # 15-D marginal prior on the last frame's body state
        # (ConstraintPoseImu): carried between consecutive frame solves
        # while the map stays unchanged, reset on any map update.
        self._prior_info = None
        self._prior_change_idx = -1
        self._first_kf_ts = None
        self._last_glitch_ts = -1e9  # last tracking hiccup (init excludes it)
        self._prev_kf_id = None      # temporal mPrevKF chain tail
        self._R_cb = np.asarray(calib.R_bc).T.astype(np.float32)
        self._t_cb = (-self._R_cb @ np.asarray(calib.t_bc)).astype(np.float32)

    # -------------------------------------------------------------- IMU I/O
    def _ingest_imu(self, imu_rows, timestamp):
        imu_rows = np.asarray(imu_rows, np.float32).reshape(-1, 7)
        self._imu_log.append((timestamp, imu_rows))
        if self.imu_stage >= 3 and len(self._imu_log) > 4096:
            # Past final init, only recent windows are re-integrated.
            self._imu_log = self._imu_log[-2048:]
        self._pred_v = None
        if imu_rows.shape[0]:
            self._pre_frame = _preintegrate_rows(
                imu_rows, self.bias, self.calib, FRAME_BUCKETS)
        else:
            self._pre_frame = None

    def _rows_between(self, t0, t1):
        """All logged samples with frame timestamp in (t0, t1]."""
        chunks = [r for ts, r in self._imu_log if t0 < ts <= t1 and r.size]
        return (np.concatenate(chunks)
                if chunks else np.zeros((0, 7), np.float32))

    # ---------------------------------------------------------- prediction
    def _predict_pose(self):
        lf = self.last_frame
        if (self.imu_stage > 0 and self._pre_frame is not None
                and getattr(lf, "v_w", None) is not None and lf.pose_ok):
            R_wb, p_wb = _body_from_cam(lf.R_cw, lf.t_cw,
                                        np.asarray(self.calib.R_bc),
                                        np.asarray(self.calib.t_bc))
            R_n, p_n, v_n = predict_state(
                jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(lf.v_w),
                self._pre_frame, jnp.asarray(self.bias))
            self._pred_v = np.asarray(v_n)
            R_cw, t_cw = _cam_from_body(np.asarray(R_n), np.asarray(p_n),
                                        np.asarray(self.calib.R_bc),
                                        np.asarray(self.calib.t_bc))
            return R_cw.astype(np.float32), t_cw.astype(np.float32)
        return super()._predict_pose()

    # -------------------------------------------------- lost-mode survival
    TIME_RECENTLY_LOST = 5.0  # s (Tracking.cc:1959 time_recently_lost)

    def _lost_pose_estimate(self, frame):
        """IMU dead-reckoning while RECENTLY_LOST (Tracking.cc:2000-2012):
        with an initialized IMU the pose keeps integrating forward for up
        to TIME_RECENTLY_LOST seconds, so the trajectory stays continuous
        and relocalization / re-tracking starts from a sane prior."""
        lf = self.last_frame
        if (self.imu_stage > 0 and self.map.imu_initialized
                and self._pre_frame is not None and lf is not None
                and lf.R_cw is not None
                and getattr(lf, "v_w", None) is not None
                and self.last_ok_ts is not None
                and frame.timestamp - self.last_ok_ts
                    <= self.TIME_RECENTLY_LOST):
            R_bc = np.asarray(self.calib.R_bc)
            t_bc = np.asarray(self.calib.t_bc)
            R_wb, p_wb = _body_from_cam(lf.R_cw, lf.t_cw, R_bc, t_bc)
            R_n, p_n, v_n = predict_state(
                jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(lf.v_w),
                self._pre_frame, jnp.asarray(self.bias))
            R_cw, t_cw = _cam_from_body(np.asarray(R_n), np.asarray(p_n),
                                        R_bc, t_bc)
            frame.R_cw = R_cw.astype(np.float32)
            frame.t_cw = t_cw.astype(np.float32)
            frame.v_w = np.asarray(v_n, np.float32)
            frame.pose_ok = False
            self.stats["imu_only_frames"] = (
                self.stats.get("imu_only_frames", 0) + 1)
            return
        super()._lost_pose_estimate(frame)

    def _lost_deadline_passed(self, frame) -> bool:
        if self.map.imu_initialized and self.last_ok_ts is not None:
            return (frame.timestamp - self.last_ok_ts
                    > self.TIME_RECENTLY_LOST)
        return super()._lost_deadline_passed(frame)

    # -------------------------------------------------------- optimization
    def _custom_pose_opt_active(self) -> bool:
        # Once IMU-initialized, frame solves are pose-INERTIAL; the fused
        # round's in-program visual GN must not replace them.
        lf = self.last_frame
        return (self.imu_stage > 0 and self._pre_frame is not None
                and lf is not None and lf.pose_ok
                and getattr(lf, "v_w", None) is not None)

    def _optimize_frame_pose(self, frame, R0, t0):
        lf = self.last_frame
        if not (self.imu_stage > 0 and self._pre_frame is not None
                and lf is not None and lf.pose_ok
                and getattr(lf, "v_w", None) is not None):
            return super()._optimize_frame_pose(frame, R0, t0)
        cfg, m = self.cfg, self.map
        stale = (frame.kp_lm != NO_LM) & ~m.lm_valid[
            np.clip(frame.kp_lm, 0, m.max_lm - 1)]
        frame.kp_lm = np.where(stale, NO_LM, frame.kp_lm).astype(np.int32)
        X = m.lm_pos[np.clip(frame.kp_lm, 0, m.max_lm - 1)]
        mask = (frame.kp_lm != NO_LM) & frame.valid

        R_wb0, p_wb0 = _body_from_cam(lf.R_cw, lf.t_cw,
                                      np.asarray(self.calib.R_bc),
                                      np.asarray(self.calib.t_bc))
        R_wbi, p_wbi = _body_from_cam(np.asarray(R0), np.asarray(t0),
                                      np.asarray(self.calib.R_bc),
                                      np.asarray(self.calib.t_bc))
        v_init = getattr(self, "_pred_v", None)
        if v_init is None:
            v_init = lf.v_w
        # Reference dispatch (Tracking.cc:3009-3021): after a map update
        # (BA / new KF / loop moved poses) anchor hard on the last frame's
        # re-estimated state; otherwise chain through the last frame as a
        # FREE vertex under its 15-D marginal prior
        # (PoseInertialOptimizationLastFrame, Optimizer.cc:4883) and carry
        # the Schur-marginalized information forward.
        map_updated = self.map.change_idx != self._prior_change_idx
        common = (
            jnp.asarray(R_wbi), jnp.asarray(p_wbi), jnp.asarray(v_init),
            jnp.asarray(self._R_cb), jnp.asarray(self._t_cb),
            jnp.asarray(X), frame.dev("uv"),
            frame.dev("level"), jnp.asarray(mask.astype(np.float32)),
        )
        if not map_updated and self._prior_info is not None:
            R, p, v, bias, inl, info = pose_inertial_optimization_last_frame(
                cfg.project_fn,
                jnp.asarray(R_wb0), jnp.asarray(p_wb0), jnp.asarray(lf.v_w),
                jnp.asarray(self.bias),
                jnp.asarray(self._prior_info, jnp.float32), self._pre_frame,
                *common, wide_fov=cfg.camera_model == "kb8",
            )
        else:
            R, p, v, bias, inl, info = pose_inertial_optimization(
                cfg.project_fn,
                jnp.asarray(R_wb0), jnp.asarray(p_wb0), jnp.asarray(lf.v_w),
                jnp.asarray(self.bias), self._pre_frame,
                *common, wide_fov=cfg.camera_model == "kb8",
            )
        R, p, v, bias, inl, info = jax.device_get((R, p, v, bias, inl, info))
        self._prior_info = info if np.isfinite(info).all() else None
        self._prior_change_idx = self.map.change_idx
        inl = inl & mask
        R_cw, t_cw = _cam_from_body(R, p,
                                    np.asarray(self.calib.R_bc),
                                    np.asarray(self.calib.t_bc))
        frame.R_cw = R_cw.astype(np.float32)
        frame.t_cw = t_cw.astype(np.float32)
        frame.v_w = np.asarray(v, np.float32)
        self.bias = np.asarray(bias, np.float32)
        frame.kp_lm = np.where(inl, frame.kp_lm, NO_LM).astype(np.int32)
        return int(inl.sum())

    # ----------------------------------------------------------- keyframes
    def _create_keyframe(self, frame):
        self._note_initial_keyframes()
        prev_kf = self._prev_kf_id
        super()._create_keyframe(frame)
        kf = self.ref_kf
        self._prev_kf_id = kf
        if prev_kf is not None and prev_kf != kf:
            # Temporal prev->next keyframe chain (reference mPrevKF/mNextKF).
            self.kf_imu[kf] = (prev_kf, self._rows_between(
                float(self.map.kf_timestamp[prev_kf]), frame.timestamp))
        if self._first_kf_ts is None:
            self._first_kf_ts = frame.timestamp
        m = self.map
        if frame.v_w is not None:
            m.kf_v[kf] = frame.v_w
        m.kf_bias[kf] = self.bias
        self._maybe_imu_init(frame)

    def _note_initial_keyframes(self):
        """Link keyframes created by the map-initialization path (mono
        two-view init / stereo first frame) into the IMU chain."""
        m = self.map
        if self._first_kf_ts is not None:
            return
        kfs = np.nonzero(m.kf_valid)[0]
        if kfs.size == 0:
            return
        self._first_kf_ts = float(m.kf_timestamp[kfs[0]])
        for a, b in zip(kfs[:-1], kfs[1:]):
            if b not in self.kf_imu:
                self.kf_imu[int(b)] = (int(a), self._rows_between(
                    float(m.kf_timestamp[a]), float(m.kf_timestamp[b])))
        self._prev_kf_id = int(kfs[-1])

    # ------------------------------------------------------------ IMU init
    def _kf_chain(self):
        """Valid keyframes in temporal order.  Intervals are rebuilt from
        the raw IMU log, so keyframe culling cannot break the chain (the
        reference merges preintegrations on KF erase; keeping the log and
        re-integrating is the array-state equivalent)."""
        m = self.map
        kfs = np.nonzero(m.kf_valid)[0]
        order = np.argsort(m.kf_timestamp[kfs], kind="stable")
        return [int(k) for k in kfs[order]]

    def _maybe_imu_init(self, frame):
        if self._first_kf_ts is None:
            return
        elapsed = frame.timestamp - self._first_kf_ts
        t1, t2, t3 = self.imu_init_times
        target = 0
        if elapsed >= t1:
            target = 1
        if elapsed >= t2:
            target = 2
        if elapsed >= t3:
            target = 3
        if target <= self.imu_stage:
            return
        # Gravity-observability gate (the bad-IMU precondition of
        # LocalMapping.cc:139-148): a stream whose accelerometer never
        # shows ~9.8 m/s^2 cannot constrain gravity or scale — an init on
        # it would "succeed" with all-zero residuals and poison the map.
        recent = self._rows_between(self._first_kf_ts, frame.timestamp)
        if recent.shape[0]:
            acc_mag = float(np.median(np.linalg.norm(recent[:, 1:4], axis=1)))
            if not (2.0 < acc_mag < 30.0):
                self.stats["imu_init_rejected_acc"] = (
                    self.stats.get("imu_init_rejected_acc", 0) + 1)
                return
        chain = self._kf_chain()
        ts = self.map.kf_timestamp
        if self.imu_stage == 0:
            # First init: prefer a recent glitch-free stretch (a tracking
            # hiccup can leave a broken-scale interval), but don't starve —
            # 1.5 s of clean keyframes is enough; the edge-norm consistency
            # gate below catches windows that are actually corrupted.
            clean = [k for k in chain if ts[k] > self._last_glitch_ts]
            if len(clean) >= 4 and ts[clean[-1]] - ts[clean[0]] >= 1.5:
                chain = clean
            elif ts[chain[-1]] - ts[chain[0]] < self.imu_init_times[0]:
                return
        if len(chain) < 4:
            return
        # Subsample the temporal chain to >= imu_init_spacing intervals and
        # bucket the solve size (bounds recompilation).
        sel = [chain[0]]
        for k in chain[1:]:
            if ts[k] - ts[sel[-1]] >= self.imu_init_spacing:
                sel.append(k)
        if sel[-1] != chain[-1]:
            sel.append(chain[-1])  # newest KF must be in the solve
        if len(sel) < 4:
            return
        for b in (16, 12, 10, 8, 6, 5, 4):
            if len(sel) >= b:
                sel = sel[-b:]
                break
        priors = IMU_PRIOR_SCHEDULE[target]
        # Starvation deadline: the reference initializes unconditionally on
        # schedule (LocalMapping.cc:187-249); our consistency gate may
        # starve forever on a jittery visual map.  Past t1 + patience,
        # accept the best-effort solve — the VIBA/refinement stages exist
        # precisely to fix a coarse first alignment.
        force = (self.imu_stage == 0
                 and elapsed > t1 + self.imu_init_starve_patience)
        ok = False
        for attempt in range(3):
            rows = [self._rows_between(float(ts[a]), float(ts[b]))
                    for a, b in zip(sel[:-1], sel[1:])]
            ok = self._run_imu_init(sel, rows, priors, frame)
            if ok or self.imu_stage > 0 or len(sel) <= 5:
                break
            # Glitch-KF excision: a tracking hiccup leaves one keyframe
            # with a broken-scale pose; its two inertial edges dominate the
            # whitened residuals.  Drop the interior chain keyframe
            # touching the worst edge and re-solve.
            norms = self.stats.get("imu_init_edge_norms")
            if norms is None:
                break
            norms = np.asarray(norms)
            if norms.size != len(sel) - 1:
                break
            e = int(np.argmax(norms))
            cand_j = [j for j in (e, e + 1) if 0 < j < len(sel) - 1]
            if not cand_j:
                break

            def _adj(j):
                s = norms[j - 1] if j - 1 >= 0 else 0.0
                s += norms[j] if j < norms.size else 0.0
                return s

            j = max(cand_j, key=_adj)
            sel = sel[:j] + sel[j + 1:]
            self.stats["imu_init_excised"] = (
                self.stats.get("imu_init_excised", 0) + 1)
        if not ok and force:
            rows = [self._rows_between(float(ts[a]), float(ts[b]))
                    for a, b in zip(sel[:-1], sel[1:])]
            ok = self._run_imu_init(sel, rows, priors, frame, force=True)
        if ok:
            self.imu_stage = target
            if target >= 3:
                # Final refinement stage done (Map::SetInertialBA2): the
                # bias is mature, keyframe culling may widen temporal gaps.
                self.map.imu_ba2 = True

    def _robust_gyro_bias(self):
        """Seed self.bias[:3] from the robust rotation-only solve over ALL
        consecutive keyframe pairs (denser than the subsampled init chain;
        Huber rejects glitched intervals).  See solvers.inertial.
        estimate_gyro_bias."""
        m = self.map
        kfs = np.nonzero(m.kf_valid)[0]
        ts = m.kf_timestamp[kfs]
        order = np.argsort(ts, kind="stable")
        kfs, ts = kfs[order], ts[order]
        if kfs.size < 4:
            return
        R_bc = np.asarray(self.calib.R_bc)
        t_bc = np.asarray(self.calib.t_bc)
        R1, R2, pres = [], [], []
        for a, b in zip(kfs[:-1], kfs[1:]):
            rows = self._rows_between(float(m.kf_timestamp[a]),
                                      float(m.kf_timestamp[b]))
            if rows.shape[0] == 0:
                continue
            R1.append(_body_from_cam(m.kf_R[a], m.kf_t[a], R_bc, t_bc)[0])
            R2.append(_body_from_cam(m.kf_R[b], m.kf_t[b], R_bc, t_bc)[0])
            pres.append(_preintegrate_rows(rows, self.bias, self.calib,
                                           KF_BUCKETS))
        if len(pres) < 3:
            return
        pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
        bg, w = jax.device_get(estimate_gyro_bias(
            jnp.asarray(np.stack(R1), jnp.float32),
            jnp.asarray(np.stack(R2), jnp.float32), pre_stack))
        if np.isfinite(bg).all() and np.abs(bg).max() < 1.0:
            self.bias = self.bias.copy()
            self.bias[:3] = bg
            self.stats["gyro_bias_edges_down"] = int((w < 0.99).sum())

    def _run_imu_init(self, chain, rows, priors, frame, force=False):
        """InertialOptimization over the keyframe chain, then
        ApplyScaledRotation (LocalMapping::InitializeIMU).  With `force`
        the consistency gate is skipped (starvation deadline — only the
        basic finiteness/scale-range sanity checks remain)."""
        m, cfg = self.map, self.cfg
        R_bc = np.asarray(self.calib.R_bc)
        t_bc = np.asarray(self.calib.t_bc)
        self._robust_gyro_bias()
        R_wb_list, p_wb_list = [], []
        for k in chain:
            R_wb, p_wb = _body_from_cam(m.kf_R[k], m.kf_t[k], R_bc, t_bc)
            R_wb_list.append(R_wb)
            p_wb_list.append(p_wb)
        pres = [_preintegrate_rows(r, self.bias, self.calib, KF_BUCKETS)
                for r in rows]
        pre_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *pres)
        fix_scale = cfg.bf > 0
        out = inertial_only_optimization(
            jnp.asarray(np.stack(R_wb_list), jnp.float32),
            jnp.asarray(np.stack(p_wb_list), jnp.float32),
            pre_stack,
            prior_gyro=priors[0], prior_acc=priors[1],
            fix_scale=fix_scale,
        )
        s = float(out["scale"])
        self.stats["imu_init_edge_norms"] = np.asarray(out["edge_norms"])
        self.stats["imu_init_last_s"] = s
        if not np.isfinite(s) or s < 1e-2 or s > 1e2:
            return False
        if not m.imu_initialized:
            # First metric alignment: when visual keyframe poses are not
            # yet mutually consistent (mono scale drift / a tracking glitch
            # inside the window), the whitened inertial edges cannot be
            # brought down and the fitted scale is meaningless — retry at
            # the next keyframe instead of poisoning the map (measured:
            # healthy solves sit at median norm ~30-80, corrupted at 200+).
            if (not force and
                    float(np.median(np.asarray(out["edge_norms"]))) > 100.0):
                return False
        else:
            # Refinement stages (the reference applies VIBA1/VIBA2
            # unconditionally on schedule, LocalMapping.cc:187-249): keep
            # only sanity bounds.  The scale band is wide on purpose — a
            # coarse first init over a short window can be several x off,
            # and the refinement's whole job is to fix that (measured: a
            # 0.7..1.4 band left a 4.5x mis-scale permanently locked in).
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(out["R_wg"])) - 1) / 2, -1, 1)))
            if not (0.2 < s < 5.0 and ang < 45.0):
                return False
            bias_jump = np.abs(np.asarray(out["bias"]) - self.bias)
            if bias_jump[3:].max() > 0.5 or bias_jump[:3].max() > 0.05:
                return False
        R_wg = np.asarray(out["R_wg"], np.float32)
        # The solver's bias is absolute (the edges reference pre.bias).
        bias_new = np.asarray(out["bias"], np.float32)
        v = np.asarray(out["v"], np.float32)

        # Re-express the map in the gravity-aligned, metric frame.
        R_gw = R_wg.T
        m.apply_scaled_rotation(R_gw, s)
        # Solver velocities are already metric; only re-orient them.
        m.kf_v[chain] = v @ R_gw.T
        # Backfill other keyframes' velocities by central differences of the
        # (now metric) keyframe positions.
        kfs = np.nonzero(m.kf_valid)[0]
        if kfs.size >= 2:
            centers = -np.einsum("kij,kj->ki",
                                 m.kf_R[kfs].transpose(0, 2, 1), m.kf_t[kfs])
            tss = m.kf_timestamp[kfs]
            others = ~np.isin(kfs, chain)
            for j in np.nonzero(others)[0]:
                a, b = max(j - 1, 0), min(j + 1, kfs.size - 1)
                dt = max(float(tss[b] - tss[a]), 1e-3)
                m.kf_v[kfs[j]] = (centers[b] - centers[a]) / dt
        # Every keyframe adopts the recovered bias (the init chain is
        # subsampled; stale zero biases on skipped keyframes would anchor
        # later random-walk chains to zero).
        m.kf_bias[m.kf_valid] = bias_new
        self.bias = bias_new
        m.imu_initialized = True

        # VIBA: whole-chain visual-inertial BA right after the alignment
        # (LocalMapping::InitializeIMU -> FullInertialBA, LocalMapping.cc:
        # 1343; bInit/shared-bias on the first metric alignment).
        first_init = "imu_init_scale" not in self.stats
        self.full_inertial_ba(
            shared_bias=first_init,
            prior_gyro=priors[0] if first_init else 0.0,
            prior_acc=priors[1] if first_init else 0.0,
            n_iters=15)

        # Transform in-flight tracker state the same way.  The current
        # frame IS the newest chain keyframe: take its pose/velocity from
        # the transformed map so tracking continues in the new world frame.
        kf_new = chain[-1]
        frame.R_cw = m.kf_R[kf_new].copy()
        frame.t_cw = m.kf_t[kf_new].copy()
        frame.v_w = m.kf_v[kf_new].copy()
        lf = self.last_frame
        if lf is not None and lf is not frame and lf.R_cw is not None:
            lf.R_cw = (lf.R_cw @ R_gw.T).astype(np.float32)
            lf.t_cw = (s * lf.t_cw).astype(np.float32)
            if lf.v_w is not None:
                lf.v_w = (lf.v_w @ R_gw.T).astype(np.float32)
            else:
                lf.v_w = m.kf_v[kf_new].copy()
        self.velocity = None  # visual motion model is stale after rescale
        self._speed_hist.clear()
        if "imu_init_scale" not in self.stats:
            self.stats["imu_init_scale"] = s   # first metric alignment
        self.stats["imu_refine_scale"] = s     # latest accepted stage
        return True


    # ------------------------------------------------------ inertial BA
    def local_inertial_ba(self, kf: int) -> bool:
        """Optimizer::LocalInertialBA (Optimizer.cc:2387): temporal window
        of the last Nd keyframes (poses + velocities + biases) with the
        keyframe before the window as fixed inertial anchor, plus fixed
        visual observers; landmarks from the window are in the Schur
        system.  Returns False when the problem is too small (caller falls
        back to visual local BA)."""
        m = self.map
        chain = self._kf_chain()
        if len(chain) < 4 or kf != chain[-1]:
            return False
        nd = min(len(chain) - 2, 10)
        window = chain[-nd:]
        anchor = [chain[-nd - 1]] if len(chain) > nd else []
        if not anchor:
            # No previous keyframe: fix the oldest window KF instead
            # (reference pops it from the optimizable set).
            anchor, window = [window[0]], window[1:]
        return self._vi_ba(opt_kfs=window, anchor_kfs=anchor,
                           n_iters=8, shared_bias=False,
                           prior_gyro=0.0, prior_acc=0.0,
                           max_fixed_observers=24, cull=True)

    def full_inertial_ba(self, shared_bias, prior_gyro=0.0, prior_acc=0.0,
                         n_iters=15) -> bool:
        """Optimizer::FullInertialBA (Optimizer.cc:393) over the whole
        temporal chain; in shared_bias (bInit) mode a single bias serves
        every inertial edge and the priorG/priorA prior applies to it."""
        chain = self._kf_chain()
        if len(chain) < 4:
            return False
        return self._vi_ba(opt_kfs=chain[1:], anchor_kfs=[chain[0]],
                           n_iters=n_iters, shared_bias=shared_bias,
                           prior_gyro=prior_gyro, prior_acc=prior_acc,
                           max_fixed_observers=0, cull=False,
                           anchor_vb_free=True)

    def _vi_ba(self, opt_kfs, anchor_kfs, n_iters, shared_bias,
               prior_gyro, prior_acc, max_fixed_observers, cull,
               anchor_vb_free=False):
        m, cfg = self.map, self.cfg
        chain_kfs = list(anchor_kfs) + list(opt_kfs)  # temporal order

        # Landmarks observed from the optimizable window.
        lms = np.unique(m.kf_kp_lm[np.asarray(opt_kfs)])
        lms = lms[(lms != NO_LM) & m.lm_valid[np.maximum(lms, 0)]]
        if lms.size < 20:
            return False

        # Fixed visual observers (maxFixKF semantics, Optimizer.cc:2485).
        seen = np.zeros(m.max_lm, bool)
        seen[lms] = True
        observing = (seen[m.kf_kp_lm] & (m.kf_kp_lm != NO_LM)).any(axis=1)
        observing &= m.kf_valid
        fixed_ids = np.nonzero(observing)[0]
        fixed_ids = fixed_ids[~np.isin(fixed_ids, chain_kfs)]
        fixed_ids = fixed_ids[:max_fixed_observers]

        all_kf = np.asarray(chain_kfs + list(fixed_ids), np.int32)
        n_opt = len(opt_kfs)
        n_chain = len(chain_kfs)
        fixed = np.ones(all_kf.size, np.float32)
        fixed[len(anchor_kfs):n_chain] = 0.0
        # Gauge anchor of a whole-chain solve: pose frozen, velocity/bias
        # free (freezing a stale anchor bias would lock the entire chain
        # to it through the stiff gyro random-walk edges).
        fixed_vb = fixed.copy()
        if anchor_vb_free:
            fixed_vb[: len(anchor_kfs)] = 0.0

        # Body states from camera poses.
        R_bc = np.asarray(self.calib.R_bc)
        t_bc = np.asarray(self.calib.t_bc)
        R_wb = np.zeros((all_kf.size, 3, 3), np.float32)
        p_wb = np.zeros((all_kf.size, 3), np.float32)
        for i, k in enumerate(all_kf):
            R_wb[i], p_wb[i] = _body_from_cam(m.kf_R[k], m.kf_t[k],
                                              R_bc, t_bc)
        v_w = m.kf_v[all_kf].astype(np.float32)
        bias = m.kf_bias[all_kf].astype(np.float32)

        # Inertial chain edges with per-edge linearization bias.
        ts = m.kf_timestamp
        edge_i, edge_j, pres = [], [], []
        for a in range(n_chain - 1):
            ka, kb = chain_kfs[a], chain_kfs[a + 1]
            rows = self._rows_between(float(ts[ka]), float(ts[kb]))
            if rows.shape[0] == 0:
                return False
            pres.append(_preintegrate_rows(rows, bias[a], self.calib,
                                           KF_BUCKETS))
            edge_i.append(a)
            edge_j.append(a + 1)
        E_live = len(pres)

        # Visual observations restricted to the selected landmarks.
        okf, okp, olm = m.observations(all_kf)
        keep = seen[olm]
        okf, okp, olm = okf[keep], okp[keep], olm[keep]

        kf_index = np.full(m.max_kf, -1, np.int64)
        kf_index[all_kf] = np.arange(all_kf.size)
        lm_index = np.full(m.max_lm, -1, np.int64)
        lm_index[lms] = np.arange(lms.size)

        def _bucket(n, step):
            return max(step, -(-n // step) * step)

        def padr(a, n, fill=0):
            if a.shape[0] >= n:
                return a[:n]
            return np.concatenate(
                [a, np.full((n - a.shape[0], *a.shape[1:]), fill, a.dtype)])

        K = _bucket(all_kf.size, 16)
        M = _bucket(lms.size, 2048)
        O = _bucket(okf.size, 8192)
        E = _bucket(E_live, 16)

        R_p = padr(R_wb, K)
        R_p[all_kf.size:] = np.eye(3)
        p_p = padr(p_wb, K)
        v_p = padr(v_w, K)
        b_p = padr(bias, K)
        fixed_p = padr(fixed, K, 1.0)
        fixed_vb_p = padr(fixed_vb, K, 1.0)
        X = padr(m.lm_pos[lms], M)
        lm_mask = padr(np.ones(lms.size, np.float32), M)
        op = padr(kf_index[okf].astype(np.int32), O)
        ol = padr(lm_index[olm].astype(np.int32), O)
        ouv = padr(m.kf_kp_uv[okf, okp], O)
        olev = padr(m.kf_kp_level[okf, okp], O)
        omask = padr(np.ones(okf.size, np.float32), O)
        ei = padr(np.asarray(edge_i, np.int32), E)
        ej = padr(np.asarray(edge_j, np.int32), E)
        emask = padr(np.ones(E_live, np.float32), E)
        # Padded edges: identity preintegration (masked out of the cost).
        pad_pre = _preintegrate_rows(np.zeros((0, 7), np.float32),
                                     np.zeros(6, np.float32), self.calib,
                                     KF_BUCKETS)
        pres = pres + [pad_pre] * (E - E_live)
        pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)

        stereo_kw = {}
        if cfg.bf > 0:
            stereo_kw = dict(
                obs_ur=jnp.asarray(padr(m.kf_kp_ur[okf, okp], O, -1.0)),
                bf=jnp.float32(cfg.bf))

        out = inertial_bundle_adjust(
            cfg.project_fn, cfg.project_jac_fn,
            jnp.asarray(R_p), jnp.asarray(p_p), jnp.asarray(v_p),
            jnp.asarray(b_p), jnp.asarray(fixed_p),
            jnp.asarray(self._R_cb), jnp.asarray(self._t_cb),
            jnp.asarray(X), jnp.asarray(lm_mask),
            jnp.asarray(op), jnp.asarray(ol), jnp.asarray(ouv),
            jnp.asarray(olev), jnp.asarray(omask),
            jnp.asarray(ei), jnp.asarray(ej), pre_stack,
            jnp.asarray(emask),
            n_iters=n_iters, shared_bias=shared_bias,
            bias_src=n_chain - 1,
            prior_gyro=prior_gyro, prior_acc=prior_acc,
            fixed_vb=jnp.asarray(fixed_vb_p),
            wide_fov=cfg.camera_model == "kb8",
            **stereo_kw,
        )
        R_f, p_f, v_f, b_f, X_f, chi2, cost = out
        R_f = np.asarray(R_f)
        p_f = np.asarray(p_f)
        if not (np.isfinite(float(cost)) and np.isfinite(R_f).all()
                and np.isfinite(p_f).all()):
            return False

        v_f = np.array(v_f)
        b_f = np.array(b_f)
        if shared_bias:
            b_f[:n_chain] = b_f[n_chain - 1]
        upd = np.asarray(chain_kfs[len(anchor_kfs):], np.int64)
        sel = kf_index[upd]
        for i, k in zip(sel, upd):
            R_cw, t_cw = _cam_from_body(R_f[i], p_f[i], R_bc, t_bc)
            m.kf_R[k] = R_cw.astype(np.float32)
            m.kf_t[k] = t_cw.astype(np.float32)
        m.kf_v[upd] = v_f[sel]
        m.kf_bias[upd] = b_f[sel]
        if anchor_vb_free:
            anc = np.asarray(anchor_kfs, np.int64)
            m.kf_v[anc] = v_f[kf_index[anc]]
            m.kf_bias[anc] = b_f[kf_index[anc]]
        m.lm_pos[lms] = np.asarray(X_f)[: lms.size]
        self.bias = m.kf_bias[chain_kfs[-1]].copy()

        if cull:
            chi2 = np.asarray(chi2)[: okf.size]
            if cfg.bf > 0:
                gate = np.where(m.kf_kp_ur[okf, okp] >= 0, CHI2_STEREO,
                                CHI2_MONO)
            else:
                gate = CHI2_MONO
            bad = chi2 > gate
            m.kf_kp_lm[okf[bad], okp[bad]] = NO_LM
            orphan = np.nonzero(m.lm_valid
                                & (m.landmark_obs_count() < 2))[0]
            if orphan.size:
                m.remove_landmarks(orphan)
        m.change_idx += 1
        self.stats["n_inertial_ba"] = self.stats.get("n_inertial_ba", 0) + 1
        return True


class InertialTracker(ImuMixin, MonoTracker):
    """Monocular-inertial tracking (System::TrackMonocular with IMU)."""

    def __init__(self, cfg, slam_map, calib: ImuCalib = None,
                 imu_init_times=(2.0, 5.0, 15.0), **kw):
        super().__init__(cfg, slam_map, **kw)
        self._init_imu_state(calib or ImuCalib.make(), imu_init_times)

    def process_inertial(self, img, timestamp, imu_rows):
        self._ingest_imu(imu_rows, timestamp)
        frame = self.process(img, timestamp)
        self._note_initial_keyframes()
        if self.state != TrackState.OK:
            self._last_glitch_ts = timestamp
        if frame.pose_ok and frame.v_w is None and self.imu_stage > 0:
            frame.v_w = self.map.kf_v[self.ref_kf].copy()
        return frame


class StereoInertialTracker(ImuMixin, StereoTracker):
    """Stereo-inertial tracking (fix_scale IMU init)."""

    def __init__(self, cfg, slam_map, calib: ImuCalib = None,
                 imu_init_times=(2.0, 5.0, 15.0), **kw):
        super().__init__(cfg, slam_map, **kw)
        self._init_imu_state(calib or ImuCalib.make(), imu_init_times)

    def process_stereo_inertial(self, img_left, img_right, timestamp,
                                imu_rows):
        self._ingest_imu(imu_rows, timestamp)
        frame = self.process_stereo(img_left, img_right, timestamp)
        self._note_initial_keyframes()
        if self.state != TrackState.OK:
            self._last_glitch_ts = timestamp
        if frame.pose_ok and frame.v_w is None and self.imu_stage > 0:
            frame.v_w = self.map.kf_v[self.ref_kf].copy()
        return frame


class RgbdInertialTracker(ImuMixin, StereoTracker):
    """RGB-D-inertial tracking (reference System.h:93 IMU_RGBD,
    Examples/RGB-D-Inertial/rgbd_inertial_realsense_D435i.cc): the RGB-D
    front end (depth-sampled virtual right coordinates) composed with the
    fix-scale IMU machinery, exactly how stereo-inertial composes."""

    def __init__(self, cfg, slam_map, calib: ImuCalib = None,
                 imu_init_times=(2.0, 5.0, 15.0), **kw):
        super().__init__(cfg, slam_map, **kw)
        self._init_imu_state(calib or ImuCalib.make(), imu_init_times)

    def process_rgbd_inertial(self, img, depth_map, timestamp, imu_rows):
        self._ingest_imu(imu_rows, timestamp)
        frame = self.process_rgbd(img, depth_map, timestamp)
        self._note_initial_keyframes()
        if self.state != TrackState.OK:
            self._last_glitch_ts = timestamp
        if frame.pose_ok and frame.v_w is None and self.imu_stage > 0:
            frame.v_w = self.map.kf_v[self.ref_kf].copy()
        return frame


class FisheyeStereoInertialTracker(ImuMixin, FisheyeStereoTracker):
    """KB8 fisheye stereo-inertial tracking — the TUM-VI configuration
    (non-rectified ComputeStereoFishEyeMatches front end + fix-scale IMU
    init; reference Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc)."""

    def __init__(self, cfg, slam_map, calib: ImuCalib = None,
                 imu_init_times=(2.0, 5.0, 15.0), **kw):
        super().__init__(cfg, slam_map, **kw)
        self._init_imu_state(calib or ImuCalib.make(), imu_init_times)

    process_stereo_inertial = StereoInertialTracker.process_stereo_inertial
