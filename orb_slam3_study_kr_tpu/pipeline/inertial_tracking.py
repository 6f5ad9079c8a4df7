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
from orb_slam3_study_kr_tpu.pipeline.stereo_tracking import StereoTracker
from orb_slam3_study_kr_tpu.pipeline.tracking import MonoTracker, TrackState
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM
from orb_slam3_study_kr_tpu.solvers.inertial import (
    inertial_only_optimization, pose_inertial_optimization)

# Padded sample-window buckets (bounds recompilation across frame gaps).
FRAME_BUCKETS = (64, 256, 1024)
KF_BUCKETS = (256, 1024, 4096)


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
        self.imu_stage = 0            # 0 = vision only; 1/2/3 = init stages
        self.bias = np.zeros(6, np.float32)
        self._imu_log = []            # (frame_ts, rows): samples ending at ts
        self.kf_imu = {}              # kf_id -> (prev_kf_id, rows (M,7))
        self._pre_frame = None        # Preintegrated last frame -> current
        self._pred_v = None
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

    # -------------------------------------------------------- optimization
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
        R, p, v, bias, inl = pose_inertial_optimization(
            cfg.project_fn,
            jnp.asarray(R_wb0), jnp.asarray(p_wb0), jnp.asarray(lf.v_w),
            jnp.asarray(self.bias), self._pre_frame,
            jnp.asarray(R_wbi), jnp.asarray(p_wbi), jnp.asarray(v_init),
            jnp.asarray(self._R_cb), jnp.asarray(self._t_cb),
            jnp.asarray(X), jnp.asarray(frame.uv),
            jnp.asarray(frame.level), jnp.asarray(mask.astype(np.float32)),
        )
        inl = np.asarray(inl) & mask
        R_cw, t_cw = _cam_from_body(np.asarray(R), np.asarray(p),
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
        rows = [self._rows_between(float(ts[a]), float(ts[b]))
                for a, b in zip(sel[:-1], sel[1:])]
        priors = {1: (1e2, 1e10), 2: (1.0, 1e5), 3: (0.0, 0.0)}[target]
        if self._run_imu_init(sel, rows, priors, frame):
            self.imu_stage = target

    def _run_imu_init(self, chain, rows, priors, frame):
        """InertialOptimization over the keyframe chain, then
        ApplyScaledRotation (LocalMapping::InitializeIMU)."""
        m, cfg = self.map, self.cfg
        R_bc = np.asarray(self.calib.R_bc)
        t_bc = np.asarray(self.calib.t_bc)
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
            if float(np.median(np.asarray(out["edge_norms"]))) > 100.0:
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
        m.kf_bias[np.asarray(chain)] = bias_new
        self.bias = bias_new
        m.imu_initialized = True

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
