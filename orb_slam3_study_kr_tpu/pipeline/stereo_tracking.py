"""Stereo (and RGB-D) tracking front end.

Extends the monocular tracker with the reference's stereo semantics
(Tracking::GrabImageStereo / StereoInitialization, Tracking.cc:2356):
per-frame rectified stereo matching gives metric depth for a subset of
keypoints; initialization is immediate (backproject close keypoints into
landmarks at the first frame), and every new keyframe also spawns
landmarks from unbound close stereo points (CreateNewKeyFrame's stereo
branch).  Observations with a measured right coordinate contribute the
stereo (u, v, u_r) 3-dof residual in pose optimization and BA
(solvers/local_ba.py:137-143 via the bf/ur plumbing here); metric scale
is additionally maintained by the continuous injection of metric-depth
landmarks.

RGB-D reuses the same path with depth measured instead of matched
(`depth_to_virtual_right`).
"""

import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu.ops import orb, stereo
from orb_slam3_study_kr_tpu.pipeline.frame import Frame
from orb_slam3_study_kr_tpu.pipeline.tracking import (MonoTracker, TrackState,
                                                      TrackerConfig, _undistort)
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM


class StereoTracker(MonoTracker):
    """Tracking driver for a rectified stereo rig (or RGB-D)."""

    def __init__(self, cfg: TrackerConfig, slam_map, baseline=0.11,
                 depth_factor=40.0, **kw):
        super().__init__(cfg, slam_map, **kw)
        self.baseline = float(baseline)
        # Close-point threshold: mThDepth = fx * baseline * depth_factor / fx
        self.th_depth = depth_factor * self.baseline

    # ------------------------------------------------------------------
    def process_stereo(self, img_left, img_right, timestamp) -> Frame:
        cfg = self.cfg
        with self.timers.stage("track/extract"):
            frame = self._extract_frame(img_left, timestamp)
            fR = orb.extract_orb(jnp.asarray(img_right, jnp.float32),
                                 cfg.orb_config)
        with self.timers.stage("track/stereo_match"):
            u_r, depth, ok = stereo.match_stereo(
                jnp.asarray(frame.uv_raw), frame.dev("level"),
                frame.dev("desc"), frame.dev("valid"),
                fR.uv, fR.level, fR.desc, fR.valid,
                jnp.asarray(img_left, jnp.float32),
                jnp.asarray(img_right, jnp.float32),
                cfg.fx, self.baseline,
            )
        ok_np = np.asarray(ok)
        frame.depth = np.where(ok_np, np.asarray(depth), -1.0).astype(np.float32)
        frame.u_r = np.where(ok_np, np.asarray(u_r), -1.0).astype(np.float32)

        if self.state == TrackState.NOT_INITIALIZED:
            with self.timers.stage("track/initialize"):
                self._stereo_initialization(frame)
        else:
            with self.timers.stage("track/track"):
                self._track(frame)

        self._record_trajectory(frame)
        self.last_frame = frame
        return frame

    def process_rgbd(self, img, depth_map, timestamp) -> Frame:
        """RGB-D: depth sampled at keypoints replaces stereo matching."""
        cfg = self.cfg
        frame = self._extract_frame(img, timestamp)
        uv = frame.uv_raw
        xi = np.clip(np.round(uv[:, 0]).astype(int), 0, depth_map.shape[1] - 1)
        yi = np.clip(np.round(uv[:, 1]).astype(int), 0, depth_map.shape[0] - 1)
        d = depth_map[yi, xi]
        frame.depth = np.where(d > 0, d, -1.0).astype(np.float32)
        # Virtual right coordinate (Frame::ComputeStereoFromRGBD).
        bf = cfg.fx * self.baseline
        frame.u_r = np.where(
            d > 0, frame.uv[:, 0] - bf / np.maximum(d, 1e-6), -1.0
        ).astype(np.float32)
        if self.state == TrackState.NOT_INITIALIZED:
            self._stereo_initialization(frame)
        else:
            self._track(frame)
        self._record_trajectory(frame)
        self.last_frame = frame
        return frame

    # ------------------------------------------------------------------
    def _backproject(self, frame, sel):
        pc = self._cheap_depth_points(frame, sel)
        # camera -> world
        R, t = frame.R_cw, frame.t_cw
        return (pc - t) @ R  # R^T (pc - t)

    def _stereo_initialization(self, frame: Frame):
        """Immediate metric initialization (StereoInitialization): the first
        frame with enough depth points becomes the origin keyframe."""
        m = self.map
        has_depth = frame.valid & (frame.depth > 0)
        if has_depth.sum() < 100:
            return
        frame.R_cw = np.eye(3, dtype=np.float32)
        frame.t_cw = np.zeros(3, np.float32)
        kf = m.add_keyframe(frame.R_cw, frame.t_cw, frame.uv, frame.level,
                            frame.angle, frame.valid, frame.desc,
                            frame.frame_id, frame.timestamp, patch=frame.patch,
                            ur=frame.u_r)
        sel = np.nonzero(has_depth)[0].astype(np.int32)
        X = self._backproject(frame, sel)
        lm_ids = m.add_landmarks(X, frame.desc[sel], kf,
                                 patches=frame.patch[sel])
        m.bind(kf, sel, lm_ids)
        m.update_landmark_stats(lm_ids)
        frame.kp_lm[sel] = lm_ids
        frame.pose_ok = True
        frame.ref_kf = kf
        self.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackState.OK
        self.stats["n_kf"] = 1
        if self.local_mapper is not None:
            self.local_mapper.note_new_keyframe(kf)

    def _cheap_depth_points(self, frame, sel):
        """Camera-frame 3-D of the selected stereo points (overridden for
        fisheye, where depth alone does not determine the point)."""
        cfg = self.cfg
        z = frame.depth[sel]
        x = (frame.uv[sel, 0] - cfg.cx) / cfg.fx * z
        y = (frame.uv[sel, 1] - cfg.cy) / cfg.fy * z
        return np.stack([x, y, z], -1).astype(np.float32)

    def _create_keyframe(self, frame: Frame):
        """Mono keyframe creation plus the stereo branch: unbound close
        points become landmarks immediately (CreateNewKeyFrame,
        Tracking.cc:3258 stereo path)."""
        super()._create_keyframe(frame)
        m = self.map
        kf = self.ref_kf
        depth = getattr(frame, "depth", None)
        if depth is None:
            return
        free = frame.valid & (frame.kp_lm == NO_LM) & (depth > 0) & (
            depth < self.th_depth)
        sel = np.nonzero(free)[0].astype(np.int32)
        if sel.size == 0:
            return
        # Pose may have been refined by mapping; recompute with the KF pose.
        frame.R_cw = m.kf_R[kf].copy()
        frame.t_cw = m.kf_t[kf].copy()
        X = self._backproject(frame, sel)
        lm_ids = m.add_landmarks(X, frame.desc[sel], kf,
                                 patches=frame.patch[sel])
        m.bind(kf, sel, lm_ids)
        m.update_landmark_stats(lm_ids)
        frame.kp_lm[sel] = lm_ids
        if self.local_mapper is not None:
            self.local_mapper.recent.extend((int(l), kf) for l in lm_ids)


class FisheyeStereoTracker(StereoTracker):
    """Non-rectified KB8 fisheye stereo rig (the TUM-VI configuration).

    Replaces the KannalaBrandt8 branch of Frame/Tracking
    (ComputeStereoFishEyeMatches, Frame.cc:1131): left/right keypoints are
    matched by descriptor under the epipolar-plane gate of the known
    extrinsic and triangulated from bearing rays; accepted points carry a
    full camera-frame 3-D point (mvStereo3Dpoints) instead of a rectified
    disparity, and metric scale enters the map through those landmarks.
    BA residuals stay per-camera KB8 reprojections (cfg.bf must be 0 — the
    rectified u_r residual row has no meaning here).

    Args:
      cfg: left-camera TrackerConfig with camera_model="kb8".
      cfg_right: right-camera TrackerConfig (defaults to the left's).
      R_rl, t_rl: pose of the left camera in the right camera frame
        (p_r = R_rl p_l + t_rl; the reference stores Tlr and inverts).
    """

    def __init__(self, cfg: TrackerConfig, slam_map, R_rl=None, t_rl=None,
                 cfg_right: TrackerConfig = None, baseline=None,
                 depth_factor=40.0, **kw):
        if cfg.camera_model != "kb8":
            raise ValueError("FisheyeStereoTracker requires camera_model='kb8'")
        if cfg.bf != 0.0:
            raise ValueError("fisheye stereo uses per-camera residuals; "
                             "set cfg.bf = 0")
        self.cfg_right = cfg_right or cfg
        self.R_rl = np.eye(3, dtype=np.float32) if R_rl is None else \
            np.asarray(R_rl, np.float32)
        self.t_rl = (np.array([-0.11, 0, 0], np.float32) if t_rl is None
                     else np.asarray(t_rl, np.float32))
        if baseline is None:
            baseline = float(np.linalg.norm(self.t_rl))
        super().__init__(cfg, slam_map, baseline=baseline,
                         depth_factor=depth_factor, **kw)

    # ------------------------------------------------------------------
    def process_stereo(self, img_left, img_right, timestamp) -> Frame:
        from orb_slam3_study_kr_tpu.ops import fisheye_stereo
        cfg, cfg_r = self.cfg, self.cfg_right
        with self.timers.stage("track/extract"):
            frame = self._extract_frame(img_left, timestamp)
            fR = orb.extract_orb(jnp.asarray(img_right, jnp.float32),
                                 cfg_r.orb_config)
        with self.timers.stage("track/stereo_match"):
            b_l = cfg.unproject_fn(frame.dev("uv"))
            b_r = cfg_r.unproject_fn(fR.uv)
            out = fisheye_stereo.match_stereo_fisheye(
                cfg.project_fn, cfg_r.project_fn, jnp.float32(cfg.focal),
                jnp.asarray(self.R_rl), jnp.asarray(self.t_rl),
                frame.dev("uv"), b_l, frame.dev("level"),
                frame.dev("desc"), frame.dev("valid"),
                frame.dev("angle"),
                fR.uv, b_r, fR.level, fR.desc, fR.valid, fR.angle,
            )
        ok = np.asarray(out["ok"])
        frame.stereo_pc = np.asarray(out["X"], np.float32)
        frame.depth = np.where(ok, np.asarray(out["depth"]), -1.0).astype(
            np.float32)
        frame.u_r = np.full(frame.uv.shape[0], -1.0, np.float32)

        if self.state == TrackState.NOT_INITIALIZED:
            with self.timers.stage("track/initialize"):
                self._stereo_initialization(frame)
        else:
            with self.timers.stage("track/track"):
                self._track(frame)

        self._record_trajectory(frame)
        self.last_frame = frame
        return frame

    def _cheap_depth_points(self, frame, sel):
        return frame.stereo_pc[sel].astype(np.float32)
