"""Per-frame container: extracted features + pose + landmark bindings.

Host-side record (reference src/Frame.cc); heavy work (extraction,
undistortion) happens in jitted ops before this is built.
"""

from dataclasses import dataclass, field

import numpy as np

from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM


@dataclass
class Frame:
    frame_id: int
    timestamp: float
    uv: np.ndarray        # (N, 2) undistorted pixel coords
    level: np.ndarray     # (N,)
    angle: np.ndarray     # (N,)
    response: np.ndarray  # (N,)
    desc: np.ndarray      # (N, 256) uint8
    valid: np.ndarray     # (N,) bool
    patch: np.ndarray = None  # (N, 11, 11) uint8 oriented patch
    uv_raw: np.ndarray = None  # (N, 2) raw (distorted) pixel coords
    pyr: object = None         # (L, H, W) device blurred pyramid (transient)
    depth: np.ndarray = None  # (N,) metric depth from stereo/RGB-D, -1 = none
    u_r: np.ndarray = None    # (N,) right-image u coordinate, -1 = mono-only
    stereo_pc: np.ndarray = None  # (N, 3) camera-frame stereo points
    # (fisheye stereo: reference mvStereo3Dpoints, Frame.cc:1131)
    v_w: np.ndarray = None    # (3,) body velocity in world (inertial only)
    R_cw: np.ndarray = None
    t_cw: np.ndarray = None
    kp_lm: np.ndarray = None   # (N,) landmark binding, NO_LM if none
    ref_kf: int = -1
    pose_ok: bool = False
    # Device-resident copies of the per-keypoint arrays (populated by the
    # extractor).  The tracking hot path passes these to its jitted stages
    # so the same (N, 256) descriptor block etc. is not re-uploaded to the
    # chip on every match/optimize round — on a remote-attached TPU each
    # upload pays a full RTT.  Invalidated (set back to None) whenever the
    # host mutates the numpy master copy.
    _dev: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        if self.kp_lm is None:
            self.kp_lm = np.full(self.uv.shape[0], NO_LM, np.int32)

    def dev(self, name):
        """Device array for field `name` (uploads and caches on miss)."""
        import jax.numpy as jnp
        a = self._dev.get(name)
        if a is None:
            a = jnp.asarray(getattr(self, name))
            self._dev[name] = a
        return a

    def set_dev(self, name, arr):
        self._dev[name] = arr

    def invalidate_dev(self, *names):
        for n in names:
            self._dev.pop(n, None)

    @property
    def n_matches(self):
        return int((self.kp_lm != NO_LM).sum())

    def bound_obs(self):
        kp = np.nonzero(self.kp_lm != NO_LM)[0].astype(np.int32)
        return kp, self.kp_lm[kp]
