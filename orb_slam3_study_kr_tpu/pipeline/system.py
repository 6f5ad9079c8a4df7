"""Public session API (reference include/System.h): construct the map +
pipeline stages, route frames, save trajectories.
"""

import time
from dataclasses import dataclass, field

import numpy as np

from orb_slam3_study_kr_tpu.pipeline.local_mapping import LocalMapper
from orb_slam3_study_kr_tpu.pipeline.tracking import (MonoTracker, TrackerConfig,
                                                      TrackState)
from orb_slam3_study_kr_tpu.slam_map.map_state import Atlas


@dataclass
class SystemConfig:
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    max_kf: int = 300
    max_lm: int = 80000


class SlamSystem:
    """Monocular SLAM session (System::TrackMonocular path)."""

    def __init__(self, cfg: SystemConfig = None):
        self.cfg = cfg or SystemConfig()
        self.atlas = Atlas()
        m = self.atlas.create_map(
            max_kf=self.cfg.max_kf,
            max_kp=self.cfg.tracker.orb_config.total_slots,
            max_lm=self.cfg.max_lm,
        )
        self.local_mapper = LocalMapper(cfg=self.cfg.tracker, map=m)
        self.tracker = MonoTracker(self.cfg.tracker, m, self.local_mapper)
        self.timings = []

    def track_monocular(self, img, timestamp):
        t0 = time.perf_counter()
        frame = self.tracker.process(img, timestamp)
        self.timings.append(time.perf_counter() - t0)
        return frame

    @property
    def state(self):
        return self.tracker.state

    def trajectory(self):
        return self.tracker.final_trajectory()

    def save_trajectory_tum(self, path):
        """TUM format: ts tx ty tz qx qy qz qw (System::SaveTrajectoryTUM)."""
        rows = self.trajectory()
        with open(path, "w") as f:
            for r in rows:
                ts, x, y, z, qw, qx, qy, qz = r
                f.write(f"{ts:.6f} {x:.7f} {y:.7f} {z:.7f} "
                        f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")

    def stats(self):
        m = self.atlas.active_map
        return dict(
            n_frames=self.tracker.stats["n_frames"],
            n_kf=int(m.kf_valid.sum()),
            n_lm=int(m.lm_valid.sum()),
            track_fail=self.tracker.stats["track_fail"],
            mapper=self.local_mapper.stats,
            mean_frame_ms=1e3 * float(np.mean(self.timings)) if self.timings else 0.0,
        )
