"""Headless visualization (reference L8: src/{FrameDrawer,MapDrawer,Viewer}.cc).

The reference renders live Pangolin/OpenCV windows; this machine is headless
and the pipeline is offline-deterministic, so the same observability surface
is provided as renderers that return/write images:

- FrameDrawer: per-frame 2-D overlay (keypoints, tracked matches, state text)
  as an (H, W, 3) uint8 array — FrameDrawer::DrawFrame semantics.
- MapDrawer: 3-D map rendering (landmarks, keyframe frusta, covisibility
  graph, current camera, trajectory) to a matplotlib figure / PNG —
  MapDrawer::Draw* semantics.
- SessionViewer: per-frame recording driver that composes both into a
  dashboard image per frame (Viewer::Run's role, without a window).
"""

from orb_slam3_study_kr_tpu.viz.frame_drawer import FrameDrawer
from orb_slam3_study_kr_tpu.viz.map_drawer import MapDrawer
from orb_slam3_study_kr_tpu.viz.viewer import SessionViewer

__all__ = ["FrameDrawer", "MapDrawer", "SessionViewer"]
