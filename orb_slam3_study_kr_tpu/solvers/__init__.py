"""Estimation / optimization layer (replaces g2o + src/Optimizer.cc).

Everything is dense-block Gauss-Newton / Levenberg-Marquardt on fixed-shape
arrays: batched closed-form Jacobians, per-landmark 3x3 Schur elimination,
robust Huber reweighting, fixed-iteration lax.scan loops with masked
early-exit semantics.
"""

from orb_slam3_study_kr_tpu.solvers.pose_opt import optimize_pose
from orb_slam3_study_kr_tpu.solvers.local_ba import bundle_adjust
