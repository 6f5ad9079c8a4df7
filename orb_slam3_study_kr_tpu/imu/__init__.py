"""Inertial pipeline: preintegration, state prediction, inertial residuals.

Replaces /root/reference/src/ImuTypes.cc (Forster-style on-manifold
preintegration with 15x15 covariance and bias Jacobians) and the inertial
parts of the optimizer (G2oTypes edges).
"""

from orb_slam3_study_kr_tpu.imu.preintegration import (
    ImuCalib, Preintegrated, preintegrate, bias_corrected_deltas,
    predict_state, GRAVITY,
)
