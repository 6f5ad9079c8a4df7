"""TPU-native visual / visual-inertial / multi-map SLAM engine.

A from-scratch re-design of the ORB-SLAM3 capability surface
(reference: hanseongbugi/ORB_SLAM3_Study_kr) for TPU hardware:

- perception kernels (ORB pyramid / FAST / BRIEF, Hamming matching) as
  batched fixed-shape JAX + Pallas programs,
- estimation (pose optimization, local/global bundle adjustment, Sim3 /
  4-DoF pose graphs, IMU preintegration) as dense-block Gauss-Newton /
  Levenberg-Marquardt solvers with Schur-complement landmark
  marginalization,
- the map (keyframes, landmarks, covisibility, Atlas) as structure-of-
  array device tables with masks instead of pointer graphs and mutexes,
- multi-chip scale via jax.sharding Mesh + shard_map collectives.

Layer map (mirrors SURVEY.md section 1 of the reference):
  lie/        L0  Lie groups (SO3/SE3/Sim3)           <- Thirdparty/Sophus
  solvers/    L1+L4 GN/LM, Schur BA, pose graphs      <- Thirdparty/g2o + src/Optimizer.cc
  bow/        L2  binary-descriptor place recognition <- Thirdparty/DBoW2
  ops/        L3  perception kernels                  <- src/ORBextractor.cc, ORBmatcher.cc
  cameras/    L3  camera models + two-view init       <- src/CameraModels, TwoViewReconstruction.cc
  imu/        L4  preintegration                      <- src/ImuTypes.cc
  slam_map/   L5  frames/keyframes/landmarks/Atlas    <- src/{Frame,KeyFrame,MapPoint,Map,Atlas}.cc
  pipeline/   L6-L7 tracking / mapping / loop closing / System
  io/         L9  dataset drivers, trajectory writers <- Examples/
  evaluation/ L10 ATE evaluation                      <- evaluation/
  parallel/   --  device-mesh sharding (new: reference is single-process)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry accuracy is load-bearing: on TPU the MXU defaults to bfloat16
# matmul inputs, whose ~0.4% relative error is amplified by depth/baseline
# ratios (>20x in triangulation) into percent-level 3-D error.  All dots in
# this package therefore default to full float32; kernels that genuinely
# want bfloat16 (descriptor-distance matrices, image-space convolutions)
# opt in explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: the pipeline's fixed-shape stages are
# bucketed, so every bucket's compile (tens of seconds on TPU) is paid at
# most once per machine instead of once per process.  The cache directory
# is scoped by the JAX platform selection AND the host machine: a
# remote-attached TPU process compiles its *CPU* executables against the
# relay host's CPU features, and a local CPU process loading those AOT
# results can SIGILL (observed: +prefer-no-scatter mismatch).
import os as _os
import platform as _platform

# XLA:CPU AOT deserialization is unreliable (segfaults in
# compilation_cache.get_executable_and_time loading blobs whose
# prefer-no-scatter/-gather pseudo-features the host detector rejects) —
# persist only for non-CPU platforms, where compiles cost tens of seconds.
if (not _jax.config.jax_compilation_cache_dir
        and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")):
    _scope = (f"{_platform.node()}-"
              f"{_os.environ.get('JAX_PLATFORMS', 'default')}")
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "ORB_SLAM3_TPU_JAX_CACHE",
            _os.path.expanduser(
                f"~/.cache/orb_slam3_study_kr_tpu/jax-{_scope}")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
