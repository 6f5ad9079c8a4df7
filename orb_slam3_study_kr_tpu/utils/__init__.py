"""Cross-cutting utilities: profiling, logging verbosity."""

from orb_slam3_study_kr_tpu.utils.profiling import StageTimers
