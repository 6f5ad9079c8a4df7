"""Pipeline stages (L6-L7): tracking, local mapping, loop closing, System.

The reference runs these as POSIX threads sharing the map under mutexes
(System.cc:191-237); here a host-side orchestrator sequences deterministic
jit-compiled stages — tracking per frame, mapping per keyframe — which makes
the whole pipeline reproducible (a property the reference lacks).
"""

from orb_slam3_study_kr_tpu.pipeline.system import SlamSystem, SystemConfig
