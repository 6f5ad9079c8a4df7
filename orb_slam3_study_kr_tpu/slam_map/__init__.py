"""Map data model (L5): keyframes, landmarks, observations, covisibility,
multi-map Atlas — as structure-of-array tables instead of the reference's
pointer graph + mutexes (src/{Frame,KeyFrame,MapPoint,Map,Atlas}.cc).

Host-side numpy owns the bookkeeping (allocation, masks, graph edges);
device arrays are materialized per solver call.  Functional updates replace
the reference's lock hierarchy: each pipeline stage consumes a state and
returns a new one, and a monotonically increasing `change_idx` mirrors the
reference's map-change index used for tracker/back-end synchronization
(Map.h:110-113).
"""

from orb_slam3_study_kr_tpu.slam_map.map_state import MapState, Atlas
