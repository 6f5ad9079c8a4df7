"""Perception + geometry kernels (L3 of the layer map).

Batched, fixed-shape JAX/Pallas re-designs of the reference's hot loops:
ORB pyramid extraction (src/ORBextractor.cc), Hamming matching
(src/ORBmatcher.cc), stereo matching (src/Frame.cc), triangulation
(src/GeometricTools.cc).
"""
