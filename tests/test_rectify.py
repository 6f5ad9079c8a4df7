"""Stereo rectification tests (io/rectify.py).

Oracles: (1) geometric — after rectification every 3-D point must project
to the SAME image row in both rectified cameras, with disparity f*b/z
(the property the row-wise stereo matcher assumes); (2) photometric — for
a trivial rig the remap must reproduce the source image; (3) driver —
build_system on a raw distorted-pinhole stereo YAML must return a
rectified session (zero distortion, shared focal, correct bf).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam3_study_kr_tpu.io.rectify import stereo_rectify


def _project(params, R, t, P):
    """Raw pinhole projection of world points (left frame) with rad-tan."""
    import jax.numpy as jnp
    from orb_slam3_study_kr_tpu.cameras import pinhole
    p = P @ np.asarray(R).T + np.asarray(t)
    full = np.concatenate([np.asarray(params, np.float32)])
    return np.asarray(pinhole.project(jnp.asarray(full), jnp.asarray(
        p, jnp.float32)))


def test_rectified_rows_align():
    rng = np.random.default_rng(0)
    W, H = 752, 480
    params_l = np.array([458.0, 457.0, 372.0, 244.0,
                         -0.28, 0.07, 1e-4, 2e-5, 0.0])
    params_r = np.array([456.0, 455.5, 379.0, 255.0,
                         -0.28, 0.07, -1e-4, 1e-5, 0.0])
    # Slightly rotated rig, baseline ~0.11 m mostly along x.
    from orb_slam3_study_kr_tpu import lie
    import jax.numpy as jnp
    R_rl = np.asarray(lie.exp_so3(jnp.asarray([0.004, -0.01, 0.006],
                                              jnp.float32)), np.float64)
    t_rl = np.array([-0.110, 0.0004, -0.0008])
    rig = stereo_rectify(params_l, params_r, R_rl, t_rl, W, H)
    assert abs(rig.baseline - np.linalg.norm(t_rl)) < 1e-6

    # Random points in front of the rig.
    P = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200),
                  rng.uniform(3, 12, 200)], -1)
    f = rig.K_new[0, 0]
    cx, cy = rig.K_new[0, 2], rig.K_new[1, 2]
    pl = P @ rig.R_rect_l.T
    pr = (P @ R_rl.T + t_rl) @ rig.R_rect_r.T
    ul = f * pl[:, 0] / pl[:, 2] + cx
    vl = f * pl[:, 1] / pl[:, 2] + cy
    ur = f * pr[:, 0] / pr[:, 2] + cx
    vr = f * pr[:, 1] / pr[:, 2] + cy
    # Same row in both rectified views.
    np.testing.assert_allclose(vl, vr, atol=1e-6)
    # Disparity = f * b / z, positive (right image shifted left).
    np.testing.assert_allclose(ul - ur, f * rig.baseline / pl[:, 2],
                               rtol=1e-6)


def test_remap_identity_rig():
    """Zero distortion, identity rig, K_new == K_raw up to the principal
    point: the remap is an exact (sub)pixel translation of the source."""
    W, H = 64, 48
    f = 100.0
    params = np.array([f, f, W / 2.0, H / 2.0, 0, 0, 0, 0, 0])
    rig = stereo_rectify(params, params, np.eye(3),
                         np.array([-0.1, 0.0, 0.0]), W, H)
    # Identity geometry: R_rect = I, K_new == K_raw.
    np.testing.assert_allclose(rig.R_rect_l, np.eye(3), atol=1e-12)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    out = rig.remap_left(img)
    np.testing.assert_allclose(out[1:-1, 1:-1], img[1:-1, 1:-1], atol=1e-3)


def test_build_system_rectifies_raw_stereo(tmp_path):
    yaml = tmp_path / "raw_stereo.yaml"
    yaml.write_text("""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 0.0000176187114
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -0.0000035559
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997, 0.002312, 0.000376, 0.110074,
         -0.002317, 0.999898, 0.014090, 0.000399,
         -0.000343, -0.014091, 0.999901, -0.000853,
         0.0, 0.0, 0.0, 1.0]
""")

    import argparse

    from examples.run_euroc import build_system
    args = argparse.Namespace(
        settings=str(yaml), sensor="stereo", vocabulary=None)
    slam = build_system(args)
    assert slam.rectifier is not None
    t = slam.cfg.tracker
    assert all(abs(d) < 1e-12 for d in t.dist)
    assert abs(t.fx - t.fy) < 1e-9
    assert abs(slam.cfg.baseline - 0.1100814) < 1e-3
    assert abs(t.bf - t.fx * slam.cfg.baseline) < 1e-3
