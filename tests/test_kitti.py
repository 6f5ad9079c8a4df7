"""KITTI odometry loader + examples/run_kitti.py on a generated fixture.

Mirrors /root/reference/Examples/Monocular/mono_kitti.cc:156-185
(LoadImages: times.txt + image_0/NNNNNN.png) without real data: synthetic
renders are written into the KITTI sequence layout, then played through
the driver end to end, producing a KITTI-format trajectory."""

import importlib.util
import os

import numpy as np
import pytest
from PIL import Image

from orb_slam3_study_kr_tpu.io import synthetic
from orb_slam3_study_kr_tpu.io.datasets import load_kitti

_spec = importlib.util.spec_from_file_location(
    "run_kitti",
    os.path.join(os.path.dirname(__file__), "..", "examples", "run_kitti.py"))
run_kitti = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(run_kitti)

# Synthetic camera (matches io/synthetic.py's render intrinsics).
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375


def _write_sequence(root, world, R_gt, t_gt, rng):
    os.makedirs(root / "image_0", exist_ok=True)
    with open(root / "times.txt", "w") as f:
        for i in range(R_gt.shape[0]):
            f.write(f"{i * 0.1:.6e}\n")
            img = synthetic.render_textured(world, R_gt[i], t_gt[i], rng=rng)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                root / "image_0" / f"{i:06d}.png")
    p0 = np.zeros(12)
    p0[0], p0[5] = FX, FY
    p0[2], p0[6] = CX, CY
    with open(root / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(f"{x:.6e}" for x in p0) + "\n")
        p1 = p0.copy()
        p1[3] = -FX * 0.54          # right camera: P1[0,3] = -fx * baseline
        f.write("P1: " + " ".join(f"{x:.6e}" for x in p1) + "\n")


def test_load_kitti_layout(tmp_path):
    rng = np.random.default_rng(3)
    world = synthetic.make_textured_world(rng, depth=6.0)
    R_gt, t_gt = synthetic.lateral_trajectory(3, x_span=0.2)
    _write_sequence(tmp_path, world, R_gt, t_gt, rng)
    seq = load_kitti(str(tmp_path))
    assert len(seq) == 3
    assert seq.ts[1] == pytest.approx(0.1)
    img = seq.image(1)
    assert img.ndim == 2 and img.shape[0] > 100
    assert seq.calib["P0"].shape == (3, 4)
    assert seq.calib["P1"][0, 3] == pytest.approx(-FX * 0.54, rel=1e-5)


@pytest.mark.slow
def test_run_kitti_mono_session(tmp_path):
    rng = np.random.default_rng(7)
    world = synthetic.make_textured_world(rng, depth=6.0)
    n = 14
    R_gt, t_gt = synthetic.lateral_trajectory(n, x_span=0.8, z_span=0.0,
                                              y_amp=0.0)
    _write_sequence(tmp_path, world, R_gt, t_gt, rng)
    out = tmp_path / "traj_kitti.txt"
    rc = run_kitti.main([str(tmp_path), "--sensor", "mono",
                         "--out", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= n // 2
    # KITTI format: 12 floats (row-major 3x4 [R | t]) per frame.
    row = np.asarray([float(x) for x in lines[0].split()])
    assert row.size == 12
    R = row.reshape(3, 4)[:, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-3)
