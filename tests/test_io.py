"""Dataset driver + settings tests on generated fixture directories and the
reference's real calibration YAMLs."""

import os

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.io.datasets import load_euroc, load_tum_rgbd
from orb_slam3_study_kr_tpu.io.settings import Settings

REF_YAML = "/root/reference/Examples/Monocular/EuRoC.yaml"
REF_TUMVI = "/root/reference/Examples/Monocular/TUM-VI.yaml"


def _write_euroc_fixture(root):
    os.makedirs(root / "cam0" / "data", exist_ok=True)
    os.makedirs(root / "imu0", exist_ok=True)
    with open(root / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(5):
            f.write(f"{1403636579763555584 + i * 50000000},{i:019d}.png\n")
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i in range(50):
            ts = 1403636579763555584 + i * 5000000
            f.write(f"{ts},0.01,0.02,0.03,0.1,0.2,9.7\n")


def test_euroc_loader(tmp_path):
    _write_euroc_fixture(tmp_path)
    seq = load_euroc(str(tmp_path))
    assert len(seq) == 5
    assert abs(seq.cam0_ts[1] - seq.cam0_ts[0] - 0.05) < 1e-6
    ts, gyro, acc = seq.imu_between(seq.cam0_ts[0], seq.cam0_ts[1])
    assert 8 <= len(ts) <= 11
    np.testing.assert_allclose(gyro[0], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(acc[0], [0.1, 0.2, 9.7])


def test_tum_rgbd_loader(tmp_path):
    with open(tmp_path / "rgb.txt", "w") as f:
        f.write("# color images\n")
        for i in range(4):
            f.write(f"{1305031102.175304 + i * 0.033:.6f} rgb/{i}.png\n")
    seq = load_tum_rgbd(str(tmp_path))
    assert len(seq) == 4
    assert seq.rgb_files[0] == "rgb/0.png"


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference not mounted")
def test_settings_parses_reference_euroc_yaml():
    s = Settings(REF_YAML)
    assert s.version == "1.0"
    cfg = s.tracker_config()
    assert abs(cfg.fx - 458.654) < 1e-3
    assert abs(cfg.dist[0] + 0.28340811) < 1e-6
    assert cfg.fps == 20.0
    assert cfg.n_features == 1000
    cam = s.make_camera()
    assert cam.kind.value == "pinhole"
    calib = s.imu_calib()
    assert calib is None  # the monocular yaml carries no IMU block


@pytest.mark.skipif(not os.path.exists(REF_TUMVI), reason="reference not mounted")
def test_settings_parses_reference_tumvi_yaml():
    s = Settings(REF_TUMVI)
    cam = s.make_camera()
    assert cam.kind.value == "kb8"


REF_STEREO_TUMVI = "/root/reference/Examples/Stereo-Inertial/TUM-VI.yaml"


def test_settings_stereo_tumvi():
    """KB8 stereo-inertial TUM-VI config: fisheye tracker + Tlr extrinsics
    (Settings.cc readCamera2 / Settings.h:58-123 parity)."""
    if not os.path.exists(REF_STEREO_TUMVI):
        pytest.skip("reference YAMLs not present")
    st = Settings(REF_STEREO_TUMVI)
    cfg = st.tracker_config()
    assert cfg.camera_model == "kb8"
    assert len(cfg.dist) == 4
    assert cfg.bf == 0.0  # fisheye rigs never use the rectified residual
    assert cfg.orb_n_levels >= 1 and cfg.orb_scale_factor > 1.0
    rig = st.stereo()
    assert rig is not None and "R_rl" in rig
    R_rl = np.asarray(rig["R_rl"])
    np.testing.assert_allclose(R_rl @ R_rl.T, np.eye(3), atol=1e-6)
    assert 0.05 < rig["baseline"] < 0.2  # TUM-VI ~10 cm stereo base
    calib = st.imu_calib()
    assert calib is not None


def test_settings_stereo_euroc_rectified():
    path = "/root/reference/Examples/Stereo/EuRoC.yaml"
    if not os.path.exists(path):
        pytest.skip("reference YAMLs not present")
    st = Settings(path)
    rig = st.stereo()
    assert rig is not None
    assert rig["baseline"] > 0.0
    load, save = st.atlas_files()  # keys absent -> (None, None), no raise
    assert load is None and save is None
