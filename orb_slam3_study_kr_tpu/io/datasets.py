"""Dataset drivers: EuRoC MAV and TUM-VI/TUM-RGBD directory layouts.

Replaces the example-side loaders (/root/reference/Examples/Monocular/
mono_euroc.cc:206-228 LoadImages, Examples/Stereo-Inertial/
stereo_inertial_euroc.cc:111-185 image+IMU sync).  Image decoding uses
imageio/PIL when available; everything else is plain CSV parsing.  No
datasets exist on the build machine, so these are exercised by the unit
tests through generated fixture directories.
"""

import csv
import os
from dataclasses import dataclass

import numpy as np


def _load_image(path):
    try:
        import imageio.v3 as iio
        img = iio.imread(path)
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = img.mean(axis=2)
    return img.astype(np.float32)


@dataclass
class EurocSequence:
    root: str                   # .../<seq>/mav0
    cam0_ts: np.ndarray         # (N,) seconds
    cam0_files: list
    cam1_ts: np.ndarray = None
    cam1_files: list = None
    imu_ts: np.ndarray = None   # (M,) seconds
    imu_gyro: np.ndarray = None  # (M, 3)
    imu_acc: np.ndarray = None   # (M, 3)
    gt_ts: np.ndarray = None
    gt_pos: np.ndarray = None

    def __len__(self):
        return len(self.cam0_files)

    def image(self, i, cam=0):
        files = self.cam0_files if cam == 0 else self.cam1_files
        sub = "cam0" if cam == 0 else "cam1"
        return _load_image(os.path.join(self.root, sub, "data", files[i]))

    def imu_between(self, t0, t1):
        """IMU samples with t0 < t <= t1 (the tracking-side preintegration
        window, Tracking::PreintegrateIMU)."""
        sel = (self.imu_ts > t0) & (self.imu_ts <= t1)
        return self.imu_ts[sel], self.imu_gyro[sel], self.imu_acc[sel]


def load_euroc(root):
    """root: path to <sequence>/mav0."""

    def read_cam(sub):
        path = os.path.join(root, sub, "data.csv")
        if not os.path.exists(path):
            return None, None
        ts, files = [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                files.append(row[1].strip())
        return np.asarray(ts), files

    cam0_ts, cam0_files = read_cam("cam0")
    cam1_ts, cam1_files = read_cam("cam1")

    imu_ts = imu_gyro = imu_acc = None
    imu_path = os.path.join(root, "imu0", "data.csv")
    if os.path.exists(imu_path):
        rows = []
        with open(imu_path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                rows.append([float(x) for x in row])
        arr = np.asarray(rows)
        imu_ts = arr[:, 0] * 1e-9
        imu_gyro = arr[:, 1:4].astype(np.float32)
        imu_acc = arr[:, 4:7].astype(np.float32)

    gt_ts = gt_pos = None
    gt_path = os.path.join(root, "state_groundtruth_estimate0", "data.csv")
    if os.path.exists(gt_path):
        rows = []
        with open(gt_path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                rows.append([float(x) for x in row[:8]])
        arr = np.asarray(rows)
        gt_ts = arr[:, 0] * 1e-9
        gt_pos = arr[:, 1:4]

    return EurocSequence(
        root=root, cam0_ts=cam0_ts, cam0_files=cam0_files,
        cam1_ts=cam1_ts, cam1_files=cam1_files,
        imu_ts=imu_ts, imu_gyro=imu_gyro, imu_acc=imu_acc,
        gt_ts=gt_ts, gt_pos=gt_pos,
    )


@dataclass
class TumRgbdSequence:
    root: str
    rgb_ts: np.ndarray
    rgb_files: list
    depth_ts: np.ndarray = None
    depth_files: list = None

    def __len__(self):
        return len(self.rgb_files)

    def image(self, i):
        return _load_image(os.path.join(self.root, self.rgb_files[i]))

    def depth(self, i, scale=1.0 / 5000.0):
        d = _load_image(os.path.join(self.root, self.depth_files[i]))
        return d * scale


def load_tum_rgbd(root):
    def read_list(name):
        path = os.path.join(root, name)
        if not os.path.exists(path):
            return None, None
        ts, files = [], []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split()[:2]
                ts.append(float(a))
                files.append(b)
        return np.asarray(ts), files

    rgb_ts, rgb_files = read_list("rgb.txt")
    depth_ts, depth_files = read_list("depth.txt")
    return TumRgbdSequence(root=root, rgb_ts=rgb_ts, rgb_files=rgb_files,
                           depth_ts=depth_ts, depth_files=depth_files)


@dataclass
class KittiSequence:
    """KITTI odometry sequence (gray): <seq>/times.txt + image_0/ (+image_1/
    for stereo) with 6-digit zero-padded .png frames
    (/root/reference/Examples/Monocular/mono_kitti.cc:156-185 LoadImages)."""
    root: str
    ts: np.ndarray              # (N,) seconds
    left_files: list
    right_files: list = None
    calib: dict = None          # P0/P1... projection rows from calib.txt

    def __len__(self):
        return len(self.left_files)

    def image(self, i, cam=0):
        files = self.left_files if cam == 0 else self.right_files
        return _load_image(files[i])


def load_kitti(root):
    """root: path to the sequence directory (e.g. .../sequences/00)."""
    times_path = os.path.join(root, "times.txt")
    ts = []
    with open(times_path) as f:
        for line in f:
            line = line.strip()
            if line:
                ts.append(float(line))
    ts = np.asarray(ts)

    def frames(sub):
        d = os.path.join(root, sub)
        if not os.path.isdir(d):
            return None
        return [os.path.join(d, f"{i:06d}.png") for i in range(len(ts))]

    left = frames("image_0")
    right = frames("image_1")

    # calib.txt: "P0: <12 floats>" per line — the 3x4 projection matrices
    # the stereo examples derive fx/baseline from.
    calib = {}
    calib_path = os.path.join(root, "calib.txt")
    if os.path.exists(calib_path):
        with open(calib_path) as f:
            for line in f:
                if ":" not in line:
                    continue
                key, vals = line.split(":", 1)
                v = np.asarray([float(x) for x in vals.split()])
                if v.size == 12:
                    calib[key.strip()] = v.reshape(3, 4)
    return KittiSequence(root=root, ts=ts, left_files=left,
                         right_files=right, calib=calib or None)
