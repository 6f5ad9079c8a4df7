"""ROS node wrapper tests (examples/ros_node.py).

rospy is not installed here; the tests drive the SlamNode message core with
hand-built sensor_msgs-shaped fakes, covering image decoding (mono8 /
bgr8 / step padding), IMU queue draining, and an end-to-end mono-inertial
feed over the synthetic world — the role of the reference's
ros_mono_inertial.cc ImuGrabber/ImageGrabber sync loop.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.ros_node import SlamNode, decode_image, stamp_to_sec


class _Stamp:
    def __init__(self, t):
        self.secs = int(t)
        self.nsecs = int(round((t - int(t)) * 1e9))


class _Header:
    def __init__(self, t):
        self.stamp = _Stamp(t)


class _ImageMsg:
    def __init__(self, img, encoding="mono8", pad=0, t=0.0):
        img = np.asarray(img)
        self.height, self.width = img.shape[:2]
        self.encoding = encoding
        ch = 1 if img.ndim == 2 else img.shape[2]
        itemsize = img.dtype.itemsize
        self.step = (self.width * ch + pad) * itemsize
        rows = []
        for r in range(self.height):
            row = img[r].tobytes()
            rows.append(row + b"\0" * (self.step - len(row)))
        self.data = b"".join(rows)
        self.header = _Header(t)


class _Vec3:
    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z


class _ImuMsg:
    def __init__(self, t, acc, gyro):
        self.header = _Header(t)
        self.linear_acceleration = _Vec3(*acc)
        self.angular_velocity = _Vec3(*gyro)


def test_decode_mono8_with_step_padding():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_image(_ImageMsg(img, "mono8", pad=3))
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_decode_bgr8_luma():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 2] = 100  # red channel in BGR
    out = decode_image(_ImageMsg(img, "bgr8"))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, 0.299 * 100, atol=0.5)


def test_stamp_to_sec():
    assert abs(stamp_to_sec(_Stamp(3.25)) - 3.25) < 1e-9


def test_imu_drain_windows():
    class _FakeSlam:
        def __init__(self):
            self.calls = []

        def track_monocular(self, img, ts, imu=None):
            self.calls.append((ts, imu))

    slam = _FakeSlam()
    node = SlamNode(slam, "mono-inertial", imu_freq=100.0)
    for k in range(30):
        t = 0.01 * (k + 1)
        node.on_imu(_ImuMsg(t, (0, 0, 9.81), (0, 0, 0)))
    img = np.zeros((8, 8), np.uint8)
    node.on_image(_ImageMsg(img, "mono8", t=0.1))
    node.on_image(_ImageMsg(img, "mono8", t=0.2))
    (t1, imu1), (t2, imu2) = slam.calls
    # First window backfills one IMU period before the first frame (the
    # reference's ts - 1/freq backstep), so it holds a single sample.
    assert imu1.shape[1] == 7
    assert imu1.shape[0] == 1
    assert imu2.shape[0] == 10
    np.testing.assert_allclose(imu2[:, 0].sum(), 0.1, atol=1e-6)
    # Samples after the second image stay queued.
    assert len(node._imu) == 10


@pytest.mark.slow
def test_ros_mono_feed_tracks():
    """Full engine behind the node core: play synthetic frames as fake ROS
    messages and check the session initializes and tracks."""
    from orb_slam3_study_kr_tpu.io import synthetic
    from orb_slam3_study_kr_tpu.pipeline import SlamSystem, SystemConfig
    from orb_slam3_study_kr_tpu.pipeline.tracking import TrackState

    rng = np.random.default_rng(3)
    world = synthetic.make_textured_world(rng)
    n = 12
    R, t = synthetic.lateral_trajectory(n, x_span=0.6)
    slam = SlamSystem(SystemConfig(sensor="mono"))
    node = SlamNode(slam, "mono")
    for i in range(n):
        img = synthetic.render_textured(world, R[i], t[i], rng=rng)
        node.on_image(_ImageMsg(np.clip(img, 0, 255).astype(np.uint8),
                                "mono8", t=i * 0.05))
    assert node.n_frames == n
    assert slam.state == TrackState.OK
    assert slam.atlas.active_map.n_kf >= 2
