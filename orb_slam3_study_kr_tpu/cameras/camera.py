"""Camera pytree + static dispatch.

The reference dispatches through GeometricCamera virtuals
(/root/reference/include/CameraModels/GeometricCamera.h); here `kind` is
static pytree metadata so `jit` specializes per model with zero runtime
branching.
"""

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.cameras import kb8, pinhole

N_PARAMS = 9  # [fx, fy, cx, cy, d0..d4] — union layout for both models


class CameraKind(str, enum.Enum):
    PINHOLE = "pinhole"
    KB8 = "kb8"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    params: jnp.ndarray  # (N_PARAMS,)
    kind: CameraKind = field(metadata=dict(static=True), default=CameraKind.PINHOLE)
    width: int = field(metadata=dict(static=True), default=752)
    height: int = field(metadata=dict(static=True), default=480)

    @property
    def fx(self):
        return self.params[0]

    @property
    def fy(self):
        return self.params[1]

    @property
    def cx(self):
        return self.params[2]

    @property
    def cy(self):
        return self.params[3]

    @property
    def K(self):
        fx, fy, cx, cy = self.params[0], self.params[1], self.params[2], self.params[3]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack([
            jnp.stack([fx, z, cx]),
            jnp.stack([z, fy, cy]),
            jnp.stack([z, z, o]),
        ])


def make_pinhole(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
                 width=752, height=480):
    p = jnp.asarray([fx, fy, cx, cy, k1, k2, p1, p2, k3], jnp.float32)
    return Camera(params=p, kind=CameraKind.PINHOLE, width=width, height=height)


def make_kb8(fx, fy, cx, cy, k1, k2, k3, k4, width=512, height=512):
    p = jnp.asarray([fx, fy, cx, cy, k1, k2, k3, k4, 0.0], jnp.float32)
    return Camera(params=p, kind=CameraKind.KB8, width=width, height=height)


_MODULES = {CameraKind.PINHOLE: pinhole, CameraKind.KB8: kb8}


def project(cam: Camera, pts):
    return _MODULES[cam.kind].project(cam.params, pts)


def unproject(cam: Camera, uv):
    return _MODULES[cam.kind].unproject(cam.params, uv)


def project_jac(cam: Camera, pts):
    return _MODULES[cam.kind].project_jac(cam.params, pts)
