"""Pinhole camera with optional radial-tangential distortion.

Replaces /root/reference/src/CameraModels/Pinhole.cpp (project/unproject/
projectJac) plus the keypoint undistortion the reference does with
cv::undistortPoints (/root/reference/src/Frame.cc:748 UndistortKeyPoints).

Intrinsics layout (params vector): [fx, fy, cx, cy, k1, k2, p1, p2, k3]
(unused trailing coefficients zero).  All functions broadcast over leading
point axes.
"""

import functools

import jax
import jax.numpy as jnp

_Z_MIN = 1e-6


def distort_normalized(params, xy):
    """Apply rad-tan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (params[..., 4], params[..., 5], params[..., 6],
                          params[..., 7], params[..., 8])
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def undistort_normalized(params, xy_d, iters: int = 8):
    """Invert rad-tan distortion by fixed-point iteration (cv::undistortPoints
    uses the same scheme).

    Jitted at module level: eager per-frame callers would otherwise re-trace
    the fori_loop body closure every call and miss the scan compile cache
    (a fresh XLA compile per frame)."""

    def body(_, xy):
        k1, k2, p1, p2, k3 = (params[..., 4], params[..., 5], params[..., 6],
                              params[..., 7], params[..., 8])
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xy_d[..., 0] - dx) / radial
        y_new = (xy_d[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_d)


def project(params, pts):
    """3-D camera-frame points (..., 3) -> pixel coords (..., 2)."""
    z = jnp.maximum(pts[..., 2], _Z_MIN)
    xy = pts[..., :2] / z[..., None]
    xy = distort_normalized(params, xy)
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


def unproject(params, uv):
    """Pixels (..., 2) -> unit-depth bearing (..., 3) with z = 1."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    xy_d = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xy = undistort_normalized(params, xy_d)
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def project_jac(params, pts):
    """d(pixel)/d(point): (..., 2, 3), closed form for the undistorted model
    (matches the reference Pinhole::projectJac which ignores distortion,
    Pinhole.cpp) — BA operates on undistorted keypoints."""
    fx, fy = params[..., 0], params[..., 1]
    x, y = pts[..., 0], pts[..., 1]
    z = jnp.maximum(pts[..., 2], _Z_MIN)
    z_inv = 1.0 / z
    z_inv2 = z_inv * z_inv
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * z_inv, zero, -fx * x * z_inv2], axis=-1)
    row1 = jnp.stack([zero, fy * z_inv, -fy * y * z_inv2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
