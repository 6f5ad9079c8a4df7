"""Kannala-Brandt 8-parameter fisheye (equidistant polynomial) camera.

Replaces /root/reference/src/CameraModels/KannalaBrandt8.cpp: the theta-
polynomial projection, Newton unprojection (reference iterates 10 steps on
the scalar polynomial), and the projection Jacobian.

Model: r = |(x, y)|, theta = atan2(r, z),
       theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8),
       u = fx * theta_d * x / r + cx,  v = fy * theta_d * y / r + cy.

Params layout: [fx, fy, cx, cy, k1, k2, k3, k4, 0].
"""

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _theta_d(params, theta):
    k1, k2, k3, k4 = (params[..., 4], params[..., 5], params[..., 6],
                      params[..., 7])
    th2 = theta * theta
    return theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))


def project(params, pts):
    """3-D camera-frame points (..., 3) -> pixels (..., 2)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, _EPS * _EPS))
    theta = jnp.arctan2(r, z)
    td = _theta_d(params, theta)
    scale = td / r
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    return jnp.stack([fx * scale * x + cx, fy * scale * y + cy], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def unproject(params, uv, iters: int = 10):
    """Pixels (..., 2) -> UNIT bearing vector (..., 3).

    Newton's method on theta_d(theta) - target = 0, 10 iterations as the
    reference does (KannalaBrandt8.cpp unproject).  Returns the unit ray
    (sin(theta) * dir_xy, cos(theta)) rather than a z = 1 point: rays
    beyond 90 degrees off-axis (z <= 0, routine on a 195-degree lens)
    have no z = 1 representation."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    td = jnp.sqrt(jnp.maximum(mx * mx + my * my, _EPS * _EPS))
    td = jnp.clip(td, 0.0, jnp.pi)  # reference clips theta_d to [-pi, pi]
    k1, k2, k3, k4 = (params[..., 4], params[..., 5], params[..., 6],
                      params[..., 7])

    def body(_, theta):
        th2 = theta * theta
        poly = 1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4)))
        dpoly = 1.0 + th2 * (3.0 * k1 + th2 * (5.0 * k2 + th2 * (7.0 * k3 + th2 * 9.0 * k4)))
        f = theta * poly - td
        return theta - f / jnp.maximum(dpoly, _EPS)

    theta = jax.lax.fori_loop(0, iters, body, td)
    s = jnp.sin(theta) / jnp.maximum(td, _EPS)
    return jnp.stack([mx * s, my * s, jnp.cos(theta)], axis=-1)


def project_jac(params, pts):
    """d(pixel)/d(point) (..., 2, 3) via autodiff of the closed-form model
    (the reference writes the same derivative out by hand,
    KannalaBrandt8.cpp projectJac)."""
    flat = pts.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(lambda p: project(params, p)))(flat)
    return J.reshape(*pts.shape[:-1], 2, 3)
