"""Camera model tests: project/unproject round trips, Jacobians, two-view
reconstruction on synthetic scenes with known motion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_study_kr_tpu import cameras, lie
from orb_slam3_study_kr_tpu.cameras.twoview import reconstruct_two_views
from orb_slam3_study_kr_tpu.ops.geometry import triangulate_dlt

EUROC_PINHOLE = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                     k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)
TUMVI_KB8 = dict(fx=190.97847715128717, fy=190.9733070521226,
                 cx=254.93170605935475, cy=256.8974428996504,
                 k1=0.0034823894022493434, k2=0.0007150348452162257,
                 k3=-0.0020532361418706202, k4=0.00020293673591811182)


def _random_points_in_frustum(rng, n, fov=0.5, zmin=1.0, zmax=10.0):
    z = rng.uniform(zmin, zmax, n)
    x = rng.uniform(-fov, fov, n) * z
    y = rng.uniform(-fov, fov, n) * z
    return np.stack([x, y, z], -1).astype(np.float32)


def test_pinhole_roundtrip_no_distortion(rng):
    cam = cameras.make_pinhole(400.0, 400.0, 376.0, 240.0)
    pts = jnp.asarray(_random_points_in_frustum(rng, 256))
    uv = cameras.project(cam, pts)
    rays = cameras.unproject(cam, uv)
    # Ray should point at the 3-D point: compare normalized coords.
    np.testing.assert_allclose(
        np.asarray(rays[:, :2]), np.asarray(pts[:, :2] / pts[:, 2:3]), atol=1e-5
    )


def test_pinhole_roundtrip_with_distortion(rng):
    cam = cameras.make_pinhole(**EUROC_PINHOLE)
    pts = jnp.asarray(_random_points_in_frustum(rng, 256, fov=0.4))
    uv = cameras.project(cam, pts)
    rays = cameras.unproject(cam, uv)
    np.testing.assert_allclose(
        np.asarray(rays[:, :2]), np.asarray(pts[:, :2] / pts[:, 2:3]), atol=1e-4
    )


def test_pinhole_jacobian_matches_autodiff(rng):
    cam = cameras.make_pinhole(400.0, 400.0, 376.0, 240.0)
    pts = jnp.asarray(_random_points_in_frustum(rng, 16))
    J = cameras.project_jac(cam, pts)
    J_ad = jax.vmap(jax.jacfwd(lambda p: cameras.project(cam, p)))(pts)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-3)


def test_kb8_roundtrip(rng):
    cam = cameras.make_kb8(**TUMVI_KB8, width=512, height=512)
    # Fisheye: points up to ~80 deg off axis.
    theta = rng.uniform(0, 1.4, 256)
    phi = rng.uniform(0, 2 * np.pi, 256)
    d = rng.uniform(1, 10, 256)
    pts = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)], -1
    ) * d[:, None]
    pts = jnp.asarray(pts, jnp.float32)
    uv = cameras.project(cam, pts)
    rays = cameras.unproject(cam, uv)
    # Unit bearings (z = 1 cannot represent >90-degree rays): direction
    # must match the source point's direction.
    dirs = np.asarray(pts) / np.linalg.norm(pts, axis=-1, keepdims=True)
    rays_n = np.asarray(rays) / np.linalg.norm(np.asarray(rays), axis=-1,
                                               keepdims=True)
    np.testing.assert_allclose(rays_n, dirs, atol=2e-3)
    # And the round trip lands back on the source pixel — including rays
    # beyond 90 degrees off-axis.
    theta_w = np.radians(rng.uniform(91.0, 100.0, 32))
    phi_w = rng.uniform(0, 2 * np.pi, 32)
    pts_w = np.stack([np.sin(theta_w) * np.cos(phi_w),
                      np.sin(theta_w) * np.sin(phi_w),
                      np.cos(theta_w)], -1).astype(np.float32) * 3.0
    uv_w = cameras.project(cam, jnp.asarray(pts_w))
    back = cameras.project(cam, cameras.unproject(cam, uv_w))
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv_w), atol=0.2)


def test_kb8_jacobian_finite_diff(rng):
    cam = cameras.make_kb8(**TUMVI_KB8)
    pts = jnp.asarray(_random_points_in_frustum(rng, 8, fov=0.8))
    J = cameras.project_jac(cam, pts)
    eps = 1e-3
    for k in range(3):
        dp = np.zeros((8, 3), np.float32)
        dp[:, k] = eps
        fd = (
            np.asarray(cameras.project(cam, pts + jnp.asarray(dp)))
            - np.asarray(cameras.project(cam, pts - jnp.asarray(dp)))
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, :, k]), fd, atol=5e-2)


def test_triangulate_dlt_exact(rng):
    pts_w = jnp.asarray(_random_points_in_frustum(rng, 128, zmin=4, zmax=12))
    R1, t1 = lie.se3_identity()
    xi = jnp.asarray([0.02, -0.03, 0.01, 0.5, 0.05, 0.0], jnp.float32)
    R2, t2 = lie.exp_se3(xi)  # world->cam2
    xn1 = pts_w[:, :2] / pts_w[:, 2:3]
    p2 = lie.se3_apply(R2, t2, pts_w)
    xn2 = p2[:, :2] / p2[:, 2:3]
    rec = triangulate_dlt(xn1, xn2, R1[None], t1[None], R2[None], t2[None])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts_w), atol=1e-2)


def _synthetic_two_view(rng, n=300, planar=False, baseline=0.3):
    K = np.array([[458.0, 0, 376.0], [0, 457.0, 240.0], [0, 0, 1.0]], np.float32)
    if planar:
        # Points on a plane z = 5 + 0.3x + 0.1y
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-2, 2, n)
        z = 5.0 + 0.3 * x + 0.1 * y
        pts = np.stack([x, y, z], -1).astype(np.float32)
    else:
        pts = _random_points_in_frustum(rng, n, fov=0.5, zmin=3, zmax=12)
    xi = np.array([0.03, -0.05, 0.02, baseline, 0.02, 0.01], np.float32)
    R2, t2 = lie.exp_se3(jnp.asarray(xi))
    p1 = pts
    p2 = np.asarray(lie.se3_apply(R2, t2, jnp.asarray(pts)))
    uv1 = (K @ (p1 / p1[:, 2:3]).T).T[:, :2]
    uv2 = (K @ (p2 / p2[:, 2:3]).T).T[:, :2]
    noise = rng.normal(0, 0.5, (2, n, 2)).astype(np.float32)
    return (
        jnp.asarray(uv1 + noise[0]),
        jnp.asarray(uv2 + noise[1]),
        jnp.asarray(K),
        np.asarray(R2),
        np.asarray(t2),
        pts,
    )


def test_two_view_reconstruction(rng):
    uv1, uv2, K, R_gt, t_gt, pts = _synthetic_two_view(rng, planar=False)
    mask = jnp.ones(uv1.shape[0])
    out = reconstruct_two_views(jax.random.PRNGKey(0), uv1, uv2, mask, K)
    assert bool(out["success"]), (
        f"n_good={int(out['n_good'])} par={float(out['parallax_deg']):.2f} "
        f"useH={bool(out['used_homography'])}"
    )
    assert not bool(out["used_homography"])
    R_est = np.asarray(out["R21"])
    t_est = np.asarray(out["t21"])
    # Rotation error in degrees.
    cos = (np.trace(R_est @ R_gt.T) - 1) / 2
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert ang < 1.0, f"rotation error {ang:.3f} deg"
    # Translation direction (scale is unobservable).
    t_dir = t_est / np.linalg.norm(t_est)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert np.dot(t_dir, t_gt_dir) > 0.999, f"t dir {t_dir} vs {t_gt_dir}"
    # Triangulated structure should match ground truth up to scale.
    good = np.asarray(out["good"])
    assert good.sum() > 200
    s = np.linalg.norm(t_gt) / np.linalg.norm(t_est)
    rec = np.asarray(out["pts3d"])[good] * s
    # Triangulation depth sigma ~ z^2 sigma_px / (f b) ~ 0.5 m at z = 12 m.
    err = np.linalg.norm(rec - pts[good], axis=-1)
    assert np.median(err) < 0.5, f"median structure error {np.median(err):.3f}"


def test_two_view_planar_no_false_positive(rng):
    """On a planar scene F and H fit equally well (the plane-induced
    degeneracy); whichever is selected, the reconstruction must either
    succeed with an accurate motion or reject via the clear-winner test —
    never return success with a wrong pose (mirrors the reference's
    ReconstructF/H gating)."""
    uv1, uv2, K, R_gt, t_gt, pts = _synthetic_two_view(rng, planar=True)
    mask = jnp.ones(uv1.shape[0])
    out = reconstruct_two_views(jax.random.PRNGKey(0), uv1, uv2, mask, K)
    if bool(out["success"]):
        R_est = np.asarray(out["R21"])
        cos = (np.trace(R_est @ R_gt.T) - 1) / 2
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang < 1.0
        t_dir = np.asarray(out["t21"])
        t_dir = t_dir / np.linalg.norm(t_dir)
        assert np.dot(t_dir, t_gt / np.linalg.norm(t_gt)) > 0.995


def test_faugeras_homography_decomposition(rng):
    """The Faugeras H decomposition must contain the true motion among its 8
    candidates, and _check_rt must select it."""
    from orb_slam3_study_kr_tpu.cameras.twoview import (
        _check_rt, _decompose_homography_faugeras)

    uv1, uv2, K, R_gt, t_gt, pts = _synthetic_two_view(rng, planar=True)
    K_np = np.asarray(K)
    # Plane z = 5 + 0.3x + 0.1y -> n = (-0.3, -0.1, 1)/d, d = 5 in frame 1.
    n = np.array([-0.3, -0.1, 1.0]) / 5.0
    Hn = np.asarray(R_gt) + np.outer(np.asarray(t_gt), n)  # calibrated H21
    R8, t8 = _decompose_homography_faugeras(jnp.asarray(Hn, jnp.float32))
    Kinv = np.linalg.inv(K_np)
    xn1 = (np.asarray(uv1) - K_np[:2, 2]) / np.diag(K_np)[:2]
    xn2 = (np.asarray(uv2) - K_np[:2, 2]) / np.diag(K_np)[:2]
    inl = jnp.ones(uv1.shape[0], bool)
    n_good, par, _, _ = jax.vmap(
        lambda R, t: _check_rt(R, t, jnp.asarray(xn1, jnp.float32),
                               jnp.asarray(xn2, jnp.float32), uv1, uv2,
                               K, inl, 1.0)
    )(R8, t8)
    best = int(np.argmax(np.asarray(n_good)))
    R_best, t_best = np.asarray(R8[best]), np.asarray(t8[best])
    cos = (np.trace(R_best @ np.asarray(R_gt).T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    t_dir = t_best / np.linalg.norm(t_best)
    t_gt_dir = np.asarray(t_gt) / np.linalg.norm(t_gt)
    assert abs(np.dot(t_dir, t_gt_dir)) > 0.999
    assert int(n_good[best]) > 250


def test_two_view_degenerate_fails(rng):
    """Pure rotation (no baseline) must not report success."""
    uv1, uv2, K, _, _, _ = _synthetic_two_view(rng, baseline=0.0)
    mask = jnp.ones(uv1.shape[0])
    out = reconstruct_two_views(jax.random.PRNGKey(0), uv1, uv2, mask, K)
    assert not bool(out["success"])
