"""Epipolar-constrained matching + triangulation between two keyframes.

Replaces ORBmatcher::SearchForTriangulation + the gating core of
LocalMapping::CreateNewMapPoints (/root/reference/src/LocalMapping.cc:398):
one masked Hamming problem per keyframe pair (epipolar distance gate in
place of the BoW node walk), one batched DLT triangulation, and the
reference's acceptance gates (parallax, cheirality, reprojection chi2
5.991 x sigma2, scale-band consistency) as masks.
"""

import functools

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.ops.geometry import triangulate_dlt
from orb_slam3_study_kr_tpu.ops.matching import BIG, TH_LOW, hamming_matrix
from orb_slam3_study_kr_tpu.lie.so3 import hat

CHI2_MONO = 5.991


@functools.partial(jax.jit, static_argnames=())
def match_and_triangulate(
    R1, t1, R2, t2, K,
    uv1, level1, desc1, free1,
    uv2, level2, desc2, free2,
    angle1=None, angle2=None,
    scale_factor=1.2,
    epi_chi2=3.84,
    nn_ratio=0.9,
):
    """Match free keypoints of KF1 against KF2 along epipolar lines and
    triangulate the accepted pairs.

    All uv are undistorted pixels.  Returns dict with per-kp1 arrays:
      idx2 (N1,), matched (N1,), X (N1, 3) world points, good (N1,).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # Fundamental F12 with x1^T F x2 = 0 (GeometricTools::ComputeF12).
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    E = hat(t12) @ R12
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ E @ Kinv

    ones1 = jnp.ones_like(uv1[:, :1])
    ones2 = jnp.ones_like(uv2[:, :1])
    x1h = jnp.concatenate([uv1, ones1], axis=-1)
    x2h = jnp.concatenate([uv2, ones2], axis=-1)
    # Epipolar line of each kp1 in image 2: l2 = F12^T x1.
    l2 = x1h @ F12  # (N1, 3)
    num = jnp.einsum("ac,bc->ab", l2, x2h)  # (N1, N2) line-point products
    den = l2[:, 0] ** 2 + l2[:, 1] ** 2
    d2 = num * num / jnp.maximum(den[:, None], 1e-12)
    sigma2_2 = scale_factor ** (2.0 * level2.astype(jnp.float32))
    epi_ok = d2 < epi_chi2 * sigma2_2[None, :]

    mask = epi_ok & free1[:, None] & free2[None, :]
    dist = hamming_matrix(desc1, desc2)
    d = jnp.where(mask, dist, BIG)
    idx2 = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    dd = jnp.where(jax.nn.one_hot(idx2, d.shape[1], dtype=bool), BIG, d)
    second = jnp.min(dd, axis=1)
    matched = (best <= TH_LOW) & (best < nn_ratio * second)
    # Mutual best to avoid two kp1 claiming one kp2.
    back = jnp.argmin(d, axis=0)
    matched = matched & (back[idx2] == jnp.arange(uv1.shape[0]))
    if angle1 is not None:
        from orb_slam3_study_kr_tpu.ops.matching import rotation_consistency
        matched = rotation_consistency(angle1, angle2, idx2, matched)

    # Triangulate matched pairs in normalized coords.
    xn1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], axis=-1)
    uv2m = uv2[idx2]
    xn2 = jnp.stack([(uv2m[:, 0] - cx) / fx, (uv2m[:, 1] - cy) / fy], axis=-1)
    X = triangulate_dlt(xn1, xn2, R1[None], t1[None], R2[None], t2[None])

    # Gates of CreateNewMapPoints:
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    r1v = X - c1
    r2v = X - c2
    n1 = jnp.linalg.norm(r1v, axis=-1)
    n2 = jnp.linalg.norm(r2v, axis=-1)
    cos_par = jnp.sum(r1v * r2v, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
    p1 = jnp.einsum("ij,nj->ni", R1, X) + t1
    p2 = jnp.einsum("ij,nj->ni", R2, X) + t2
    z_ok = (p1[:, 2] > 0) & (p2[:, 2] > 0)

    def reproj_err2(p, uv):
        zz = jnp.maximum(p[:, 2], 1e-9)
        u = fx * p[:, 0] / zz + cx
        v = fy * p[:, 1] / zz + cy
        return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

    sigma2_1 = scale_factor ** (2.0 * level1.astype(jnp.float32))
    e1 = reproj_err2(p1, uv1)
    e2 = reproj_err2(p2, uv2m)
    reproj_ok = (e1 < CHI2_MONO * sigma2_1) & (e2 < CHI2_MONO * sigma2_2[idx2])

    # Scale consistency: distance ratio vs octave ratio within 1.5x.
    ratio_dist = n2 / jnp.maximum(n1, 1e-9)
    ratio_oct = scale_factor ** (
        level1.astype(jnp.float32) - level2[idx2].astype(jnp.float32)
    )
    sc_ok = (ratio_dist < ratio_oct * 1.5) & (ratio_dist * 1.5 > ratio_oct)

    good = (
        matched
        & z_ok
        & (cos_par < 0.9998)
        & (cos_par > 0)
        & reproj_ok
        & sc_ok
        & jnp.all(jnp.isfinite(X), axis=-1)
    )
    return dict(idx2=idx2, matched=matched, X=X, good=good, cos_par=cos_par)
