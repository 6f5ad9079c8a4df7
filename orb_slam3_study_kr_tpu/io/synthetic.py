"""Synthetic SLAM sequences with exact ground truth.

The build machine has no EuRoC/TUM datasets (zero egress), so the test and
benchmark oracle is a rendered world: a field of visually distinctive
landmark blobs projected through the real camera models, observed from a
smooth trajectory.  This plays the role the reference assigns to dataset
end-to-end runs (SURVEY.md section 4): the pipeline runs on these frames and
its trajectory is scored with the same ATE evaluator.

Rendering is host-side numpy (it stands in for a dataset reader, not a hot
path).  Each landmark is an anisotropic Gaussian blob plus a satellite blob,
giving FAST a corner-like response at the center and BRIEF a distinctive,
mostly view-stable local pattern.
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class SyntheticScene:
    points: np.ndarray        # (M, 3) world landmarks
    intensity: np.ndarray     # (M,)
    axis: np.ndarray          # (M, 2) blob principal axis (unit)
    ecc: np.ndarray           # (M,) eccentricity in [1, 3]
    sat_offset: np.ndarray    # (M, 2) satellite blob offset (px)
    sat_intensity: np.ndarray # (M,)
    K: np.ndarray             # (3, 3)
    width: int
    height: int


def make_scene(
    rng, n_points=600, extent=(8.0, 5.0, 4.0), center=(0.0, 0.0, 8.0),
    K=None, width=752, height=480,
):
    if K is None:
        K = np.array([[458.0, 0, width / 2], [0, 457.0, height / 2], [0, 0, 1.0]])
    pts = rng.uniform(-1, 1, (n_points, 3)) * np.asarray(extent) + np.asarray(center)
    ax = rng.normal(size=(n_points, 2))
    ax /= np.linalg.norm(ax, axis=1, keepdims=True)
    return SyntheticScene(
        points=pts.astype(np.float32),
        intensity=rng.uniform(80, 200, n_points).astype(np.float32),
        axis=ax.astype(np.float32),
        ecc=rng.uniform(1.2, 2.5, n_points).astype(np.float32),
        sat_offset=rng.uniform(-6, 6, (n_points, 2)).astype(np.float32),
        sat_intensity=rng.uniform(40, 140, n_points).astype(np.float32),
        K=K.astype(np.float32),
        width=width,
        height=height,
    )


def circular_trajectory(n_frames, radius=1.5, z_amp=0.3, look_at=(0, 0, 8.0),
                        span=1.0):
    """World->camera poses along an arc, camera looking at the landmark
    cloud.  Returns (R_cw (T,3,3), t_cw (T,3)); world = first-camera-ish."""
    Rs, ts = [], []
    for i in range(n_frames):
        a = span * 2 * np.pi * i / max(n_frames - 1, 1)
        c = np.array([radius * np.sin(a), z_amp * np.sin(2 * a), -radius * (1 - np.cos(a)) * 0.3])
        fwd = np.asarray(look_at) - c
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R_wc = np.stack([right, up, fwd], axis=1)  # cam axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        Rs.append(R_cw)
        ts.append(t_cw)
    return np.stack(Rs).astype(np.float32), np.stack(ts).astype(np.float32)


def render(scene: SyntheticScene, R_cw, t_cw, sigma=1.4, noise_std=2.0,
           rng=None, window=9):
    """Render one frame (H, W) float32 in [0, 255]."""
    H, W = scene.height, scene.width
    img = np.full((H, W), 30.0, np.float32)
    # Smooth background gradient for realism (doesn't add corners).
    yy = np.linspace(0, 20, H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 15, W, dtype=np.float32)[None, :]
    img += yy + xx

    pc = scene.points @ R_cw.T + t_cw
    vis = pc[:, 2] > 0.3
    uv = (pc[:, :2] / pc[:, 2:3]) @ scene.K[:2, :2].T + scene.K[:2, 2]
    in_img = (
        vis & (uv[:, 0] > window) & (uv[:, 0] < W - window)
        & (uv[:, 1] > window) & (uv[:, 1] < H - window)
    )
    idxs = np.nonzero(in_img)[0]
    r = window
    for i in idxs:
        u, v = uv[i]
        cu, cv = int(round(u)), int(round(v))
        ys = np.arange(cv - r, cv + r + 1)
        xs = np.arange(cu - r, cu + r + 1)
        dy = (ys - v)[:, None].astype(np.float32)
        dx = (xs - u)[None, :].astype(np.float32)
        ax = scene.axis[i]
        # Anisotropic quadratic form with eccentricity along `ax`.
        a_par = (dx * ax[0] + dy * ax[1])
        a_perp = (-dx * ax[1] + dy * ax[0])
        e = scene.ecc[i]
        q = (a_par / (sigma * e)) ** 2 + (a_perp / sigma) ** 2
        blob = scene.intensity[i] * np.exp(-0.5 * q)
        # Satellite blob for descriptor distinctiveness.
        so = scene.sat_offset[i]
        q2 = ((dx - so[0]) / sigma) ** 2 + ((dy - so[1]) / sigma) ** 2
        blob += scene.sat_intensity[i] * np.exp(-0.5 * q2)
        img[cv - r : cv + r + 1, cu - r : cu + r + 1] += blob
    if rng is not None and noise_std > 0:
        img += rng.normal(0, noise_std, img.shape).astype(np.float32)
    return np.clip(img, 0, 255), uv, in_img


def render_sequence(scene, R_cw, t_cw, rng=None, **kw):
    frames = []
    for i in range(R_cw.shape[0]):
        img, uv, vis = render(scene, R_cw[i], t_cw[i], rng=rng, **kw)
        frames.append((img, uv, vis))
    return frames
