"""IMU preintegration tests: numerical-integration oracle, bias-Jacobian
finite differences, state prediction on known trajectories."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_study_kr_tpu import lie
from orb_slam3_study_kr_tpu.imu import (ImuCalib, GRAVITY,
                                        bias_corrected_deltas, predict_state,
                                        preintegrate)
from orb_slam3_study_kr_tpu.imu.preintegration import inertial_residual

CALIB = ImuCalib.make()


def _simulate(rng, n=100, dt=0.005, bias=None, noise=0.0):
    """Simulate a smooth body trajectory and the exact IMU it would measure.

    Returns (acc, gyro arrays), (R, p, v) at start/end in world frame."""
    bias = np.zeros(6, np.float32) if bias is None else bias
    g = np.asarray(GRAVITY)
    # Sinusoidal body rates and world acceleration.
    ts = np.arange(n) * dt
    w_b = np.stack([
        0.3 * np.sin(2 * ts), 0.2 * np.cos(3 * ts), 0.1 * np.sin(ts)], -1)
    a_w = np.stack([
        0.5 * np.sin(3 * ts), 0.4 * np.cos(2 * ts), 0.3 * np.sin(2 * ts)], -1)
    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    R0, p0, v0 = R.copy(), p.copy(), v.copy()
    accs, gyros = [], []
    for i in range(n):
        # measurement (body frame): a_m = R^T (a_w - g) + ba
        a_m = R.T @ (a_w[i] - g) + bias[3:]
        w_m = w_b[i] + bias[:3]
        accs.append(a_m)
        gyros.append(w_m)
        # integrate ground truth with the same discretization the
        # preintegration assumes (piecewise-constant over dt).
        a_true = a_w[i]
        p = p + v * dt + 0.5 * a_true * dt * dt
        v = v + a_true * dt
        R = R @ np.asarray(lie.exp_so3(jnp.asarray(w_b[i] * dt, jnp.float32)))
    acc = np.asarray(accs, np.float32)
    gyro = np.asarray(gyros, np.float32)
    if noise > 0:
        acc = acc + rng.normal(0, noise, acc.shape).astype(np.float32)
        gyro = gyro + rng.normal(0, noise * 0.1, gyro.shape).astype(np.float32)
    return acc, gyro, (R0, p0, v0), (R, p, v), dt, n


def test_preintegration_matches_numerical_integration(rng):
    acc, gyro, (R0, p0, v0), (R1, p1, v1), dt, n = _simulate(rng)
    pre = preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro),
        jnp.full(n, dt, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.zeros(6, jnp.float32), CALIB,
    )
    Rp, pp, vp = predict_state(
        jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
        jnp.asarray(v0, jnp.float32), pre, jnp.zeros(6, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(Rp), R1, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pp), p1, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vp), v1, atol=1e-3)


def test_masked_window_matches_short_window(rng):
    acc, gyro, _, _, dt, n = _simulate(rng, n=60)
    full = preintegrate(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.full(60, dt, jnp.float32),
        jnp.ones(60), jnp.zeros(6), CALIB)
    # Same 60 samples inside a 100-slot masked window.
    pad = 40
    acc_p = np.concatenate([acc, np.ones((pad, 3), np.float32) * 99])
    gyro_p = np.concatenate([gyro, np.ones((pad, 3), np.float32) * 99])
    mask = np.concatenate([np.ones(60), np.zeros(pad)]).astype(np.float32)
    padded = preintegrate(
        jnp.asarray(acc_p), jnp.asarray(gyro_p),
        jnp.full(100, dt, jnp.float32), jnp.asarray(mask),
        jnp.zeros(6), CALIB)
    np.testing.assert_allclose(np.asarray(full.dR), np.asarray(padded.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.dP), np.asarray(padded.dP), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.cov), np.asarray(padded.cov), atol=1e-9)
    np.testing.assert_allclose(float(full.dT), float(padded.dT), atol=1e-6)


def test_bias_jacobians_first_order(rng):
    """Bias-corrected deltas must match re-integration at a shifted bias."""
    acc, gyro, _, _, dt, n = _simulate(rng)
    b0 = jnp.zeros(6, jnp.float32)
    pre0 = preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                        jnp.full(n, dt, jnp.float32), jnp.ones(n), b0, CALIB)
    db = jnp.asarray([0.002, -0.003, 0.001, 0.02, -0.01, 0.015], jnp.float32)
    dR_c, dV_c, dP_c = bias_corrected_deltas(pre0, b0 + db)
    pre1 = preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                        jnp.full(n, dt, jnp.float32), jnp.ones(n), b0 + db, CALIB)
    np.testing.assert_allclose(np.asarray(dR_c), np.asarray(pre1.dR), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dV_c), np.asarray(pre1.dV), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dP_c), np.asarray(pre1.dP), atol=1e-3)


def test_residual_zero_at_truth_and_covariance_sane(rng):
    acc, gyro, (R0, p0, v0), (R1, p1, v1), dt, n = _simulate(rng, noise=1e-3)
    pre = preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                       jnp.full(n, dt, jnp.float32), jnp.ones(n),
                       jnp.zeros(6), CALIB)
    r = inertial_residual(
        jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
        jnp.asarray(v0, jnp.float32),
        jnp.asarray(R1, jnp.float32), jnp.asarray(p1, jnp.float32),
        jnp.asarray(v1, jnp.float32),
        jnp.zeros(6), pre)
    assert float(jnp.abs(r).max()) < 5e-3, np.asarray(r)
    C = np.asarray(pre.cov)
    # Covariance symmetric PSD-ish, growing with time.
    np.testing.assert_allclose(C, C.T, atol=1e-10)
    evals = np.linalg.eigvalsh(C[:9, :9])
    assert evals.min() > -1e-9
    assert C[0, 0] > 0 and C[6, 6] > 0


def test_true_bias_recovery_via_residual(rng):
    """Integrating biased measurements with the correct bias reference gives
    small residuals; with a wrong reference, large ones."""
    bias = np.asarray([0.01, -0.02, 0.015, 0.1, -0.05, 0.08], np.float32)
    acc, gyro, (R0, p0, v0), (R1, p1, v1), dt, n = _simulate(rng, bias=bias)
    args = (jnp.asarray(acc), jnp.asarray(gyro),
            jnp.full(n, dt, jnp.float32), jnp.ones(n))
    pre_good = preintegrate(*args, jnp.asarray(bias), CALIB)
    pre_bad = preintegrate(*args, jnp.zeros(6), CALIB)

    def res(pre, b):
        return inertial_residual(
            jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
            jnp.asarray(v0, jnp.float32),
            jnp.asarray(R1, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(v1, jnp.float32), b, pre)

    r_good = res(pre_good, jnp.asarray(bias))
    r_bad = res(pre_bad, jnp.zeros(6))
    assert float(jnp.abs(r_good).max()) < 5e-3
    assert float(jnp.abs(r_bad).max()) > 0.01
    # And the first-order correction of the wrong-reference window toward the
    # true bias shrinks the residual.
    r_corr = res(pre_bad, jnp.asarray(bias))
    assert float(jnp.abs(r_corr).max()) < 0.01
