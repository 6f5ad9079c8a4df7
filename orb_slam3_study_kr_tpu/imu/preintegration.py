"""IMU preintegration on the manifold, as a masked lax.scan.

Implements the measurement model of /root/reference/src/ImuTypes.cc:181-237
(IntegrateNewMeasurement): midpoint-averaged samples integrate into
bias-referenced deltas (dR, dV, dP) with a 15x15 covariance propagated
through the A/B linearization and first-order bias Jacobians
(JRg, JVg, JVa, JPg, JPa), so deltas can be corrected for new bias
estimates without re-integration (GetDeltaRotation/Velocity/Position,
ImuTypes.cc:285+).

The fixed-size window + validity mask replaces the reference's growing
measurement vector: tracking hands the scan up to IMU_WINDOW samples per
frame and masked slots are identity updates, so one compiled kernel serves
every frame.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from orb_slam3_study_kr_tpu.lie.so3 import (exp_so3, hat, normalize_rotation,
                                            right_jacobian_so3)

GRAVITY = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)  # reference GRAVITY_VALUE


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ImuCalib:
    """Noise densities (discrete, per-sample) and bias random walk —
    reference IMU::Calib (ImuTypes.h:92)."""
    noise_gyro: jnp.ndarray   # sigma_g * sqrt(freq)
    noise_acc: jnp.ndarray
    walk_gyro: jnp.ndarray
    walk_acc: jnp.ndarray
    R_bc: jnp.ndarray         # body <- camera rotation (Tbc)
    t_bc: jnp.ndarray

    @staticmethod
    def make(noise_gyro=1.7e-4, noise_acc=2e-3, walk_gyro=1.9e-5,
             walk_acc=3e-3, freq=200.0, R_bc=None, t_bc=None):
        sf = float(freq) ** 0.5
        return ImuCalib(
            noise_gyro=jnp.float32(noise_gyro * sf),
            noise_acc=jnp.float32(noise_acc * sf),
            walk_gyro=jnp.float32(walk_gyro / sf),
            walk_acc=jnp.float32(walk_acc / sf),
            R_bc=jnp.eye(3, dtype=jnp.float32) if R_bc is None else jnp.asarray(R_bc, jnp.float32),
            t_bc=jnp.zeros(3, jnp.float32) if t_bc is None else jnp.asarray(t_bc, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Preintegrated:
    """Bias-referenced deltas between two stamps (reference Preintegrated)."""
    dT: jnp.ndarray     # total time
    dR: jnp.ndarray     # (3, 3)
    dV: jnp.ndarray     # (3,)
    dP: jnp.ndarray     # (3,)
    cov: jnp.ndarray    # (15, 15): [phi, v, p, bg, ba]
    JRg: jnp.ndarray    # (3, 3) d(dR)/d(bg)
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    bias: jnp.ndarray   # (6,) [bg, ba] linearization point


@jax.jit
def preintegrate(acc, gyro, dts, mask, bias, calib: ImuCalib) -> Preintegrated:
    """Integrate a window of IMU samples.

    Args:
      acc, gyro: (N, 3) raw measurements (already midpoint-averaged by the
        caller if resampling across frame boundaries, Tracking.cc:1685-1726).
      dts: (N,) per-sample integration intervals.
      mask: (N,) 1.0 for live samples.
      bias: (6,) [bg, ba] reference bias.
      calib: noise parameters.
    """
    bg, ba = bias[:3], bias[3:]
    sg2 = calib.noise_gyro ** 2
    sa2 = calib.noise_acc ** 2
    wg2 = calib.walk_gyro ** 2
    wa2 = calib.walk_acc ** 2

    def step(carry, inp):
        dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, dT = carry
        a, w, dt, m = inp
        dt = dt * m
        acc_c = a - ba
        w_c = w - bg
        dt2 = dt * dt

        # Position / velocity updates with the *old* dR (ImuTypes.cc order).
        dP_n = dP + dV * dt + 0.5 * dR @ acc_c * dt2
        dV_n = dV + dR @ acc_c * dt
        acc_hat = hat(acc_c)

        # A/B blocks for the 9-D [phi, v, p] covariance (ImuTypes.cc:186-230).
        A = jnp.eye(9, dtype=dR.dtype)
        B = jnp.zeros((9, 6), dR.dtype)
        A = A.at[3:6, 0:3].set(-dR @ acc_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ acc_hat * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dR.dtype) * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt2)

        # Jacobians w.r.t. bias (same order as reference).
        JPa_n = JPa + JVa * dt - 0.5 * dR * dt2
        JPg_n = JPg + JVg * dt - 0.5 * dR @ acc_hat @ JRg * dt2
        JVa_n = JVa - dR * dt
        JVg_n = JVg - dR @ acc_hat @ JRg * dt

        # Rotation update.
        dRi = exp_so3(w_c * dt)
        Jr = right_jacobian_so3(w_c * dt)
        A = A.at[0:3, 0:3].set(dRi.T)
        B = B.at[0:3, 0:3].set(Jr * dt)

        Nga = jnp.diag(
            jnp.concatenate([jnp.full(3, sg2), jnp.full(3, sa2)])
        ).astype(dR.dtype)
        C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        C_n = C.at[:9, :9].set(C9)
        walk = jnp.diag(
            jnp.concatenate([jnp.full(3, wg2), jnp.full(3, wa2)])
        ).astype(dR.dtype)
        C_n = C_n.at[9:, 9:].add(walk * m)

        JRg_n = dRi.T @ JRg - Jr * dt
        dR_n = dR @ dRi

        # Masked slots: keep the old state entirely.
        keep = m > 0
        out = tuple(
            jnp.where(keep, new, old)
            for new, old in zip(
                (dR_n, dV_n, dP_n, C_n, JRg_n, JVg_n, JVa_n, JPg_n, JPa_n, dT + dt),
                (dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, dT),
            )
        )
        return out, None

    eye = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros((3, 3), jnp.float32)
    init = (eye, jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros((15, 15), jnp.float32),
            zero3, zero3, zero3, zero3, zero3, jnp.float32(0.0))
    (dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, dT), _ = jax.lax.scan(
        step, init, (acc, gyro, dts, mask)
    )
    dR = normalize_rotation(dR)
    return Preintegrated(dT=dT, dR=dR, dV=dV, dP=dP, cov=C, JRg=JRg,
                         JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bias=bias)


def bias_corrected_deltas(pre: Preintegrated, new_bias):
    """First-order bias correction (GetDeltaRotation/Velocity/Position)."""
    db = new_bias - pre.bias
    dbg, dba = db[:3], db[3:]
    dR = pre.dR @ exp_so3(pre.JRg @ dbg)
    dV = pre.dV + pre.JVg @ dbg + pre.JVa @ dba
    dP = pre.dP + pre.JPg @ dbg + pre.JPa @ dba
    return dR, dV, dP


def predict_state(R_wb, p_wb, v_w, pre: Preintegrated, bias, gravity=None):
    """Propagate a body state through a preintegrated window
    (Tracking::PredictStateIMU semantics)."""
    g = GRAVITY if gravity is None else gravity
    dR, dV, dP = bias_corrected_deltas(pre, bias)
    t = pre.dT
    R_new = normalize_rotation(R_wb @ dR)
    v_new = v_w + g * t + R_wb @ dV
    p_new = p_wb + v_w * t + 0.5 * g * t * t + R_wb @ dP
    return R_new, p_new, v_new


def inertial_residual(R1, p1, v1, R2, p2, v2, bias, pre: Preintegrated,
                      gravity=None):
    """9-D preintegration residual [e_R, e_v, e_p] between two body states
    (EdgeInertial, G2oTypes.cc:514-560)."""
    from orb_slam3_study_kr_tpu.lie.so3 import log_so3

    g = GRAVITY if gravity is None else gravity
    dR, dV, dP = bias_corrected_deltas(pre, bias)
    t = pre.dT
    e_R = log_so3(dR.T @ R1.T @ R2)
    e_v = R1.T @ (v2 - v1 - g * t) - dV
    e_p = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
    return jnp.concatenate([e_R, e_v, e_p])
