"""Robust-kernel weights and chi-square gates shared by all solvers.

Mirrors the constants used throughout /root/reference/src/Optimizer.cc:
chi2 gates 5.991 (2-dof mono) / 7.815 (3-dof stereo), Huber deltas
sqrt(5.991) / sqrt(7.815), per-octave information 1 / 1.2^(2 level).
"""

import jax.numpy as jnp

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = CHI2_MONO ** 0.5
HUBER_STEREO = CHI2_STEREO ** 0.5


def huber_weight(r2, delta):
    """IRLS weight for the Huber kernel given squared residual norm r2."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)


def octave_inv_sigma2(level, scale_factor=1.2):
    """Information weight per pyramid level (reference mvInvLevelSigma2)."""
    return scale_factor ** (-2.0 * level.astype(jnp.float32))
