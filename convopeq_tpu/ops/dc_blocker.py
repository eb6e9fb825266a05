"""Cascaded one-pole DC blockers (src/UltraHighRateDCBlocker.h).

Two first-order high-pass sections in series with cutoffs spread +-10%:
  alpha_i = 1 - exp(-2 pi fc (1 -+ 0.1) / sr)        (init, :78-115)
  per sample: s_i' = s_i + alpha_i (x_i - s_i);  y_i = x_i - s_i'
(the output uses the UPDATED state, :127-150).

Linear in (s0, s1) -> evaluated as one 2x2 affine associative scan:
  s0' = (1-a0) s0 + a0 x
  s1' = -a1(1-a0) s0 + (1-a1) s1 + a1(1-a0) x
  y   = (1-a1)( (1-a0)(x - s0) - s1 )
Engine cutoffs: input/output 3 Hz at device rate, oversampled 1 Hz at the
processing rate (AudioEngine.h:640-648).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scan_iir import affine_scan_2x2

INTERNAL_SPREAD = 0.1


def dc_blocker_alphas(sample_rate: float, cutoff_hz: float):
    """init() coefficients (host libm, exact)."""
    alphas = []
    for ratio in (1.0 - INTERNAL_SPREAD, 1.0 + INTERNAL_SPREAD):
        omega = 2.0 * np.pi * cutoff_hz * ratio / sample_rate
        a = -np.expm1(-omega)
        if not np.isfinite(a) or a <= 0.0 or a >= 1.0:
            a = 1.0e-6
        alphas.append(float(a))
    return alphas


def dc_block(x, sample_rate: float, cutoff_hz: float, state0=None):
    """Apply the 2-stage DC blocker along the last axis.

    Returns (y, final_state) with state = (s0, s1).  (A cascaded
    two-one-pole decomposition was tried and measured slower than the
    fused 2x2 scan on TPU.)
    """
    x = jnp.asarray(x)
    dt = x.dtype
    a0, a1 = dc_blocker_alphas(sample_rate, cutoff_hz)
    b0 = 1.0 - a0
    b1 = 1.0 - a1

    A = jnp.asarray([[b0, 0.0],
                     [-a1 * b0, b1]], dt)
    bu = jnp.stack([a0 * x, a1 * b0 * x], axis=-1)
    if state0 is None:
        state0 = jnp.zeros(x.shape[:-1] + (2,), dt)
    pre, final = affine_scan_2x2(A, bu, state0)
    s0 = pre[..., 0]
    s1 = pre[..., 1]
    y = b1 * (b0 * (x - s0) - s1)
    return y, final
