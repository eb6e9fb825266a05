"""Rational (Padé) tanh approximations — vectorized, branch-free.

The reference uses two policy-templated approximations with hard clip at
|x| >= 4.5 (ref: src/dsp/math/FastTanhApprox.h:24-92):

- ``fast_tanh_eq``   (DefaultFastTanhPolicy, EQ band saturation):
      f(x) = x * (27 + x^2) / (27 + 9 x^2)
- ``fast_tanh_clip`` (SoftClipPadéPolicy, output soft clip):
      f(x) = x*(10395 + x^2*(1260 + 21 x^2))
             / (10395 + x^2*(4725 + x^2*(210 + x^2)))

Scalar reference semantics: x >= 4.5 -> 1.0, x <= -4.5 -> -1.0 (EQ scalar
path); the SIMD paths clamp x to [-4.5, 4.5] first and evaluate the rational,
which differs from +-1.0 by the policy's residual at 4.5.  We follow the
*clamp-then-evaluate* SIMD form for the soft-clip policy (that is what the
AVX2 block kernel uses) and the exact-one scalar form for the EQ policy
(processBand calls the scalar fastTanh<>).
"""
from __future__ import annotations

import jax.numpy as jnp

CLIP_THRESHOLD = 4.5


def fast_tanh_eq(x):
    """27/9 Padé tanh, exact +-1 beyond the clip threshold.

    Matches convo::dsp::fastTanh<DefaultFastTanhPolicy> (scalar path used by
    EQProcessor.Processing.cpp processBand).
    """
    x = jnp.asarray(x)
    x2 = x * x
    core = x * (27.0 + x2) / (27.0 + 9.0 * x2)
    return jnp.where(x >= CLIP_THRESHOLD, 1.0,
                     jnp.where(x <= -CLIP_THRESHOLD, -1.0, core))


def fast_tanh_eq_v(x):
    """SIMD-equivalent EQ tanh: clamp to +-4.5 then evaluate the rational.

    Matches convo::dsp::fastTanhV128<DefaultFastTanhPolicy> used by the
    stereo-packed band kernel (processBandStereo).  At |x|=4.5 the 27/9
    rational evaluates to ~1.0006 rather than 1.0, so the stereo path differs
    from the scalar path by <=6.2e-4 for |x|>4.26 — we reproduce the stereo
    (SIMD) form since the reference uses it for all stereo-mode bands.
    """
    x = jnp.clip(jnp.asarray(x), -CLIP_THRESHOLD, CLIP_THRESHOLD)
    x2 = x * x
    return x * (27.0 + x2) / (27.0 + 9.0 * x2)


def fast_tanh_clip(x):
    """10395-series Padé tanh with clamp-then-evaluate (soft-clip policy).

    Matches convo::dsp::fastTanhV256<SoftClipPadéPolicy> used by
    softClipBlockAVX2 (AudioEngine.Processing.DSPCoreDouble.cpp:133-175).
    """
    x = jnp.clip(jnp.asarray(x), -CLIP_THRESHOLD, CLIP_THRESHOLD)
    x2 = x * x
    num = x * (10395.0 + x2 * (1260.0 + x2 * 21.0))
    den = 10395.0 + x2 * (4725.0 + x2 * (210.0 + x2))
    return num / den
