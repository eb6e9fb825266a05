"""Musical soft clip (softClipBlockAVX2 / musicalSoftClipScalar).

Ref: src/audioengine/AudioEngine.Processing.DSPCoreDouble.cpp:107-224.
Memoryless elementwise nonlinearity (the prevSample carry in the reference
is written but never read back into the output — vestigial state from a
removed pre-averaging step), so it vectorizes with no scan:

  clip_start = threshold - knee
  |x| <= clip_start -> x
  t   = clamp((|x| - clip_start)/(2 knee), 0, 1); ks = t^2 (3 - 2 t)
  clipped = threshold + knee * tanh_sc((|x| - threshold)/knee)
  mixed   = |x| + (clipped - |x|) * ks
  factor  = 1 - asym * (1 - sign)/2 * ks
  y = sign * mixed * factor
knee < 1e-9 -> hard clip at +-threshold.

Parameter derivation from saturation amount s (DSPCoreDouble.cpp:471-475):
  threshold = 0.95 - 0.45 s;  knee = 0.05 + 0.35 s;  asymmetry = 0.10 s
"""
from __future__ import annotations

import jax.numpy as jnp

from .fast_tanh import fast_tanh_clip


def soft_clip_params(saturation_amount: float):
    s = float(saturation_amount)
    return (0.95 - 0.45 * s, 0.05 + 0.35 * s, 0.10 * s)


def soft_clip(x, threshold: float, knee: float, asymmetry: float):
    x = jnp.asarray(x)
    if knee <= 1.0e-9:
        return jnp.clip(x, -threshold, threshold)
    clip_start = threshold - knee
    ax = jnp.abs(x)
    sign = jnp.where(x > 0.0, 1.0, -1.0)
    t = jnp.clip((ax - clip_start) / (2.0 * knee), 0.0, 1.0)
    ks = t * t * (3.0 - 2.0 * t)
    clipped = threshold + knee * fast_tanh_clip((ax - threshold) / knee)
    mixed = ax + (clipped - ax) * ks
    factor = 1.0 - asymmetry * (1.0 - sign) * 0.5 * ks
    y = sign * mixed * factor
    return jnp.where(ax > clip_start, y, x)
