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


def soft_clip_local2x(x, threshold: float, knee: float, asymmetry: float):
    """The local 2x oversampled soft clip (DSPCoreDouble.cpp:491-501:
    31-tap halfband up -> clip -> down, prepareSingleStage) with the 2x
    intermediate ELIMINATED by polyphase substitution.

    For the 31-tap reference stage (M=15, conv_parity=0, center phase
    odd with gain 0.5, center_delay 7):

        u[2n]   = 2 sum_s c[s] x[n-s]      (conv phase)
        u[2n+1] = 0.5 x[n-7]               (center phase)
        y[n]    = 0.5 clip(u[2n-15]) + sum_r c[r] clip(u[2n-2r])
                = 0.5 clip(0.5 x[n-15])
                  + sum_r c[r] clip(2 sum_s c[s] x[n-r-s])

    — ~32 shifted multiply-adds + two clip passes at BASE rate, all
    XLA-fusable elementwise work; the staged form costs three chunked
    Toeplitz GEMM passes over 2x the samples (measured the #2 stage
    wall of bench config6 at 384 kHz).  Identical math per sample
    (different summation grouping only: f32 roundoff-level deltas);
    zero history at the block start, as in the staged form.  The 15
    base-sample latency (AudioEngine.Processing.Latency.cpp:104) is
    the x[n-15] delay visible in the formula."""
    from .oversample import design_halfband
    x = jnp.asarray(x)
    st = design_halfband(31, 90.0)
    assert st.conv_parity == 0 and st.center_parity == 1
    c = st.conv                      # (16,) host float64
    n = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(30, 0)])
    # ue_ext[k] = u[2(k-15)] for k in [0, n+15)
    ue = c[0] * xp[..., 15:15 + n + 15]
    for s in range(1, len(c)):
        ue = ue + c[s] * xp[..., 15 - s:15 - s + n + 15]
    ue = soft_clip(2.0 * ue, threshold, knee, asymmetry)
    y = c[0] * ue[..., 15:15 + n]
    for r in range(1, len(c)):
        y = y + c[r] * ue[..., 15 - r:15 - r + n]
    uo = soft_clip(0.5 * xp[..., 15:15 + n], threshold, knee, asymmetry)
    return 0.5 * uo + y
