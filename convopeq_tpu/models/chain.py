"""Full DSP chain — the rebuild of AudioEngine::DSPCore::processDouble.

Stage order (src/audioengine/AudioEngine.Processing.DSPCoreDouble.cpp:309-660
and .../AudioEngine.Processing.DSPCoreIO.cpp:256-306):

  1. input: headroom gain -> input DC blockers (3 Hz, device rate)
  2. [oversampling] processUp (2x/4x/8x halfband cascade) -> oversampled DC
     blockers (1 Hz, processing rate)
  3. order routing (DSPCoreDouble.cpp:386-451):
       ConvolverThenEQ: convolver -> EQ
       EQThenConvolver: EQ -> x convolverInputTrimGain -> convolver
  4. OutputFilter (convIsLast selects HC+LC vs HPF+LPF) when either stage
     is active (DSPCoreDouble.cpp:453-463)
  5. x outputMakeupGain
  6. [softClip] at the oversampled rate, or wrapped in a local 2x
     oversampler when os_factor == 1 (DSPCoreDouble.cpp:471-501; the local
     wrap uses a 31-tap IIRLike stage, prepareSingleStage)
  7. [oversampling] processDown
  8. output DC blockers (3 Hz) -> x kOutputHeadroom (-1 dBFS) and/or
     dither/noise shaping (processOutputDouble, DSPCoreDouble.cpp:577-660)

The fixed-latency output delay and bypass-crossfade ramps are real-time
plumbing (block-boundary fades); offline, bypass is a static config choice.

Everything below is a pure function of (x, ChainConfig, prepared states):
`build_chain` returns a jit-compiled closure over the static config — the
analog of the reference's RuntimeState rebuild+publish (a config change is
a retrace, cached by config key).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.dc_blocker import dc_block
from ..ops.oversample import (
    PRESET_IIR_LIKE, design_halfband, make_stages, oversample_up,
    oversample_down)
from ..ops.softclip import soft_clip, soft_clip_params
from ..utils.dsputil import K_OUTPUT_HEADROOM
from .convolver import StereoConvolverState, convolver_process
from .eq import EQParams, eq_process_bands, agc_apply
from .gain_planner import CONVOLVER_THEN_EQ, EQ_THEN_CONVOLVER
from .output_filter import output_filter_process, HC_NATURAL, LC_NATURAL


def resolve_oversampling_factor(requested: int, sample_rate: float) -> int:
    """OversamplingPolicy::resolve (src/audioengine/OversamplingPolicy.h:28-57):
    cap so the internal rate stays <= 768 kHz; power-of-two result."""
    if sample_rate <= 96000.0:
        cap = 8
    elif sample_rate <= 192000.0:
        cap = 4
    elif sample_rate <= 384000.0:
        cap = 2
    else:
        cap = 1
    r = 8 if requested >= 8 else 4 if requested >= 4 else 2 if requested >= 2 else 1
    return min(r, cap)


@dataclass
class ChainConfig:
    """Static per-stream configuration (the ProcessingState analog,
    src/audioengine/AudioEngine.h:822-848)."""
    sample_rate: float = 48000.0
    order: int = EQ_THEN_CONVOLVER
    eq_bypassed: bool = False
    conv_bypassed: bool = False
    oversampling_factor: int = 1       # requested; resolved via policy
    oversampling_preset: int = PRESET_IIR_LIKE
    input_headroom_gain: float = 1.0   # linear
    output_makeup_gain: float = 1.0    # linear
    convolver_input_trim_gain: float = 1.0  # linear
    soft_clip_enabled: bool = False
    saturation_amount: float = 0.0     # drives soft-clip params
    wet_dry_mix: float = 1.0
    conv_hc_mode: int = HC_NATURAL
    conv_lc_mode: int = LC_NATURAL
    eq_lpf_mode: int = HC_NATURAL
    apply_output_headroom: bool = True  # x kOutputHeadroom when no dither
    agc_block_size: int = 512
    eq_method: str = "auto"   # "scan" | "fft" | "auto" (see models/eq.py)


def process_chain(x, cfg: ChainConfig, eq_params: EQParams | None = None,
                  conv_state: StereoConvolverState | None = None):
    """Run the full chain on x: (..., 2, N) float, time on last axis."""
    x = jnp.asarray(x)
    sr = cfg.sample_rate
    os_factor = resolve_oversampling_factor(cfg.oversampling_factor, sr)
    proc_rate = sr * os_factor

    # 1. input stage: sanitize/limit (InputBitDepthTransform.h:32-100 —
    # NaN -> 0, |x| < 1e-20 denormal flush, clamp +-1.0) then headroom +
    # DC blockers
    x = jnp.where(jnp.isfinite(x) & (jnp.abs(x) >= 1e-20), x, 0.0)
    x = jnp.clip(x, -1.0, 1.0)
    if cfg.input_headroom_gain != 1.0:
        x = x * cfg.input_headroom_gain
    x, _ = dc_block(x, sr, 3.0)

    # 2. oversample up + oversampled DC blockers
    stages = make_stages(os_factor, cfg.oversampling_preset) if os_factor > 1 else []
    if stages:
        x = oversample_up(x, stages)
        x, _ = dc_block(x, proc_rate, 1.0)

    eq_in = x  # AGC input reference is the EQ input at the processing rate

    # 3. order routing
    conv_active = (not cfg.conv_bypassed) and conv_state is not None
    eq_active = (not cfg.eq_bypassed) and eq_params is not None

    def run_eq(sig):
        pre = sig
        out = eq_process_bands(sig, eq_params, proc_rate,
                               method=cfg.eq_method)
        if eq_params.agc_enabled:
            out = agc_apply(pre, out, proc_rate,
                            cfg.agc_block_size * os_factor)
        return out

    if cfg.order == CONVOLVER_THEN_EQ:
        if conv_active:
            x = convolver_process(x, conv_state, cfg.wet_dry_mix)
        if eq_active:
            x = run_eq(x)
    else:
        if eq_active:
            x = run_eq(x)
        if conv_active:
            if abs(cfg.convolver_input_trim_gain - 1.0) > 1e-12:
                x = x * cfg.convolver_input_trim_gain
            x = convolver_process(x, conv_state, cfg.wet_dry_mix)

    # 4. output filter
    if conv_active or eq_active:
        conv_is_last = conv_active and (
            not eq_active or cfg.order == EQ_THEN_CONVOLVER)
        x = output_filter_process(x, proc_rate, conv_is_last,
                                  cfg.conv_hc_mode, cfg.conv_lc_mode,
                                  cfg.eq_lpf_mode)

    # 5. makeup gain
    if cfg.output_makeup_gain != 1.0:
        x = x * cfg.output_makeup_gain

    # 6. soft clip
    if cfg.soft_clip_enabled:
        thr, knee, asym = soft_clip_params(cfg.saturation_amount)
        if os_factor > 1:
            x = soft_clip(x, thr, knee, asym)
        else:
            # local 2x OS wrap: 31-tap IIRLike single stage
            # (prepareSingleStage; latency 15 base samples is inherent in
            # the FIR group delay, AudioEngine.Processing.Latency.cpp:104)
            st = [design_halfband(31, 90.0)]
            u = oversample_up(x, st)
            u = soft_clip(u, thr, knee, asym)
            x = oversample_down(u, st)

    # 7. downsample
    if stages:
        x = oversample_down(x, stages)

    # 8. output stage: DC block + headroom (dither handled by caller when a
    # quantizer is configured — see models/dither.py)
    x, _ = dc_block(x, sr, 3.0)
    if cfg.apply_output_headroom:
        x = x * K_OUTPUT_HEADROOM
    return x


def build_chain(cfg: ChainConfig, eq_params: EQParams | None = None,
                has_conv: bool = True):
    """Return a jitted fn(x, conv_state) with static config baked in.

    conv_state is a jit ARGUMENT (NUCState pytree): closure-capturing device
    arrays would embed them as compile-time constants, which requires a
    device->host readback that some TPU runtimes don't implement for
    complex dtypes — and passing it as an argument also lets one compiled
    chain serve many IRs of the same layout.
    """
    if has_conv:
        return jax.jit(lambda x, conv_state: process_chain(
            x, cfg, eq_params, conv_state))
    return jax.jit(lambda x: process_chain(x, cfg, eq_params, None))
