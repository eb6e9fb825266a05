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
from ..utils.dsputil import K_OUTPUT_HEADROOM, next_pow2
from .convolver import StereoConvolverState, convolver_process
from .eq import EQParams, eq_process
from .gain_planner import CONVOLVER_THEN_EQ, EQ_THEN_CONVOLVER
from .output_filter import output_filter_process, HC_NATURAL, LC_NATURAL


def resolve_oversampling_factor(requested: int, sample_rate: float) -> int:
    """OversamplingPolicy::resolve (src/audioengine/OversamplingPolicy.h:51-86),
    pinned against the compiled reference (engine_math.json): the max
    factor caps the internal rate at 768 kHz; requested == 0 (Auto) or
    any value outside {1,2,4,8} resolves to the MAX allowed factor; a
    valid request above the cap falls back to the cap; > 768 kHz input
    is unsupported and resolves to 1."""
    if sample_rate <= 96000.0:
        cap = 8
    elif sample_rate <= 192000.0:
        cap = 4
    elif sample_rate <= 384000.0:
        cap = 2
    elif sample_rate <= 768000.0:
        cap = 1
    else:
        return 1  # supported == false
    if requested not in (1, 2, 4, 8):
        return cap  # Auto / invalid-value fallback
    return requested if requested <= cap else cap


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
                  conv_state: StereoConvolverState | None = None,
                  mix_ramp=None):
    """Run the full chain on x: (..., 2, N) float, time on last axis.

    mix_ramp: optional per-sample wet/dry mix (N * os_factor,) at the
    processing rate — overrides cfg.wet_dry_mix for glitch-free mix
    transitions (the reference's mixSmoother, passed as a traced arg so
    one compilation serves every ramp)."""
    x = jnp.asarray(x)
    sr = cfg.sample_rate
    os_factor = resolve_oversampling_factor(cfg.oversampling_factor, sr)
    proc_rate = sr * os_factor

    # 1. input stage: sanitize/limit (InputBitDepthTransform.h:32-100 —
    # NaN -> 0, |x| < 1e-20 denormal flush, clamp +-1.0) then headroom +
    # DC blockers
    x = jnp.where(~jnp.isnan(x) & (jnp.abs(x) >= 1e-20), x, 0.0)  # Inf survives to the clamp (ref: +-1), pinned by engine_math.json
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
        return eq_process(sig, eq_params, proc_rate,
                          block_size=cfg.agc_block_size * os_factor,
                          method=cfg.eq_method)

    if cfg.order == CONVOLVER_THEN_EQ:
        if conv_active:
            x = convolver_process(x, conv_state, cfg.wet_dry_mix, mix_ramp)
        if eq_active:
            x = run_eq(x)
    else:
        if eq_active:
            x = run_eq(x)
        if conv_active:
            if abs(cfg.convolver_input_trim_gain - 1.0) > 1e-12:
                x = x * cfg.convolver_input_trim_gain
            x = convolver_process(x, conv_state, cfg.wet_dry_mix, mix_ramp)

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
            # — the 2x intermediate is eliminated by polyphase
            # substitution (ops/softclip.soft_clip_local2x, equal to the
            # staged up/clip/down at 1e-12)
            from ..ops.softclip import soft_clip_local2x
            x = soft_clip_local2x(x, thr, knee, asym)

    # 7. downsample
    if stages:
        x = oversample_down(x, stages)

    # 8. output stage: DC block + headroom (dither handled by caller when a
    # quantizer is configured — see models/dither.py)
    x, _ = dc_block(x, sr, 3.0)
    if cfg.apply_output_headroom:
        x = x * K_OUTPUT_HEADROOM
    return x


# ------------------------------------------------------------ fused mode
#
# When every stage around the convolver is LTI (no soft clip, no AGC, no
# oversampling, wet-only mix, EQ bands all-stereo or bypassed), the whole
# chain is ONE linear cascade: LTI operators commute, so the input/output
# DC blockers, the EQ response, and the output filter fold into a SINGLE
# precomputed prefilter applied as one extra partitioned convolution —
# the TPU-native analog of the reference's rebuild-time precompute
# (SetImpulse applies its spectrum filters the same way,
# MKLNonUniformConvolver.cpp:336-440).  The runtime chain collapses to
# sanitize -> prefilter conv -> NUC -> scalar gains; on v5e this lifts
# the 1M-tap headline (the DC blockers + output filter + separate EQ
# pass were ~50% of the chain wall).
#
# The SPECTRUM-FILTERED NUC is deliberately excluded from commutation:
# per-partition circular filtering makes that operator periodically
# time-varying (LPTV, period = partition size), and LPTV does not commute
# with LTI (measured 0.6-2% reorder error).  Fused mode therefore
# prepares the NUC with UNFILTERED spectra (pure LTI convolution —
# commutes exactly) and folds the HC/LC curve into the prefilter, where
# it is applied LINEARLY on a long grid instead of circularly per
# partition — a documented variant (no frame-wrap aliasing; the unfused
# path remains the reference-exact mode).  Per-layer air-absorption
# damping cannot be expressed as one global prefilter, so AIR tail mode
# is ineligible; CONTOUR/BYPASS tail gains are per-layer scalars (LTI)
# and stay in the NUC.
#
# Exactness (of the fusion itself): the folded prefilter is truncated
# where every pole's ringing is below `eps` (the 3 Hz DC blockers
# dominate: ~57k taps at 1e-10); fused == commuted exact cascade at
# ~7e-12 in f64 (tests/test_chain_stages.py).

def fused_eligible(cfg: ChainConfig, eq_params: EQParams | None,
                   has_conv: bool) -> bool:
    """Static-config fusion applies when the around-conv chain is LTI and
    single-rate, and the EQ (if active) is a DIAGONAL 2x2 (stereo-only
    bands — M/S bands mix channels, which one IR per channel can't)."""
    if not has_conv or cfg.conv_bypassed or cfg.soft_clip_enabled:
        return False
    if cfg.wet_dry_mix < 1.0:
        return False
    if resolve_oversampling_factor(cfg.oversampling_factor,
                                   cfg.sample_rate) != 1:
        return False
    if cfg.eq_bypassed or eq_params is None:
        return True
    if eq_params.agc_enabled or float(eq_params.saturation) > 0.0:
        return False
    from .eq import band_active_mask, STEREO
    active = band_active_mask(eq_params)
    return all(int(eq_params.modes[b]) == STEREO
               for b in range(len(active)) if active[b])


def fused_prefilter_ir(cfg: ChainConfig, eq_params: EQParams | None,
                       eps: float = 1e-10, spec=None, dc_passes: int = 2):
    """Host-f64 impulse response of the folded LTI stages: dc_in(3 Hz) *
    [EQ] * output_filter * dc_out(3 Hz) * [HC/LC spectrum-filter curve,
    applied linearly when `spec` is given].  Returns (tail,) float64.

    dc_passes: how many 3 Hz DC-blocker passes to fold (2 = input AND
    output blocker; 1 = input only — the semi-fused soft-clip chain
    keeps the output blocker AFTER the nonlinearity, where it lives in
    the staged order)."""
    import numpy as np
    from ..ops.dc_blocker import dc_blocker_alphas
    from ..ops.scan_iir import _biquad_pole_radius
    from .output_filter import output_filter_coeffs, IDENTITY
    sr = cfg.sample_rate

    # truncation length from the slowest pole
    radii = [1.0 - a for a in dc_blocker_alphas(sr, 3.0)] * 2
    ofc = output_filter_coeffs(sr)
    eq_active = (not cfg.eq_bypassed) and eq_params is not None
    conv_is_last = not eq_active or cfg.order == EQ_THEN_CONVOLVER
    if conv_is_last:
        stages = [ofc["hc"][cfg.conv_hc_mode][0],
                  ofc["hc"][cfg.conv_hc_mode][1],
                  ofc["lc"][cfg.conv_lc_mode]]
    else:
        stages = [ofc["hpf"], ofc["lp"][cfg.eq_lpf_mode][0],
                  ofc["lp"][cfg.eq_lpf_mode][1]]
    for c in stages:
        if tuple(c) != IDENTITY:
            radii.append(_biquad_pole_radius(c[3], c[4]))
    if eq_active:
        from .eq import _eq_ring_tail_samples
        eq_tail = _eq_ring_tail_samples(eq_params, sr, eps)
    else:
        eq_tail = 0
    rmax = min(max(radii), 1.0 - 1e-12)
    tail = max(int(np.ceil(np.log(eps) / np.log(rmax))), eq_tail, 256)
    m = next_pow2(2 * tail)
    w = 2.0 * np.pi * np.arange(m // 2 + 1) / m
    z = np.exp(1j * w)

    # dc blockers: per one-pole stage H(z) = (1-a)(z-1)/(z-(1-a))
    H = np.ones(m // 2 + 1, complex)
    for _ in range(dc_passes):
        for a in dc_blocker_alphas(sr, 3.0):
            H *= (1.0 - a) * (z - 1.0) / (z - (1.0 - a))
    # output filter biquads
    for c in stages:
        if tuple(c) != IDENTITY:
            b0, b1, b2, a1, a2 = c
            H *= (b0 * z * z + b1 * z + b2) / (z * z + a1 * z + a2)
    # EQ (diagonal): h11 of the 2x2 band-matrix response
    if eq_active:
        from .eq import _band_matrix_response
        freqs = np.arange(m // 2 + 1) * (sr / m)
        h11, _h12, _h21, _h22 = _band_matrix_response(eq_params, sr, freqs)
        H *= h11
    if spec is not None:
        # the NUC HC/LC curve, applied LINEARLY on this grid (the fused
        # NUC is prepared unfiltered; see the block comment above)
        from .nuc import spectrum_filter_gain
        H *= spectrum_filter_gain(m, spec)
    return np.fft.irfft(H, n=m)[:tail]


def prepare_fused_prefilter(cfg: ChainConfig, eq_params: EQParams | None,
                            eps: float = 1e-10, dtype=None,
                            part_size: int = 8192, spec=None,
                            ir_len: int = 10 ** 6, block_size: int = 512):
    """Partitioned spectra of the folded prefilter: (Hg, part_size).

    Pass the FilterSpec as `spec` to fold the HC/LC curve in (and prepare
    the NUC with apply_spectrum_filter=False); AIR tail mode (per-layer
    damping) is not fusable.  Pass the ACTUAL ir_len/block_size so the
    damping-eligibility probe inspects the caller's real layer plan (the
    defaults are a conservative 1M-tap probe whose long tail carries
    damping whenever the mode can produce any)."""
    from ..ops.partitioned_conv import partition_spectra
    if spec is not None:
        from .nuc import plan_layers
        # reject configs whose layers would carry per-layer damping
        probe = plan_layers(ir_len, block_size, spec)
        if any(lp.damping is not None for lp in probe.layers):
            raise ValueError("AIR tail mode (per-layer damping) cannot be "
                             "folded into a global prefilter")
    g = fused_prefilter_ir(cfg, eq_params, eps, spec=spec)
    if dtype is None:
        dtype = jnp.zeros(()).dtype
    return partition_spectra(jnp.asarray(g, dtype), part_size), part_size


def process_chain_fused(x, cfg: ChainConfig, conv_state, prefilter=None):
    """The collapsed runtime chain: sanitize -> scalar gains -> [prefilter
    conv (folded dc/EQ/output-filter)] -> NUC -> scalar gains.  Pair with
    `prepare_fused_prefilter` under a `fused_eligible` config; the NUC
    state is the normal `stereo_prepare` output (untouched semantics).
    With `prefilter=None` the prefilter pass is skipped entirely — use
    with `prepare_folded_convolver`, which bakes it into the IR."""
    from ..ops.partitioned_conv import uniform_partitioned_conv
    x = jnp.asarray(x)
    x = jnp.where(~jnp.isnan(x) & (jnp.abs(x) >= 1e-20), x, 0.0)  # Inf survives to the clamp (ref: +-1), pinned by engine_math.json
    x = jnp.clip(x, -1.0, 1.0)
    # trim applies only on the EQ->conv order, as in the staged chain
    # (it trims EQ output into the convolver; conv-first has no EQ ahead)
    pre = cfg.input_headroom_gain * (
        cfg.convolver_input_trim_gain
        if cfg.order != CONVOLVER_THEN_EQ else 1.0)
    if pre != 1.0:
        x = x * pre
    if prefilter is not None:
        Hg, pg = prefilter
        x = uniform_partitioned_conv(x, Hg, pg)
    y = convolver_process(x, conv_state, 1.0)
    post = cfg.output_makeup_gain * (K_OUTPUT_HEADROOM
                                     if cfg.apply_output_headroom else 1.0)
    if post != 1.0:
        y = y * post
    return y


def throughput_partition_size(ir_len: int, f64: bool = False) -> int:
    """Partition size for the offline single-layer throughput plan.

    The reference's 3-layer non-uniform plan exists to bound REAL-TIME
    latency (L0 small for fast first output, tails amortized across
    callbacks — MKLNonUniformConvolver.h:17-31).  Offline, latency is
    irrelevant and every extra layer is an extra full pass over the
    signal (its own forward transform / MAC / inverse pipeline), so the
    throughput-optimal plan is ONE uniform layer with a large partition.
    Measured on v5e (1M-tap IR, 64 stream-channels x 60 s):

        3-layer reference plan   412 ms   (RTF 4.7k)
        1 layer p=8192  x131     157 ms
        1 layer p=16384 x66      144 ms   <- flattest point
        1 layer p=32768 x33      149 ms
        1 layer p=131072 x9      189 ms   (FFT cost dominates)

    The optimum is flat around p≈16k: smaller p grows the MAC band
    (num_parts), larger p grows the per-frame transform cost.  Exactness
    is untouched — any partitioning computes the same linear convolution
    (single-layer f32 tracks the 3-layer f32 output at ~4e-6 relative,
    i.e. below the f32 chain floor).

    The dd/f64 path has its own optimum.  With the fused dd Pallas
    pipeline (ops/pallas_dd_fft.py) the partition must fit the kernels'
    VMEM plan — p=32768 does (and balances transform flops against the
    dd MAC's per-partition VPU cost); without it (CONVOPEQ_PALLAS_DD=0
    or unsupported shape) the all-XLA shift-MAC costs O(num_parts) full
    passes, so the largest partition wins (measured dd-folded 1M-tap:
    p16384 226x / p32768 250x / p65536 **271x** / p131072 266x).

    Round-4 re-scan with the Pallas transform kernels of record: the f32
    optimum moved to p=32768 (22.3k RTF at p16384 -> 23.8k at p32768 on
    the 1M-tap headline; the phase-copy MAC is VPU-compute-bound at
    ~2.2 TFLOP/s, so halving num_parts buys more than the slightly
    costlier transforms lose).  p=65536 exceeds the transform kernels'
    scoped-vmem fit (pallas_xform_supported)."""
    p = next_pow2(max(1024, ir_len // 64))
    if f64:
        from ..ops.pallas_dd_fft import dd_pallas_enabled
        cap = 32768 if dd_pallas_enabled() else 65536
    else:
        cap = 32768
    return min(p, cap)


def prepare_folded_convolver(ir, block_size: int, spec, cfg: ChainConfig,
                             eq_params: EQParams | None, eps: float = 1e-10,
                             dtype=None, partition: int | str | None = "auto",
                             dc_passes: int = 2,
                             fold_spectrum_curve: bool = True):
    """Deepest static-config fusion: host-convolve the folded LTI
    prefilter (dc blockers, EQ, output filter, HC/LC curve) into the IR
    ITSELF, then prepare the NUC on the combined response — the runtime
    chain is just sanitize -> NUC -> scalar gains
    (`process_chain_fused(..., prefilter=None)`), zero extra passes.

    Exactness: the NUC is NOT a plain convolution — it is a sum of
    contour-GAIN-weighted layer segments (plan_layers, cpp:738-768), so
    g*h folded naively would move energy across layer-gain boundaries.
    Instead the layer gains of the ORIGINAL IR's plan are baked into the
    IR first (h_eff[n] = h[n] * gain(layer of n) — exactly what the
    layered NUC computes), then h_eff is convolved with g, and the NUC is
    prepared with `unit_layer_gains=True` (plain exact convolution):
        NUC(h) = h_eff * x  =>  g * NUC(h) = (g * h_eff) * x  exactly.
    The precompute is one host f64 FFT convolution per channel
    (~2^21-point for the 1M-tap headline, milliseconds) — the TPU-native
    analog of the reference's rebuild-time spectrum precompute
    (MKLNonUniformConvolver.cpp:336-440, which folds its output filters
    into the partition spectra the same way).  The combined IR is
    ~`tail` samples longer, so layer counts grow marginally; AIR tail
    mode (per-layer damping is inside the layer sum, not a global LTI
    factor) stays ineligible.

    `partition` selects the NUC partitioning of the combined IR (pure
    evaluation detail — every choice computes the same exact linear
    convolution):
      "auto" (default): single-layer throughput plan
        (`throughput_partition_size` — ~2.8x the 3-layer plan on v5e);
      an int: single-layer plan at that partition size;
      None: the reference's 3-layer plan (unit gains).
    """
    import numpy as np
    from .convolver import StereoConvolverState, stereo_prepare
    from .nuc import nuc_prepare_uniform, plan_layers
    ir = np.asarray(ir, np.float64)
    if ir.ndim == 1:
        ir = np.stack([ir, ir])
    base = plan_layers(ir.shape[-1], block_size, spec)
    if any(lp.damping is not None for lp in base.layers):
        raise ValueError("AIR tail mode (per-layer damping) cannot be "
                         "folded into the IR")
    h_eff = ir.copy()
    for lp in base.layers:
        if lp.gain != 1.0:
            h_eff[:, lp.offset:lp.offset + lp.length] *= lp.gain
    g = fused_prefilter_ir(cfg, eq_params, eps,
                           spec=spec if fold_spectrum_curve else None,
                           dc_passes=dc_passes)
    m = next_pow2(ir.shape[-1] + g.shape[0] - 1)
    combined = np.fft.irfft(np.fft.rfft(h_eff, m) * np.fft.rfft(g, m),
                            m)[:, :ir.shape[-1] + g.shape[0] - 1]
    if dtype is None:
        dtype = jnp.zeros(()).dtype
    if partition == "fused2":
        return _prepare_fused2(combined, block_size, dtype)
    if partition is not None:
        if partition == "auto":
            partition = throughput_partition_size(
                combined.shape[-1], f64=(jnp.dtype(dtype) == jnp.float64))
        cj = jnp.asarray(combined, dtype)
        return StereoConvolverState(
            left=nuc_prepare_uniform(cj[0], int(partition), block_size),
            right=nuc_prepare_uniform(cj[1], int(partition), block_size))
    return stereo_prepare(jnp.asarray(combined, dtype), block_size, spec,
                          apply_spectrum_filter=False,
                          unit_layer_gains=True)


def _prepare_fused2(combined, block_size: int, dtype,
                    p_near: int = 16384):
    """Two-level throughput plan (partition="fused2"): a NEAR layer of
    <= 8 partitions at `p_near` that rides the fully-fused fwd+MAC+inv
    Pallas kernel (X spectra never leave VMEM —
    ops/pallas_gemm_fft.fused_conv_frames_pallas), plus a FAR layer at
    8*p_near for the remaining tail, whose per-frame stage-grid traffic
    is 1/8th as frequent.  Same exact linear convolution as any other
    partitioning; `nuc_convolve` sums the layers with the far layer's
    offset shift.  Falls back to the single-layer auto plan when the IR
    fits 8 near partitions outright or the fused kernel cannot hold the
    shape."""
    import numpy as np
    from ..ops.pallas_gemm_fft import fused_conv_supported
    from ..ops.partitioned_conv import partition_spectra
    from .convolver import StereoConvolverState
    from .nuc import (NUCLayerPlan, NUCPlan, NUCState, nuc_prepare_uniform)
    n = combined.shape[-1]
    near_len = 8 * p_near
    if not fused_conv_supported(p_near, 8):
        part = throughput_partition_size(n)
        cj = jnp.asarray(combined, dtype)
        return StereoConvolverState(
            left=nuc_prepare_uniform(cj[0], part, block_size),
            right=nuc_prepare_uniform(cj[1], part, block_size))
    cj = jnp.asarray(combined, dtype)
    if n <= near_len:
        return StereoConvolverState(
            left=nuc_prepare_uniform(cj[0], p_near, block_size),
            right=nuc_prepare_uniform(cj[1], p_near, block_size))
    # far partition capped at the largest size the two-stage transform
    # kernels hold in VMEM (p=131072 exceeds the 16 MB scoped limit at
    # the Mosaic-required 8-frame tile; 65536 fits)
    from ..ops.pallas_gemm_fft import pallas_xform_supported
    p_far = 8 * p_near
    while p_far > p_near and not pallas_xform_supported(p_far):
        p_far //= 2
    far_len = n - near_len
    far_parts = -(-far_len // p_far)

    def prep(ch):
        layers = (
            NUCLayerPlan(offset=0, length=near_len, part_size=p_near,
                         num_parts=8, gain=1.0, damping=None),
            NUCLayerPlan(offset=near_len, length=far_len, part_size=p_far,
                         num_parts=far_parts, gain=1.0, damping=None),
        )
        plan = NUCPlan(layers=layers, direct_taps=0, latency=p_near,
                       block_size=block_size, ir_len=n)
        H0 = partition_spectra(ch[:near_len], p_near, 8, dtype=ch.dtype)
        H1 = partition_spectra(ch[near_len:], p_far, far_parts,
                               dtype=ch.dtype)
        return NUCState(plan=plan, layer_spectra=[H0, H1], direct_ir=None)

    return StereoConvolverState(left=prep(cj[0]), right=prep(cj[1]))


def prepare_semi_folded_convolver(ir, block_size: int, spec,
                                  cfg: ChainConfig,
                                  eq_params: EQParams | None,
                                  eps: float = 1e-10, dtype=None,
                                  partition: int | str | None = "auto",
                                  fold_spectrum_curve: bool = True):
    """Partial fold for SOFT-CLIP chains: the LTI prefix (input DC
    blockers, EQ, convolver with layer gains, output filter, HC/LC
    curve) folds into the IR; the nonlinear suffix (makeup -> soft clip
    -> output DC blocker -> headroom/dither) stays staged in the exact
    reference order (process_chain steps 4-8, DSPCoreDouble.cpp:453-
    660).  Pair with `process_chain_semi_fused`.  This is what makes
    bench config6 (full chain + dither at 384 kHz) ride the folded NUC
    kernels: the full fold is ineligible (soft clip is nonlinear), but
    everything BEFORE the clip is one LTI cascade."""
    if not cfg.soft_clip_enabled:
        raise ValueError("use prepare_folded_convolver when soft clip is "
                         "off (the full fold is strictly better)")
    if cfg.wet_dry_mix < 1.0:
        raise ValueError("wet/dry mixing does not fold")
    lin_cfg = ChainConfig(**{**cfg.__dict__, "soft_clip_enabled": False})
    return prepare_folded_convolver(ir, block_size, spec, lin_cfg,
                                    eq_params, eps, dtype, partition,
                                    dc_passes=1,
                                    fold_spectrum_curve=fold_spectrum_curve)


def process_chain_semi_fused(x, cfg: ChainConfig, conv_state):
    """Runtime for `prepare_semi_folded_convolver`: sanitize -> scalar
    pre-gains -> folded NUC (dc_in + EQ + conv + output filter) ->
    makeup -> soft clip -> output DC blocker -> headroom.  Matches the
    staged process_chain order exactly (soft clip and the output DC
    blocker do not commute with the fold, so they run staged)."""
    from ..ops.dc_blocker import dc_block
    from ..ops.softclip import soft_clip_local2x, soft_clip_params
    x = jnp.asarray(x)
    x = jnp.where(~jnp.isnan(x) & (jnp.abs(x) >= 1e-20), x, 0.0)
    x = jnp.clip(x, -1.0, 1.0)
    pre = cfg.input_headroom_gain * (
        cfg.convolver_input_trim_gain
        if cfg.order != CONVOLVER_THEN_EQ else 1.0)
    if pre != 1.0:
        x = x * pre
    y = convolver_process(x, conv_state, 1.0)
    if cfg.output_makeup_gain != 1.0:
        y = y * cfg.output_makeup_gain
    thr, knee, asym = soft_clip_params(cfg.saturation_amount)
    os_factor = resolve_oversampling_factor(cfg.oversampling_factor,
                                            cfg.sample_rate)
    if os_factor > 1:
        raise ValueError("semi-fused chain is single-rate (oversampled "
                         "soft-clip configs run staged)")
    # local 2x wrap via the polyphase-substituted fused form
    y = soft_clip_local2x(y, thr, knee, asym)
    y, _ = dc_block(y, cfg.sample_rate, 3.0)
    if cfg.apply_output_headroom:
        y = y * K_OUTPUT_HEADROOM
    return y


def _os_composite_taps(stages, for_up: bool):
    """Dense taps of the whole up (or down) halfband cascade at the final
    processing rate, by the noble identity: each stage's polyphase-merged
    filter (ops/oversample._stage_full_response) is zero-stuffed to the
    final rate and the results convolve.  Up cascade (stage order 0..k):
    G = g_k * stuff2(g_{k-1}) * stuff4(g_{k-2}) ...; the down cascade
    (applied reversed) has the same structure with the decimator taps."""
    import numpy as np
    from ..ops.oversample import _stage_full_response
    G = np.ones(1, np.float64)
    for i, st in enumerate(stages):
        g = _stage_full_response(st, for_up)
        stuff = 2 ** (len(stages) - 1 - i)
        if stuff > 1:
            gs = np.zeros((len(g) - 1) * stuff + 1, np.float64)
            gs[::stuff] = g
            g = gs
        G = np.convolve(G, g)
    return G


def prepare_folded_convolver_oversampled(
        ir_hf, block_size: int, spec, cfg: ChainConfig,
        eq_params: EQParams | None, eps: float = 1e-10, dtype=None,
        partition: int | str | None = "auto",
        fold_spectrum_curve: bool = True):
    """Fold the ENTIRE oversampled static chain into one base-rate IR.

    The staged chain (process_chain with os_factor L > 1) is, for a
    static linear config (soft clip off, wet-only, AGC off, diagonal EQ),
    the LTI cascade  up-FIRs -> dc_os(1 Hz) -> [EQ] -> conv(IR at the
    processing rate, DSPCoreLifecycle.cpp:192 'processingRate = sr * L')
    -> output filter -> down-FIRs  sandwiched between the base-rate
    input/output DC blockers.  Upsample-by-L -> LTI -> decimate-by-L is
    itself exactly LTI at base rate (polyphase identity): with composite
    interpolator G_u and decimator G_d (at the processing rate),

        h_eq[n] = (G_d * h_hf_chain * G_u)[L n]

    — no approximation beyond the same eps pole-tail truncation the
    base-rate fold uses.  The runtime chain is then the standard folded
    path (sanitize -> NUC -> scalar gains, `process_chain_fused` with
    prefilter=None), which is how bench config3 rides the headline
    kernels.  The OS FIR group delay (the reference's reported
    oversampling latency, AudioEngine.Processing.Latency.cpp:22-23) is
    carried inside h_eq as its leading zeros — identical to the staged
    path's output alignment.

    `ir_hf`: the impulse response AT THE PROCESSING RATE (the reference
    loader resamples the IR to processingRate; use ir/resample.py).
    Layer contour gains of the high-rate plan (block_size * L per
    processingBlockSize) are baked in; AIR damping stays ineligible, and
    the HC/LC spectrum curve folds linearly (same documented variant as
    prepare_folded_convolver).  EQ must be diagonal stereo (M/S bands
    mix channels) with AGC/saturation off, as in fused_eligible.
    """
    import numpy as np
    from ..ops.dc_blocker import dc_blocker_alphas
    from ..ops.scan_iir import _biquad_pole_radius
    from .convolver import StereoConvolverState
    from .nuc import nuc_prepare_uniform, plan_layers, spectrum_filter_gain
    from .output_filter import output_filter_coeffs, IDENTITY

    sr = cfg.sample_rate
    L = resolve_oversampling_factor(cfg.oversampling_factor, sr)
    if L == 1:
        return prepare_folded_convolver(ir_hf, block_size, spec, cfg,
                                        eq_params, eps, dtype, partition)
    if cfg.soft_clip_enabled:
        raise ValueError("soft clip is nonlinear; the OS chain cannot fold")
    if cfg.wet_dry_mix < 1.0:
        raise ValueError("wet/dry mixing does not fold (dry path bypasses "
                         "the conv)")
    proc = sr * L
    block_hf = block_size * L

    ir_hf = np.asarray(ir_hf, np.float64)
    if ir_hf.ndim == 1:
        ir_hf = np.stack([ir_hf, ir_hf])
    base = plan_layers(ir_hf.shape[-1], block_hf, spec)
    if any(lp.damping is not None for lp in base.layers):
        raise ValueError("AIR tail mode (per-layer damping) cannot be "
                         "folded into the IR")
    h_eff = ir_hf.copy()
    for lp in base.layers:
        if lp.gain != 1.0:
            h_eff[:, lp.offset:lp.offset + lp.length] *= lp.gain

    # ---- high-rate section: G_u * dc_os * [EQ] * h_eff * outfilt *
    # [HC/LC curve] * G_d, all sampled on one proc-rate DFT grid
    g_up = _os_composite_taps(make_stages(L, cfg.oversampling_preset), True)
    g_dn = _os_composite_taps(make_stages(L, cfg.oversampling_preset), False)

    eq_active = (not cfg.eq_bypassed) and eq_params is not None
    if eq_active:
        if eq_params.agc_enabled or float(eq_params.saturation) > 0.0:
            raise ValueError("AGC / saturated EQ is not LTI; cannot fold")
        from .eq import band_active_mask, STEREO, _eq_ring_tail_samples
        active = band_active_mask(eq_params)
        if not all(int(eq_params.modes[b]) == STEREO
                   for b in range(len(active)) if active[b]):
            raise ValueError("M/S EQ bands mix channels; one IR per "
                             "channel cannot fold them")

    # truncation: slowest pole among the 1 Hz oversampled DC blockers,
    # the output-filter biquads and the EQ ring tail, at the proc rate
    radii = [1.0 - a for a in dc_blocker_alphas(proc, 1.0)]
    ofc = output_filter_coeffs(proc)
    conv_is_last = not eq_active or cfg.order == EQ_THEN_CONVOLVER
    if conv_is_last:
        stages_of = [ofc["hc"][cfg.conv_hc_mode][0],
                     ofc["hc"][cfg.conv_hc_mode][1],
                     ofc["lc"][cfg.conv_lc_mode]]
    else:
        stages_of = [ofc["hpf"], ofc["lp"][cfg.eq_lpf_mode][0],
                     ofc["lp"][cfg.eq_lpf_mode][1]]
    for c in stages_of:
        if tuple(c) != IDENTITY:
            radii.append(_biquad_pole_radius(c[3], c[4]))
    eq_tail = _eq_ring_tail_samples(eq_params, proc, eps) if eq_active else 0
    rmax = min(max(radii), 1.0 - 1e-12)
    tail_hf = max(int(np.ceil(np.log(eps) / np.log(rmax))), eq_tail, 256)
    total_hf = (ir_hf.shape[-1] + len(g_up) + len(g_dn) + tail_hf)
    m = next_pow2(total_hf)
    w = 2.0 * np.pi * np.arange(m // 2 + 1) / m
    z = np.exp(1j * w)

    H = np.fft.rfft(g_up, m) * np.fft.rfft(g_dn, m)
    for a in dc_blocker_alphas(proc, 1.0):
        H *= (1.0 - a) * (z - 1.0) / (z - (1.0 - a))
    for c in stages_of:
        if tuple(c) != IDENTITY:
            b0, b1, b2, a1, a2 = c
            H *= (b0 * z * z + b1 * z + b2) / (z * z + a1 * z + a2)
    if eq_active:
        from .eq import _band_matrix_response
        freqs = np.arange(m // 2 + 1) * (proc / m)
        h11, _h12, _h21, _h22 = _band_matrix_response(eq_params, proc, freqs)
        H = H * h11
    if spec is not None and fold_spectrum_curve:
        # linear-grid variant of the per-partition circular HC/LC filter
        # (same documented divergence as prepare_folded_convolver);
        # fold_spectrum_curve=False pairs with a staged NUC prepared
        # apply_spectrum_filter=False for exactness tests
        H = H * spectrum_filter_gain(m, spec)
    Hc = np.fft.rfft(h_eff, m) * H            # (2, m//2+1)
    h_hf = np.fft.irfft(Hc, m)[:, :total_hf]
    h_dec = h_hf[:, ::L]                       # polyphase identity

    # ---- base-rate section: input + output 3 Hz DC blockers
    tail_b = max(int(np.ceil(np.log(eps) / np.log(min(
        [1.0 - a for a in dc_blocker_alphas(sr, 3.0)])))), 256)
    nb = h_dec.shape[-1] + tail_b
    mb = next_pow2(nb)
    wb = 2.0 * np.pi * np.arange(mb // 2 + 1) / mb
    zb = np.exp(1j * wb)
    Hb = np.ones(mb // 2 + 1, complex)
    for _ in range(2):
        for a in dc_blocker_alphas(sr, 3.0):
            Hb *= (1.0 - a) * (zb - 1.0) / (zb - (1.0 - a))
    combined = np.fft.irfft(np.fft.rfft(h_dec, mb) * Hb, mb)[:, :nb]

    if dtype is None:
        dtype = jnp.zeros(()).dtype
    if partition is not None:
        if partition == "auto":
            partition = throughput_partition_size(
                combined.shape[-1], f64=(jnp.dtype(dtype) == jnp.float64))
        cj = jnp.asarray(combined, dtype)
        return StereoConvolverState(
            left=nuc_prepare_uniform(cj[0], int(partition), block_size),
            right=nuc_prepare_uniform(cj[1], int(partition), block_size))
    from .convolver import stereo_prepare
    return stereo_prepare(jnp.asarray(combined, dtype), block_size, spec,
                          apply_spectrum_filter=False,
                          unit_layer_gains=True)


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
