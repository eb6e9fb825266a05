"""Non-Uniform Partitioned Convolution (NUC) engine — TPU-native rebuild.

Reproduces the reference MKLNonUniformConvolver's mathematical contract
(src/MKLNonUniformConvolver.h:17-31, .cpp:610-1110):

- 3-layer non-uniform partitioning:
    L0 partSize = nextPow2(max(blockSize, 64)), <= 32 partitions, immediate
    L1 partSize = L0 * mult (mult = tailL1L2Multiplier in [2,16], default 8),
       <= 64 partitions
    L2 partSize = L1 * mult, remaining tail (unbounded)
  Layer spans depend on tail mode: l0Len = clamp(round(tailStartSec*sr),
  l0Part, 32*l0Part) (cpp:745-751); tail disabled -> only L0 (up to 32 parts)
  and the rest of the IR is dropped.
- direct head: <= 32-tap time-domain FIR at zero delay; those taps are
  zeroed in the FFT path (cpp:693-733).
- per-layer partition spectra (2P-point real FFT of zero-padded partitions,
  scaled by `scale`), with the HC/LC spectrum filter (cpp:336-440) and — in
  Air-Absorption mode — a per-layer Gaussian HF damping e^{-c (f/fnyq)^2}
  (cpp:1062-1100) applied directly to the spectra (circular per-partition
  filtering, reproduced bit-for-bit by operating on the same FFT grid).
- per-layer output gains m_tailLayerGain (cpp:645-683) and delay alignment:
  layer li's output is delayed by the total IR span of preceding layers
  (B13, cpp:1005-1010, delayLineReadAdd :1639-1688).
- algorithm latency = L0 partSize (cpp:1057 m_latency) — with the engine
  block size equal to the L0 partition size the streamed output aligns at
  zero sample offset and equals exact linear convolution in steady state.

TPU-first: layers are three independent `uniform_partitioned_conv` calls
(batched frame FFT + depthwise causal frame-MAC), fully parallel; no rings,
no amortized tail scheduling — the offline form computes every tail
partition exactly instead of spreading MACs across callbacks.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax

import jax.numpy as jnp
import numpy as np

from ..ops.partitioned_conv import partition_spectra, uniform_partitioned_conv
from ..utils.dsputil import next_pow2

K_NUM_LAYERS = 3
K_L0_MAX_PARTS = 32   # MKLNonUniformConvolver.h:392
K_L1_MAX_PARTS = 64   # MKLNonUniformConvolver.h:393
K_MAX_DIRECT_TAPS = 32  # cpp:689

# HCMode / LCMode (src/OutputFilter.h:9-16)
HC_SHARP, HC_NATURAL, HC_SOFT = 0, 1, 2
LC_NATURAL, LC_SOFT = 0, 1
# tail modes (FilterSpec, MKLNonUniformConvolver.h:129)
TAIL_AIR_ABSORPTION, TAIL_CONTOUR, TAIL_BYPASS = 0, 1, 2


@dataclass
class FilterSpec:
    """Mirrors the reference FilterSpec (MKLNonUniformConvolver.h:123-133)."""
    sample_rate: float = 48000.0
    hc_mode: int = HC_NATURAL
    lc_mode: int = LC_NATURAL
    tail_mode: int = TAIL_CONTOUR
    tail_enabled: bool = True
    tail_start_seconds: float = 0.085
    tail_strength: float = 1.0
    tail_l1l2_multiplier: int = 8


@dataclass(frozen=True)
class NUCLayerPlan:
    offset: int        # IR offset of this layer's segment
    length: int        # segment length in samples
    part_size: int
    num_parts: int     # ceil(length / part_size)
    gain: float        # m_tailLayerGain for this layer
    damping: float | None  # air-absorption damping coeff (None = off)


@dataclass(frozen=True)
class NUCPlan:
    """Host-side layer layout (the SetImpulse sizing logic, cpp:738-768)."""
    layers: tuple
    direct_taps: int
    latency: int
    block_size: int
    ir_len: int

    @property
    def num_layers(self):
        return len(self.layers)


def plan_layers(ir_len: int, block_size: int, spec: FilterSpec,
                enable_direct_head: bool = False) -> NUCPlan:
    """Layer sizing — exact parity with SetImpulse (cpp:624-768, 1062-1075)."""
    tail_mode = int(np.clip(spec.tail_mode, 0, 2))
    tail_enabled = (tail_mode != TAIL_BYPASS) and spec.tail_enabled
    sr = spec.sample_rate
    tail_start = float(np.clip(spec.tail_start_seconds, 0.01, 0.80))
    user_strength = float(np.clip(spec.tail_strength, 0.0, 2.0))
    mult = int(np.clip(spec.tail_l1l2_multiplier, 2, 16))
    strength01 = min(max(user_strength * 0.5, 0.0), 1.0)

    if not tail_enabled:
        l1_gain = l2_gain = 0.0
    elif tail_mode == TAIL_AIR_ABSORPTION:
        tail_start = float(np.clip(max(tail_start, 0.055), 0.01, 0.80))
        mult = int(np.clip(max(mult, 6), 2, 16))
        strength = float(np.clip(user_strength, 0.0, 2.0))
        l1_gain = float(np.clip(strength * (0.95 - 0.25 * strength01), 0.0, 2.0))
        l2_gain = float(np.clip(strength * (0.80 - 0.45 * strength01), 0.0, 2.0))
    elif tail_mode == TAIL_CONTOUR:
        tail_start = float(np.clip(max(tail_start, 0.12), 0.01, 0.80))
        strength = float(np.clip(max(user_strength, 1.25), 0.0, 2.0))
        mult = int(np.clip(max(mult, 8), 2, 16))
        l1_gain = float(np.clip(strength * (1.05 + 0.20 * strength01), 0.0, 2.0))
        l2_gain = float(np.clip(strength * (0.82 + 0.12 * strength01), 0.0, 2.0))
    else:
        l1_gain = l2_gain = 0.0

    l0_part = next_pow2(max(block_size, 64))
    l1_part = l0_part * mult
    l2_part = l1_part * mult

    l0_max_len = K_L0_MAX_PARTS * l0_part
    l0_by_tail = int(round(tail_start * sr))
    l0_target = int(np.clip(l0_by_tail, l0_part, l0_max_len))
    l0_len = min(ir_len, l0_target if tail_enabled else l0_max_len)

    l1_len = max(0, min(ir_len - l0_len, K_L1_MAX_PARTS * l1_part)) if tail_enabled else 0
    l2_len = max(0, ir_len - l0_len - l1_len) if tail_enabled else 0

    # Air-absorption HF damping coefficients (cpp:1063-1072)
    if tail_enabled and tail_mode == TAIL_AIR_ABSORPTION:
        start_norm = float(np.clip(tail_start / 0.085, 0.65, 1.55))
        damping_base = (0.35 + 1.10 * strength01) * start_norm
        dampings = [None, damping_base * 1.0, damping_base * 1.6]
    else:
        dampings = [None, None, None]

    cfg = [(0, l0_len, l0_part, 1.0, dampings[0]),
           (l0_len, l1_len, l1_part, l1_gain, dampings[1]),
           (l0_len + l1_len, l2_len, l2_part, l2_gain, dampings[2])]
    layers = tuple(NUCLayerPlan(offset=o, length=ln, part_size=p,
                                num_parts=-(-ln // p), gain=g, damping=d)
                   for (o, ln, p, g, d) in cfg if ln > 0)

    direct_part = next_pow2(max(block_size, 64))
    direct_taps = (min(ir_len, min(direct_part, K_MAX_DIRECT_TAPS))
                   if enable_direct_head else 0)

    return NUCPlan(layers=layers, direct_taps=direct_taps,
                   latency=l0_part, block_size=block_size, ir_len=ir_len)


def spectrum_filter_gain(fft_size: int, spec: FilterSpec) -> np.ndarray:
    """HC/LC gain curve on one layer's FFT grid (applySpectrumFilter,
    cpp:336-440).  Host NumPy (exact libm)."""
    fs = spec.sample_rate
    nyq = fs * 0.5
    n = fft_size
    half = n // 2
    csize = half + 1
    gain = np.ones(csize)

    hc_start = 18000.0 if fs <= 48000.0 else 22000.0
    k_start = int(round(hc_start * n / fs))
    k_end = min(half, int(round(nyq * n / fs)))
    k = np.arange(csize)
    in_roll = (k > k_start) & (k <= k_end)
    x = (k - k_start) / max(1, (k_end - k_start))
    if spec.hc_mode == HC_SHARP:
        roll = 1.0 / np.sqrt(1.0 + np.power(x, 8.0))
    elif spec.hc_mode == HC_NATURAL:
        roll = 0.5 * (1.0 + np.cos(np.pi * x))
    else:
        roll = np.exp(-4.60517 * x * x)
    gain = np.where(in_roll, roll, gain)

    lc_end_f = 6.0 if spec.lc_mode == LC_SOFT else 8.0
    lc_start_f = 15.0 if spec.lc_mode == LC_SOFT else 18.0
    k_lc_end = int(round(lc_end_f * n / fs))
    k_lc_start = int(round(lc_start_f * n / fs))
    gain = np.where(k <= k_lc_end, 0.0, gain)
    ramp_zone = (k > k_lc_end) & (k < k_lc_start)
    xr = (k - k_lc_end) / max(1, k_lc_start - k_lc_end)
    g_lc = 0.5 * (1.0 - np.cos(np.pi * xr))
    gain = np.where(ramp_zone, gain * g_lc, gain)
    return gain


def air_absorption_gain(fft_size: int, damping: float) -> np.ndarray:
    """Per-layer HF damping e^{-c x^2}, x = k/(csize-1) (cpp:1080-1090)."""
    csize = fft_size // 2 + 1
    x = np.arange(csize) / max(1, csize - 1)
    return np.exp(-damping * x * x)


@dataclass
class NUCState:
    """Prepared NUC instance: plan + device-side spectra + direct head.

    Registered as a JAX pytree (plan static, arrays as leaves) so prepared
    states are passed as jit ARGUMENTS rather than closure constants —
    closure-captured device arrays would be read back to host for constant
    embedding, which some TPU runtimes don't support for complex dtypes.
    """
    plan: NUCPlan
    layer_spectra: list        # per layer: (num_parts, P+1) complex
    direct_ir: jnp.ndarray | None


def _nuc_flatten(s: NUCState):
    return ((s.layer_spectra, s.direct_ir), s.plan)


def _nuc_unflatten(plan, children):
    spectra, direct = children
    return NUCState(plan=plan, layer_spectra=spectra, direct_ir=direct)


jax.tree_util.register_pytree_node(NUCState, _nuc_flatten, _nuc_unflatten)


def nuc_prepare(ir, block_size: int, spec: FilterSpec | None = None,
                scale: float = 1.0, enable_direct_head: bool = False,
                apply_spectrum_filter: bool = True,
                unit_layer_gains: bool = False) -> NUCState:
    """SetImpulse equivalent: partition the IR, precompute filtered spectra.

    ir: (N,) mono float64 (one NUCState per channel, as the reference runs
    one MKLNonUniformConvolver instance per channel).

    unit_layer_gains=True keeps the layer SIZING but forces every layer's
    contour gain to 1.0, making the NUC a plain (exact) linear convolution
    with `ir` — for callers that pre-bake the contour gains into the IR
    itself (chain.prepare_folded_convolver).
    """
    if spec is None:
        spec = FilterSpec()
        apply_spectrum_filter = False
    plan = plan_layers(int(np.shape(ir)[-1]), block_size, spec,
                       enable_direct_head)
    if unit_layer_gains:
        from dataclasses import replace as _dc_replace
        plan = _dc_replace(plan, layers=tuple(
            _dc_replace(lp, gain=1.0) for lp in plan.layers))

    ir = jnp.asarray(ir)
    direct_ir = None
    ir_fft = ir
    if plan.direct_taps > 0:
        direct_ir = ir[:plan.direct_taps] * scale
        ir_fft = ir_fft.at[:plan.direct_taps].set(0.0)

    spectra = []
    for lp in plan.layers:
        seg = ir_fft[lp.offset:lp.offset + lp.length]
        H = partition_spectra(seg, lp.part_size, lp.num_parts, dtype=ir.dtype)
        gain = np.ones(lp.part_size + 1)
        if scale != 1.0:
            gain = gain * scale
        if apply_spectrum_filter:
            gain = gain * spectrum_filter_gain(2 * lp.part_size, spec)
        if lp.damping is not None:
            gain = gain * air_absorption_gain(2 * lp.part_size, lp.damping)
        g = jnp.asarray(gain, jnp.float64 if isinstance(H, tuple)
                        else ir.dtype)
        if isinstance(H, tuple):
            # split re/im planes (dd/f64 accelerator mode): real gain
            # applies to both planes
            H = (H[0] * g, H[1] * g)
        else:
            H = H * g
        spectra.append(H)
    return NUCState(plan=plan, layer_spectra=spectra, direct_ir=direct_ir)


def nuc_prepare_uniform(ir, part_size: int, block_size: int = 512) -> NUCState:
    """Single-layer uniform plan: plain exact partitioned convolution.

    The offline throughput plan (models/chain.py::throughput_partition_size):
    one uniform layer, unit gain, no spectrum filter — for callers that have
    already baked every gain/filter into `ir` itself (the folded
    static-config mode).  Any partitioning computes the same linear
    convolution; this one minimizes passes over the signal on TPU."""
    ir = jnp.asarray(ir)
    n = int(np.shape(ir)[-1])
    nparts = -(-n // part_size)
    plan = NUCPlan(
        layers=(NUCLayerPlan(offset=0, length=n, part_size=part_size,
                             num_parts=nparts, gain=1.0, damping=None),),
        direct_taps=0, latency=part_size, block_size=block_size, ir_len=n)
    H = partition_spectra(ir, part_size, nparts, dtype=ir.dtype)
    return NUCState(plan=plan, layer_spectra=[H], direct_ir=None)


def tail_delivery_map(part_size: int, block_size: int, num_parts: int,
                      out_delay: int, nblocks: int) -> np.ndarray:
    """Discrete-event model of the reference's B13 tail delivery protocol.

    The reference does NOT deliver L1/L2 tail output at the mathematically
    exact convolution position.  Each tail layer is an overlap-save FDL on
    its own partition clock whose MAC is amortized over callbacks
    (partsPerCallback, MKLNonUniformConvolver.cpp:988-993, 1500-1545); the
    completed partSize chunk is pushed into a delay ring (delayLineWrite)
    and Get() reads it back with readCursor = max(readCursor,
    writeCursor - outputDelaySamples) where outputDelaySamples = total IR
    length of preceding layers (cpp:1005-1010, 1659-1689).  Because the
    read clamp only ever applies when the writer is AHEAD, the steady-state
    delivery offset is set by the write schedule, not by
    outputDelaySamples: chunk m (covering conv output [m*P,(m+1)*P) of the
    layer's segment) is written in callback
    (m+1)*blocksPerPart - 1 + (macCallbacks-1), and reads then proceed
    contiguously.  Net effect (verified against the compiled reference
    with Dirac probes, tests/test_ref_vectors.py): every tail layer
    arrives at a CONSTANT shift vs the exact position — e.g. +1408
    samples late for a 64-partition L1, 230528 samples EARLY for the L2
    of a 600k-tap IR (block 512).

    `nuc_convolve(..., tail_delivery="reference")` applies this map so a
    full-stream A/B diff against the reference binary is possible on
    3-layer configs; the exact mode places every layer at the true
    convolution offset instead (PARITY.md "tail delivery seam").

    Returns an int64 array mapping output sample index -> index into the
    layer's exact convolution (or -1 where the reference delivers
    nothing, i.e. warmup stalls / clamp drops).
    """
    part, block = part_size, block_size
    bpp = -(-part // block)                       # blocksPerPart
    ppc = min(num_parts, max(1, -(-num_parts // bpp)))
    macs = -(-num_parts // ppc)                   # callbacks per chunk MAC
    writes = {}
    m = 0
    while True:
        wb = (m + 1) * bpp - 1 + (macs - 1)
        if wb >= nblocks:
            break
        writes[wb] = writes.get(wb, 0) + part
        m += 1
    out = np.full(nblocks * block, -1, dtype=np.int64)
    wc = 0
    rc = 0
    for b in range(nblocks):
        wc += writes.get(b, 0)
        start = max(rc, max(0, wc - out_delay))
        if start + block <= wc:
            out[b * block:(b + 1) * block] = np.arange(start, start + block)
            rc = start + block
    return out


def nuc_convolve(x, state: NUCState, tail_delivery: str = "exact"):
    """Offline NUC convolution of x (..., N) -> (..., N).

    Steady-state-exact equivalent of streaming Add/Get with blockSize equal
    to the L0 partition size: layer li contributes
      gain_li * OS_conv(x, H_li)[n - offset_li]
    and the direct head contributes at zero delay.  (The real-time engine's
    warmup transient — ring/delay-line fill — is not reproduced; offline the
    convolution is exact from sample 0.)

    tail_delivery="reference" is the opt-in compat mode: tail layers are
    delivered on the reference's amortized write/read-clamp schedule
    (`tail_delivery_map`) instead of at the exact offset, reproducing the
    reference binary's streamed output sample-for-sample (including its
    constant per-layer delivery shifts and warmup drops) for A/B diffs.
    Samples past the last whole plan block get no tail contribution, as
    in the reference (a partial Get never completes a block read).
    """
    if tail_delivery not in ("exact", "reference"):
        raise ValueError(f"tail_delivery: {tail_delivery!r}")
    x = jnp.asarray(x)
    n = x.shape[-1]
    y = jnp.zeros_like(x)
    for li, (lp, H) in enumerate(zip(state.plan.layers,
                                     state.layer_spectra)):
        yl = uniform_partitioned_conv(x, H, lp.part_size)
        if tail_delivery == "reference" and li > 0:
            block = state.plan.block_size
            mp = np.full(n, -1, np.int64)
            nb = n // block
            mp[:nb * block] = tail_delivery_map(
                lp.part_size, block, lp.num_parts, lp.offset, nb)
            valid = jnp.asarray(mp >= 0)
            yl = jnp.where(valid, jnp.take(yl, jnp.asarray(
                np.maximum(mp, 0)), axis=-1), 0.0)
        elif lp.offset > 0:
            yl = jnp.pad(yl, [(0, 0)] * (x.ndim - 1) + (
                [(lp.offset, 0)]))[..., :n]
        y = y + (lp.gain * yl if lp.gain != 1.0 else yl)
    if state.direct_ir is not None:
        # <=32-tap head as a shift-accumulate (fuses to one elementwise
        # pass; stacking K shifted copies would materialize K times the
        # signal).  Taps stay traced: the NUC state is a jit argument.
        K = state.direct_ir.shape[0]
        h = state.direct_ir
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(K - 1, 0)])
        yd = h[0] * x
        for j in range(1, K):
            yd = yd + h[j] * xp[..., K - 1 - j:K - 1 - j + n]
        y = y + yd
    return y
