"""Streaming (serving) runtime: block-at-a-time processing with state.

The real-time analog of the reference's audio callback path (SURVEY.md
§3.1): one jitted `streaming_step(state, block)` advances a batch of
independent streams by `block_size` samples, carrying all DSP state
functionally — the TPU-native replacement for the reference's per-thread
mutable state + RCU handoff.  Throughput comes from the stream batch; the
step is identical every call (static shapes, `lax.cond` only on the tail
layers' frame clocks).

State carried (mirrors DSPCore's detached runtime states,
AudioEngine.h:849-898): DC blocker states, EQ band filter states
(NUM_BANDS x 4 x 2), per-channel NUC layer states (overlap-save frame,
FDL ring, input accumulator, aligned output ring, frame counter),
output-filter biquad states, block counter.

Constraints:
- block_size must equal the NUC L0 partition size (pow2 engine block);
- tail layers fire every (P_l / P_0) steps via `lax.cond`;
- tail-layer alignment requires offset_l >= part_size_l (holds for the
  standard tail-mode configs; the reference DROPS contributions in the
  violating corner, see MKLNonUniformConvolver delayLineReadAdd skip).

Exactness: consecutive `streaming_step` calls equal the offline
`nuc_convolve`/EQ scan outputs in steady state; tail-layer contributions
begin after their first complete frame (warmup zeros, like the reference).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eq import EQParams, band_active_mask, NUM_BANDS
from ..models.eq import STEREO, LEFT, RIGHT, MID, SERIAL
from ..models.nuc import NUCState
from ..models.output_filter import output_filter_coeffs, IDENTITY
from ..ops.dc_blocker import dc_blocker_alphas
from ..ops.softclip import soft_clip, soft_clip_params
from ..ops.svf import svf_coeffs, svf_process
from ..ops.scan_iir import affine_scan_2x2, biquad_df2t_scan
from ..utils.dsputil import equal_power_sin, K_OUTPUT_HEADROOM
from ..models.convolver import CONVOLUTION_HEADROOM_GAIN
from ..models.gain_planner import CONVOLVER_THEN_EQ


# ---------------------------------------------------------------- ring ops

def _ring_write(ring, data, pos):
    """Circular write of `data` (static length L) at traced pos."""
    n = ring.shape[-1]
    L = data.shape[-1]
    doubled = jnp.concatenate([ring, ring], axis=-1)
    doubled = jax.lax.dynamic_update_slice_in_dim(doubled, data, pos, axis=-1)
    first = doubled[..., :n]
    second = doubled[..., n:]
    wrap_len = jnp.maximum(pos + L - n, 0)
    return jnp.where(jnp.arange(n) < wrap_len, second, first)


def _ring_read(ring, pos, L):
    """Aligned ring read: the serving path reads at pos = step*L mod n
    with n a power-of-two multiple of L, so the read NEVER wraps — one
    dynamic slice, no ring doubling (the doubled-copy form cost ~8 MB of
    copies per step on a 1M-tap IR's L2 ring)."""
    return jax.lax.dynamic_slice_in_dim(ring, pos, L, axis=-1)


# ------------------------------------------------------------- NUC layers

@dataclass
class StreamLayerState:
    """FDL spectra are carried as SPLIT re/im real arrays: the tunneled
    TPU backend has no complex dynamic_update_slice / lax.cond, and the
    split form matches the grid layout of ops/pallas_gemm_fft."""
    prev: jnp.ndarray       # (..., P) previous overlap-save frame
    fdl_r: jnp.ndarray      # (..., numParts, P+1) real plane, ring:
    fdl_i: jnp.ndarray      #   slot (k mod numParts) holds frame k
    acc: jnp.ndarray        # (..., P) input accumulation buffer
    ring: jnp.ndarray       # (..., ring_len) aligned output ring (tail)
    step: jnp.ndarray       # () int32 block counter
    par_r: jnp.ndarray      # (..., P+1) amortized partial MAC (j >= 1
    par_i: jnp.ndarray      #   terms of the NEXT completing frame);
    #                         (..., 0) for L0, which fires every block


jax.tree_util.register_pytree_node(
    StreamLayerState,
    lambda s: ((s.prev, s.fdl_r, s.fdl_i, s.acc, s.ring, s.step,
                s.par_r, s.par_i), None),
    lambda _, c: StreamLayerState(*c))


def _layer_init(batch, lp, block_size, rdt, sdt=None):
    """sdt: FDL spectra storage dtype (default rdt).  f16 halves the
    dominant per-stream state (~16 MB -> ~8 MB at 1M taps) with a
    10-bit-mantissa floor (~-66 dB per stored frame, at the f32 chain
    floor) — the serving-scale tier (SURVEY.md §2.6 thousands-of-streams
    premise); the MAC always accumulates in rdt."""
    sdt = rdt if sdt is None else sdt
    ring_len = 1
    ratio = lp.part_size // block_size
    if lp.offset > 0:
        if lp.offset < lp.part_size:
            raise ValueError(
                f"streaming tail layer needs offset ({lp.offset}) >= "
                f"part_size ({lp.part_size}); the reference drops these "
                "contributions — use the offline path for this config")
        ring_len = int(2 ** int(np.ceil(np.log2(lp.offset + 2 * lp.part_size))))
    nbins = lp.part_size + 1 if ratio > 1 else 0
    return StreamLayerState(
        prev=jnp.zeros(batch + (lp.part_size,), rdt),
        fdl_r=jnp.zeros(batch + (lp.num_parts, lp.part_size + 1), sdt),
        fdl_i=jnp.zeros(batch + (lp.num_parts, lp.part_size + 1), sdt),
        acc=jnp.zeros(batch + (lp.part_size,), rdt),
        ring=jnp.zeros(batch + (ring_len,), rdt),
        step=jnp.zeros((), jnp.int32),
        par_r=jnp.zeros(batch + (nbins,), rdt),
        par_i=jnp.zeros(batch + (nbins,), rdt),
    )


def _fdl_mac_ri(fr, fi, Hr, Hi):
    """Y = sum_p fdl[p] * H[p], split re/im (the accumulateSplitComplex
    loop, MKLNonUniformConvolver.cpp:167-182).  FDL planes may be stored
    narrower than H (f16 serving tier); accumulate in H's dtype."""
    fr = fr.astype(Hr.dtype)
    fi = fi.astype(Hr.dtype)
    Yr = jnp.sum(fr * Hr - fi * Hi, axis=-2)
    Yi = jnp.sum(fr * Hi + fi * Hr, axis=-2)
    return Yr, Yi


def _fdl_ring_update_mac(fdl_r, fdl_i, Xr, Xi, Hr, Hi, k):
    """Write frame-k spectrum into its FDL ring slot and run the MAC.

    The FDL is a RING over partition slots — slot (k mod numParts) holds
    frame k — not a newest-first shift register: shifting materializes a
    full new (batch, numParts, bins) FDL copy every frame (the dominant
    per-stream state, ~16 MB for a 1M-tap IR), while the ring write is a
    one-slot dynamic_update_slice that XLA performs in place on donated
    state.  The MAC compensates by gathering H rotated to the ring
    phase: slot q holds frame k-((k-q) mod P), so its partition spectrum
    is H[(k-q) mod P].  Unwritten warmup slots are zero, matching the
    reference's silent FDL start.
    """
    num_parts = fdl_r.shape[-2]
    w = jnp.mod(k, num_parts)
    fr = jax.lax.dynamic_update_slice_in_dim(
        fdl_r, Xr[..., None, :].astype(fdl_r.dtype), w, axis=-2)
    fi = jax.lax.dynamic_update_slice_in_dim(
        fdl_i, Xi[..., None, :].astype(fdl_i.dtype), w, axis=-2)
    idx = jnp.mod(k - jnp.arange(num_parts), num_parts)
    Yr, Yi = _fdl_mac_ri(fr, fi, Hr[..., idx, :], Hi[..., idx, :])
    return fr, fi, Yr, Yi


def _layer_step(state: StreamLayerState, block, Hri, lp, block_size, gain):
    """Advance one NUC layer by one engine block and return its output.

    Hri: (Hr, Hi) split partition spectra."""
    p = lp.part_size
    ratio = p // block_size
    Hr, Hi = Hri
    # the dd serving tier: XLA:TPU has no complex128, so f64 streaming
    # transforms route through the split-plane GEMM DFTs (same seam the
    # offline dd path uses, ops/partitioned_conv.py)
    dd = (block.dtype == jnp.float64
          and jax.default_backend() not in ("cpu",))

    def fft_split(osa):
        if dd:
            from ..ops.gemm_fft import rfft_gemm
            return rfft_gemm(osa, p)
        X = jnp.fft.rfft(osa, axis=-1)
        return jnp.real(X), jnp.imag(X)

    def irfft_half(Yr, Yi):
        if dd:
            from ..ops.gemm_fft import irfft_valid_gemm
            return irfft_valid_gemm(Yr, Yi, p)
        Y = jax.lax.complex(Yr, Yi)
        return jnp.fft.irfft(Y, n=2 * p, axis=-1)[..., p:]

    if ratio == 1 and lp.offset == 0:
        # L0: immediate (processLayerBlock)
        osa = jnp.concatenate([state.prev, block], axis=-1)
        Xr, Xi = fft_split(osa)
        fr, fi, Yr, Yi = _fdl_ring_update_mac(
            state.fdl_r, state.fdl_i, Xr, Xi, Hr, Hi, state.step)
        y = irfft_half(Yr, Yi)
        return StreamLayerState(prev=block, fdl_r=fr, fdl_i=fi,
                                acc=state.acc, ring=state.ring,
                                step=state.step + 1,
                                par_r=state.par_r, par_i=state.par_i), \
            gain * y

    slot = jnp.mod(state.step, ratio)
    acc = jax.lax.dynamic_update_slice_in_dim(
        state.acc, block, slot * block_size, axis=-1)
    frame_done = jnp.equal(slot, ratio - 1)
    ring_len = state.ring.shape[-1]
    num_parts = lp.num_parts

    # ----- amortized tail MAC (the partsPerCallback analog,
    # MKLNonUniformConvolver.cpp:991-993,1497-1545): the completing
    # frame's output Y_k = sum_j X_{k-j} H_j needs only j=0 (the frame
    # itself) at fire time — every j >= 1 term uses an ALREADY-KNOWN
    # frame spectrum, so a ppc-partition chunk of them is accumulated on
    # EACH of the frame's ratio block-steps instead of all at once on
    # the firing block.  Per-block tail cost becomes ~num_parts/ratio
    # partitions + (FFT + j0 + IFFT) on the boundary, flattening the
    # p99/median wall ratio the all-at-once form spikes.
    k_cur = state.step // ratio           # frame currently accumulating
    ppc = -(-(num_parts - 1) // ratio) if num_parts > 1 else 0
    if ppc:
        j0 = 1 + slot * ppc
        js = j0 + jnp.arange(ppc)
        valid = (js < num_parts)[..., None]
        # FDL ring slot of frame k_cur - j  (warmup slots hold zeros)
        w = jnp.mod(k_cur - js, num_parts)
        fr_c = jnp.take(state.fdl_r, w, axis=-2)
        fi_c = jnp.take(state.fdl_i, w, axis=-2)
        hr_c = jnp.where(valid, jnp.take(Hr, jnp.minimum(
            js, num_parts - 1), axis=-2), 0)
        hi_c = jnp.where(valid, jnp.take(Hi, jnp.minimum(
            js, num_parts - 1), axis=-2), 0)
        cYr, cYi = _fdl_mac_ri(fr_c, fi_c, hr_c, hi_c)
        par_r = state.par_r + cYr
        par_i = state.par_i + cYi
    else:
        par_r, par_i = state.par_r, state.par_i

    def fire(_):
        osa = jnp.concatenate([state.prev, acc], axis=-1)
        Xr, Xi = fft_split(osa)
        # frame index k: this frame holds local samples [k*p, (k+1)*p);
        # aligned stream position = k*p + offset
        k = (state.step + 1) // ratio - 1
        w0 = jnp.mod(k, num_parts)
        fr = jax.lax.dynamic_update_slice_in_dim(
            state.fdl_r, Xr[..., None, :].astype(state.fdl_r.dtype), w0,
            axis=-2)
        fi = jax.lax.dynamic_update_slice_in_dim(
            state.fdl_i, Xi[..., None, :].astype(state.fdl_i.dtype), w0,
            axis=-2)
        # j = 0 term + the amortized j >= 1 partial
        Yr = par_r + (Xr * Hr[..., 0, :] - Xi * Hi[..., 0, :])
        Yi = par_i + (Xr * Hi[..., 0, :] + Xi * Hr[..., 0, :])
        y = irfft_half(Yr, Yi)
        pos = jnp.mod(k * p + lp.offset, ring_len)
        return (acc, fr, fi, _ring_write(state.ring, y, pos),
                jnp.zeros_like(par_r), jnp.zeros_like(par_i))

    def hold(_):
        return (state.prev, state.fdl_r, state.fdl_i, state.ring,
                par_r, par_i)

    prev, fr, fi, ring, npr, npi = jax.lax.cond(frame_done, fire, hold,
                                                None)

    read_pos = jnp.mod(state.step * block_size, ring_len)
    out = _ring_read(ring, read_pos, block_size)
    return StreamLayerState(prev=prev, fdl_r=fr, fdl_i=fi, acc=acc,
                            ring=ring, step=state.step + 1,
                            par_r=npr, par_i=npi), gain * out


# ------------------------------------------------------------- full chain

@dataclass
class StreamState:
    """All carried state for a batch of streams."""
    dc_in: jnp.ndarray        # (..., 2, 2)
    dc_out: jnp.ndarray       # (..., 2, 2)
    eq_states: jnp.ndarray    # (..., NUM_BANDS, 4, 2)
    conv_layers: tuple        # ((left layers...), (right layers...))
    of_states: jnp.ndarray    # (..., 2, 3, 2)  [channel][biquad stage]
    direct_hist: tuple | None # ((..., K-1) per channel) or None
    sc_up_hist: jnp.ndarray | None   # (..., 2, H_up) soft-clip OS history
    sc_down_hist: jnp.ndarray | None # (..., 2, H_dn)
    os_up_hists: tuple        # per-stage (..., 2, H) upsampler FIR history
    os_down_hists: tuple      # per-stage (..., 2, H) decimator history
    dc_os: jnp.ndarray | None # (..., 2, 2) oversampled-rate DC blockers
    agc: jnp.ndarray | None   # (..., 3) [env_in, env_out, gain]
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    StreamState,
    lambda s: ((s.dc_in, s.dc_out, s.eq_states, s.conv_layers, s.of_states,
                s.direct_hist, s.sc_up_hist, s.sc_down_hist, s.os_up_hists,
                s.os_down_hists, s.dc_os, s.agc, s.step), None),
    lambda _, c: StreamState(*c))


def _stage_hist_sizes(st):
    """History lengths for block-stateful upsample2/downsample2 of one
    halfband stage: enough input past to make the causal FIRs exact."""
    h_up = max(len(st.conv) - 1, st.center_delay)
    h_dn = max(st.center_tap, st.conv_parity + 2 * (len(st.conv) - 1))
    h_dn += h_dn % 2       # even: keeps the decimator grid aligned
    return h_up, h_dn


class StreamingChain:
    """Compiled block-at-a-time chain for a fixed config + prepared IR.

    Supports: input headroom + DC blockers, 2x/4x/8x oversampling
    (stateful halfband cascades + oversampled-rate DC blockers), 20-band
    EQ (scan path, all channel modes, serial/parallel), stereo NUC
    convolution with wet/dry mix and direct head, output filter, makeup
    gain, soft clip (at the oversampled rate when os > 1, local 2x wrap
    at base rate), output DC + headroom.

    Block contract: `step` consumes BASE-rate blocks of `block_size`
    samples; internally the DSP runs at base * os_factor.  With a
    convolver, its L0 partition (plan.latency) must equal
    block_size * os_factor (the engine prepares it at the processing
    rate for oversampled configs, like the reference's oversampled IR).
    """

    def __init__(self, cfg, eq_params: EQParams | None,
                 conv_state: NUCState | None = None,
                 conv_state_r: NUCState | None = None, dtype=jnp.float32,
                 donate_state: bool = False, fdl_dtype=None,
                 folded: bool = False):
        from ..models.chain import resolve_oversampling_factor
        from ..ops.oversample import make_stages
        self.cfg = cfg
        self.eq_params = eq_params
        # folded serving mode: the LTI stages around the convolver (input/
        # output DC blockers, EQ, output filter) were baked into the IR at
        # rebuild time (models.chain.prepare_folded_convolver with the
        # 3-layer streaming plan), so the per-block step skips their scans
        # entirely — the streaming analog of the offline folded chain and
        # of the reference's rebuild-time spectrum precompute
        # (MKLNonUniformConvolver.cpp:336-440).  Construct via
        # `StreamingChain.folded_from_ir`, which checks eligibility.
        self._folded = bool(folded)
        if self._folded:
            if eq_params is not None:
                raise ValueError("folded streaming: the EQ is baked into "
                                 "the IR — pass eq_params=None")
            if cfg.soft_clip_enabled or conv_state is None:
                raise ValueError("folded streaming needs an active "
                                 "convolver and no soft clip (see "
                                 "models.chain.fused_eligible)")
        self.left = conv_state
        self.right = conv_state_r if conv_state_r is not None else conv_state
        self.dtype = dtype
        # fdl_dtype=jnp.float16 halves the dominant per-stream state
        # (stored FDL spectra) for the high-stream-count serving tier;
        # the MAC still accumulates in `dtype` (see _fdl_mac_ri)
        self.fdl_dtype = dtype if fdl_dtype is None else fdl_dtype
        self.os_factor = resolve_oversampling_factor(
            cfg.oversampling_factor, cfg.sample_rate)
        self.os_stages = (make_stages(self.os_factor, cfg.oversampling_preset)
                          if self.os_factor > 1 else [])
        self._os_hists = tuple(_stage_hist_sizes(st) for st in self.os_stages)
        internal_block = (conv_state.plan.latency if conv_state is not None
                          else 512 * self.os_factor)
        if internal_block % self.os_factor:
            raise ValueError("convolver block must be divisible by the "
                             "oversampling factor")
        self.block_size = internal_block // self.os_factor  # base-rate block
        self._sc_stage = None
        self._sc_hists = (0, 0)
        if cfg.soft_clip_enabled and self.os_factor == 1:
            from ..ops.oversample import design_halfband
            st = design_halfband(31, 90.0)   # prepareSingleStage (local 2x OS)
            self._sc_stage = st
            self._sc_hists = _stage_hist_sizes(st)
        # prepared spectra ride as jit ARGUMENTS (complex constants would
        # need a device->host readback the TPU runtime lacks), split into
        # re/im real planes (no complex control flow on the TPU path)
        def split_H(H):
            if isinstance(H, tuple):
                return H                      # dd mode: already split
            return (jnp.real(H), jnp.imag(H))

        if self.left is not None:
            direct = None
            if self.left.plan.direct_taps > 0:
                direct = (self.left.direct_ir, self.right.direct_ir)
            self._conv_args = (
                (tuple(split_H(H) for H in self.left.layer_spectra),
                 tuple(split_H(H) for H in self.right.layer_spectra)),
                direct)
        else:
            self._conv_args = ((None, None), None)
        # donate_state=True lets XLA update the carried StreamState in
        # place (the FDL spectra dominate: ~16 MB/stream for a 1M-tap IR,
        # so two live copies halve the stream capacity of a 16 GB chip).
        # Safe for serving loops that always overwrite their state
        # (st, y = chain.step(st, x)); donation is ignored on CPU.
        self._donate = (0,) if donate_state else ()
        self._step = jax.jit(self._make_step(), donate_argnums=self._donate)
        self._multi = None

    # ----------------------------------------------------- folded build
    @classmethod
    def folded_from_ir(cls, cfg, eq_params: EQParams | None, ir, spec,
                       block_size: int = 512, dtype=jnp.float32,
                       donate_state: bool = False, fdl_dtype=None,
                       eps: float = 1e-10,
                       partition: int | None = None) -> "StreamingChain":
        """Build a FOLDED streaming chain: bake the LTI stages (DC
        blockers, EQ, output filter, HC/LC curve) into the IR itself at
        rebuild time, then stream with the reference's 3-layer plan — the
        per-block step collapses to sanitize -> scalar gains -> NUC ->
        scalar gains, with the same L0-partition latency contract as the
        staged step.  This is the serving analog of the offline folded
        mode (models.chain.prepare_folded_convolver): at high stream
        counts the staged step's 20 sequential EQ band scans + DC +
        output-filter scans dominate the per-block wall, and folding
        removes all of them.

        Eligibility = models.chain.fused_eligible: wet-only mix, no soft
        clip / AGC / oversampling, stereo-only EQ bands, non-AIR tail.
        Exactness: the fusion itself is exact to the prefilter truncation
        (~7e-12 f64); streaming == offline folded chain in steady state
        (tests/test_streaming.py::test_streaming_folded_*).

        partition: None keeps the reference 3-layer latency plan (block-
        size algorithm latency).  An int builds the SINGLE-LAYER plan at
        that partition — the 'bigblock' windowed serving tier: algorithm
        latency grows to the partition, but the FDL state is re-read once
        per partition instead of once per block (Mx less HBM bandwidth),
        which is what holds 512+ concurrent streams xrun-free
        (tools/serving_bench.py --frontier; layer gains still bake at
        `block_size`, so audio is identical to the other tiers)."""
        from ..models.chain import fused_eligible, prepare_folded_convolver
        if not fused_eligible(cfg, eq_params, True):
            raise ValueError("config is not fused-eligible (see "
                             "models.chain.fused_eligible): needs wet-only "
                             "mix, no soft clip/AGC/oversampling, "
                             "stereo-only EQ bands")
        st = prepare_folded_convolver(ir, block_size, spec, cfg, eq_params,
                                      eps=eps, dtype=dtype,
                                      partition=partition)
        return cls(cfg, None, st.left, st.right, dtype=dtype,
                   donate_state=donate_state, fdl_dtype=fdl_dtype,
                   folded=True)

    # ------------------------------------------------------------ state
    def init_state(self, batch_shape=()) -> StreamState:
        rdt = self.dtype
        conv_layers = ((), ())
        direct_hist = None
        if self.left is not None:
            mk = lambda st: tuple(
                _layer_init(batch_shape, lp, self.block_size, rdt,
                            sdt=self.fdl_dtype)
                for lp in st.plan.layers)
            conv_layers = (mk(self.left), mk(self.right))
            if self.left.plan.direct_taps > 0:
                k = self.left.plan.direct_taps
                direct_hist = tuple(
                    jnp.zeros(batch_shape + (k - 1,), rdt) for _ in range(2))
        sc_up = sc_down = None
        if self.cfg.soft_clip_enabled and self.os_factor == 1:
            h_up, h_dn = self._sc_hists
            sc_up = jnp.zeros(batch_shape + (2, h_up), rdt)
            sc_down = jnp.zeros(batch_shape + (2, h_dn), rdt)
        os_up = tuple(jnp.zeros(batch_shape + (2, h[0]), rdt)
                      for h in self._os_hists)
        os_down = tuple(jnp.zeros(batch_shape + (2, h[1]), rdt)
                        for h in self._os_hists)
        dc_os = (jnp.zeros(batch_shape + (2, 2), rdt)
                 if self.os_factor > 1 else None)
        agc = None
        if self.eq_params is not None and self.eq_params.agc_enabled:
            agc = jnp.concatenate(
                [jnp.zeros(batch_shape + (2,), rdt),
                 jnp.ones(batch_shape + (1,), rdt)], axis=-1)
        return StreamState(
            dc_in=jnp.zeros(batch_shape + (2, 2), rdt),
            dc_out=jnp.zeros(batch_shape + (2, 2), rdt),
            eq_states=jnp.zeros(batch_shape + (NUM_BANDS, 4, 2), rdt),
            conv_layers=conv_layers,
            of_states=jnp.zeros(batch_shape + (2, 3, 2), rdt),
            direct_hist=direct_hist,
            sc_up_hist=sc_up,
            sc_down_hist=sc_down,
            os_up_hists=os_up,
            os_down_hists=os_down,
            dc_os=dc_os,
            agc=agc,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- step
    def _make_step(self):
        cfg = self.cfg
        eqp = self.eq_params
        sr = cfg.sample_rate
        os_factor = self.os_factor
        proc_rate = sr * os_factor
        dc_a = dc_blocker_alphas(sr, 3.0)
        dc_os_a = dc_blocker_alphas(proc_rate, 1.0) if os_factor > 1 else None
        eq_active = (not cfg.eq_bypassed) and eqp is not None
        conv_active = (not cfg.conv_bypassed) and self.left is not None
        if eq_active:
            active = band_active_mask(eqp)
            coeffs = svf_coeffs(eqp.band_types, eqp.freqs, eqp.gains_db,
                                eqp.qs, proc_rate)
            sat = float(eqp.saturation)
        ofc = output_filter_coeffs(proc_rate)
        wet_g = float(equal_power_sin(min(cfg.wet_dry_mix, 1.0))) \
            * CONVOLUTION_HEADROOM_GAIN
        dry_g = float(equal_power_sin(1.0 - min(cfg.wet_dry_mix, 1.0)))

        def dc_pair(x, states, alphas):
            outs = []
            new_s = []
            for ch in range(2):
                y, s = self._dc(x[..., ch, :], alphas, states[..., ch, :])
                outs.append(y)
                new_s.append(s)
            return jnp.stack(outs, axis=-2), jnp.stack(new_s, axis=-2)

        agc_enabled = eq_active and eqp.agc_enabled
        agc_block = int(cfg.agc_block_size) * os_factor

        def run_eq(L, R, eq_states, agc_state):
            if agc_enabled:
                from ..models.eq import agc_apply
                pre = jnp.stack([L, R], axis=-2)
                L, R, eq_states = _run_bands(L, R, eq_states)
                post = jnp.stack([L, R], axis=-2)
                y, agc_state = agc_apply(pre, post, proc_rate, agc_block,
                                         state0=agc_state, return_state=True)
                return y[..., 0, :], y[..., 1, :], eq_states, agc_state
            L, R, eq_states = _run_bands(L, R, eq_states)
            return L, R, eq_states, agc_state

        def _run_bands(L, R, eq_states):
            new_states = eq_states
            if eqp.structure == SERIAL:
                for b in range(NUM_BANDS):
                    if not active[b]:
                        continue
                    cb = tuple(float(c[b]) for c in coeffs)
                    L, R, new_states = self._band_block(
                        L, R, cb, int(eqp.modes[b]), sat, b, new_states)
            else:
                srcL, srcR = L, R
                accL = jnp.zeros_like(L)
                accR = jnp.zeros_like(R)
                for b in range(NUM_BANDS):
                    if not active[b]:
                        continue
                    cb = tuple(float(c[b]) for c in coeffs)
                    Lb, Rb, new_states = self._band_block(
                        srcL, srcR, cb, int(eqp.modes[b]), sat, b, new_states)
                    accL = accL + (Lb - srcL)
                    accR = accR + (Rb - srcR)
                L, R = srcL + accL, srcR + accR
            return L, R, new_states

        def run_conv(L, R, st: StreamState, conv_args):
            # conv_args = ((left spectra...), (right spectra...),
            #              (direct_l, direct_r) | None) passed as traced jit
            # ARGUMENTS: closure-capturing the prepared device arrays would
            # embed them as compile-time constants, which requires a
            # device->host readback that this TPU runtime does not
            # implement for complex dtypes (see NUCState docstring).
            spectra_lr, direct_lr = conv_args
            new_layers = []
            outs = []
            for ch, (sig, nuc) in enumerate(((L, self.left), (R, self.right))):
                states = st.conv_layers[ch]
                wet = jnp.zeros_like(sig)
                ls = []
                for lstate, H, lp in zip(states, spectra_lr[ch],
                                         nuc.plan.layers):
                    lstate, y = _layer_step(lstate, sig, H, lp,
                                            self.block_size * os_factor,
                                            lp.gain)
                    wet = wet + y
                    ls.append(lstate)
                new_layers.append(tuple(ls))
                outs.append(wet)
            wetL, wetR = outs

            direct_hist = st.direct_hist
            if direct_hist is not None:
                k = self.left.plan.direct_taps
                dh = []
                douts = []
                for ch, sig in enumerate((L, R)):
                    windowed = jnp.concatenate([direct_hist[ch], sig], axis=-1)
                    g = jnp.zeros_like(sig)
                    for t in range(k):
                        g = g + direct_lr[ch][t] * windowed[
                            ..., k - 1 - t:k - 1 - t + sig.shape[-1]]
                    douts.append(g)
                    dh.append(windowed[..., -(k - 1):])
                wetL = wetL + douts[0]
                wetR = wetR + douts[1]
                direct_hist = tuple(dh)

            outL = wetL * wet_g + L * dry_g
            outR = wetR * wet_g + R * dry_g
            return outL, outR, tuple(new_layers), direct_hist

        def run_output_filter(L, R, of_states):
            conv_is_last = conv_active and (
                not eq_active or cfg.order != CONVOLVER_THEN_EQ)
            if conv_is_last:
                stages = [ofc["hc"][cfg.conv_hc_mode][0],
                          ofc["hc"][cfg.conv_hc_mode][1],
                          ofc["lc"][cfg.conv_lc_mode]]
            else:
                stages = [ofc["hpf"], ofc["lp"][cfg.eq_lpf_mode][0],
                          ofc["lp"][cfg.eq_lpf_mode][1]]
            chans = [L, R]
            new_states = of_states
            for ch in range(2):
                x = chans[ch]
                for si, c in enumerate(stages):
                    x, s = self._biquad(x, c, new_states[..., ch, si, :])
                    new_states = new_states.at[..., ch, si, :].set(
                        jnp.asarray(s, new_states.dtype))
                chans[ch] = x
            return chans[0], chans[1], new_states

        def os_up(x, hists):
            """Stateful halfband cascade: exact block-wise upsample_up."""
            from ..ops.oversample import upsample2
            new_hists = []
            for st, (h_up, _), hist in zip(self.os_stages, self._os_hists,
                                           hists):
                xext = jnp.concatenate([hist, x], axis=-1)
                x = upsample2(xext, st)[..., 2 * h_up:]
                new_hists.append(xext[..., -h_up:])
            return x, tuple(new_hists)

        def os_down(x, hists):
            from ..ops.oversample import downsample2
            new_hists = list(hists)
            for i in range(len(self.os_stages) - 1, -1, -1):
                st = self.os_stages[i]
                h_dn = self._os_hists[i][1]
                uext = jnp.concatenate([hists[i], x], axis=-1)
                x = downsample2(uext, st)[..., h_dn // 2:]
                new_hists[i] = uext[..., -h_dn:]
            return x, tuple(new_hists)

        def step(state: StreamState, block, conv_args):
            x = jnp.asarray(block, self.dtype)
            x = jnp.where(~jnp.isnan(x) & (jnp.abs(x) >= 1e-20), x, 0.0)  # Inf survives to the clamp (ref: +-1), pinned by engine_math.json
            x = jnp.clip(x, -1.0, 1.0)
            if cfg.input_headroom_gain != 1.0:
                x = x * cfg.input_headroom_gain
            if self._folded:
                dc_in = state.dc_in          # baked into the IR
            else:
                x, dc_in = dc_pair(x, state.dc_in, dc_a)
            os_up_hists = state.os_up_hists
            os_down_hists = state.os_down_hists
            dc_os = state.dc_os
            if os_factor > 1:
                x, os_up_hists = os_up(x, os_up_hists)
                x, dc_os = dc_pair(x, state.dc_os, dc_os_a)
            L = x[..., 0, :]
            R = x[..., 1, :]

            eq_states = state.eq_states
            conv_layers = state.conv_layers
            direct_hist = state.direct_hist
            agc_state = state.agc
            if cfg.order == CONVOLVER_THEN_EQ:
                if conv_active:
                    L, R, conv_layers, direct_hist = run_conv(L, R, state,
                                                              conv_args)
                if eq_active:
                    L, R, eq_states, agc_state = run_eq(L, R, eq_states,
                                                        agc_state)
            else:
                if eq_active:
                    L, R, eq_states, agc_state = run_eq(L, R, eq_states,
                                                        agc_state)
                if conv_active:
                    if abs(cfg.convolver_input_trim_gain - 1.0) > 1e-12:
                        L = L * cfg.convolver_input_trim_gain
                        R = R * cfg.convolver_input_trim_gain
                    L, R, conv_layers, direct_hist = run_conv(L, R, state,
                                                              conv_args)

            of_states = state.of_states
            if (conv_active or eq_active) and not self._folded:
                L, R, of_states = run_output_filter(L, R, of_states)

            if cfg.output_makeup_gain != 1.0:
                L = L * cfg.output_makeup_gain
                R = R * cfg.output_makeup_gain
            y = jnp.stack([L, R], axis=-2)
            sc_up_hist = state.sc_up_hist
            sc_down_hist = state.sc_down_hist
            if cfg.soft_clip_enabled:
                thr, knee, asym = soft_clip_params(cfg.saturation_amount)
                if os_factor > 1:
                    # already oversampled: clip directly (DSPCoreDouble
                    # .cpp:471-501)
                    y = soft_clip(y, thr, knee, asym)
                else:
                    # local 2x OS wrap with FIR history carry (matches the
                    # offline chain's prepareSingleStage path exactly)
                    from ..ops.oversample import upsample2, downsample2
                    h_up, h_dn = self._sc_hists
                    xext = jnp.concatenate([sc_up_hist, y], axis=-1)
                    u = upsample2(xext, self._sc_stage)[..., 2 * h_up:]
                    u = soft_clip(u, thr, knee, asym)
                    uext = jnp.concatenate([sc_down_hist, u], axis=-1)
                    y = downsample2(uext, self._sc_stage)[..., h_dn // 2:]
                    sc_up_hist = xext[..., -h_up:]
                    sc_down_hist = uext[..., -h_dn:]
            if os_factor > 1:
                y, os_down_hists = os_down(y, os_down_hists)
            if self._folded:
                dc_out = state.dc_out        # baked into the IR
            else:
                y, dc_out = dc_pair(y, state.dc_out, dc_a)
            if cfg.apply_output_headroom:
                y = y * K_OUTPUT_HEADROOM
            return StreamState(dc_in=dc_in, dc_out=dc_out,
                               eq_states=eq_states, conv_layers=conv_layers,
                               of_states=of_states, direct_hist=direct_hist,
                               sc_up_hist=sc_up_hist,
                               sc_down_hist=sc_down_hist,
                               os_up_hists=os_up_hists,
                               os_down_hists=os_down_hists,
                               dc_os=dc_os,
                               agc=agc_state,
                               step=state.step + 1), y

        return step

    # ------------------------------------------------------- primitives
    @staticmethod
    def _dc(x, alphas, state):
        a0, a1 = alphas
        b0, b1 = 1.0 - a0, 1.0 - a1
        A = jnp.asarray([[b0, 0.0], [-a1 * b0, b1]], x.dtype)
        bu = jnp.stack([a0 * x, a1 * b0 * x], axis=-1)
        pre, final = affine_scan_2x2(A, bu, state)
        y = b1 * (b0 * (x - pre[..., 0]) - pre[..., 1])
        return y, final

    @staticmethod
    def _biquad(x, c, state):
        if tuple(c) == IDENTITY:
            return x, state
        return biquad_df2t_scan(x, *c, s0=state)

    def _band_block(self, L, R, cb, mode, sat, b, eq_states):
        """One EQ band over one block with carried 4-channel states."""
        def run(sig, ch_idx, simd):
            y, s = svf_process(sig, cb, state0=eq_states[..., b, ch_idx, :],
                               saturation=sat, simd_tanh=simd)
            return y, eq_states.at[..., b, ch_idx, :].set(s)

        if mode == STEREO:
            yl, eq_states = run(L, 0, True)
            yr, eq_states = run(R, 1, True)
            return yl, yr, eq_states
        if mode == LEFT:
            yl, eq_states = run(L, 0, False)
            return yl, R, eq_states
        if mode == RIGHT:
            yr, eq_states = run(R, 1, False)
            return L, yr, eq_states
        m = (L + R) * 0.5
        s = (L - R) * 0.5
        if mode == MID:
            fm, eq_states = run(m, 2, False)
            return fm + s, fm - s, eq_states
        fs, eq_states = run(s, 3, False)
        return m + fs, m - fs, eq_states

    # ---------------------------------------------------------- process
    def step(self, state: StreamState, block):
        """Advance by one block: block (..., 2, block_size)."""
        return self._step(state, block, self._conv_args)

    def multi_step(self, state: StreamState, blocks):
        """Advance M blocks in ONE dispatch: blocks (..., 2, M*block_size).

        The per-call host->device dispatch latency (tens of ms through a
        tunneled transport) dwarfs the per-block compute, so real-time
        serving batches M callback blocks per dispatch — latency grows to
        M blocks, throughput amortizes the dispatch (the XRUN contract is
        then per M-block deadline).  Internally a lax.scan over the same
        single-block step (identical numerics and carried state)."""
        m = blocks.shape[-1] // self.block_size
        if self._multi is None:
            step = self._make_step()

            def multi(state, xs, conv_args):
                def body(st, blk):
                    return step(st, blk, conv_args)
                return jax.lax.scan(body, state, xs)

            self._multi = jax.jit(multi, donate_argnums=self._donate)
        bs = self.block_size
        xs = blocks.reshape(blocks.shape[:-1] + (m, bs))
        xs = jnp.moveaxis(xs, -2, 0)                  # (M, ..., 2, bs)
        state, ys = self._multi(state, xs, self._conv_args)
        ys = jnp.moveaxis(ys, 0, -2)
        return state, ys.reshape(ys.shape[:-2] + (m * bs,))

    def process(self, x, state: StreamState | None = None):
        """Convenience: stream a whole (..., 2, N) signal block by block."""
        n = x.shape[-1]
        bs = self.block_size
        nb = n // bs
        if state is None:
            state = self.init_state(tuple(x.shape[:-2]))
        outs = []
        for k in range(nb):
            state, y = self.step(state, x[..., k * bs:(k + 1) * bs])
            outs.append(y)
        return jnp.concatenate(outs, axis=-1), state
