"""Oversampler, DC blocker, soft clip, output filter, gain planner, chain."""
import numpy as np
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops.oversample import (
    design_halfband, make_stages, upsample2, downsample2,
    oversample_up, oversample_down, PRESET_IIR_LIKE, PRESET_LINEAR_PHASE)
from convopeq_tpu.ops.dc_blocker import dc_block, dc_blocker_alphas
from convopeq_tpu.ops.softclip import soft_clip, soft_clip_params
from convopeq_tpu.models.output_filter import (
    output_filter_process, make_lpf, make_hpf)
from convopeq_tpu.models.gain_planner import (
    PlannerInput, plan, empirical_safety_margin,
    CONVOLVER_THEN_EQ, EQ_THEN_CONVOLVER)
from convopeq_tpu.models.chain import (
    ChainConfig, process_chain, resolve_oversampling_factor)
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.convolver import stereo_prepare
from convopeq_tpu.models.nuc import FilterSpec, TAIL_BYPASS

RNG = np.random.default_rng(5)
SR = 48000.0


# ---------- golden per-sample oversampler (direct C++ semantics) ----------

def up2_golden(x, st):
    cc = len(st.conv)
    keep = max(cc - 1, st.center_delay)
    hist = np.zeros(keep + len(x))
    hist[keep:] = x
    out = np.zeros(2 * len(x))
    for n in range(len(x)):
        idx = keep + n
        conv = 2.0 * sum(st.conv[r] * hist[idx - r] for r in range(cc))
        center = st.center_gain * hist[idx - st.center_delay]
        out[2 * n + st.conv_parity] = conv
        out[2 * n + st.center_parity] = center
    return out


def down2_golden(u, st):
    cc = len(st.conv)
    keep = max(st.center_tap, st.conv_parity + (cc - 1) * 2 + 6)
    hist = np.zeros(keep + len(u))
    hist[keep:] = u
    out = np.zeros(len(u) // 2)
    for n in range(len(out)):
        base = keep + 2 * n
        acc = 0.5 * hist[base - st.center_tap]
        for r in range(cc):
            acc += st.conv[r] * hist[base - st.conv_parity - 2 * r]
        out[n] = acc
    return out


def test_halfband_design_properties():
    st = design_halfband(31, 90.0)
    assert st.taps == 31 and st.center_tap == 15
    assert st.center_parity == 1 and st.conv_parity == 0
    # conv arm sums to 0.5 (DC normalization contract)
    np.testing.assert_allclose(st.conv.sum(), 0.5, atol=1e-12)


@pytest.mark.parametrize("taps,atten", [(31, 90.0), (127, 110.0), (63, 120.0)])
def test_upsample2_matches_golden(taps, atten):
    st = design_halfband(taps, atten)
    x = RNG.normal(size=300)
    got = np.asarray(upsample2(jnp.asarray(x), st))
    ref = up2_golden(x, st)
    np.testing.assert_allclose(got, ref, atol=1e-13)


@pytest.mark.parametrize("taps", [31, 63])
def test_downsample2_matches_golden(taps):
    st = design_halfband(taps, 90.0)
    u = RNG.normal(size=600)
    got = np.asarray(downsample2(jnp.asarray(u), st))
    ref = down2_golden(u, st)
    np.testing.assert_allclose(got, ref, atol=1e-13)


@pytest.mark.parametrize("taps,n", [(511, 10000), (127, 3001), (31, 257),
                                    (31, 100)])
def test_resample2_matmul_equivalence(taps, n):
    """The TPU path (fused polyphase Toeplitz GEMM, no strided slices) is
    sample-exact against the polyphase FIR path for both directions."""
    from convopeq_tpu.ops.oversample import (_resample2_matmul,
                                             _stage_full_response)
    st = design_halfband(taps, 110.0)
    x = RNG.normal(size=(2, n))
    yu = np.asarray(_resample2_matmul(jnp.asarray(x),
                                      _stage_full_response(st, True), True))
    np.testing.assert_allclose(yu, np.asarray(upsample2(jnp.asarray(x), st)),
                               atol=1e-13)
    u = RNG.normal(size=(2, 2 * n))
    yd = np.asarray(_resample2_matmul(jnp.asarray(u),
                                      _stage_full_response(st, False), False))
    np.testing.assert_allclose(yd, np.asarray(downsample2(jnp.asarray(u), st)),
                               atol=1e-13)


def test_reference_updown_dc_gain_quirk():
    """The reference's up->down round trip has DC gain 0.75 (center phase
    is 0.5x, not doubled) — pinned here as a parity contract."""
    st = make_stages(2, PRESET_IIR_LIKE)
    x = np.ones(2000)
    y = np.asarray(oversample_down(oversample_up(jnp.asarray(x), st), st))
    np.testing.assert_allclose(y[-100:], 0.75, atol=1e-6)


def test_unity_variant_updown_is_flat():
    st = make_stages(2, PRESET_IIR_LIKE, center_phase_gain="unity")
    x = np.ones(2000)
    y = np.asarray(oversample_down(oversample_up(jnp.asarray(x), st), st))
    np.testing.assert_allclose(y[-100:], 1.0, atol=1e-6)


def test_oversample_cascade_shapes():
    st = make_stages(8, PRESET_LINEAR_PHASE)
    assert [s.taps for s in st] == [1023, 255, 63]
    x = RNG.normal(size=(2, 256))
    u = oversample_up(jnp.asarray(x), st)
    assert u.shape == (2, 2048)
    d = oversample_down(u, st)
    assert d.shape == (2, 256)


def test_dc_blocker_matches_loop():
    x = RNG.normal(size=500) + 0.7   # DC offset
    y, fin = dc_block(jnp.asarray(x), SR, 3.0)
    a0, a1 = dc_blocker_alphas(SR, 3.0)
    s0 = s1 = 0.0
    ref = np.zeros_like(x)
    for i, v in enumerate(x):
        s0 = s0 + a0 * (v - s0)
        t = v - s0
        s1 = s1 + a1 * (t - s1)
        ref[i] = t - s1
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-13)
    # removes DC in steady state
    y2, _ = dc_block(jnp.asarray(np.full(200000, 0.5)), SR, 3.0)
    assert abs(float(y2[-1])) < 1e-3


def golden_softclip(x, thr, knee, asym):
    def tanh_sc(v):
        v = min(max(v, -4.5), 4.5)
        v2 = v * v
        return v * (10395.0 + v2 * (1260.0 + v2 * 21.0)) / (
            10395.0 + v2 * (4725.0 + v2 * (210.0 + v2)))
    out = np.empty_like(x)
    clip_start = thr - knee
    for i, v in enumerate(x):
        if knee < 1e-9:
            out[i] = min(max(v, -thr), thr)
            continue
        av = abs(v)
        if av <= clip_start:
            out[i] = v
            continue
        sign = 1.0 if v > 0 else -1.0
        t = min(max((av - clip_start) / (2 * knee), 0.0), 1.0)
        ks = t * t * (3 - 2 * t)
        clipped = thr + knee * tanh_sc((av - thr) / knee)
        mixed = av + (clipped - av) * ks
        factor = 1.0 - asym * (1.0 - sign) * 0.5 * ks
        out[i] = sign * mixed * factor
    return out


@pytest.mark.parametrize("sat", [0.0, 0.3, 1.0])
def test_softclip_matches_golden(sat):
    thr, knee, asym = soft_clip_params(sat)
    x = RNG.normal(size=2000) * 1.5
    got = np.asarray(soft_clip(jnp.asarray(x), thr, knee, asym))
    ref = golden_softclip(x, thr, knee, asym)
    np.testing.assert_allclose(got, ref, atol=1e-14)


def golden_biquad(x, c):
    b0, b1, b2, a1, a2 = c
    w1 = w2 = 0.0
    out = np.empty_like(x)
    for i, v in enumerate(x):
        y = b0 * v + w1
        w1 = b1 * v - a1 * y + w2
        w2 = b2 * v - a2 * y
        out[i] = y
    return out


def test_output_filter_conv_last_matches_golden():
    x = RNG.normal(size=1024)
    got = np.asarray(output_filter_process(jnp.asarray(x), SR, True))
    from convopeq_tpu.models.output_filter import output_filter_coeffs
    c = output_filter_coeffs(SR)
    ref = golden_biquad(x, c["hc"][1][0])
    ref = golden_biquad(ref, c["hc"][1][1])
    ref = golden_biquad(ref, c["lc"][0])
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_output_filter_eq_last_matches_golden():
    x = RNG.normal(size=1024)
    got = np.asarray(output_filter_process(jnp.asarray(x), SR, False,
                                           lp_mode=0))
    from convopeq_tpu.models.output_filter import output_filter_coeffs
    c = output_filter_coeffs(SR)
    ref = golden_biquad(x, c["hpf"])
    ref = golden_biquad(ref, c["lp"][0][0])
    ref = golden_biquad(ref, c["lp"][0][1])
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_gain_planner_contract():
    # disabled -> zeros
    p = plan(False, EQ_THEN_CONVOLVER, False, False,
             PlannerInput(10.0, 2.0, 5.0))
    assert (p.input_headroom_db, p.output_makeup_db,
            p.convolver_input_trim_db) == (0.0, 0.0, 0.0)
    # EQ-only: input = -(max(0, g-1.5)) - margin
    inp = PlannerInput(eq_max_gain_db=10.0, eq_max_q=2.0)
    p = plan(True, EQ_THEN_CONVOLVER, False, True, inp)
    margin = float(empirical_safety_margin(10.0, 2.0))
    assert abs(p.input_headroom_db - (-(10.0 - 1.5) - margin)) < 1e-6
    assert abs(p.output_makeup_db - min(12.0, -p.input_headroom_db)) < 1e-6
    # conv-only
    p = plan(True, EQ_THEN_CONVOLVER, True, False,
             PlannerInput(ir_freq_peak_gain_db=6.0))
    assert abs(p.input_headroom_db - (-(6.0 - 1.0))) < 1e-6
    # EQ->Conv applies trim
    p = plan(True, EQ_THEN_CONVOLVER, False, False,
             PlannerInput(6.0, 1.0, 4.0))
    assert p.convolver_input_trim_db < 0.0
    # clamps
    p = plan(True, CONVOLVER_THEN_EQ, False, False,
             PlannerInput(48.0, 20.0, 30.0))
    assert p.input_headroom_db == -18.0
    assert p.output_makeup_db == 12.0
    # margin formula
    assert empirical_safety_margin(0.4, 10.0) == 0.0
    m = empirical_safety_margin(6.0, 2.0)
    assert abs(m - min(2.5, 0.8 + 0.12 * (2.0 - 0.707) + 0.04 * 6.0)) < 1e-6


def test_resolve_oversampling_policy():
    assert resolve_oversampling_factor(8, 48000.0) == 8
    assert resolve_oversampling_factor(8, 96000.0) == 8
    assert resolve_oversampling_factor(8, 192000.0) == 4
    assert resolve_oversampling_factor(8, 384000.0) == 2
    assert resolve_oversampling_factor(8, 768000.0) == 1
    # invalid values and 0 are Auto -> max allowed factor
    # (OversamplingPolicy.h:73-77, pinned by engine_math.json)
    assert resolve_oversampling_factor(3, 48000.0) == 8
    assert resolve_oversampling_factor(0, 48000.0) == 8
    assert resolve_oversampling_factor(0, 192000.0) == 4
    assert resolve_oversampling_factor(2, 800000.0) == 1


def test_chain_end_to_end_smoke():
    """Full chain EQ->Conv with all stages on; verify finite and that the
    EQ boost is audible vs bypassed chain."""
    n = 8192
    t = np.arange(n) / SR
    sig = 0.25 * np.sin(2 * np.pi * 1000 * t)
    x = np.stack([sig, sig])[None]                  # (1, 2, N)

    eqp = EQParams()
    eqp.enabled[:] = False
    eqp.set_band(0, band_type=1, freq=1000.0, gain_db=6.0, q=1.0, enabled=True)

    ir = np.zeros(2000)
    ir[0] = 1.0
    ir[500] = 0.3
    conv = stereo_prepare(jnp.asarray(ir), 512,
                          FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS),
                          apply_spectrum_filter=False)

    cfg = ChainConfig(sample_rate=SR, soft_clip_enabled=True,
                      saturation_amount=0.2, oversampling_factor=2)
    y = np.asarray(process_chain(jnp.asarray(x), cfg, eqp, conv))
    assert y.shape == x.shape
    assert np.all(np.isfinite(y))
    assert np.abs(y).max() > 0.05

    cfg_byp = ChainConfig(sample_rate=SR, eq_bypassed=True,
                          conv_bypassed=True)
    y2 = np.asarray(process_chain(jnp.asarray(x), cfg_byp, eqp, conv))
    assert np.abs(y).max() != pytest.approx(np.abs(y2).max(), rel=1e-3)


def test_fused_chain_matches_exact_cascade():
    """Static-config fusion: the folded prefilter conv (dc_in * EQ *
    output filter * dc_out) + untouched NUC equals the exact stage
    cascade to the prefilter's truncation bound (models/chain.py fused
    mode — the headline-bench fast path)."""
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import (
        ChainConfig, process_chain, process_chain_fused, fused_eligible,
        prepare_fused_prefilter)
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec
    rng = np.random.default_rng(31)
    sr = 48000.0
    ir = rng.normal(size=(2, 6000)) * np.exp(-np.arange(6000) / 900.0) * 0.2
    p = EQParams()
    p.gains_db[:] = np.linspace(-4.0, 4.0, 20)     # all stereo bands
    cfg = ChainConfig(sample_rate=sr)
    assert fused_eligible(cfg, p, True)
    # fusion requires the pure-LTI NUC (unfiltered spectra — the filtered
    # NUC is LPTV and does not commute; see models/chain.py fused block)
    conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=sr),
                          apply_spectrum_filter=False)
    x = rng.normal(size=(1, 2, 32768)) * 0.25

    y_ref = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
    pre = prepare_fused_prefilter(cfg, p, eps=1e-10)
    y_fused = np.asarray(process_chain_fused(jnp.asarray(x), cfg, conv, pre))
    rel = np.sqrt(np.mean((y_fused - y_ref) ** 2)) \
        / np.sqrt(np.mean(y_ref ** 2))
    assert rel < 3e-9, rel

    # the HC/LC-in-prefilter variant tracks the circular-filtered chain to
    # the filter's frame-wrap difference (a documented variant, not exact)
    from convopeq_tpu.models.nuc import spectrum_filter_gain
    spec = FilterSpec(sample_rate=sr)
    conv_f = stereo_prepare(jnp.asarray(ir), 512, spec)
    y_circ = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv_f))
    pre_f = prepare_fused_prefilter(cfg, p, eps=1e-10, spec=spec)
    y_lin = np.asarray(process_chain_fused(jnp.asarray(x), cfg, conv, pre_f))
    rel_v = np.sqrt(np.mean((y_lin - y_circ) ** 2)) \
        / np.sqrt(np.mean(y_circ ** 2))
    assert rel_v < 0.05, rel_v              # same shaping, different grid

    # deepest fold: prefilter baked into the IR itself (layer contour
    # gains pre-applied, unit-gain NUC) == the prefilter-conv fused path
    from convopeq_tpu.models.chain import prepare_folded_convolver
    conv_fold = prepare_folded_convolver(ir, 512, spec, cfg, p, eps=1e-10)
    y_fold = np.asarray(process_chain_fused(jnp.asarray(x), cfg, conv_fold))
    rel_f = np.sqrt(np.mean((y_fold - y_lin) ** 2)) \
        / np.sqrt(np.mean(y_lin ** 2))
    assert rel_f < 1e-9, rel_f

    # partitioning is a pure evaluation detail: the single-layer
    # throughput plan (default), an explicit partition size, and the
    # reference 3-layer plan all compute the same convolution
    for part in (None, 4096):
        conv_alt = prepare_folded_convolver(ir, 512, spec, cfg, p,
                                            eps=1e-10, partition=part)
        y_alt = np.asarray(process_chain_fused(jnp.asarray(x), cfg,
                                               conv_alt))
        rel_p = np.sqrt(np.mean((y_alt - y_fold) ** 2)) \
            / np.sqrt(np.mean(y_fold ** 2))
        assert rel_p < 1e-11, (part, rel_p)

    # ineligibility guards: M/S band, soft clip, wet/dry
    p2 = EQParams()
    p2.set_band(0, mode=3, gain_db=3.0)
    assert not fused_eligible(cfg, p2, True)
    from dataclasses import replace
    assert not fused_eligible(replace(cfg, soft_clip_enabled=True), p, True)
    assert not fused_eligible(replace(cfg, wet_dry_mix=0.5), p, True)
    assert not fused_eligible(replace(cfg, oversampling_factor=4), p, True)


def test_fused_trim_gain_matches_unfused_both_orders():
    """convolver_input_trim_gain applies only on the EQ->conv order in
    the staged chain; the fused chain must match in BOTH orders (a
    conv-first config must not pick up a spurious trim factor)."""
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import (
        CONVOLVER_THEN_EQ, EQ_THEN_CONVOLVER, ChainConfig, process_chain,
        process_chain_fused, fused_eligible, prepare_fused_prefilter)
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec
    rng = np.random.default_rng(41)
    sr = 48000.0
    ir = rng.normal(size=(2, 3000)) * np.exp(-np.arange(3000) / 500.0) * 0.2
    p = EQParams()
    p.gains_db[:3] = [3.0, -2.0, 1.0]
    conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=sr),
                          apply_spectrum_filter=False)
    x = rng.normal(size=(1, 2, 16384)) * 0.25
    for order in (CONVOLVER_THEN_EQ, EQ_THEN_CONVOLVER):
        cfg = ChainConfig(sample_rate=sr, order=order,
                          convolver_input_trim_gain=0.5)
        assert fused_eligible(cfg, p, True)
        pre = prepare_fused_prefilter(cfg, p, eps=1e-10)
        y_ref = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
        y_fused = np.asarray(process_chain_fused(jnp.asarray(x), cfg,
                                                 conv, pre))
        err = np.abs(y_fused - y_ref).max() / np.abs(y_ref).max()
        assert err < 1e-7, f"order={order}: fused diverges {err:.2e}"


def test_folded_oversampled_chain_matches_staged():
    """The polyphase-identity fold of the ENTIRE oversampled static chain
    (up FIRs -> dc_os -> EQ -> conv@proc-rate -> output filter -> down
    FIRs, plus base-rate DC blockers) equals the staged process_chain at
    the truncation bound — bench config3's fast path
    (models/chain.prepare_folded_convolver_oversampled)."""
    from convopeq_tpu.models.chain import (
        ChainConfig, process_chain, process_chain_fused,
        prepare_folded_convolver_oversampled)
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.nuc import FilterSpec
    rng = np.random.default_rng(52)
    sr = 48000.0
    x = rng.normal(size=(1, 2, 32768)) * 0.25
    p = EQParams()
    p.gains_db[:] = np.linspace(-3.0, 3.0, 20)     # all stereo bands
    for os_req, order in ((2, EQ_THEN_CONVOLVER), (4, CONVOLVER_THEN_EQ),
                          (4, EQ_THEN_CONVOLVER)):
        proc_len = 3000 * os_req
        ir_hf = rng.normal(size=(2, proc_len)) \
            * np.exp(-np.arange(proc_len) / (500.0 * os_req)) * 0.2
        spec = FilterSpec(sample_rate=sr * os_req)
        cfg = ChainConfig(sample_rate=sr, order=order,
                          oversampling_factor=os_req,
                          convolver_input_trim_gain=0.7,
                          output_makeup_gain=1.1)
        # exact comparison: staged NUC unfiltered vs fold without the
        # HC/LC curve (the curve variant is LPTV-vs-linear, not exact)
        conv = stereo_prepare(jnp.asarray(ir_hf), 512 * os_req, spec,
                              apply_spectrum_filter=False)
        y_ref = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
        st = prepare_folded_convolver_oversampled(
            ir_hf, 512, spec, cfg, p, eps=1e-10,
            fold_spectrum_curve=False)
        y_fold = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st))
        rel = np.sqrt(np.mean((y_fold - y_ref) ** 2)) \
            / np.sqrt(np.mean(y_ref ** 2))
        assert rel < 3e-9, (os_req, order, rel)

    # the HC/LC-curve variant tracks the circular-filtered staged chain
    # to the documented frame-wrap difference
    os_req = 4
    cfg = ChainConfig(sample_rate=sr, order=EQ_THEN_CONVOLVER,
                      oversampling_factor=os_req)
    proc_len = 3000 * os_req
    ir_hf = rng.normal(size=(2, proc_len)) \
        * np.exp(-np.arange(proc_len) / (500.0 * os_req)) * 0.2
    spec = FilterSpec(sample_rate=sr * os_req)
    conv_f = stereo_prepare(jnp.asarray(ir_hf), 512 * os_req, spec)
    y_circ = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv_f))
    st_f = prepare_folded_convolver_oversampled(ir_hf, 512, spec, cfg, p,
                                                eps=1e-10)
    y_lin = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st_f))
    rel_v = np.sqrt(np.mean((y_lin - y_circ) ** 2)) \
        / np.sqrt(np.mean(y_circ ** 2))
    assert rel_v < 0.05, rel_v


def test_semi_folded_softclip_chain_matches_staged():
    """Partial fold for soft-clip chains (bench config6's fast path): the
    LTI prefix (dc_in + EQ + conv + output filter) folds into the IR;
    makeup -> soft clip -> dc_out -> headroom stay staged in the exact
    reference order.  Equals the staged chain to the truncation bound."""
    from convopeq_tpu.models.chain import (
        ChainConfig, process_chain, process_chain_semi_fused,
        prepare_semi_folded_convolver)
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.nuc import FilterSpec
    rng = np.random.default_rng(63)
    sr = 48000.0
    n_ir = 6000
    ir = rng.normal(size=(2, n_ir)) * np.exp(-np.arange(n_ir) / 900.0) * 0.2
    p = EQParams()
    p.gains_db[:] = np.linspace(-3.0, 3.0, 20)
    spec = FilterSpec(sample_rate=sr)
    cfg = ChainConfig(sample_rate=sr, soft_clip_enabled=True,
                      saturation_amount=0.3, output_makeup_gain=1.2,
                      apply_output_headroom=False)
    x = rng.normal(size=(1, 2, 32768)) * 0.25

    # exact: staged NUC unfiltered vs fold without the HC/LC curve
    conv = stereo_prepare(jnp.asarray(ir), 512, spec,
                          apply_spectrum_filter=False)
    y_ref = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
    st = prepare_semi_folded_convolver(ir, 512, spec, cfg, p, eps=1e-10,
                                       fold_spectrum_curve=False)
    y_semi = np.asarray(process_chain_semi_fused(jnp.asarray(x), cfg, st))
    rel = np.sqrt(np.mean((y_semi - y_ref) ** 2)) \
        / np.sqrt(np.mean(y_ref ** 2))
    assert rel < 3e-9, rel

    # curve variant tracks the circular-filtered staged chain (documented)
    conv_f = stereo_prepare(jnp.asarray(ir), 512, spec)
    y_circ = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv_f))
    st_f = prepare_semi_folded_convolver(ir, 512, spec, cfg, p, eps=1e-10)
    y_lin = np.asarray(process_chain_semi_fused(jnp.asarray(x), cfg, st_f))
    rel_v = np.sqrt(np.mean((y_lin - y_circ) ** 2)) \
        / np.sqrt(np.mean(y_circ ** 2))
    assert rel_v < 0.05, rel_v


def test_fused2_two_level_plan_matches_single_layer():
    """partition="fused2" (near layer <= 8 parts for the fully-fused
    Pallas kernel + far layer at 8x partitions) computes the same exact
    convolution as the single-layer plan — pure evaluation detail, layer
    offset shift included."""
    from convopeq_tpu.models.chain import (
        ChainConfig, process_chain_fused, prepare_folded_convolver,
        _prepare_fused2)
    from convopeq_tpu.models.nuc import FilterSpec
    rng = np.random.default_rng(77)
    sr = 48000.0
    cfg = ChainConfig(sample_rate=sr)
    p = EQParams()
    p.gains_db[:4] = [2.0, -1.0, 3.0, -2.0]
    spec = FilterSpec(sample_rate=sr)
    n_ir = 200000       # combined IR > 8*16384 so the FAR layer engages
    ir = rng.normal(size=(2, n_ir)) * np.exp(-np.arange(n_ir) / 30000.0) * 0.2
    x = rng.normal(size=(1, 2, 65536)) * 0.25

    st1 = prepare_folded_convolver(ir, 512, spec, cfg, p, partition=8192)
    y1 = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st1))

    st2 = prepare_folded_convolver(ir, 512, spec, cfg, p,
                                   partition="fused2")
    plans = st2.left.plan.layers
    assert len(plans) == 2 and plans[1].offset == 8 * plans[0].part_size
    y2 = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st2))
    rel = np.sqrt(np.mean((y2 - y1) ** 2)) / np.sqrt(np.mean(y1 ** 2))
    assert rel < 1e-12, (rel, [
        (lp.offset, lp.part_size, lp.num_parts) for lp in plans])


def test_soft_clip_local2x_polyphase_matches_staged():
    """The polyphase-substituted local-2x soft clip (no 2x intermediate)
    equals up(31-tap halfband) -> clip -> down to f64 roundoff."""
    from convopeq_tpu.ops.softclip import (soft_clip, soft_clip_params,
                                           soft_clip_local2x)
    from convopeq_tpu.ops.oversample import (design_halfband,
                                             oversample_up, oversample_down)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 2, 4096)) * 0.9        # drives the knee hard
    for sat in (0.0, 0.3, 0.9):
        thr, knee, asym = soft_clip_params(sat)
        st = [design_halfband(31, 90.0)]
        u = oversample_up(jnp.asarray(x), st)
        u = soft_clip(u, thr, knee, asym)
        y_ref = np.asarray(oversample_down(u, st))
        y = np.asarray(soft_clip_local2x(jnp.asarray(x), thr, knee, asym))
        np.testing.assert_allclose(y, y_ref, rtol=0, atol=1e-12,
                                   err_msg=f"sat={sat}")
