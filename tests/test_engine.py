"""ConvoPeqEngine facade: load pipeline, config, state IO, processing."""
import numpy as np
import jax.numpy as jnp

from convopeq_tpu.engine import ConvoPeqEngine
from convopeq_tpu.engine.engine import (
    estimate_peak_latency, energy_scale, trim_ir,
    PHASE_MINIMUM, PHASE_AS_IS)
from convopeq_tpu.engine.eq_analysis import (
    estimate_max_gain_db, max_active_q, eq_response, svf_to_biquad)
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.gain_planner import EQ_THEN_CONVOLVER, CONVOLVER_THEN_EQ
from convopeq_tpu.ops.svf import svf_coeffs

RNG = np.random.default_rng(33)
SR = 48000.0


def _ir(n=4000):
    t = np.arange(n)
    ir = RNG.normal(size=(2, n)) * np.exp(-t / 600.0)
    ir[:, 0] = 1.0
    return ir


def test_eq_response_matches_filter_gain():
    p = EQParams()
    p.enabled[:] = False
    p.set_band(0, band_type=1, freq=1000.0, gain_db=12.0, q=2.0, enabled=True)
    h = eq_response(p, SR, np.array([1000.0]))
    assert abs(20 * np.log10(abs(h[0])) - 12.0) < 0.05
    g = estimate_max_gain_db(p, SR)
    assert abs(g - 12.0) < 0.1
    assert max_active_q(p) == 2.0
    # cut-only EQ has max gain ~0
    p2 = EQParams()
    p2.enabled[:] = False
    p2.set_band(0, band_type=1, freq=500.0, gain_db=-9.0, q=1.0, enabled=True)
    assert estimate_max_gain_db(p2, SR) < 0.2
    assert max_active_q(p2) == 0.0


def test_svf_to_biquad_response_consistency():
    c = svf_coeffs(1, 2000.0, 8.0, 1.5, SR)
    bq = svf_to_biquad(*(float(v) for v in c))
    from convopeq_tpu.engine.eq_analysis import biquad_response
    h = biquad_response(bq, np.array([2000.0]), SR)
    assert abs(20 * np.log10(abs(h[0])) - 8.0) < 0.05


def test_peak_latency_centroid():
    ir = np.zeros(1000)
    ir[200] = 1.0
    assert estimate_peak_latency(ir) == 200
    assert estimate_peak_latency(np.zeros(100)) == 0


def test_energy_scale_minus6db():
    ir = np.zeros((1, 100))
    ir[0, 0] = 2.0       # energy 4 -> 1/2 * 0.5012
    s = energy_scale(ir)
    assert abs(s - 0.5 * 0.5011872336272722) < 1e-12


def test_trim_fade():
    ir = np.ones((1, 48000))
    out = trim_ir(ir, SR, 10000)
    assert out.shape == (1, 10000)
    assert out[0, 0] == 1.0
    assert out[0, -1] < 0.01    # faded to ~0
    # zero-pad case
    out2 = trim_ir(np.ones((1, 100)), SR, 500)
    assert out2.shape == (1, 500)
    assert np.all(out2[0, 100:] == 0.0)


def test_engine_end_to_end():
    eng = ConvoPeqEngine(SR, 512)
    eng.load_impulse_response(_ir(), SR)
    eng.set_eq_band(0, band_type=1, freq=1000.0, gain_db=6.0, q=1.0)
    eng.set_soft_clip(True, 0.3)
    eng.set_auto_gain(True)
    n = 8192
    x = RNG.normal(size=(1, 2, n)) * 0.2
    y = np.asarray(eng.process(jnp.asarray(x)))
    assert y.shape == x.shape
    assert np.all(np.isfinite(y))
    assert np.abs(y).max() > 1e-4

    # auto gain plan reacts to the EQ boost
    plan = eng.auto_gain_plan()
    assert plan.input_headroom_db < 0.0
    assert plan.output_makeup_db > 0.0

    lb = eng.latency_breakdown()
    assert lb.algorithm_latency_samples == 512
    assert lb.ir_peak_latency_samples >= 0
    assert lb.softclip_latency_samples == 15
    assert lb.total_latency_samples >= 512


def test_engine_prepared_ir_cache():
    eng = ConvoPeqEngine(SR, 512)
    ir = _ir(2000)
    eng.load_impulse_response(ir, SR)
    first = eng._conv_state
    eng.load_impulse_response(ir, SR)   # identical -> cache hit
    assert eng._conv_state is first


def test_engine_min_phase_load():
    eng = ConvoPeqEngine(SR, 512)
    ir = np.zeros((2, 2000))
    ir[:, 300] = 1.0
    eng.load_impulse_response(ir, SR, phase_mode=PHASE_MINIMUM,
                              target_seconds=2000 / SR)
    # min phase moves the IR peak to the front
    assert eng._ir_peak_latency < 50


def test_engine_state_roundtrip():
    eng = ConvoPeqEngine(SR, 512)
    eng.set_eq_band(3, band_type=2, freq=8000.0, gain_db=-4.0, q=0.9)
    eng.set_processing_order(CONVOLVER_THEN_EQ)
    eng.set_oversampling(4)
    eng.set_soft_clip(True, 0.7)
    eng.set_wet_dry_mix(0.8)
    eng.set_dither(2, 24)
    eng.set_auto_gain(True)
    blob = eng.save_state()

    eng2 = ConvoPeqEngine(SR, 512).load_state(blob)
    assert eng2.config.order == CONVOLVER_THEN_EQ
    assert eng2.config.oversampling_factor == 4
    assert eng2.config.soft_clip_enabled
    assert eng2.config.saturation_amount == 0.7
    assert eng2.config.wet_dry_mix == 0.8
    assert eng2.dither_type == 2 and eng2.dither_bit_depth == 24
    assert eng2.auto_gain_enabled
    np.testing.assert_array_equal(eng2.eq_params.gains_db,
                                  eng.eq_params.gains_db)
    assert eng2.save_state() == blob


def test_engine_dither_output_on_grid():
    eng = ConvoPeqEngine(SR, 512)
    eng.set_bypass(eq=True, conv=True)
    eng.set_dither(1, 16)
    x = RNG.normal(size=(2, 2048)) * 0.2
    import jax
    y = np.asarray(eng.process(jnp.asarray(x), key=jax.random.PRNGKey(7)))
    grid = y * 32768.0
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-9)


def test_sharded_chain_on_cpu_mesh():
    import jax
    from convopeq_tpu.parallel.sharding import (
        make_stream_mesh, shard_streams, sharded_chain)
    from convopeq_tpu.models.chain import ChainConfig, process_chain
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.nuc import FilterSpec

    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should provide 8 cpu devices, got {n_dev}"
    mesh = make_stream_mesh()
    ir = _ir(1500)[0]
    conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=SR))
    cfg = ChainConfig(sample_rate=SR)
    eqp = EQParams()
    fn = sharded_chain(lambda x, c: process_chain(x, cfg, eqp, c), mesh)
    x = RNG.normal(size=(16, 2, 2048)) * 0.2
    import jax as _j
    conv_r = _j.device_put(conv, __import__(
        "convopeq_tpu.parallel.sharding", fromlist=["replicated"]).replicated(mesh))
    xs = shard_streams(jnp.asarray(x), mesh)
    y = fn(xs, conv_r)
    assert y.shape == x.shape
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # sharded output must EQUAL the single-device output (f64): a sharding
    # bug that scrambles or cross-talks streams fails here, not just NaNs.
    y_ref = np.asarray(jax.jit(
        lambda v, c: process_chain(v, cfg, eqp, c))(jnp.asarray(x), conv))
    err = np.max(np.abs(y - y_ref))
    assert err < 1e-9 * (np.max(np.abs(y_ref)) + 1e-30), err


def test_compute_ir_scale_clamps():
    from convopeq_tpu.engine.engine import compute_ir_scale
    # delta IR: energy 1 -> base scale ~0.5012; peak*scale > 0.5 -> clamped
    ir = np.zeros((1, 4096))
    ir[0, 2048] = 1.0
    s = compute_ir_scale(ir)
    assert s * 1.0 <= 0.5 + 1e-12        # effective peak clamp
    # resonant IR with big frequency peak gets the +3dB clamp
    t = np.arange(8192)
    res = (np.sin(2 * np.pi * 0.02 * t) * np.exp(-t / 2000.0))[None]
    s2 = compute_ir_scale(res)
    from convopeq_tpu.ir.analyzer import estimate_max_frequency_gain
    assert estimate_max_frequency_gain(res * s2) <= 1.41 * 1.001


def test_engine_streaming_matches_offline():
    eng = ConvoPeqEngine(SR, 512)
    ir = np.zeros((2, 2000))
    ir[:, 0] = 1.0
    ir[:, 700] = 0.3
    eng.load_impulse_response(ir, SR, target_seconds=2000 / SR)
    eng.set_eq_band(0, band_type=1, freq=800.0, gain_db=4.0, q=1.0)
    from dataclasses import replace
    eng.config = replace(eng.config, eq_method="scan")
    x = RNG.normal(size=(2, 4096)) * 0.3
    off = np.asarray(eng.process(jnp.asarray(x)))
    y, st = eng.process_streaming(jnp.asarray(x))
    err = np.sqrt(np.mean((np.asarray(y) - off) ** 2))
    assert err < 1e-9, err
    # continue the stream with carried state
    y2, _ = eng.process_streaming(jnp.asarray(x), st)
    assert np.asarray(y2).shape == x.shape


def test_engine_progressive_upgrade():
    eng = ConvoPeqEngine(SR, 512)
    ir = _ir(3000)
    eng.load_impulse_response(ir, SR)
    assert eng.latency_breakdown().algorithm_latency_samples == 512
    eng.progressive_upgrade(2048)
    assert eng.latency_breakdown().algorithm_latency_samples == 2048
    x = RNG.normal(size=(2, 4096)) * 0.2
    y = np.asarray(eng.process(jnp.asarray(x)))
    assert np.all(np.isfinite(y))


def test_ir_jump_protection_clamps_scale():
    """IRConverter current-IR jump protection (IRConverter.cpp:124-168):
    the clamp ratio caps the new effective level at 4x the current one,
    gated by the absolute floors (0.5 peak / 0.25 RMS) that make it a
    backstop for scales computed outside the clamped pipeline."""
    from convopeq_tpu.engine.engine import (compute_ir_scale,
                                            jump_protection_clamp)
    # fires: new peak 0.8 vs current 0.1 -> ratio 4*0.1/0.8 = 0.5
    assert jump_protection_clamp(0.8, 0.1, 0.1, 0.05) == 0.5
    # RMS-driven: new rms 0.4 vs current 0.05 -> 4*0.05/0.4 = 0.5
    assert jump_protection_clamp(0.3, 0.4, 0.2, 0.05) == 0.5
    # below the absolute floors: never fires even at >4x
    assert jump_protection_clamp(0.4, 0.2, 0.01, 0.01) == 1.0
    # no current level -> no clamp
    assert jump_protection_clamp(0.8, 0.4, 0.0, 0.0) == 1.0
    # within 4x -> no clamp
    assert jump_protection_clamp(0.6, 0.3, 0.2, 0.1) == 1.0

    # in the standard pipeline the peak/RMS ceilings keep effective levels
    # at/below the floors, so a normal IR swap is never re-clamped
    rng = np.random.default_rng(11)
    quiet = rng.normal(size=(2, 2000)) * 1e-3
    loud = rng.normal(size=(2, 2000)) * 0.5
    free_scale = compute_ir_scale(loud)
    assert compute_ir_scale(
        loud, current_ir=quiet * compute_ir_scale(quiet),
        current_scale=1.0) == free_scale


def test_progressive_upgrade_ladder():
    """ProgressiveUpgradeThread analog: the ladder {1024,2048,4096} is
    filtered to (current, target]; background mode publishes each step and
    a new IR load (generation bump) cancels in-flight upgrades."""
    import time
    from convopeq_tpu.engine.engine import ConvoPeqEngine, ProgressiveUpgrader
    rng = np.random.default_rng(5)
    ir = rng.normal(size=(2, 4000)) * np.exp(-np.arange(4000) / 600.0) * 0.2
    eng = ConvoPeqEngine(sample_rate=48000.0, block_size=512)
    eng.load_impulse_response(ir, 48000.0)

    seen = []
    up = eng.progressive_upgrade(4096, background=True,
                                 on_step=seen.append)
    up.join(timeout=120)
    assert not up.is_alive()
    assert seen == [1024, 2048, 4096]
    assert eng.block_size == 4096

    # ladder filtering: target below the first step -> no steps
    assert ProgressiveUpgrader(eng, 4096).steps == []
    eng2 = ConvoPeqEngine(sample_rate=48000.0, block_size=512)
    eng2.load_impulse_response(ir, 48000.0)
    assert ProgressiveUpgrader(eng2, 2048).steps == [1024, 2048]

    # generation check: a different IR load invalidates the upgrader
    up2 = ProgressiveUpgrader(eng2, 4096)
    eng2.load_impulse_response(ir * 0.5, 48000.0)
    up2.run()
    assert up2.completed_steps == []
    # explicit cancel
    up3 = ProgressiveUpgrader(eng2, 4096)
    up3.cancel()
    up3.run()
    assert up3.completed_steps == []


def test_engine_live_learning_session():
    """Live adaptive-shaper learning (AudioEngine.Learning.cpp analog):
    streamed blocks are captured into the SPSC ring, the worker runs a
    CMA-ES generation, the learned bank publishes into adaptive_banks,
    and the ADAPTIVE9 dither path consumes it."""
    import time
    from convopeq_tpu.models.dither import ADAPTIVE9

    eng = ConvoPeqEngine(SR, 512)
    eng.set_bypass(eq=True, conv=True)
    eng.set_dither(ADAPTIVE9, 16)
    eng.start_learning(mode=0)
    assert eng.start_learning() is eng        # idempotent while running

    x = jnp.asarray(RNG.normal(size=(1, 2, 512 * 10)) * 0.3)
    st = None
    deadline = time.monotonic() + 240.0
    while eng._learner.generation < 1 and time.monotonic() < deadline:
        _, st = eng.process_streaming(x, state=st)
        time.sleep(0.05)
    state = eng.stop_learning()
    assert state.generations >= 1, "worker never completed a generation"
    assert np.isfinite(state.best_score)
    assert eng.adaptive_banks.get(SR, 16, 0) is not None
    # banks ride the preset round trip and the dither path consumes them
    eng2 = ConvoPeqEngine(SR, 512)
    eng2.load_state(eng.save_state())
    assert eng2.adaptive_banks.get(SR, 16, 0) is not None
    y, _ = eng2.process_streaming(x)
    grid = np.asarray(y) * 32768.0
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-9)


def test_engine_live_learning_session_96k_publishes_bank_quality():
    """Second end-to-end live-learning artifact (VERDICT r4 #10), on a
    different (SR, depth, mode): 96 kHz / 24-bit / mode 2, fed the SAME
    deterministic program material the factory-bank trainer uses.
    Pins that a live session (a) publishes a bank MID-STREAM (visible
    in adaptive_banks while the worker is still running), (b) converges
    to factory-bank evaluator cost: the published coefficients, scored
    with the trainer's warm-started objective, land within 5% of the
    shipped 96k/24 factory bank's recorded best_score (at 24-bit the
    masked floor ~= the flat cost, so this pins the whole live pipeline
    — capture ring, leveling, CMA-ES, publication — not a large gain;
    see test_learner.test_factory_bank_fixture_quality for the honest
    quality statement)."""
    import json
    import os
    import sys
    import time
    from convopeq_tpu.models.dither import ADAPTIVE9
    from convopeq_tpu.models.learner import NoiseShaperLearner
    from convopeq_tpu.ir.cmaes import CmaEs

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from train_banks import EVAL_BLOCKS, program_material

    sr, bits, mode = 96000.0, 24, 2
    eng = ConvoPeqEngine(sr, 512)
    eng.set_bypass(eq=True, conv=True)
    eng.set_dither(ADAPTIVE9, bits)
    eng.start_learning(mode=mode)

    audio = program_material(sr)
    x = jnp.asarray(audio[None, :, :512 * 8] * 1.0)
    st = None
    deadline = time.monotonic() + 240.0
    mid_stream_bank = None
    while eng._learner.generation < 2 and time.monotonic() < deadline:
        _, st = eng.process_streaming(x, state=st)
        if eng._learner.generation >= 1 and mid_stream_bank is None:
            mid_stream_bank = eng.adaptive_banks.get(sr, bits, mode)
        time.sleep(0.05)
    state = eng.stop_learning()
    assert state.generations >= 2, "worker never completed 2 generations"
    assert mid_stream_bank is not None, "no mid-stream publication"

    # score the live-learned bank with the factory trainer's objective
    k_live = eng.adaptive_banks.get(sr, bits, mode)
    assert k_live is not None
    path = os.path.join(os.path.dirname(__file__), "..", "convopeq_tpu",
                        "data", "learned_banks.json")
    with open(path) as f:
        rec = [r for r in json.load(f)["training"].values()
               if r["sample_rate"] == sr and r["bit_depth"] == bits][0]
    scorer = NoiseShaperLearner(sr, bits, mode=mode, seed=0,
                                eval_blocks=EVAL_BLOCKS)
    cost_live = scorer._cost(CmaEs.parcor_to_unconstrained(
        np.asarray(k_live)), audio)
    assert cost_live <= rec["best_score"] * 1.05, (
        cost_live, rec["best_score"])


def test_mix_ramp_spans_short_buffers():
    """A wet/dry mix change whose smoothing window is longer than one
    process() buffer continues ramping across calls (the LinearRamp is
    not truncated to a single buffer) and retargets from the value
    actually reached."""
    eng = ConvoPeqEngine(SR, 512)
    eng.set_bypass(eq=True)
    ir = np.zeros(800)
    ir[0] = 1.0
    eng.load_impulse_response(ir, SR)
    eng.set_mix_smoothing_time(0.1)            # 4800-step window
    eng.set_wet_dry_mix(0.0)
    eng.process(jnp.zeros((1, 2, 8192)))       # absorbs the 1.0->0.0 ramp
    assert eng._pending_mix_ramp is None
    eng.set_wet_dry_mix(1.0)

    x = jnp.zeros((1, 2, 1024))
    eng.process(x)                              # 1024 of 4800 steps
    pend = eng._pending_mix_ramp
    assert isinstance(pend, tuple)
    reached, remaining = pend
    np.testing.assert_allclose(reached, 1024 / 4800, rtol=1e-12)
    assert remaining == 4800 - 1024
    eng.process(x)                              # continue the trajectory
    reached2, remaining2 = eng._pending_mix_ramp
    np.testing.assert_allclose(reached2, 2048 / 4800, rtol=1e-12)
    assert remaining2 == 4800 - 2048
    # mid-ramp retarget starts from the reached value
    eng.set_wet_dry_mix(0.25)
    assert eng._pending_mix_ramp == reached2
    # a buffer >= the window finishes the ramp
    eng.process(jnp.zeros((1, 2, 8192)))
    assert eng._pending_mix_ramp is None


def test_structural_change_with_mix_change_still_crossfades():
    """A mix change riding along with a structural change (new IR) must
    not suppress the structural crossfade — the pure-mix-change skip
    compares the full mix-stripped chain key, not just the config."""
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM  # noqa: F401
    rng = np.random.default_rng(9)
    ir_a = rng.normal(size=1200) * np.exp(-np.arange(1200) / 200.0)
    ir_b = rng.normal(size=1200) * np.exp(-np.arange(1200) / 200.0)
    eng = ConvoPeqEngine(SR, 512)
    eng.set_bypass(eq=True)
    eng.load_impulse_response(ir_a, SR)
    x = jnp.asarray(rng.normal(size=(1, 2, 8192)) * 0.25)
    eng.process(x)                              # publish chain A
    eng.set_wet_dry_mix(0.7)                    # mix change AND
    eng.load_impulse_response(ir_b, SR)         # structural change
    eng.process(x)
    cats = [e.category for e in eng.telemetry.events]
    assert "crossfade" in cats, \
        "structural change was hard-switched because a mix ramp rode along"


def test_engine_folded_streaming_matches_offline_fused():
    """engine.streaming_chain(folded=True) bakes the LTI stages into the
    IR; its steady-state output equals the offline folded chain built
    from the same engine state (models.chain.process_chain_fused)."""
    from convopeq_tpu.models.chain import (prepare_folded_convolver,
                                           process_chain_fused)
    eng = ConvoPeqEngine(SR, 512)
    n_ir = 6000
    ir = RNG.normal(size=(2, n_ir)) * np.exp(-np.arange(n_ir) / 1500.0) * 0.2
    eng.load_impulse_response(ir, SR, target_seconds=n_ir / SR)
    eng.set_eq_band(0, band_type=1, freq=800.0, gain_db=4.0, q=1.0)

    sc = eng.streaming_chain(folded=True)
    assert sc.block_size == 512

    cfg = eng._effective_config()
    st = prepare_folded_convolver(
        jnp.asarray(eng._ir_prepared, eng.dtype), eng.block_size,
        eng.filter_spec, cfg, eng.eq_params, dtype=eng.dtype,
        partition=None)
    n = 32768
    x = RNG.normal(size=(2, n)) * 0.3
    y_off = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st))
    y, _ = sc.process(jnp.asarray(x))
    y = np.asarray(y)
    warmup = max(lp.offset + 2 * lp.part_size for lp in sc.left.plan.layers)
    sl = slice(warmup, n)
    ref = np.sqrt(np.mean(y_off[..., sl] ** 2))
    err = np.sqrt(np.mean((y[..., sl] - y_off[..., sl]) ** 2)) / ref
    assert err < 1e-9, err


def test_engine_streaming_chain_bigblock_tier():
    """engine.streaming_chain(folded=True, partition=M*block) builds the
    bigblock windowed serving tier: single-layer plan at the window
    partition, step == one window, output equal to the per-block folded
    tier in steady state."""
    import numpy as np
    import jax.numpy as jnp
    eng = ConvoPeqEngine(SR, 512)
    eng.load_impulse_response(_ir(40000), SR)
    eng.set_eq_band(0, band_type=1, freq=1000.0, gain_db=3.0, q=1.0,
                    enabled=True)
    sc_bb = eng.streaming_chain(folded=True, partition=8 * 512)
    assert sc_bb.block_size == 8 * 512
    assert len(sc_bb.left.plan.layers) == 1
    sc_ref = eng.streaming_chain(folded=True)
    assert sc_ref.block_size == 512
    rng = np.random.default_rng(3)
    n = 16 * 4096
    x = rng.normal(size=(2, n)) * 0.3
    y_bb, _ = sc_bb.process(jnp.asarray(x, jnp.float64))
    y_ref, _ = sc_ref.process(jnp.asarray(x, jnp.float64))
    warm = max(lp.offset + 2 * lp.part_size
               for lp in sc_ref.left.plan.layers)
    err = np.sqrt(np.mean((np.asarray(y_bb)[..., warm:]
                           - np.asarray(y_ref)[..., warm:]) ** 2))
    ref = np.sqrt(np.mean(np.asarray(y_ref)[..., warm:] ** 2))
    assert err / ref < 1e-9, err / ref
    import pytest
    with pytest.raises(ValueError):
        eng.streaming_chain(partition=4096)        # needs folded=True
