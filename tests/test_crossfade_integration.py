"""Engine-integrated crossfade + telemetry (the live-path ISR residue).

Ref behaviors being modeled: CrossfadeRuntime mix loop on every structural
change (src/audioengine/CrossfadeRuntime.h:1-222, fade table
ARCHITECTURE.md:694-704), XRUN contract (ARCHITECTURE.md:397), health /
policy ticking (RuntimeHealthMonitor.h:38-41).
"""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from convopeq_tpu.engine.engine import ConvoPeqEngine
from convopeq_tpu.models.nuc import HC_NATURAL, HC_SHARP
from convopeq_tpu.runtime.crossfade import FADE_TIMES_SEC

SR = 48000.0
RNG = np.random.default_rng(11)


def _ir(n=2000):
    t = np.arange(n)
    return RNG.normal(size=(2, n)) * np.exp(-t / 300.0) * 0.3


def _mk_engine(hc=HC_NATURAL):
    # conv_hc_mode drives the OUTPUT-filter stage only (the IR-spectrum
    # filter is FilterSpec.hc_mode, applied at prepare time) — so flipping
    # it is a pure chain-config change, no IR rebuild.
    eng = ConvoPeqEngine(SR, 512)
    eng.config = replace(eng.config, conv_hc_mode=hc)
    return eng


def test_streaming_crossfade_on_config_change():
    """A conv_hc_mode flip mid-stream fades old->new over 30 ms
    (nuc_filter class) instead of hard-switching, and the post-fade output
    equals the new chain started fresh at the switch point."""
    ir = _ir()
    x = RNG.normal(size=(1, 2, 512 * 16)) * 0.25
    x1, x2 = x[..., : 512 * 6], x[..., 512 * 6:]

    eng = _mk_engine()
    eng.load_impulse_response(ir, SR)
    y1, st = eng.process_streaming(jnp.asarray(x1))
    eng.config = replace(eng.config, conv_hc_mode=HC_SHARP)
    y2, st = eng.process_streaming(jnp.asarray(x2), st)
    y2 = np.asarray(y2)

    # expected OLD path: the A chain continued with its carried state
    eng_a = _mk_engine()
    eng_a.load_impulse_response(ir, SR)
    _, st_a = eng_a.process_streaming(jnp.asarray(x1))
    y_old, _ = eng_a.process_streaming(jnp.asarray(x2), st_a)
    y_old = np.asarray(y_old)

    # expected NEW path: the B chain from fresh state at the switch point
    eng_b = _mk_engine(HC_SHARP)
    eng_b.load_impulse_response(ir, SR)
    y_new, _ = eng_b.process_streaming(jnp.asarray(x2))
    y_new = np.asarray(y_new)

    fade_n = int(round(FADE_TIMES_SEC["nuc_filter"] * SR))
    n2 = y2.shape[-1]
    g = np.minimum((np.arange(n2) + 1) / fade_n, 1.0)
    expected = y_old * (1.0 - g) + y_new * g
    np.testing.assert_allclose(y2, expected, atol=1e-12)

    # telemetry recorded the transition
    cats = [e.category for e in eng.telemetry.events]
    assert "crossfade" in cats
    rep = eng.telemetry_report()
    assert rep["steps"] == 16
    assert rep["health"] in (0, 1, 2)


def test_streaming_hard_switch_when_disabled():
    ir = _ir()
    x = RNG.normal(size=(1, 2, 512 * 8)) * 0.25
    x1, x2 = x[..., : 512 * 4], x[..., 512 * 4:]
    eng = _mk_engine()
    eng.crossfade_enabled = False
    eng.load_impulse_response(ir, SR)
    _, st = eng.process_streaming(jnp.asarray(x1))
    eng.config = replace(eng.config, conv_hc_mode=HC_SHARP)
    y2, _ = eng.process_streaming(jnp.asarray(x2), st)
    # hard switch carries the (structurally compatible) old state into the
    # new chain — expected: the B chain continued with the A-chain state
    eng_b = _mk_engine(HC_SHARP)
    eng_b.load_impulse_response(ir, SR)
    sc_b = eng_b.streaming_chain()
    y_new, _ = sc_b.process(jnp.asarray(x2), st.chain)  # unwrap StreamCarry
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_new), atol=1e-12)


def test_offline_process_crossfade():
    """Offline process() also fades a structural change: the first fade
    window mixes the OLD chain's output into the new one."""
    ir = _ir()
    x = RNG.normal(size=(1, 2, 8192)) * 0.25

    eng = _mk_engine()
    eng.load_impulse_response(ir, SR)
    y_a = np.asarray(eng.process(jnp.asarray(x)))     # publishes chain A
    eng.config = replace(eng.config, conv_hc_mode=HC_SHARP)
    y_mix = np.asarray(eng.process(jnp.asarray(x)))   # A->B crossfade

    eng_b = _mk_engine(HC_SHARP)
    eng_b.load_impulse_response(ir, SR)
    y_b = np.asarray(eng_b.process(jnp.asarray(x)))

    fade_n = int(round(FADE_TIMES_SEC["nuc_filter"] * SR))
    g = np.minimum((np.arange(fade_n) + 1) / fade_n, 1.0)
    expected = y_a[..., :fade_n] * (1.0 - g) + y_b[..., :fade_n] * g
    np.testing.assert_allclose(y_mix[..., :fade_n], expected, atol=1e-12)
    np.testing.assert_allclose(y_mix[..., fade_n:], y_b[..., fade_n:],
                               atol=1e-12)
    # re-processing with no further change is NOT faded
    y_again = np.asarray(eng.process(jnp.asarray(x)))
    np.testing.assert_allclose(y_again, y_b, atol=1e-12)


def test_xrun_and_health_tick():
    """The streaming path ticks the XRUN detector and health monitor."""
    ir = _ir(800)
    eng = _mk_engine()
    eng.load_impulse_response(ir, SR)
    x = RNG.normal(size=(1, 2, 512 * 4)) * 0.25
    _, st = eng.process_streaming(jnp.asarray(x))
    assert eng._xrun is not None and eng._xrun.steps == 4
    rep = eng.telemetry_report()
    assert rep["policy_level"] >= 0 and "xruns" in rep


def test_convolver_mix_ramp_exact():
    """convolver_process(mix_ramp=...) applies the reference's per-sample
    equal-power gains (ConvolverProcessor.Runtime.cpp:601-603): with a
    1-tap identity IR (spectrum filter off) the output is exactly
    x * (eps(mix_i)*headroom + eps(1-mix_i))."""
    from convopeq_tpu.models.convolver import (
        CONVOLUTION_HEADROOM_GAIN, convolver_process, stereo_prepare)
    from convopeq_tpu.models.nuc import FilterSpec
    from convopeq_tpu.utils.dsputil import equal_power_sin

    sr = 48000.0
    n = 2048
    ir = np.zeros(1024)
    ir[0] = 1.0
    st = stereo_prepare(jnp.asarray(np.stack([ir, ir])), 512,
                        FilterSpec(sample_rate=sr),
                        apply_spectrum_filter=False)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, n)) * 0.1
    steps = int(sr * 0.01 + 0.5)
    k = np.arange(n) + 1.0                       # LinearRamp: advance first
    mix = np.where(k >= steps, 0.25, 1.0 + (0.25 - 1.0) / steps * k)
    y = np.asarray(convolver_process(jnp.asarray(x), st, mix_ramp=mix))
    eps = lambda m: np.asarray(equal_power_sin(m), float)
    expected = x * (eps(mix) * CONVOLUTION_HEADROOM_GAIN + eps(1.0 - mix))
    np.testing.assert_allclose(y, expected, atol=1e-12)


def test_wet_dry_mix_change_is_smoothed_per_sample():
    """Engine behavior on a wet/dry mix change (the reference's
    mixSmoother): the transition must be glitch-free per-sample — NOT a
    hard switch and NOT a 'default' crossfade — and converge to the
    static new-mix output after the smoothing window."""
    from convopeq_tpu.engine.engine import ConvoPeqEngine
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.nuc import FilterSpec

    sr = 48000.0
    n = 16384
    eng = ConvoPeqEngine(sample_rate=sr)
    eng.set_bypass(eq=True)
    eng.auto_gain_enabled = False
    ir = np.zeros(1024)
    ir[0] = 1.0
    eng._conv_state = stereo_prepare(
        jnp.asarray(np.stack([ir, ir])), 512, FilterSpec(sample_rate=sr),
        apply_spectrum_filter=False)
    eng._ir_content_key = "identity-test"
    eng.set_mix_smoothing_time(0.01)             # 480-sample window
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, n)) * 0.1

    eng.set_wet_dry_mix(1.0)
    eng.process(x)                               # publish the old chain
    before = len(eng.telemetry.drain())

    # static new-mix output for comparison (separate engine, no pending ramp)
    eng2 = ConvoPeqEngine(sample_rate=sr)
    eng2.set_bypass(eq=True)
    eng2.auto_gain_enabled = False
    eng2._conv_state = eng._conv_state
    eng2._ir_content_key = "identity-test"
    eng2.set_wet_dry_mix(0.25)
    eng2._pending_mix_ramp = None        # truly static: no smoothing ramp
    y_static = np.asarray(eng2.process(x))

    eng.set_wet_dry_mix(0.25)
    y = np.asarray(eng.process(x))

    # converged tail == static new-mix output: after the 480-sample
    # window the residual is the output filter's ~18 Hz pole (tau ~600
    # samples) ringing out the transition difference — gone by ~12k
    np.testing.assert_allclose(y[..., 12000:], y_static[..., 12000:],
                               atol=3e-8)
    # the head is NOT a hard switch: the first samples sit near the OLD
    # gain trajectory, far from the static new-mix output
    head_dev_static = np.abs(y[..., :64] - y_static[..., :64]).max()
    assert head_dev_static > 1e-3
    # no crossfade event was recorded for the pure mix change
    evs = eng.telemetry.drain()
    assert not [e for e in evs if e.category == "crossfade"]
