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
    y_new, _ = sc_b.process(jnp.asarray(x2), st)
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
