"""Crossfade plane and FFT backend abstraction."""
import numpy as np
import jax.numpy as jnp

from convopeq_tpu.runtime.crossfade import (
    classify_transition, fade_time_for, crossfade_mix, crossfade_blocks,
    CrossfadeState, FADE_TIMES_SEC)
from convopeq_tpu.ops import fft_backend as fb

RNG = np.random.default_rng(55)
SR = 48000.0


def test_classify_and_fade_time():
    old = {"conv_bypassed": False, "oversampling_factor": 1,
           "conv_hc_mode": 1, "conv_lc_mode": 0, "phase_mode": 0,
           "tail_mode": 1, "enable_direct_head": False,
           "target_ir_seconds": 1.0}
    new = dict(old, conv_bypassed=True, oversampling_factor=2)
    trig = classify_transition(old, new)
    assert set(trig) == {"conv_bypass", "oversampling"}
    assert fade_time_for(trig) == FADE_TIMES_SEC["conv_bypass"]  # longest
    assert fade_time_for(()) == 0.0
    assert fade_time_for(("direct_head",)) == 0.010


def test_crossfade_mix_ramp():
    n = 4800   # 100 ms at 48k
    old = np.ones((2, n))
    new = np.zeros((2, n))
    y = np.asarray(crossfade_mix(jnp.asarray(old), jnp.asarray(new), SR, 0.05))
    # LinearRamp advances before returning (reference parity, pinned by
    # tests/ref_harness dump_engine_math): sample 0 carries 1/fade_samples
    # of new, the ramp hits exactly 1.0 on its final step (index 2399).
    fade_n = 2400
    assert abs(y[0, 0] - (1.0 - 1.0 / fade_n)) < 1e-9
    assert abs(y[0, 1199] - 0.5) < 1e-9
    assert abs(y[0, fade_n - 1]) < 1e-9
    assert np.all(y[:, fade_n:] == 0.0)


def test_crossfade_latency_alignment():
    n = 1000
    new = np.arange(n, dtype=float)[None, :]
    old = np.zeros((1, n))
    y = np.asarray(crossfade_mix(jnp.asarray(old), jnp.asarray(new), SR,
                                 1e-9, new_latency_offset=5))
    # fade completes immediately -> output is the delayed new path
    np.testing.assert_allclose(y[0, 5:], new[0, :-5])
    np.testing.assert_allclose(y[0, :5], 0.0)


def test_crossfade_blockwise_equals_oneshot():
    n, bs = 2048, 256
    old = RNG.normal(size=(2, n))
    new = RNG.normal(size=(2, n))
    full = np.asarray(crossfade_mix(jnp.asarray(old), jnp.asarray(new), SR,
                                    0.02))
    st = CrossfadeState(fade_samples=int(round(0.02 * SR)))
    outs = []
    for k in range(n // bs):
        sl = slice(k * bs, (k + 1) * bs)
        st, y = crossfade_blocks(st, jnp.asarray(old[:, sl]),
                                 jnp.asarray(new[:, sl]), SR)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=-1), full,
                               atol=1e-12)
    assert not st.active


def test_fft_backend_matmul_matches_xla():
    x = RNG.normal(size=(3, 256))
    try:
        fb.set_provider("matmul")
        y_mm = np.asarray(fb.rfft(jnp.asarray(x)))
        back_mm = np.asarray(fb.irfft(jnp.asarray(y_mm), n=256))
    finally:
        fb.set_provider("xla")
    y_ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(y_mm, y_ref, atol=1e-9)
    np.testing.assert_allclose(back_mm, x, atol=1e-9)
    # xla provider agrees too
    y_xla = np.asarray(fb.rfft(jnp.asarray(x)))
    np.testing.assert_allclose(y_xla, y_ref, atol=1e-10)


def test_fft_backend_padding_and_axis():
    x = RNG.normal(size=(4, 100))
    y = np.asarray(fb.rfft(jnp.asarray(x), n=128))
    np.testing.assert_allclose(y, np.fft.rfft(x, n=128, axis=-1), atol=1e-10)
    xt = RNG.normal(size=(64, 5))
    yt = np.asarray(fb.rfft(jnp.asarray(xt), axis=0))
    np.testing.assert_allclose(yt, np.fft.rfft(xt, axis=0), atol=1e-10)
