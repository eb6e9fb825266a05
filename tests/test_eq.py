"""20-band EQ model vs per-sample golden model."""
import numpy as np
import pytest
import jax.numpy as jnp

from convopeq_tpu.models.eq import (
    EQParams, eq_process, eq_process_bands, agc_apply, SERIAL, PARALLEL,
)
from golden import eq_serial_golden, eq_parallel_golden, agc_golden

RNG = np.random.default_rng(7)
SR = 48000.0


def _mk_params(bands, structure=SERIAL, saturation=0.0, agc=False):
    p = EQParams(structure=structure, saturation=saturation, agc_enabled=agc)
    p.enabled[:] = False
    for i, b in enumerate(bands):
        p.set_band(i, band_type=b["type"], freq=b["freq"], gain_db=b["gain_db"],
                   q=b["q"], mode=b.get("mode", 0), enabled=b.get("enabled", True))
    return p


BANDS_MIXED = [
    {"type": 0, "freq": 60.0, "gain_db": 4.0, "q": 0.707, "mode": 0},
    {"type": 1, "freq": 250.0, "gain_db": -3.0, "q": 1.4, "mode": 0},
    {"type": 1, "freq": 1000.0, "gain_db": 6.0, "q": 2.0, "mode": 3},   # Mid
    {"type": 1, "freq": 3000.0, "gain_db": -4.5, "q": 0.9, "mode": 4},  # Side
    {"type": 2, "freq": 9000.0, "gain_db": 2.5, "q": 0.707, "mode": 0},
    {"type": 1, "freq": 5000.0, "gain_db": 3.0, "q": 3.0, "mode": 1},   # Left
    {"type": 1, "freq": 7000.0, "gain_db": -2.0, "q": 3.0, "mode": 2},  # Right
    {"type": 4, "freq": 30.0, "gain_db": 0.0, "q": 0.707, "mode": 0},   # HP (0dB stays active)
    {"type": 3, "freq": 18000.0, "gain_db": 0.0, "q": 0.707, "mode": 0},# LP
    {"type": 1, "freq": 440.0, "gain_db": 0.005, "q": 1.0, "mode": 0},  # inactive (tiny gain)
]


def _stereo_sig(n=4096):
    return RNG.normal(size=(2, n)) * 0.4


def test_eq_serial_matches_golden():
    x = _stereo_sig()
    params = _mk_params(BANDS_MIXED, structure=SERIAL)
    got = np.asarray(eq_process(jnp.asarray(x), params, SR))
    refL, refR = eq_serial_golden(x[0], x[1], BANDS_MIXED, SR)
    err = np.sqrt(np.mean((got - np.stack([refL, refR])) ** 2))
    assert err < 1e-11, err


def test_eq_serial_saturation_matches_golden():
    x = _stereo_sig(2048) * 2.0
    params = _mk_params(BANDS_MIXED, structure=SERIAL, saturation=0.5)
    got = np.asarray(eq_process(jnp.asarray(x), params, SR))
    refL, refR = eq_serial_golden(x[0], x[1], BANDS_MIXED, SR, saturation=0.5)
    err = np.sqrt(np.mean((got - np.stack([refL, refR])) ** 2))
    assert err < 1e-11, err


def test_eq_parallel_matches_golden():
    x = _stereo_sig(2048)
    params = _mk_params(BANDS_MIXED, structure=PARALLEL)
    got = np.asarray(eq_process(jnp.asarray(x), params, SR))
    refL, refR = eq_parallel_golden(x[0], x[1], BANDS_MIXED, SR)
    err = np.sqrt(np.mean((got - np.stack([refL, refR])) ** 2))
    assert err < 1e-11, err


def test_eq_disabled_band_is_identity():
    x = _stereo_sig(1024)
    params = EQParams()
    params.enabled[:] = False
    got = np.asarray(eq_process(jnp.asarray(x), params, SR))
    np.testing.assert_allclose(got, x, atol=0)


def test_eq_default_params_zero_gain_is_identity():
    # default peaking bands at 0 dB are inactive (|gain| < 0.01)
    x = _stereo_sig(512)
    got = np.asarray(eq_process(jnp.asarray(x), EQParams(), SR))
    np.testing.assert_allclose(got, x, atol=0)


def test_eq_batched_streams():
    x = RNG.normal(size=(3, 2, 1024)) * 0.3
    params = _mk_params(BANDS_MIXED[:5])
    got = np.asarray(eq_process(jnp.asarray(x), params, SR))
    for i in range(3):
        refL, refR = eq_serial_golden(x[i, 0], x[i, 1], BANDS_MIXED[:5], SR)
        np.testing.assert_allclose(got[i], np.stack([refL, refR]), atol=1e-11)


def test_agc_matches_golden():
    n, bs = 8192, 512
    pre = RNG.normal(size=(2, n)) * 0.2
    post = pre * 2.5   # pretend EQ boosted by 8 dB
    got = np.asarray(agc_apply(jnp.asarray(pre), jnp.asarray(post), SR, bs))
    ref = agc_golden(pre, post, SR, bs)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_eq_with_agc_end_to_end():
    n, bs = 4096, 256
    x = _stereo_sig(n)
    bands = BANDS_MIXED[:4]
    params = _mk_params(bands, agc=True)
    got = np.asarray(eq_process(jnp.asarray(x), params, SR, block_size=bs))
    refL, refR = eq_serial_golden(x[0], x[1], bands, SR)
    ref = agc_golden(x, np.stack([refL, refR]), SR, bs)
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_eq_fft_path_matches_scan():
    """The frequency-domain fast path equals the scan path within the
    padded ringing-tail bound (f64)."""
    from convopeq_tpu.models.eq import eq_process_bands
    x = _stereo_sig(16384)
    params = _mk_params(BANDS_MIXED, structure=SERIAL)
    y_scan = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                         method="scan"))
    y_fft = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                        method="fft"))
    err = np.sqrt(np.mean((y_scan - y_fft) ** 2)) / np.sqrt(np.mean(y_scan ** 2))
    assert err < 1e-8, err


def test_eq_fft_path_parallel_structure():
    from convopeq_tpu.models.eq import eq_process_bands
    x = _stereo_sig(8192)
    params = _mk_params(BANDS_MIXED, structure=PARALLEL)
    y_scan = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                         method="scan"))
    y_fft = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                        method="fft"))
    err = np.sqrt(np.mean((y_scan - y_fft) ** 2)) / np.sqrt(np.mean(y_scan ** 2))
    assert err < 1e-8, err


def test_eq_fft_path_high_q_padding():
    """High-Q low-frequency band: padding must grow to keep the bound."""
    from convopeq_tpu.models.eq import eq_process_bands, _eq_ring_tail_samples
    bands = [{"type": 1, "freq": 40.0, "gain_db": 10.0, "q": 20.0, "mode": 0}]
    params = _mk_params(bands)
    pad = _eq_ring_tail_samples(params, SR)
    assert pad > 100000   # tau = Q*sr/(pi*f) ~ 7.6k samples, eps 1e-10
    x = _stereo_sig(4096)
    y_scan = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                         method="scan"))
    y_fft = np.asarray(eq_process_bands(jnp.asarray(x), params, SR,
                                        method="fft"))
    err = np.sqrt(np.mean((y_scan - y_fft) ** 2)) / np.sqrt(np.mean(y_scan ** 2))
    assert err < 1e-8, err


def test_eq_fft_rejects_saturation():
    from convopeq_tpu.models.eq import eq_process_bands
    params = _mk_params(BANDS_MIXED[:2], saturation=0.5)
    x = _stereo_sig(1024)
    with pytest.raises(ValueError):
        eq_process_bands(jnp.asarray(x), params, SR, method="fft")
    # auto falls back to scan silently
    y = np.asarray(eq_process_bands(jnp.asarray(x), params, SR, method="auto"))
    assert np.all(np.isfinite(y))


def test_upper_bound_dominates_measured():
    """The log1p-sum upper bound is >= the measured composite max for any
    band set (it bounds |prod H| and |1+sum(H-1)| alike), and the planner
    input is their max (the reference's Builder collapse)."""
    from convopeq_tpu.engine.eq_analysis import (
        estimate_max_gain_db, estimate_upper_bound_db,
        estimate_planner_gain_db)
    p = EQParams()
    p.enabled[:] = False
    p.set_band(0, band_type=1, freq=1000.0, gain_db=6.0, q=2.0, enabled=True)
    p.set_band(1, band_type=1, freq=1500.0, gain_db=4.0, q=1.0, enabled=True)
    p.set_band(2, band_type=0, freq=100.0, gain_db=3.0, q=0.7, enabled=True)
    measured = estimate_max_gain_db(p, 48000.0)
    upper, f_ub = estimate_upper_bound_db(p, 48000.0)
    assert upper >= measured - 0.05   # grid max vs interpolated peak
    assert 10.0 < f_ub < 24000.0
    assert estimate_planner_gain_db(p, 48000.0) == max(measured, upper)
    # single peaking band: bound is tight at the peak (log1p(|H-1|)
    # ~ log|H| when the band response dominates)
    p2 = EQParams()
    p2.enabled[:] = False
    p2.set_band(0, band_type=1, freq=1000.0, gain_db=6.0, q=2.0, enabled=True)
    m2 = estimate_max_gain_db(p2, 48000.0)
    u2, _ = estimate_upper_bound_db(p2, 48000.0)
    assert m2 - 0.05 <= u2 <= m2 + 1.5


def test_fft_path_identity_when_no_active_bands():
    """Flat EQ (no active bands) must pass through unchanged on every
    backend: the blocked TPU path would otherwise build a 0-tap IR
    (regression for the pad==0 -> _eq_fft_blocked(tail=0) route)."""
    from convopeq_tpu.models.eq import (eq_process_bands_fft,
                                        _eq_ring_tail_samples)
    params = EQParams()          # default: all peaking, 0 dB -> inactive
    assert _eq_ring_tail_samples(params, SR) == 0
    x = jnp.asarray(RNG.normal(size=(2, 4096)).astype(np.float32))
    y = eq_process_bands_fft(x, params, SR)
    assert np.array_equal(np.asarray(y), np.asarray(x))
