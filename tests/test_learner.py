"""Adaptive noise-shaper learner and psychoacoustic evaluator."""
import numpy as np
import pytest

from convopeq_tpu.models.learner import (
    SpectralEvaluator, NoiseShaperLearner, simulate_shaper_error,
    coefficient_bank_index, a_weight_power, ath_spl_db, NUM_BANKS,
    K_FFT_LENGTH)

RNG = np.random.default_rng(41)
SR = 48000.0


def test_a_weighting_shape():
    w = a_weight_power(np.array([100.0, 1000.0, 4000.0, 20000.0]), 24000.0)
    # A-weighting: peak near 2-4 kHz, low at 100 Hz, rolled off at 20 kHz
    assert w[2] > w[1] > w[0]
    assert w[3] < w[1]
    # floor is enforced
    assert np.all(w >= 1.0e-6)


def test_ath_curve():
    # ATH minimum sits in the 3-4 kHz region
    f = np.array([100.0, 1000.0, 3500.0, 15000.0])
    a = ath_spl_db(f)
    assert a[2] == a.min()
    assert a[0] > a[2] and a[3] > a[2]


def test_bank_index_coverage():
    seen = set()
    for sr in [44100.0, 48000.0, 96000.0, 192000.0, 384000.0, 768000.0]:
        for bits in [16, 24, 32]:
            for mode in range(6):
                seen.add(coefficient_bank_index(sr, bits, mode))
    assert len(seen) == 6 * 3 * 6
    assert max(seen) < NUM_BANKS


def test_evaluator_prefers_shaped_noise():
    """Noise pushed to ultrasonics must score better than flat noise of the
    same power (the whole point of noise shaping)."""
    ev = SpectralEvaluator(96000.0)
    n = K_FFT_LENGTH
    flat = RNG.normal(size=n) * 1e-4
    # high-pass the noise: differentiator pushes energy to HF
    hp = np.diff(np.concatenate([[0.0], flat]))
    hp *= np.sqrt((flat ** 2).mean() / (hp ** 2).mean())
    s_flat = ev.evaluate(flat, flat).composite_score
    s_hp = ev.evaluate(hp, hp).composite_score
    assert s_hp < s_flat


def test_evaluator_monotone_in_level():
    ev = SpectralEvaluator(SR)
    q = RNG.normal(size=K_FFT_LENGTH)
    lo = ev.evaluate(q * 1e-5, q * 1e-5).composite_score
    hi = ev.evaluate(q * 1e-3, q * 1e-3).composite_score
    assert hi > lo


def test_simulate_shaper_error_scale():
    x = RNG.normal(size=(2, K_FFT_LENGTH)) * 0.2
    err = simulate_shaper_error(x, np.zeros(9), SR, 16, RNG)
    scale = 1.0 / 32768.0
    # unshaped TPDF quantization error ~ bounded by ~1.5 LSB
    assert np.abs(err).max() < 4 * scale
    assert np.abs(err).max() > 0.1 * scale


@pytest.mark.slow
def test_learner_loop_machinery():
    """A short learning run exercises the full loop: deterministic cost,
    best tracking, bounded parcor coefficients, and no divergence from the
    unshaped baseline.  (The reference's learning schedule converges over
    10-160 MINUTES — ARCHITECTURE.md:44 — so a unit test only checks the
    machinery, not convergence.)"""
    sr = 96000.0
    learner = NoiseShaperLearner(sr, bit_depth=16, seed=5)
    t = np.arange(2 * K_FFT_LENGTH) / sr
    audio = np.stack([np.sin(2 * np.pi * 440.0 * t),
                      np.sin(2 * np.pi * 554.0 * t)]) * 0.3
    zero_cost = learner._cost(np.zeros(9), audio)
    # deterministic objective (fixed dither draw)
    assert learner._cost(np.zeros(9), audio) == zero_cost
    st = learner.feed(audio, generations=12)
    assert st.generations == 12
    assert np.isfinite(st.best_score)
    # near-zero candidates exist in every population: best can't be much
    # worse than the unshaped quantizer
    assert st.best_score < zero_cost * 1.25, (st.best_score, zero_cost)
    assert np.all(np.abs(st.best_coefficients) < 1.0)
    assert st.bank_index == coefficient_bank_index(sr, 16, 0)
