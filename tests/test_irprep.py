"""IR preparation: min/mixed phase, resampler, analyzer, CMA-ES, allpass."""
import numpy as np
import pytest

from convopeq_tpu.ir.phase import (
    minimum_phase, mixed_phase_fallback, mixed_phase_allpass, unwrap_phase)
from convopeq_tpu.ir.resample import resample_ir, design_resample_filter
from convopeq_tpu.ir.analyzer import (
    estimate_max_frequency_gain, ir_peak_gain_db, analyze_ir, tukey_window)
from convopeq_tpu.ir.cmaes import CmaEs, minimize
from convopeq_tpu.ir.allpass import (
    SecondOrderAllpass, sections_group_delay, compute_response,
    DesignerConfig, design_cmaes)

SR = 48000.0


def _test_ir(n=3000, seed=21):
    # fresh seeded generator per call: a shared module-level RNG made the
    # fixture content depend on how many tests ran before (the allpass
    # gate test then failed only in full-suite order)
    t = np.arange(n)
    ir = np.random.default_rng(seed).normal(size=n) * np.exp(-t / 400.0)
    ir[0] = 1.0
    return ir


def test_minimum_phase_preserves_magnitude():
    ir = _test_ir(2000)
    mp = minimum_phase(ir)
    assert mp.shape == ir.shape
    nfft = 16384
    H1 = np.abs(np.fft.rfft(ir, nfft))
    H2 = np.abs(np.fft.rfft(mp, nfft))
    # magnitude response preserved within the cepstral truncation error
    err_db = 20 * np.log10(np.maximum(H2, 1e-12) / np.maximum(H1, 1e-12))
    assert np.percentile(np.abs(err_db), 95) < 0.5


def test_minimum_phase_energy_front_loaded():
    """Min-phase concentrates energy at the start."""
    n = 2000
    ir = np.zeros(n)
    ir[300] = 1.0          # pure delay
    ir[500] = 0.4
    mp = minimum_phase(ir)
    e_head_lin = np.sum(ir[:100] ** 2) / np.sum(ir ** 2)
    e_head_min = np.sum(mp[:100] ** 2) / np.sum(mp ** 2)
    # min-phase of delta@300 + 0.4*delta@500 = delta@0 + 0.4*delta@200
    # (already minimum phase once the bulk delay is removed)
    assert e_head_min > 0.8 > e_head_lin


def test_minimum_phase_of_minimum_phase_is_identity_like():
    # a simple already-minimum-phase IR (decaying one-pole)
    n = 1024
    h = 0.9 ** np.arange(n)
    mp = minimum_phase(h)
    assert np.max(np.abs(mp - h)) < 1e-6


def test_unwrap_phase():
    from convopeq_tpu.ir.phase import unwrap_phase_delta
    true_phase = -0.2 * np.arange(100)
    raw = np.angle(np.exp(1j * true_phase))
    # delta-based variant (allpass path) unwraps correctly
    np.testing.assert_allclose(unwrap_phase_delta(raw), true_phase, atol=1e-9)
    # Internal.h variant applies only +-2*pi*k corrections — a no-op under
    # the cos/sin that consume its output (the fallback path), even though
    # the corrections compound on ramps.  Pin that invariant.
    single = np.concatenate([np.linspace(0, 3.0, 10),
                             np.linspace(3.0, 3.5, 5) - 2 * np.pi])
    uw = unwrap_phase(single)
    np.testing.assert_allclose(np.cos(uw), np.cos(single), atol=1e-9)
    np.testing.assert_allclose(np.sin(uw), np.sin(single), atol=1e-9)


def test_mixed_phase_fallback_blend():
    ir = _test_ir(1500)
    # delayed so the LF is linear-phase-dominant
    ir = np.concatenate([np.zeros(200), ir])[:1500]
    mp = minimum_phase(ir)
    mixed = mixed_phase_fallback(ir, mp, SR, 200.0, 700.0)
    assert mixed.shape == ir.shape
    nfft = 8192
    Hl = np.abs(np.fft.rfft(ir, nfft))
    Hx = np.abs(np.fft.rfft(mixed, nfft))
    err_db = 20 * np.log10(np.maximum(Hx, 1e-12) / np.maximum(Hl, 1e-12))
    assert np.percentile(np.abs(err_db), 95) < 0.5  # magnitude unchanged
    # HF behaves minimum-phase-like: energy arrives earlier than linear
    # (peak of mixed <= peak position of linear)
    assert np.argmax(np.abs(mixed)) <= np.argmax(np.abs(ir))


def test_resampler_spec():
    h = design_resample_filter(2, 1, 2.0, 140.0)
    # frequency response: passband ripple tiny, stopband < -140 dB
    w = np.fft.rfftfreq(1 << 18)
    H = np.abs(np.fft.rfft(h, 1 << 18)) / 2.0   # DC gain L=2
    pass_edge = 0.25 * (1 - 0.02)
    stop_edge = 0.25
    pb = H[w < pass_edge * 0.98]
    sb = H[w > stop_edge * 1.01]
    assert np.max(np.abs(20 * np.log10(pb))) < 0.01
    assert 20 * np.log10(sb.max()) < -139.0


def test_resample_sine_roundtrip():
    n = 4800
    t = np.arange(n) / 48000.0
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = resample_ir(x, 48000.0, 96000.0)
    assert len(y) == 9600
    t2 = np.arange(len(y)) / 96000.0
    ref = np.sin(2 * np.pi * 1000.0 * t2)
    # interior match (edges have filter transients)
    sl = slice(2000, -2000)
    err = np.sqrt(np.mean((y[sl] - ref[sl]) ** 2))
    assert err < 1e-5, err
    # downsample back
    z = resample_ir(y, 96000.0, 48000.0)
    err2 = np.sqrt(np.mean((z[2000:-2000] - x[2000:4800 - 2000]) ** 2))
    assert err2 < 1e-5, err2


def test_resample_production_size_fast():
    """1M-tap stereo IR through the worst rational pair (44.1<->48 kHz,
    L/M = 160/147) finishes in seconds — the polyphase GEMM path never
    materializes the zero-stuffed stream (ref: chunked r8brain usage,
    src/IRDSP.cpp:1-142)."""
    import time
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1_000_000))
    t0 = time.perf_counter()
    y = resample_ir(x, 44100.0, 48000.0)
    dt = time.perf_counter() - t0
    assert y.shape == (2, int(np.ceil(1_000_000 * 48000.0 / 44100.0)))
    assert np.isfinite(y).all()
    assert dt < 30.0, f"production-size resample took {dt:.1f}s"
    # spot-check spectrum preservation: a 1 kHz sine resamples cleanly
    n = 441_000
    t = np.arange(n) / 44100.0
    s = np.sin(2 * np.pi * 1000.0 * t)
    ys = resample_ir(s, 44100.0, 48000.0)
    t2 = np.arange(len(ys)) / 48000.0
    ref = np.sin(2 * np.pi * 1000.0 * t2)
    sl = slice(5000, -5000)
    assert np.sqrt(np.mean((ys[sl] - ref[sl]) ** 2)) < 1e-5


def test_analyzer_peak_gain():
    # delta in the Tukey window's flat region: |H| = 1 -> 0 dB
    # (a delta at sample 0 is killed by the window taper — real reference
    # behavior, IRAnalyzer.cpp:76-95)
    ir = np.zeros(4096)
    ir[2048] = 1.0
    g = estimate_max_frequency_gain(ir)
    # coherent-gain correction divides by the window mean (~0.75 for
    # Tukey 0.5), so a flat-region delta reads 1/0.75 — the reference's
    # intentionally conservative estimate for gain planning
    w = tukey_window(4096)
    expected = 1.0 / (w.sum() / 4096)
    assert abs(g - expected) < 1e-6, (g, expected)
    # 2x IR -> +6.02 dB relative
    assert abs(ir_peak_gain_db(ir * 2.0) - ir_peak_gain_db(ir) - 6.02) < 0.01
    a = analyze_ir(ir)
    assert a.peak == 1.0 and abs(a.peak_db) < 1e-9
    # delta at sample 0 is tapered away -> floor value 1.0
    d0 = np.zeros(4096)
    d0[0] = 1.0
    assert estimate_max_frequency_gain(d0) == 1.0
    # resonant IR has freq peak above its sample peak
    t = np.arange(8192)
    res = np.sin(2 * np.pi * 0.02 * t) * np.exp(-t / 2000.0)
    g2 = estimate_max_frequency_gain(res)
    assert g2 > 10.0


def test_tukey_window_shape():
    w = tukey_window(64)
    assert abs(w[32] - 1.0) < 1e-12
    assert w[0] < 1e-6
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)


def test_cmaes_minimizes_quadratic():
    target = np.array([0.5, -1.2, 2.0])
    best, best_f = minimize(lambda x: float(np.sum((x - target) ** 2)),
                            dim=3, generations=120,
                            population=18, elite=6, seed=1)
    assert best_f < 1e-2
    np.testing.assert_allclose(best, target, atol=0.1)


def test_cmaes_parcor_mapping():
    u = np.array([-5.0, 0.0, 5.0])
    p = CmaEs.to_parcor(u)
    assert np.all(np.abs(p) < 1.0)
    back = CmaEs.parcor_to_unconstrained(np.array([0.5]))
    np.testing.assert_allclose(np.tanh(back), 0.5, atol=1e-12)


def test_allpass_section_is_allpass():
    s = SecondOrderAllpass(rho=0.7, theta=1.0)
    w = np.linspace(0.01, np.pi - 0.01, 64)
    h = s.response(w)
    np.testing.assert_allclose(np.abs(h), 1.0, atol=1e-9)


def test_allpass_group_delay_formula():
    """Analytic GD matches numeric phase derivative."""
    rho, theta = 0.6, 0.8
    w = np.linspace(0.05, 3.0, 400)
    tau = sections_group_delay([rho], [theta], w)
    s = SecondOrderAllpass(rho, theta)
    ph = np.unwrap(np.angle(s.response(w)))
    tau_num = -np.gradient(ph, w)
    np.testing.assert_allclose(tau, tau_num, rtol=0.05, atol=0.1)


def test_allpass_designer_matches_flat_target():
    """Design against a constant group delay; cascade should approximate."""
    fs = 48000.0
    freq = np.exp(np.linspace(np.log(50.0), np.log(20000.0), 48))
    target = np.full(len(freq), 8.0)
    cfg = DesignerConfig(num_sections=4, cmaes_max_generations=60,
                         cmaes_population=24, cmaes_initial_sigma=1.0)
    sections, cost = design_cmaes(fs, freq, target, cfg)
    assert sections is not None
    w = 2 * np.pi * freq / fs
    got = sections_group_delay([s.rho for s in sections],
                               [s.theta for s in sections], w)
    # weighted fit should be reasonably close
    assert np.abs(got - target).mean() < 4.0, got


@pytest.mark.slow
def test_mixed_phase_allpass_end_to_end():
    # IR long enough to absorb the allpass group delay (<= 120 samples +
    # full-band offset) without tail truncation: 4096 samples, decay tau
    # 400 -> the tail is ~e^-10 by the end (production IRs are ~1 s).
    ir = np.concatenate([np.zeros(64), _test_ir(4096)])[:4096]
    mp = minimum_phase(ir)
    mixed = mixed_phase_allpass(ir, mp, SR, 200.0, 700.0,
                                num_sections=6, freq_points=64,
                                generations=30, population=16)
    assert mixed is not None
    nfft = 16384
    Hl = np.abs(np.fft.rfft(ir, nfft))
    Hx = np.abs(np.fft.rfft(mixed, nfft))
    # allpass + RMS renorm keeps magnitude close
    err_db = 20 * np.log10(np.maximum(Hx, 1e-9) / np.maximum(Hl, 1e-9))
    assert np.percentile(np.abs(err_db), 90) < 1.5


def test_mixed_phase_allpass_gate_rejects_truncating_fixture():
    """A short IR whose tail still carries energy cannot absorb the
    allpass group delay (up to MAX_ALLOWED_GD samples): the truncation
    distorts the magnitude and the fidelity gate must return None so the
    loader falls back to the exact spectral blend (ADVICE r1)."""
    ir = np.concatenate([np.zeros(64), _test_ir(500)])[:512]
    mp = minimum_phase(ir)
    mixed = mixed_phase_allpass(ir, mp, SR, 200.0, 700.0,
                                num_sections=6, freq_points=64,
                                generations=10, population=12,
                                max_mag_err_db=0.5)
    assert mixed is None
    # and the fallback path remains available and finite
    fb = mixed_phase_fallback(ir, mp, SR, 200.0, 700.0)
    assert fb.shape == ir.shape and np.all(np.isfinite(fb))
