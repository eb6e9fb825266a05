"""Precision policy: f32 TPU-path fidelity vs f64, and regression pins."""
import numpy as np
import jax.numpy as jnp

from convopeq_tpu.models.chain import ChainConfig, process_chain
from convopeq_tpu.models.convolver import stereo_prepare
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.nuc import FilterSpec

RNG = np.random.default_rng(99)
SR = 48000.0


def _setup():
    # self-seeded: the pinned regression values depend on these exact draws,
    # so _setup must not share a generator with collection-time callers
    rng = np.random.default_rng(99)
    n_ir = 6000
    t = np.arange(n_ir)
    ir = rng.normal(size=(2, n_ir)) * np.exp(-t / 800.0) * 0.3
    p = EQParams()
    p.enabled[:] = False
    for i, (bt, f, g, q, m) in enumerate([(0, 80, 3, 0.7, 0),
                                          (1, 500, -4, 1.2, 0),
                                          (1, 2000, 5, 2, 3),
                                          (2, 8000, 2, 0.7, 0)]):
        p.set_band(i, band_type=bt, freq=f, gain_db=g, q=q, mode=m,
                   enabled=True)
    cfg = ChainConfig(sample_rate=SR, soft_clip_enabled=True,
                      saturation_amount=0.25, eq_method="scan")
    x = rng.normal(size=(2, 8192)) * 0.25
    return ir, p, cfg, x


def test_chain_regression_pin():
    """End-to-end output pinned (f64, fixed seed/config): guards against
    silent semantic drift across refactors."""
    ir, p, cfg, x = _setup()
    conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=SR))
    y = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
    np.testing.assert_allclose(
        y[0, 4000:4006],
        [0.25831349, -0.68423518, -0.64369992, -0.86408318, -0.29380731,
         0.72707911], atol=2e-8)
    assert abs(float(np.sqrt((y ** 2).mean())) - 0.5945206035348838) < 1e-8


def test_f32_path_close_to_f64():
    """The TPU fast dtype (f32) tracks the f64 exactness path.

    The bound is set by the output filter's 18-20 Hz biquads: a pole at
    radius r=0.998 is conditioned like 1/(1-r) ~ 540 in ANY f32
    realization (the sequential TDF-II floor is ~4e-4 relative), so the
    achievable full-chain tracking is ~-65 dB, not f32 eps.  The measured
    value with the diagonalized scan dispatch (ops.scan_iir
    POLE_RADIUS_DIAG_F32) is ~5.6e-4; the bound below also guards against
    regressing to the ill-conditioned 2x2 companion scan (6e-2)."""
    ir, p, cfg, x = _setup()
    conv64 = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=SR))
    conv32 = stereo_prepare(jnp.asarray(ir, jnp.float32), 512,
                            FilterSpec(sample_rate=SR))
    y64 = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv64))
    y32 = np.asarray(process_chain(jnp.asarray(x, np.float32), cfg, p, conv32))
    rel = np.sqrt(np.mean((y32 - y64) ** 2)) / np.sqrt(np.mean(y64 ** 2))
    assert rel < 2e-3, rel

    # the fft EQ path obeys the same bound
    from dataclasses import replace
    cfg_fft = replace(cfg, eq_method="fft", soft_clip_enabled=False)
    y64f = np.asarray(process_chain(jnp.asarray(x), cfg_fft, p, conv64))
    y32f = np.asarray(process_chain(jnp.asarray(x, np.float32), cfg_fft, p,
                                    conv32))
    rel = np.sqrt(np.mean((y32f - y64f) ** 2)) / np.sqrt(np.mean(y64f ** 2))
    assert rel < 2e-3, rel


def test_low_freq_biquad_f32_dispatch():
    """Near-DC biquads in f32 auto-route to the diagonalized scan: the 2x2
    companion scan's prefix products grow like k*r^k and lose ~100x accuracy
    (6e-2 vs the 4e-4 sequential floor for an 18 Hz HPF at 48 kHz)."""
    from convopeq_tpu.models.output_filter import output_filter_coeffs
    from convopeq_tpu.ops.scan_iir import biquad_df2t_scan
    x = RNG.normal(size=(2, 8192)) * 0.5
    c = output_filter_coeffs(SR)["lc"][0]          # 18 Hz Butterworth-2 HPF
    y64, _ = biquad_df2t_scan(jnp.asarray(x), *c)
    y32, _ = biquad_df2t_scan(jnp.asarray(x, jnp.float32), *c)
    rel = np.sqrt(np.mean((np.asarray(y32) - np.asarray(y64)) ** 2))
    rel /= np.sqrt(np.mean(np.asarray(y64) ** 2))
    assert rel < 2e-3, rel                          # diag: ~7e-4; 2x2: ~6e-2

    # f64 keeps the fast 2x2 path and is exact to near-eps
    y64b, _ = biquad_df2t_scan(jnp.asarray(x), *c, method="2x2")
    assert np.allclose(np.asarray(y64), np.asarray(y64b))


import pytest


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b ** 2)))


def _stage_cases():
    """Per-stage f32-vs-f64 sweep (SURVEY §7.6 fidelity ladder): every DSP
    stage individually tracks f64 within its conditioning-derived bound."""
    from dataclasses import replace
    from convopeq_tpu.models.eq import eq_process_bands
    from convopeq_tpu.models.output_filter import output_filter_process
    from convopeq_tpu.ops.dc_blocker import dc_block
    from convopeq_tpu.ops.oversample import (make_stages, oversample_up,
                                             oversample_down)
    from convopeq_tpu.ops.softclip import soft_clip, soft_clip_params
    from convopeq_tpu.ops.limiter import peak_limiter
    from convopeq_tpu.models.metering import k_weight
    from convopeq_tpu.models.convolver import stereo_prepare, convolver_process
    from convopeq_tpu.models.nuc import FilterSpec

    ir, p, cfg, x = _setup()
    st2 = make_stages(2)
    thr, knee, asym = soft_clip_params(0.3)

    def conv_stage(v):
        c = stereo_prepare(jnp.asarray(ir, v.dtype), 512,
                           FilterSpec(sample_rate=SR))
        return convolver_process(v, c, 1.0)

    return [
        # (name, fn(sig)->sig, tolerance)
        ("eq_scan", lambda v: eq_process_bands(v, p, SR, method="scan"),
         1e-5),
        ("eq_fft", lambda v: eq_process_bands(v, p, SR, method="fft"),
         1e-4),
        ("conv_nuc", conv_stage, 1e-5),
        ("dc_3hz", lambda v: dc_block(v, SR, 3.0)[0], 1e-5),
        ("dc_1hz_96k", lambda v: dc_block(v, SR * 2, 1.0)[0], 1e-4),
        # 18-20 Hz biquads: f32 floor is ~4e-4 regardless of realization
        ("output_filter_conv_last",
         lambda v: output_filter_process(v, SR, True), 2e-3),
        ("output_filter_eq_last",
         lambda v: output_filter_process(v, SR, False), 2e-3),
        ("oversample_up2", lambda v: oversample_up(v, st2), 1e-5),
        ("oversample_down2",
         lambda v: oversample_down(jnp.concatenate([v, v], axis=-1), st2),
         1e-5),
        ("softclip", lambda v: soft_clip(v, thr, knee, asym), 1e-5),
        ("limiter", lambda v: peak_limiter(v * 3.0, SR)[0], 1e-4),
        ("k_weight", lambda v: k_weight(v, SR), 2e-3),
    ]


@pytest.mark.parametrize("case", _stage_cases(), ids=lambda c: c[0])
def test_f32_stage_parity_sweep(case):
    name, fn, tol = case
    _, _, _, x = _setup()
    y64 = np.asarray(fn(jnp.asarray(x)))
    y32 = np.asarray(fn(jnp.asarray(x, jnp.float32)))
    assert _rel(y32, y64) < tol, (name, _rel(y32, y64))


def test_low_radius_biquad_fir_dispatch():
    """Fast-decaying f32 biquads route to the truncated-FIR GEMM: exact to
    ~f32 eps (r^128 truncation is far below), final state included."""
    from convopeq_tpu.models.output_filter import output_filter_coeffs
    from convopeq_tpu.ops.scan_iir import (biquad_df2t_scan,
                                           _biquad_pole_radius,
                                           POLE_RADIUS_FIR_F32)
    c = output_filter_coeffs(SR)["hc"][1][0]        # 19 kHz LPF, r ~ 0.63
    assert _biquad_pole_radius(c[3], c[4]) <= POLE_RADIUS_FIR_F32
    x = np.random.default_rng(7).normal(size=(2, 8192)) * 0.5
    y64, f64_ = biquad_df2t_scan(jnp.asarray(x), *c)
    y32, f32_ = biquad_df2t_scan(jnp.asarray(x, jnp.float32), *c)
    rel = np.sqrt(np.mean((np.asarray(y32) - np.asarray(y64)) ** 2))
    rel /= np.sqrt(np.mean(np.asarray(y64) ** 2))
    assert rel < 5e-7, rel
    assert np.abs(np.asarray(f32_) - np.asarray(f64_)).max() < 1e-6
