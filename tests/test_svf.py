"""SVF kernel: associative-scan implementation vs per-sample golden model."""
import numpy as np
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops.svf import svf_coeffs, svf_process
from convopeq_tpu.ops.scan_iir import affine_scan_2x2, biquad_df2t_scan, one_pole_scan
from golden import svf_coeffs_golden, process_band_golden

RNG = np.random.default_rng(42)
SR = 48000.0


def test_affine_scan_matches_loop():
    A = np.array([[0.9, -0.2], [0.1, 0.95]])
    bu = RNG.normal(size=(257, 2))
    s0 = np.array([0.3, -0.7])
    pre, final = affine_scan_2x2(jnp.asarray(A), jnp.asarray(bu), jnp.asarray(s0))
    s = s0.copy()
    pre_ref = np.empty_like(bu)
    for n in range(bu.shape[0]):
        pre_ref[n] = s
        s = A @ s + bu[n]
    np.testing.assert_allclose(np.asarray(pre), pre_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(final), s, rtol=0, atol=1e-12)


def test_one_pole_scan():
    x = RNG.normal(size=(3, 100))
    a, b = 0.99, 0.5
    pre, fin = one_pole_scan(jnp.asarray(x), a, b, 0.25)
    s = np.full(3, 0.25)
    for n in range(100):
        np.testing.assert_allclose(np.asarray(pre)[:, n], s, atol=1e-13)
        s = a * s + b * x[:, n]
    np.testing.assert_allclose(np.asarray(fin), s, atol=1e-13)


def test_biquad_scan_matches_df1_loop():
    b0, b1, b2, a1, a2 = 0.8, -1.2, 0.6, -1.5, 0.64
    x = RNG.normal(size=512)
    y, _ = biquad_df2t_scan(jnp.asarray(x), b0, b1, b2, a1, a2)
    # direct-form-I reference
    yr = np.zeros_like(x)
    for n in range(len(x)):
        yr[n] = (b0 * x[n]
                 + (b1 * x[n - 1] if n >= 1 else 0.0)
                 + (b2 * x[n - 2] if n >= 2 else 0.0)
                 - (a1 * yr[n - 1] if n >= 1 else 0.0)
                 - (a2 * yr[n - 2] if n >= 2 else 0.0))
    np.testing.assert_allclose(np.asarray(y), yr, atol=1e-10)


@pytest.mark.parametrize("btype", [0, 1, 2, 3, 4])
def test_svf_coeffs_match_golden(btype):
    for freq, gain, q in [(100.0, 6.0, 0.707), (1000.0, -12.0, 2.0),
                          (19500.0, 3.0, 0.5), (25.0, 48.0, 20.0),
                          (5.0, 60.0, 0.001)]:  # out-of-range -> clamped
        got = svf_coeffs(btype, freq, gain, q, SR)
        want = svf_coeffs_golden(btype, freq, gain, q, SR)
        np.testing.assert_allclose([float(g) for g in got], want, rtol=1e-14)


@pytest.mark.parametrize("btype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("saturation", [0.0, 0.35])
def test_svf_process_matches_golden(btype, saturation):
    n = 2048
    x = RNG.normal(size=n) * 0.5
    c = svf_coeffs_golden(btype, 750.0, 9.0, 1.3, SR)
    ref, ref_state = process_band_golden(x, c, np.zeros(2), saturation)
    got, got_state = svf_process(jnp.asarray(x), tuple(jnp.float64(v) for v in c),
                                 saturation=saturation, simd_tanh=False)
    err = np.sqrt(np.mean((np.asarray(got) - ref) ** 2))
    assert err < 1e-12, f"RMS error {err}"
    np.testing.assert_allclose(np.asarray(got_state), np.asarray(ref_state), atol=1e-11)


def test_svf_process_simd_tanh_variant():
    n = 1024
    x = RNG.normal(size=n) * 3.0   # hot signal so tanh clamp region is hit
    c = svf_coeffs_golden(0, 120.0, 18.0, 1.0, SR)
    ref, _ = process_band_golden(x, c, np.zeros(2), 0.8, simd=True)
    got, _ = svf_process(jnp.asarray(x), tuple(jnp.float64(v) for v in c),
                         saturation=0.8, simd_tanh=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-12)


def test_svf_batched_channels():
    x = RNG.normal(size=(4, 6, 512))
    c = svf_coeffs_golden(1, 2000.0, -6.0, 4.0, SR)
    got, _ = svf_process(jnp.asarray(x), tuple(jnp.float64(v) for v in c))
    for i in range(4):
        for j in range(6):
            ref, _ = process_band_golden(x[i, j], c, np.zeros(2), 0.0)
            np.testing.assert_allclose(np.asarray(got)[i, j], ref, atol=1e-11)


def test_svf_state_carry_blockwise():
    """Processing in two blocks with carried state == one shot."""
    x = RNG.normal(size=1000)
    c = tuple(jnp.float64(v) for v in svf_coeffs_golden(2, 8000.0, 12.0, 0.9, SR))
    full, _ = svf_process(jnp.asarray(x), c)
    y1, s1 = svf_process(jnp.asarray(x[:500]), c)
    y2, _ = svf_process(jnp.asarray(x[500:]), c, state0=s1)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(full), atol=1e-12)


def test_biquad_diag_variant_matches_2x2():
    from convopeq_tpu.ops.scan_iir import biquad_df2t_scan
    x = jnp.asarray(RNG.normal(size=600))
    # complex poles
    args = (0.8, -1.2, 0.6, -1.5, 0.64)
    y2, s2 = biquad_df2t_scan(x, *args)
    yd, sd = biquad_df2t_scan(x, *args, method="diag")
    np.testing.assert_allclose(np.asarray(yd), np.asarray(y2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sd), np.asarray(s2), atol=1e-10)
    # real poles (overdamped)
    args = (1.0, 0.3, 0.02, -1.3, 0.4)
    y2, _ = biquad_df2t_scan(x, *args)
    yd, _ = biquad_df2t_scan(x, *args, method="diag")
    np.testing.assert_allclose(np.asarray(yd), np.asarray(y2), atol=1e-10)
