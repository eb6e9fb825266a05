"""Pallas FDL-MAC kernel vs reference reduction (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops import pallas_kernels as pk

pytestmark = pytest.mark.skipif(not pk.HAVE_PALLAS,
                                reason="pallas unavailable")
RNG = np.random.default_rng(71)


def test_fdl_mac_matches_reduction():
    b, p, k = 3, 12, 200
    xr = RNG.normal(size=(b, p, k)).astype(np.float32)
    xi = RNG.normal(size=(b, p, k)).astype(np.float32)
    hr = RNG.normal(size=(p, k)).astype(np.float32)
    hi = RNG.normal(size=(p, k)).astype(np.float32)
    yr, yi = pk.fdl_mac(jnp.asarray(xr), jnp.asarray(xi),
                        jnp.asarray(hr), jnp.asarray(hi), interpret=True)
    ref = ((xr + 1j * xi) * (hr + 1j * hi)[None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-4)


def test_error_feedback_quantize_matches_scan():
    """The Pallas sequential quantizer is bit-compatible with the lax.scan
    reference kernels (same op order, same rounding) — verified here in
    interpret mode; the TPU path is exercised by bench config6."""
    from convopeq_tpu.models.dither import (
        psycho_dither, fixed_shaper_dither, psycho_coeffs, quant_scales,
        FIXED15_DEFAULT)
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM
    r, n = 3, 700
    x = (RNG.normal(size=(r, n)) * 0.4).astype(np.float32)
    u = RNG.random(size=(r, n, 2)).astype(np.float32)
    scale, _ = quant_scales(16)

    qp = pk.error_feedback_quantize(
        jnp.asarray(x), jnp.asarray(u), psycho_coeffs(48000.0, 16), scale,
        K_OUTPUT_HEADROOM, mode="psycho", chunk=256, interpret=True)
    ref = psycho_dither(jnp.asarray(x), jnp.asarray(u), 48000.0, 16)
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(ref))

    qf = pk.error_feedback_quantize(
        jnp.asarray(x), jnp.asarray(u), FIXED15_DEFAULT, scale,
        K_OUTPUT_HEADROOM, mode="fixed", chunk=256, interpret=True)
    reff = fixed_shaper_dither(jnp.asarray(x), jnp.asarray(u),
                               FIXED15_DEFAULT, 16)
    np.testing.assert_array_equal(np.asarray(qf), np.asarray(reff))


def test_fdl_mac_complex_wrapper():
    fdl = (RNG.normal(size=(2, 2, 8, 130))
           + 1j * RNG.normal(size=(2, 2, 8, 130))).astype(np.complex64)
    H = (RNG.normal(size=(8, 130))
         + 1j * RNG.normal(size=(8, 130))).astype(np.complex64)
    y = pk.fdl_mac_complex(jnp.asarray(fdl), jnp.asarray(H), interpret=True)
    ref = (fdl * H).sum(axis=-2)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
