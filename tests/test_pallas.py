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


def test_fdl_mac_complex_wrapper():
    fdl = (RNG.normal(size=(2, 2, 8, 130))
           + 1j * RNG.normal(size=(2, 2, 8, 130))).astype(np.complex64)
    H = (RNG.normal(size=(8, 130))
         + 1j * RNG.normal(size=(8, 130))).astype(np.complex64)
    y = pk.fdl_mac_complex(jnp.asarray(fdl), jnp.asarray(H), interpret=True)
    ref = (fdl * H).sum(axis=-2)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
