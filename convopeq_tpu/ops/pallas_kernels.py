"""Pallas TPU kernels for the hot streaming ops.

`fdl_mac` — the frequency-domain delay-line multiply-accumulate at the
heart of partitioned convolution (the AVX2 accumulateSplitComplex loop,
src/MKLNonUniformConvolver.cpp:167-182, recast for the VPU):

    Y[b, k] = sum_p  X[b, p, k] * H[p, k]        (complex, split re/im)

One grid step processes a (partitions, bin-tile) block per batch element:
the FDL slab and the IR spectra tile are staged in VMEM, the partition
reduction runs on the VPU with both real/imag fused, and the output tile
is written once — a single pass over HBM for data that XLA's generic
reduce would often re-materialize.

Falls back to interpreter mode off-TPU (used by the CPU test suite).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    HAVE_PALLAS = True
except Exception:          # pragma: no cover
    HAVE_PALLAS = False


def _fdl_mac_kernel(xr_ref, xi_ref, hr_ref, hi_ref, yr_ref, yi_ref):
    xr = xr_ref[:]          # (P, TB)
    xi = xi_ref[:]
    hr = hr_ref[:]
    hi = hi_ref[:]
    yr_ref[:] = jnp.sum(xr * hr - xi * hi, axis=0, keepdims=True)
    yi_ref[:] = jnp.sum(xr * hi + xi * hr, axis=0, keepdims=True)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:       # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("interpret",))
def fdl_mac(xr, xi, hr, hi, interpret=None):
    """Split-complex FDL MAC.

    xr/xi: (B, P, K) FDL spectra (newest partition first),
    hr/hi: (P, K) partition spectra.  Returns (yr, yi): (B, K).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    b, p, k = xr.shape
    tile = 128
    bt = 8                     # batch tile (sublane granule)
    kp = -(-k // tile) * tile
    bp = -(-b // bt) * bt
    if kp != k or bp != b:
        pad = [(0, bp - b), (0, 0), (0, kp - k)]
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
        hr = jnp.pad(hr, [(0, 0), (0, kp - k)])
        hi = jnp.pad(hi, [(0, 0), (0, kp - k)])
    if interpret is None:
        interpret = not _on_tpu()

    grid = (bp // bt, kp // tile)
    x_spec = pl.BlockSpec((bt, p, tile), lambda i, j: (i, 0, j))
    h_spec = pl.BlockSpec((p, tile), lambda i, j: (0, j))
    y_spec = pl.BlockSpec((bt, tile), lambda i, j: (i, j))

    def kernel(xr_ref, xi_ref, hr_ref, hi_ref, yr_ref, yi_ref):
        xr_t = xr_ref[:]                # (bt, P, TB)
        xi_t = xi_ref[:]
        hr_t = hr_ref[:][None]          # (1, P, TB)
        hi_t = hi_ref[:][None]
        yr_ref[:, :] = jnp.sum(xr_t * hr_t - xi_t * hi_t, axis=1)
        yi_ref[:, :] = jnp.sum(xr_t * hi_t + xi_t * hr_t, axis=1)

    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, h_spec, h_spec],
        out_specs=(y_spec, y_spec),
        out_shape=(jax.ShapeDtypeStruct((bp, kp), xr.dtype),
                   jax.ShapeDtypeStruct((bp, kp), xr.dtype)),
        interpret=interpret,
    )(xr, xi, hr, hi)
    return yr[:b, :k], yi[:b, :k]


def fdl_mac_complex(fdl, H, interpret=None):
    """Convenience: complex in/out wrapper over `fdl_mac`.

    fdl: (..., P, K) complex; H: (P, K) complex -> (..., K) complex.
    """
    shape = fdl.shape
    b = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    xr = jnp.real(fdl).reshape(b, shape[-2], shape[-1])
    xi = jnp.imag(fdl).reshape(b, shape[-2], shape[-1])
    yr, yi = fdl_mac(xr, xi, jnp.real(H), jnp.imag(H), interpret=interpret)
    out = jax.lax.complex(yr, yi).reshape(shape[:-2] + (shape[-1],))
    return out
