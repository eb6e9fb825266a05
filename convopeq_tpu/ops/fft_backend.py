"""FFT backend abstraction (the FFTBackend / FftBackendConcept analog).

The reference isolates its FFT provider behind a concept so tests can
inject a reference FFT (src/FFTBackend.h:83-100 ProductionFft vs TestFft).
Here the same seam exists for a different reason too: small real DFTs can
be evaluated as matmuls on the MXU (a win for tiny partition sizes where
FFT launch overheads dominate), and the matmul form doubles as the
injectable "test FFT" used to validate the XLA FFT path.

Providers:
- "xla":    jnp.fft (default; TPU FFT units / CPU pocketfft)
- "matmul": real DFT matrices (host-precomputed f64, cast to the compute
            dtype) contracted on the MXU.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_PROVIDER = "xla"


def set_provider(name: str):
    global _PROVIDER
    if name not in ("xla", "matmul"):
        raise ValueError(name)
    _PROVIDER = name


def get_provider() -> str:
    return _PROVIDER


@lru_cache(maxsize=32)
def _rdft_matrices(n: int):
    """Host-side real-DFT matrices: cos/sin of shape (n, n//2+1), f64."""
    k = np.arange(n)[:, None] * np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k / n
    return np.cos(ang), np.sin(ang)


@lru_cache(maxsize=32)
def _irdft_matrices(n: int):
    """Inverse real-DFT matrices mapping (n//2+1) bins -> n samples."""
    csize = n // 2 + 1
    k = np.arange(csize)[None, :] * np.arange(n)[:, None]
    ang = 2.0 * np.pi * k / n
    w = np.full(csize, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    return np.cos(ang) * w / n, np.sin(ang) * w / n


def rfft(x, n=None, axis=-1):
    x = jnp.asarray(x)
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    if n is not None and n != x.shape[-1]:
        if n > x.shape[-1]:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
        else:
            x = x[..., :n]
    if _PROVIDER == "xla":
        y = jnp.fft.rfft(x, axis=-1)
    else:
        c, s = _rdft_matrices(x.shape[-1])
        re = x @ jnp.asarray(c, x.dtype)
        im = x @ jnp.asarray(s, x.dtype)
        y = jnp.asarray(re + 1j * im)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def irfft(y, n=None, axis=-1):
    y = jnp.asarray(y)
    if axis != -1:
        y = jnp.moveaxis(y, axis, -1)
    if n is None:
        n = 2 * (y.shape[-1] - 1)
    if _PROVIDER == "xla":
        x = jnp.fft.irfft(y, n=n, axis=-1)
    else:
        rdt = jnp.float64 if y.dtype == jnp.complex128 else jnp.float32
        csize = n // 2 + 1
        if y.shape[-1] != csize:
            # match numpy irfft semantics: zero-pad or truncate the
            # spectrum to the bin count implied by n
            if y.shape[-1] < csize:
                y = jnp.pad(y, [(0, 0)] * (y.ndim - 1)
                            + [(0, csize - y.shape[-1])])
            else:
                y = y[..., :csize]
        c, s = _irdft_matrices(n)
        x = (jnp.real(y) @ jnp.asarray(c.T, rdt)
             - jnp.imag(y) @ jnp.asarray(s.T, rdt))
    if axis != -1:
        x = jnp.moveaxis(x, -1, axis)
    return x
