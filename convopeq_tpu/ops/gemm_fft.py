"""Two-stage (Cooley-Tukey) real FFTs as MXU GEMMs.

For large overlap-save partitions the VPU FFT dominates the partitioned
convolution (measured on v5e: the 8192-point rfft/irfft pair costs ~3x the
frame MAC).  Factoring N = N1*N2 turns the DFT into two batched GEMMs of
size ~sqrt(N) plus a twiddle — flops/sample ~2(N1+N2) instead of N for the
direct GEMM DFT, with O(N) matrix memory instead of O(N^2), so it scales
to the 16k-65k frames of the NUC tail layers while staying on the MXU.

Forward (rfft of real frames, length N = 2p, bins p+1):
  n = n1*N2 + n2, k = k1 + N1*k2 (k2 <= N2/2 covers all k <= p):
  X[k1, k2] = sum_{n2} W_N2^{n2 k2} * (W_N^{n2 k1} sum_{n1} x[n1, n2]
              W_N1^{n1 k1})            (all W = e^{-2 pi i . / .})

Inverse, valid half only (y[p..2p) of irfft(Y, N)): with
U[k] = w_k (-1)^k Y[k]  (w = irfft synthesis weights; (-1)^k is the
half-frame shift), y[p + j] = Re sum_k U[k] e^{+2 pi i k j / N}, factored
over j = j2 + N2*j1 (j1 < N1/2) the same way.

Reference parity: numerically identical to jnp.fft.rfft / the second half
of jnp.fft.irfft (tested to f64 roundoff); used by ops/partitioned_conv.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# GEMM precision: see partitioned_conv.RDFT_GEMM_PRECISION for the measured
# ladder; HIGHEST keeps the f32 path at FFT-equivalent accuracy.
GEMM_FFT_PRECISION = jax.lax.Precision.HIGHEST

# f64-on-TPU stage GEMMs route through the Ozaki bf16-slice scheme
# (ops/ozaki.py): measured 1.9x the emulated-f64 matmul at ~6e-12
# relative — three orders below the dd chain contract.  Opt out with
# CONVOPEQ_OZAKI=0.  CPU f64 keeps native GEMMs (exact and fast there).
OZAKI_SLICES = 6

_MAT_CACHE: dict = {}
_SLICED_MAT_CACHE: dict = {}


def _ozaki_enabled(dt) -> bool:
    import os
    return (dt == jnp.float64
            and os.environ.get("CONVOPEQ_OZAKI", "1") != "0"
            and jax.default_backend() != "cpu")


def _sliced_mats(p: int, n1: int | None = None, s: int = OZAKI_SLICES):
    """ozaki.slice_const of every stage matrix of `_mats(p, n1)`."""
    key = (p, n1, s)
    sm = _SLICED_MAT_CACHE.get(key)
    if sm is None:
        from .ozaki import slice_const
        (N1, N2, K2, f1c, f1s, ftc, fts, f2c, f2s,
         w, i1c, i1s, itc, its, i2c, i2s) = _mats(p, n1)
        sm = tuple(slice_const(m, s, scale_axis=0)
                   for m in (f1c, f1s, f2c, f2s, i1c, i1s, i2c, i2s))
        _SLICED_MAT_CACHE[key] = sm
    return sm


def _factor(n: int) -> tuple[int, int]:
    """Balanced power-of-two split n = n1 * n2 with n1 <= n2."""
    lg = n.bit_length() - 1
    n1 = 1 << (lg // 2)
    return n1, n // n1


def _mats(p: int, n1: int | None = None):
    """Host-built stage matrices + twiddles for frame size N = 2p.

    `n1` overrides the balanced factorization (the fused Pallas kernels
    need N2 >= 128 so the lane dimension meets the TPU tile minimum)."""
    key = (p, n1)
    mats = _MAT_CACHE.get(key)
    if mats is not None:
        return mats
    N = 2 * p
    N1, N2 = _factor(N) if n1 is None else (n1, N // n1)
    K2 = N2 // 2 + 1

    n1 = np.arange(N1)
    n2 = np.arange(N2)
    k1 = np.arange(N1)
    k2 = np.arange(K2)

    # forward stage 1: contract n1 -> k1 (N1, N1)
    a1 = -2.0 * np.pi * np.outer(n1, k1) / N1
    f1c, f1s = np.cos(a1), np.sin(a1)
    # forward twiddle W_N^{n2 k1} on the (k1, n2) grid
    at = -2.0 * np.pi * np.outer(k1, n2) / N
    ftc, fts = np.cos(at), np.sin(at)
    # forward stage 2: contract n2 -> k2 (N2, K2)
    a2 = -2.0 * np.pi * np.outer(n2, k2) / N2
    f2c, f2s = np.cos(a2), np.sin(a2)

    # inverse: U weights w_k (-1)^k on the padded (k1, k2) grid
    kk = k1[:, None] + N1 * k2[None, :]              # (N1, K2)
    w = np.where((kk == 0) | (kk == p), 1.0 / N, 2.0 / N)
    w = np.where(kk > p, 0.0, w) * np.where(kk % 2 == 0, 1.0, -1.0)
    # inverse stage 1: contract k2 -> j2, e^{+2 pi i k2 j2 / N2} (K2, N2)
    b1 = 2.0 * np.pi * np.outer(k2, n2) / N2
    i1c, i1s = np.cos(b1), np.sin(b1)
    # inverse twiddle e^{+2 pi i k1 j2 / N} on (k1, j2)
    bt = 2.0 * np.pi * np.outer(k1, n2) / N
    itc, its = np.cos(bt), np.sin(bt)
    # inverse stage 2: contract k1 -> j1 (real part only), j1 < N1/2
    j1 = np.arange(N1 // 2)
    b2 = 2.0 * np.pi * np.outer(k1, j1) / N1
    i2c, i2s = np.cos(b2), np.sin(b2)

    mats = (N1, N2, K2, f1c, f1s, ftc, fts, f2c, f2s,
            w, i1c, i1s, itc, its, i2c, i2s)
    _MAT_CACHE[key] = mats
    return mats


def rfft_gemm(x, p: int):
    """rfft of real frames x (..., 2p) -> (Xr, Xi) each (..., p+1)."""
    (N1, N2, K2, f1c, f1s, ftc, fts, f2c, f2s,
     *_rest) = _mats(p)
    dt = x.dtype
    hi = GEMM_FFT_PRECISION
    batch = x.shape[:-1]
    A = x.reshape(batch + (N1, N2))                  # [n1, n2]
    c = lambda m: jnp.asarray(m, dt)
    if _ozaki_enabled(dt):
        from .ozaki import contract_sliced, preslice
        sf1c, sf1s, sf2c, sf2s, *_ = _sliced_mats(p)
        pA = preslice("nj,nk->kj", A, len(sf1c[0]))
        Br = contract_sliced("nj,nk->kj", A, *sf1c, presliced=pA)
        Bi = contract_sliced("nj,nk->kj", A, *sf1s, presliced=pA)
        Cr = Br * c(ftc) - Bi * c(fts)
        Ci = Br * c(fts) + Bi * c(ftc)
        pCr = preslice("mk,kn->mn", Cr, len(sf2c[0]))
        pCi = preslice("mk,kn->mn", Ci, len(sf2c[0]))
        Xr = (contract_sliced("mk,kn->mn", Cr, *sf2c, presliced=pCr)
              - contract_sliced("mk,kn->mn", Ci, *sf2s, presliced=pCi))
        Xi = (contract_sliced("mk,kn->mn", Cr, *sf2s, presliced=pCr)
              + contract_sliced("mk,kn->mn", Ci, *sf2c, presliced=pCi))
        Xr = jnp.swapaxes(Xr, -1, -2).reshape(batch + (N1 * K2,))[..., :p + 1]
        Xi = jnp.swapaxes(Xi, -1, -2).reshape(batch + (N1 * K2,))[..., :p + 1]
        return Xr, Xi
    mm = lambda a, b: jnp.einsum("...nj,nk->...kj", a, b, precision=hi)
    # stage 1 over n1 -> (..., k1, n2)
    Br = mm(A, c(f1c))
    Bi = mm(A, c(f1s))
    # twiddle (k1, n2)
    Cr = Br * c(ftc) - Bi * c(fts)
    Ci = Br * c(fts) + Bi * c(ftc)
    # stage 2 over n2 -> (..., k1, k2)
    m2 = lambda a, b: jnp.matmul(a, b, precision=hi)
    Xr = m2(Cr, c(f2c)) - m2(Ci, c(f2s))
    Xi = m2(Cr, c(f2s)) + m2(Ci, c(f2c))
    # k = k1 + N1 k2 -> (..., k2, k1) flat, sliced to p+1 bins
    Xr = jnp.swapaxes(Xr, -1, -2).reshape(batch + (N1 * K2,))[..., :p + 1]
    Xi = jnp.swapaxes(Xi, -1, -2).reshape(batch + (N1 * K2,))[..., :p + 1]
    return Xr, Xi


def irfft_valid_gemm(Yr, Yi, p: int):
    """Second half of irfft(Y, 2p): (..., p+1) spectra -> (..., p) real."""
    (N1, N2, K2, _f1c, _f1s, _ftc, _fts, _f2c, _f2s,
     w, i1c, i1s, itc, its, i2c, i2s) = _mats(p)
    dt = Yr.dtype
    hi = GEMM_FFT_PRECISION
    batch = Yr.shape[:-1]
    c = lambda m: jnp.asarray(m, dt)
    npad = N1 * K2 - (p + 1)
    pad = [(0, 0)] * len(batch) + [(0, npad)]
    # U on the (k1, k2) grid: k-major layout is (k2, k1)
    Ur = jnp.swapaxes(jnp.pad(Yr, pad).reshape(batch + (K2, N1)), -1, -2)
    Ui = jnp.swapaxes(jnp.pad(Yi, pad).reshape(batch + (K2, N1)), -1, -2)
    Ur = Ur * c(w)
    Ui = Ui * c(w)
    if _ozaki_enabled(dt):
        from .ozaki import contract_sliced, preslice
        *_f, si1c, si1s, si2c, si2s = _sliced_mats(p)
        pUr = preslice("mk,kn->mn", Ur, len(si1c[0]))
        pUi = preslice("mk,kn->mn", Ui, len(si1c[0]))
        Dr = (contract_sliced("mk,kn->mn", Ur, *si1c, presliced=pUr)
              - contract_sliced("mk,kn->mn", Ui, *si1s, presliced=pUi))
        Di = (contract_sliced("mk,kn->mn", Ur, *si1s, presliced=pUr)
              + contract_sliced("mk,kn->mn", Ui, *si1c, presliced=pUi))
        Er = Dr * c(itc) - Di * c(its)
        Ei = Dr * c(its) + Di * c(itc)
        pEr = preslice("kj,ki->ji", Er, len(si2c[0]))
        pEi = preslice("kj,ki->ji", Ei, len(si2c[0]))
        z = (contract_sliced("kj,ki->ji", Er, *si2c, presliced=pEr)
             - contract_sliced("kj,ki->ji", Ei, *si2s, presliced=pEi))
        z = jnp.swapaxes(z, -1, -2).reshape(batch + (N2 * (N1 // 2),))
        return z[..., :p]
    # stage 1 over k2 -> (..., k1, j2)
    m2 = lambda a, b: jnp.matmul(a, b, precision=hi)
    Dr = m2(Ur, c(i1c)) - m2(Ui, c(i1s))
    Di = m2(Ur, c(i1s)) + m2(Ui, c(i1c))
    # twiddle (k1, j2)
    Er = Dr * c(itc) - Di * c(its)
    Ei = Dr * c(its) + Di * c(itc)
    # stage 2 over k1 -> real (..., j2, j1); j = j2 + N2 j1
    mmk = lambda a, b: jnp.einsum("...kj,ki->...ji", a, b, precision=hi)
    z = mmk(Er, c(i2c)) - mmk(Ei, c(i2s))            # (..., j2, j1)
    z = jnp.swapaxes(z, -1, -2).reshape(batch + (N2 * (N1 // 2),))
    return z[..., :p]
