"""Ozaki-scheme f64 GEMMs on the MXU (error-free bf16 slice products).

XLA:TPU emulates float64 matmuls in software at ~7x the cost of an
f32-HIGHEST GEMM (measured on v5e: 22.0 ms vs 3.75 ms at the dd-mode
two-stage-FFT stage shapes).  The Ozaki splitting scheme recovers
near-f64 GEMM accuracy from the MXU's native bf16 x bf16 -> f32 path:

  - split each operand into `s` slices of q = 7-bit mantissas with a
    power-of-2 scale per output row/column:  A ~ scale_A * sum_i A_i,
    |A_i| <= 2^{-iq}, each A_i * 2^{iq} exactly representable in bf16;
  - every slice product A_i @ B_j is then EXACT in the MXU's f32
    accumulator: the products carry 2q = 14 significand bits and the
    K-term accumulation adds ceil(log2 K) more, 14 + log2(K) <= 24 for
    K <= 1024 — no rounding happens inside the GEMM at all;
  - recombine the s(s+1)/2 exact f32 partial GEMMs in f64 (the only
    rounding left), dropping the i+j >= s tail whose magnitude is
    ~2^{-qs}.

Measured on v5e at the stage-2 dd shape (120x256x512 @ 512x257):
s=6 -> 11.5 ms, 6.0e-12 relative RMS; the emulated f64 matmul is
22.0 ms at 2.3e-15.  Used for the dd (f64-on-TPU) precision mode's
GEMM FFTs, where the ~1e-12 slice error sits three orders below the
<=1e-9 chain contract (PARITY_TPU.json).

The B side of every call site is a host-built constant (DFT stage
matrices, twiddles — entries in [-1, 1]), so its slices are precomputed
once per (p, dtype) and cached; only the A side is sliced at runtime
(one fused read of A, s bf16 slice writes = 1.5 A-sized passes).

This is a from-scratch implementation of the published splitting idea
(Ozaki et al., "Error-free transformations of matrix multiplication",
2012); nothing here derives from the reference codebase.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Slice mantissa width: products must accumulate exactly in f32 over the
# largest contraction this module sees (two-stage FFT stages contract
# N1/N2 <= 1024): 2q + log2(K) <= 24.
Q_BITS = 7
# Slice count: truncation error ~2^{-q*s} relative = 2^-42 ~ 2e-13 at
# s=6.  dd-mode call sites pass their own (see gemm_fft).
DEFAULT_SLICES = 6
# Largest contraction size for which the q=7 exactness bound holds.
MAX_EXACT_K = 1 << (24 - 2 * Q_BITS)


def slice_f64(A, s: int, scale_axis: int, q: int = Q_BITS):
    """Split f64 array A into s bf16 slices + a power-of-2 scale.

    scale_axis: the CONTRACTION axis of A in the upcoming GEMM — the
    scale must be constant along it (it becomes a per-output-element
    rescale), so it is max-reduced away.

    Returns (slices, scale): slices[i] is bf16 with values that are
    multiples of 2^{-q+1} bounded by 1 (q-bit mantissas; bf16 holds 8),
    and  A ~= scale * sum_i slices[i] * 2^{-iq}  with relative truncation
    error <= 2^{-qs}.  All slicing arithmetic is exact: power-of-2
    scaling, round-to-grid, and the nearby-value subtraction r - sl.
    """
    mx = jnp.max(jnp.abs(A), axis=scale_axis, keepdims=True)
    # Power-of-2 bound >= mx without f64 bit ops (XLA:TPU's X64 rewrite
    # has no s64 bitcast-convert): frexp in f32 — mx32 = m * 2^e with
    # m in [0.5, 1) — then scale = 2^{e+1} covers the f32 downward
    # rounding of the cast.  exp2 of a small integer is exact, and
    # division by an exact power of 2 is exact in f64.
    mx32 = jnp.clip(mx.astype(jnp.float32), jnp.finfo(jnp.float32).tiny,
                    2.0 ** 120)
    _, e = jnp.frexp(mx32)
    # ldexp in f32 is a bit operation (exact power of 2); widening to the
    # working dtype is exact
    scale = jnp.ldexp(jnp.ones_like(mx32), e + 1).astype(A.dtype)
    r = A / scale                                   # |r| < 1, exact
    slices = []
    for i in range(s):
        lvl = 2.0 ** (-(i + 1) * q + 1)
        sl = jnp.round(r * (1.0 / lvl)) * lvl       # exact grid round
        slices.append((sl * 2.0 ** (i * q)).astype(jnp.bfloat16))
        r = r - sl                                  # exact (nearby values)
    return slices, scale


def slice_const(B, s: int, scale_axis: int, q: int = Q_BITS):
    """Host-side `slice_f64` for constant operands.  Returns HOST NumPy
    (f32 slices — every value is bf16-representable, so the in-graph
    bf16 cast at the use site is exact — plus the f64 scale): results
    are cached across traces/backends, and a device array captured under
    one backend poisons a later trace on another (same reason
    gemm_fft._mats returns NumPy).  This module keeps no global cache —
    cache next to the matrices being sliced."""
    B = np.asarray(B, np.float64)
    mx = np.max(np.abs(B), axis=scale_axis, keepdims=True)
    e = np.ceil(np.log2(np.maximum(mx, np.finfo(np.float64).tiny)))
    scale = np.exp2(e)
    # exact-power-of-2 guard: log2(2^k) can land a hair under k
    scale = np.where(scale < mx, scale * 2.0, scale)
    r = B / scale
    slices = []
    for i in range(s):
        lvl = 2.0 ** (-(i + 1) * q + 1)
        sl = np.round(r / lvl) * lvl
        slices.append(np.asarray(sl * 2.0 ** (i * q), np.float32))
        r = r - sl
    return tuple(slices), scale


# The three contraction patterns of the two-stage GEMM FFT.  Each entry:
# (einsum string over the last two axes of A and the 2D constant B,
#  A's contraction axis, fn(Ascale with contraction axis kept) ->
#  output-broadcastable form, fn(Bscale) -> output-broadcastable form).
_PATTERNS = {
    # forward stage 1: out[..., k, j] = sum_n A[..., n, j] B[n, k]
    "nj,nk->kj": ("...nj,nk->...kj", -2,
                  lambda a: a, lambda b: jnp.swapaxes(b, -1, -2)),
    # plain matmul: out[..., m, n] = sum_k A[..., m, k] B[k, n]
    "mk,kn->mn": ("...mk,kn->...mn", -1,
                  lambda a: a, lambda b: b),
    # inverse stage 2: out[..., j, i] = sum_k A[..., k, j] B[k, i]
    "kj,ki->ji": ("...kj,ki->...ji", -2,
                  lambda a: jnp.swapaxes(a, -1, -2), lambda b: b),
}


def preslice(pattern: str, A, s: int, q: int = Q_BITS):
    """Slice A once for `pattern`, to be reused against several constant
    operands (the complex GEMM-FFT stages contract the same A against
    both a cos and a sin matrix)."""
    _, caxis, _, _ = _PATTERNS[pattern]
    k = A.shape[caxis]
    max_k = 1 << max(24 - 2 * q, 0)
    if k > max_k:
        raise ValueError(f"contraction {k} exceeds the q={q} exactness "
                         f"bound {max_k}")
    return slice_f64(A, s, scale_axis=caxis, q=q)


def contract_sliced(pattern: str, A, Bslices, Bscale, q: int = Q_BITS,
                    presliced=None):
    """Ozaki contraction of f64 A with a pre-sliced constant B.

    pattern: one of "nj,nk->kj" (GEMM-FFT forward stage 1),
    "mk,kn->mn" (plain matmul), "kj,ki->ji" (inverse stage 2).
    The triangular i + j < s set of slice products is evaluated (bf16
    MXU GEMMs, exact f32 accumulation) and recombined in f64; s =
    len(Bslices).  Pass `presliced=preslice(pattern, A, s)` to share A's
    slicing across calls (A itself is ignored then)."""
    sub, _, afix, bfix = _PATTERNS[pattern]
    s = len(Bslices)
    if presliced is None:
        presliced = preslice(pattern, A, s, q=q)
    Asl, Ascale = presliced
    Bsl = [jnp.asarray(b, jnp.bfloat16) for b in Bslices]   # exact cast
    acc = None
    for i in range(s):
        for j in range(s - i):
            part = jnp.einsum(sub, Asl[i], Bsl[j],
                              preferred_element_type=jnp.float32)
            term = part.astype(jnp.float64) * 2.0 ** (-(i + j) * q)
            acc = term if acc is None else acc + term
    return acc * afix(Ascale) * bfix(jnp.asarray(Bscale))
