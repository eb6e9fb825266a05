"""Cascaded one-pole DC blockers (src/UltraHighRateDCBlocker.h).

Two first-order high-pass sections in series with cutoffs spread +-10%:
  alpha_i = 1 - exp(-2 pi fc (1 -+ 0.1) / sr)        (init, :78-115)
  per sample: s_i' = s_i + alpha_i (x_i - s_i);  y_i = x_i - s_i'
(the output uses the UPDATED state, :127-150).

Linear in (s0, s1) -> evaluated as one 2x2 affine associative scan:
  s0' = (1-a0) s0 + a0 x
  s1' = -a1(1-a0) s0 + (1-a1) s1 + a1(1-a0) x
  y   = (1-a1)( (1-a0)(x - s0) - s1 )
Engine cutoffs: input/output 3 Hz at device rate, oversampled 1 Hz at the
processing rate (AudioEngine.h:640-648).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scan_iir import affine_scan_2x2

INTERNAL_SPREAD = 0.1


def dc_blocker_alphas(sample_rate: float, cutoff_hz: float):
    """init() coefficients (host libm, exact)."""
    alphas = []
    for ratio in (1.0 - INTERNAL_SPREAD, 1.0 + INTERNAL_SPREAD):
        omega = 2.0 * np.pi * cutoff_hz * ratio / sample_rate
        a = -np.expm1(-omega)
        if not np.isfinite(a) or a <= 0.0 or a >= 1.0:
            a = 1.0e-6
        alphas.append(float(a))
    return alphas


_DC_KERNEL_CACHE: dict = {}
DC_CHUNK = 128


def _dc_kernels(a0: float, a1: float, chunk: int):
    """Host-f64 direct-Toeplitz operands for the 2-state dc recurrence.

    With drive bu[j] = u x[j] (u = [a0, a1 b0] — a rank-1 function of
    the input) the in-chunk solution is

        s_pre[i] = A^i s_b + sum_{j<i} w[i-1-j] x[j],   w[k] = A^k u

    i.e. per state component ONE strictly-lower Toeplitz matmul on x
    itself — no bu or pre-state tensors ever materialize (the generic
    affine_scan_2x2 form costs four GEMMs plus two full (N, 2)
    write+read passes; measured 80 -> ~45 ms at 512 streams x 480k
    @384 kHz).  Row `chunk` of each Toeplitz carries the chunk-boundary
    drive.  A^k is computed here in exact f64 (the device log-doubling
    composes the same products in matmul precision)."""
    key = (a0, a1, chunk)
    got = _DC_KERNEL_CACHE.get(key)
    if got is not None:
        return got
    b0, b1 = 1.0 - a0, 1.0 - a1
    A = np.array([[b0, 0.0], [-a1 * b0, b1]], np.float64)
    u = np.array([a0, a1 * b0], np.float64)
    P = np.empty((chunk + 1, 2, 2))
    P[0] = np.eye(2)
    for k in range(chunk):
        P[k + 1] = A @ P[k]
    w = P[:chunk] @ u                           # (chunk, 2)
    idx = np.subtract.outer(np.arange(chunk + 1), np.arange(chunk)) - 1
    T = np.where(idx[..., None] >= 0,
                 w[np.clip(idx, 0, chunk - 1)], 0.0)   # (chunk+1, chunk, 2)
    out = (P, T[..., 0].T.copy(), T[..., 1].T.copy())  # T_c: (chunk, chunk+1)
    _DC_KERNEL_CACHE[key] = out
    return out


_DC_DD_CACHE: dict = {}
DD_DC_CHUNK = 128


def _dc_dd_kernels(a0: float, a1: float, chunk: int):
    """Host-combined operators for the minimal-pass dd path.

    On TPU every full-signal f64-emulated pass costs ~35x its f32
    equivalent, so the dd form of the Toeplitz dc solver folds the
    output combination y = b1 (b0 (x - s0_pre) - s1_pre) into the host
    matrices: ONE combined Toeplitz GEMM Tc = b1 b0 T0 + b1 T1 produces
    the correction drive directly, one (chunk, 2) GEMV produces both
    chunk-boundary drives, and one (chunk, 2) einsum maps the boundary
    states through Pc = b1 b0 P[:,0,:] + b1 P[:,1,:]:

        y = b1 b0 x - (einsum(s_b, Pc) + x_chunks @ Tc)

    — 4 full-size passes instead of ~20 (measured standalone wall
    76.8 -> 50.6 ms incl. the ~28 ms dispatch floor, i.e. compute
    ~49 -> ~22 ms, on the 4x20 s dd chain).  Chunk stays at 128: the
    measured sweep is 90.8 / 63.6 / 50.6 / 49.7 ms at chunk
    32/64/128/256 — smaller chunks trade GEMM MACs for
    boundary-scan levels and lose."""
    key = (a0, a1, chunk)
    got = _DC_DD_CACHE.get(key)
    if got is None:
        P, T0, T1 = _dc_kernels(a0, a1, chunk)
        b0, b1 = 1.0 - a0, 1.0 - a1
        Tc = b1 * b0 * T0[:, :chunk] + b1 * T1[:, :chunk]
        Tend = np.stack([T0[:, chunk], T1[:, chunk]], axis=-1)
        Pc = b1 * b0 * P[:chunk, 0, :] + b1 * P[:chunk, 1, :]
        got = (P, Tc, Tend, Pc)
        _DC_DD_CACHE[key] = got
    return got


def dc_block(x, sample_rate: float, cutoff_hz: float, state0=None):
    """Apply the 2-stage DC blocker along the last axis.

    Returns (y, final_state) with state = (s0, s1).  (A cascaded
    two-one-pole decomposition was tried and measured slower than the
    fused 2x2 scan on TPU.)  Uses the direct-Toeplitz form (see
    `_dc_kernels`); the boundary states across chunks follow via the
    generic affine scan over N/chunk elements.
    """
    import jax
    x = jnp.asarray(x)
    dt = x.dtype
    a0, a1 = dc_blocker_alphas(sample_rate, cutoff_hz)
    b0 = 1.0 - a0
    b1 = 1.0 - a1
    n = x.shape[-1]
    batch = x.shape[:-1]
    if state0 is None:
        state0 = jnp.zeros(batch + (2,), dt)

    dd = dt == jnp.float64 and jax.default_backend() not in ("cpu",)
    chunk = min(DD_DC_CHUNK if dd else DC_CHUNK, n)
    nc = -(-n // chunk)
    npad = nc * chunk
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, npad - n)]) \
        if npad != n else x
    xr = xp.reshape(batch + (nc, chunk))
    hi = jax.lax.Precision.HIGHEST
    if dd:
        return _dc_block_dd(x, xr, a0, a1, chunk, nc, npad, n, batch,
                            state0)
    P, T0, T1 = _dc_kernels(a0, a1, chunk)
    d0 = jnp.matmul(xr, jnp.asarray(T0, dt), precision=hi)
    d1 = jnp.matmul(xr, jnp.asarray(T1, dt), precision=hi)
    # chunk-boundary states: s_{b+1} = A^chunk s_b + drive_end[b]
    Ac = jnp.asarray(P[chunk], dt)
    dend = jnp.stack([d0[..., chunk], d1[..., chunk]], axis=-1)
    sb, s_after = affine_scan_2x2(Ac, dend, state0)          # (..., nc, 2)
    # y[i] = b1 (b0 (x - s0_pre) - s1_pre), s_pre = A^i s_b + drive[i]
    Pj = jnp.asarray(P[:chunk], dt)                          # (chunk, 2, 2)
    s0p = jnp.einsum("...nc,kc->...nk", sb, Pj[:, 0, :],
                     precision=hi) + d0[..., :chunk]
    s1p = jnp.einsum("...nc,kc->...nk", sb, Pj[:, 1, :],
                     precision=hi) + d1[..., :chunk]
    y = b1 * (b0 * (xr - s0p) - s1p)
    y = y.reshape(batch + (npad,))[..., :n]
    if npad != n:
        # true final state = state at offset k of the LAST chunk (the
        # padded boundary recursion ran over zeros): A^k s_b + drive[k].
        # x[j >= n] is zero so Toeplitz row k (covering j < k) is exact.
        k = n - (nc - 1) * chunk
        s_last = sb[..., -1, :]
        Pk = jnp.asarray(P[k], dt)
        sf = jnp.einsum("...c,dc->...d", s_last, Pk, precision=hi) \
            + jnp.stack([d0[..., -1, k], d1[..., -1, k]], axis=-1)
        final = sf
    else:
        final = s_after
    return y, final


def _dc_block_dd(x, xr, a0, a1, chunk, nc, npad, n, batch, state0):
    """Minimal-pass dd (f64-on-TPU) form — see `_dc_dd_kernels`.
    Identical recurrence; only the output combination is folded into
    the host matrices (summation regrouping at the 1e-16 level)."""
    import jax
    dt = x.dtype
    hi = jax.lax.Precision.HIGHEST
    P, Tc, Tend, Pc = _dc_dd_kernels(a0, a1, chunk)
    b0, b1 = 1.0 - a0, 1.0 - a1
    dend = jnp.matmul(xr, jnp.asarray(Tend, dt), precision=hi)
    Ac = jnp.asarray(P[chunk], dt)
    sb, s_after = affine_scan_2x2(Ac, dend, state0)          # (..., nc, 2)
    corr = jnp.einsum("...nc,kc->...nk", sb, jnp.asarray(Pc, dt),
                      precision=hi) \
        + jnp.matmul(xr, jnp.asarray(Tc, dt), precision=hi)
    y = (b1 * b0) * xr - corr
    y = y.reshape(batch + (npad,))[..., :n]
    if npad != n:
        # final state at offset k of the last chunk: A^k s_b + drive[k]
        # (drive via the k-th Toeplitz columns of the FULL kernels)
        _Pf, T0, T1 = _dc_kernels(a0, a1, chunk)
        k = n - (nc - 1) * chunk
        xl = xr[..., -1, :]
        d0k = jnp.einsum("...j,j->...", xl, jnp.asarray(T0[:, k], dt),
                         precision=hi)
        d1k = jnp.einsum("...j,j->...", xl, jnp.asarray(T1[:, k], dt),
                         precision=hi)
        s_last = sb[..., -1, :]
        Pk = jnp.asarray(P[k], dt)
        final = jnp.einsum("...c,dc->...d", s_last, Pk, precision=hi) \
            + jnp.stack([d0k, d1k], axis=-1)
    else:
        final = s_after
    return y, final
