"""Linear recurrences as parallel (associative) scans.

Every IIR structure in the signal chain — TPT-SVF EQ bands, output-filter
biquads, K-weighting filters, one-pole DC blockers — is *linear* in its
state: s[n+1] = A s[n] + b[n].  Composition of affine maps is associative,
so the whole recurrence evaluates with `jax.lax.associative_scan` in
O(log N) depth, fully parallel across VPU lanes and batch dims — this is the
TPU-native replacement for the reference's per-sample scalar/SSE2 loops
(ref: src/eqprocessor/EQProcessor.Processing.cpp:128-275).

Conventions
-----------
- Time is the LAST axis of `bu`; leading axes are batch.
- The 2x2 transition matrix A may be constant per-batch (shape (..., 2, 2))
  with `bu` shape (..., N, 2).
- Returned `pre_states` are the states *before* consuming each sample
  (s[0..N-1]), which is what output equations need; `final_state` is s[N].
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _affine_combine(left, right):
    """Compose affine maps elementwise: right ∘ left (left applied first).

    Each element is (m11, m12, m21, m22, v1, v2) representing
    x -> M x + v with M = [[m11, m12], [m21, m22]].
    """
    l11, l12, l21, l22, lv1, lv2 = left
    r11, r12, r21, r22, rv1, rv2 = right
    m11 = r11 * l11 + r12 * l21
    m12 = r11 * l12 + r12 * l22
    m21 = r21 * l11 + r22 * l21
    m22 = r21 * l12 + r22 * l22
    v1 = r11 * lv1 + r12 * lv2 + rv1
    v2 = r21 * lv1 + r22 * lv2 + rv2
    return (m11, m12, m21, m22, v1, v2)


DEFAULT_CHUNK = 4096

# Pole radius above which an f32 biquad switches from the 2x2 companion scan
# to the diagonalized scan (see biquad_df2t_scan docstring): intermediate
# product growth ~1/(e*(1-r)) times f32 eps crosses ~1e-6 around r=0.996;
# 0.99 leaves margin.
POLE_RADIUS_DIAG_F32 = 0.99

# Pole radius below which an f32 biquad runs as a truncated-FIR GEMM:
# with FIR_TAPS taps the truncation error is r^taps (< 1e-9 at r=0.85).
POLE_RADIUS_FIR_F32 = 0.85
BIQUAD_FIR_TAPS = 128


def _biquad_pole_radius(a1: float, a2: float) -> float:
    """Largest pole magnitude of z^2 + a1 z + a2."""
    disc = a1 * a1 - 4.0 * a2
    if disc < 0.0:
        return float(np.sqrt(max(a2, 0.0)))
    s = np.sqrt(disc)
    return float(max(abs((-a1 + s) / 2.0), abs((-a1 - s) / 2.0)))


def _biquad_fir_f32(x, b0, b1, b2, a1, a2):
    """Low-radius biquad as a truncated-FIR banded-Toeplitz GEMM.

    Impulse response computed exactly on host; truncation error r^taps is
    below f32 eps for r <= POLE_RADIUS_FIR_F32.  Final TDF2 state is
    reconstructed from the output tail (as in _biquad_scan_diag)."""
    from .oversample import _fir_matmul
    h = np.zeros(BIQUAD_FIR_TAPS)
    z1 = z2 = 0.0
    xi = 1.0
    for k in range(BIQUAD_FIR_TAPS):
        y = b0 * xi + z1
        z1 = b1 * xi - a1 * y + z2
        z2 = b2 * xi - a2 * y
        h[k] = y
        xi = 0.0
    y = _fir_matmul(x, h)
    xm1 = x[..., -1]
    ym1 = y[..., -1]
    xm2 = x[..., -2] if x.shape[-1] >= 2 else jnp.zeros_like(xm1)
    ym2 = y[..., -2] if x.shape[-1] >= 2 else jnp.zeros_like(ym1)
    z1f = b1 * xm1 - a1 * ym1 + (b2 * xm2 - a2 * ym2)
    z2f = b2 * xm1 - a2 * ym1
    return y, jnp.stack([z1f, z2f], axis=-1).astype(x.dtype)


# In-chunk block size for the MXU (Toeplitz-matmul) scan backends.
MATMUL_CHUNK = 128

# Default affine-scan backend (A/B knob; see affine_scan_2x2 docstring).
# "auto" picks per length: megasample offline buffers amortize the MXU
# Toeplitz form's many small matmuls, but at serving block sizes those
# matmuls are pure launch overhead (measured on v5e, 20-band EQ over
# 512-sample blocks: 15.5 ms/block matmul vs 3.6 ms scan — and 665 s vs
# 34 s compile).
AFFINE_BACKEND = os.environ.get("CONVOPEQ_AFFINE_BACKEND", "auto")
AFFINE_AUTO_MIN_MATMUL_N = 4096


def affine_scan_2x2(A, bu, s0, chunk: int | None = None,
                    backend: str | None = None):
    """Evaluate s[n+1] = A @ s[n] + bu[n] for constant A.

    backend="matmul" (default): within a chunk the solution is a strictly
    lower-triangular block-Toeplitz matmul, s[b+i] = A^i s[b] +
    sum_{j<i} A^(i-1-j) bu[b+j] — four (chunk x chunk) matmuls that run on
    the MXU instead of the VPU; chunk-boundary states follow via a short
    affine scan over N/chunk elements.  Numerically this composes the same
    A^k products as the scan backend (identical conditioning), just
    batched.  backend="scan": two-level blocked `associative_scan`
    composing per-sample affine maps on the VPU.

    Args:
      A:  (..., 2, 2) constant transition matrix (broadcast against batch).
      bu: (..., N, 2) per-sample affine offsets.
      s0: (..., 2) initial state.
      chunk: in-chunk block size (static); defaults to MATMUL_CHUNK /
        DEFAULT_CHUNK per backend.
      backend: "matmul" | "scan".

    Returns:
      (pre_states, final_state):
        pre_states (..., N, 2) — state before each sample (s[0..N-1]).
        final_state (..., 2)   — s[N].
    """
    if backend is None:
        backend = AFFINE_BACKEND
    if backend == "auto":
        backend = ("matmul" if jnp.shape(bu)[-2] >= AFFINE_AUTO_MIN_MATMUL_N
                   else "scan")
    if backend == "matmul":
        return _affine_scan_2x2_matmul(A, bu, s0, chunk or MATMUL_CHUNK)
    return _affine_scan_2x2_scan(A, bu, s0, chunk or DEFAULT_CHUNK)


def _affine_scan_2x2_matmul(A, bu, s0, chunk: int = MATMUL_CHUNK):
    bu = jnp.asarray(bu)
    dt = bu.dtype
    batch = bu.shape[:-2]
    n = bu.shape[-2]
    A = jnp.broadcast_to(jnp.asarray(A, dt), batch + (2, 2))
    s0 = jnp.broadcast_to(jnp.asarray(s0, dt), batch + (2,))
    if len(batch) != 1:
        # Flatten batch to rank 1: XLA's dot_general handles one batch dim
        # markedly better than several (measured 56 ms vs 34 ms on v5e for
        # (4, 2) vs (8,) over 2.88M samples).
        nb = int(np.prod(batch)) if batch else 1
        pre, fin = _affine_scan_2x2_matmul(
            A.reshape((nb, 2, 2)), bu.reshape((nb, n, 2)),
            s0.reshape((nb, 2)), chunk)
        return pre.reshape(batch + (n, 2)), fin.reshape(batch + (2,))
    hi = jax.lax.Precision.HIGHEST

    chunk = min(chunk, n)
    nc = -(-n // chunk)
    npad = nc * chunk
    bu_last = bu[..., n - 1, :]
    if npad != n:
        bu = jnp.pad(bu, [(0, 0)] * (bu.ndim - 2) + [(0, npad - n), (0, 0)])
    bu_r = bu.reshape(batch + (nc, chunk, 2))

    # P[k] = A^k for k = 0..chunk by log-doubling: P_2m = [P_m, A^m P_m]
    # (O(log chunk) batched matmuls, no sequential scan).
    Ps = jnp.broadcast_to(jnp.eye(2, dtype=dt), batch + (1, 2, 2))
    Am = A
    while Ps.shape[-3] < chunk + 1:
        Ps = jnp.concatenate(
            [Ps, jnp.einsum("...ab,...kbc->...kac", Am, Ps, precision=hi)],
            axis=-3)
        Am = jnp.einsum("...ab,...bc->...ac", Am, Am, precision=hi)
    Ps = Ps[..., :chunk + 1, :, :]                  # (..., chunk+1, 2, 2)

    # T[i, j] = A^(i-1-j) for j < i, else 0 (strictly lower Toeplitz),
    # one (chunk x chunk) matrix per matrix component -> 4 clean batched
    # matmuls for the drive contribution.
    idx = np.subtract.outer(np.arange(chunk), np.arange(chunk)) - 1
    idxc = jnp.asarray(np.clip(idx, 0, chunk))
    maskT = jnp.asarray(idx >= 0, dt)
    Tc = [[jnp.take(Ps[..., a, b], idxc, axis=-1) * maskT for b in (0, 1)]
          for a in (0, 1)]
    bu1 = bu_r[..., 0]
    bu2 = bu_r[..., 1]
    mm = lambda t, v: jnp.einsum("...ij,...cj->...ci", t, v, precision=hi)
    win = jnp.stack([mm(Tc[0][0], bu1) + mm(Tc[0][1], bu2),
                     mm(Tc[1][0], bu1) + mm(Tc[1][1], bu2)], axis=-1)

    # chunk total map: matrix A^chunk (same for all chunks), value
    # v_tot[c] = A @ win[c, -1] + bu[c, -1].
    if nc > 1:
        v_tot = jnp.einsum("...ab,...cb->...ca", A, win[..., -1, :],
                           precision=hi) + bu_r[..., -1, :]
        m_tot = Ps[..., chunk, :, :]
        me = [jnp.broadcast_to(m_tot[..., a, b, None], batch + (nc,))
              for a in (0, 1) for b in (0, 1)]
        tot = (me[0], me[1], me[2], me[3], v_tot[..., 0], v_tot[..., 1])
        c11, c12, c21, c22, cv1, cv2 = jax.lax.associative_scan(
            _affine_combine, tot, axis=-1)
        post_c1 = c11 * s0[..., :1] + c12 * s0[..., 1:] + cv1
        post_c2 = c21 * s0[..., :1] + c22 * s0[..., 1:] + cv2
        start = jnp.stack(
            [jnp.concatenate([s0[..., :1], post_c1[..., :-1]], axis=-1),
             jnp.concatenate([s0[..., 1:], post_c2[..., :-1]], axis=-1)],
            axis=-1)                                 # (..., nc, 2)
    else:
        start = s0[..., None, :]

    # pre[c, i] = A^i start[c] + win[c, i]
    pre = jnp.einsum("...iab,...cb->...cia", Ps[..., :chunk, :, :], start,
                     precision=hi) + win
    pre = pre.reshape(batch + (npad, 2))[..., :n, :]
    final = jnp.einsum("...ab,...b->...a", A, pre[..., n - 1, :],
                       precision=hi) + bu_last
    return pre, final


def _affine_scan_2x2_scan(A, bu, s0, chunk: int = DEFAULT_CHUNK):
    """Two-level blocked associative-scan backend (VPU)."""
    bu = jnp.asarray(bu)
    batch = bu.shape[:-2]
    n = bu.shape[-2]
    A = jnp.asarray(A, bu.dtype)
    s0 = jnp.broadcast_to(jnp.asarray(s0, bu.dtype), batch + (2,))

    chunk = min(chunk, n)
    nc = -(-n // chunk)
    npad = nc * chunk
    if npad != n:
        # Zero-pad the drive; A is unchanged so padded prefix maps are
        # valid (their outputs are sliced away below).
        pad = [(0, 0)] * (bu.ndim - 2) + [(0, npad - n), (0, 0)]
        bu = jnp.pad(bu, pad)

    shp = batch + (nc, chunk)                       # element layout
    b1 = bu[..., 0].reshape(shp)
    b2 = bu[..., 1].reshape(shp)
    a11 = jnp.broadcast_to(A[..., 0, 0][..., None, None], shp)
    a12 = jnp.broadcast_to(A[..., 0, 1][..., None, None], shp)
    a21 = jnp.broadcast_to(A[..., 1, 0][..., None, None], shp)
    a22 = jnp.broadcast_to(A[..., 1, 1][..., None, None], shp)

    # Phase 1: in-chunk inclusive prefix maps.
    m11, m12, m21, m22, v1, v2 = jax.lax.associative_scan(
        _affine_combine, (a11, a12, a21, a22, b1, b2), axis=-1)

    if nc > 1:
        # Phase 2: propagate chunk-start states.  The per-chunk total map is
        # the last in-chunk prefix; an inclusive scan over chunks then gives
        # the state AFTER each chunk; shift right to get chunk-start states.
        tot = tuple(t[..., -1] for t in (m11, m12, m21, m22, v1, v2))
        c11, c12, c21, c22, cv1, cv2 = jax.lax.associative_scan(
            _affine_combine, tot, axis=-1)
        post_c1 = c11 * s0[..., :1] + c12 * s0[..., 1:] + cv1   # (..., nc)
        post_c2 = c21 * s0[..., :1] + c22 * s0[..., 1:] + cv2
        start1 = jnp.concatenate([s0[..., :1], post_c1[..., :-1]], axis=-1)
        start2 = jnp.concatenate([s0[..., 1:], post_c2[..., :-1]], axis=-1)
    else:
        start1 = s0[..., :1]
        start2 = s0[..., 1:]

    # Phase 3: states after each sample = in-chunk prefix applied to the
    # chunk-start state; pre-states are the right-shift within each chunk.
    st1 = start1[..., None]
    st2 = start2[..., None]
    post1 = m11 * st1 + m12 * st2 + v1
    post2 = m21 * st1 + m22 * st2 + v2
    pre1 = jnp.concatenate([st1, post1[..., :-1]], axis=-1)
    pre2 = jnp.concatenate([st2, post2[..., :-1]], axis=-1)

    pre1 = pre1.reshape(batch + (npad,))[..., :n]
    pre2 = pre2.reshape(batch + (npad,))[..., :n]
    postf1 = post1.reshape(batch + (npad,))[..., n - 1]
    postf2 = post2.reshape(batch + (npad,))[..., n - 1]

    pre_states = jnp.stack([pre1, pre2], axis=-1)
    final_state = jnp.stack([postf1, postf2], axis=-1)
    return pre_states, final_state


def biquad_df2t_scan(x, b0, b1, b2, a1, a2, s0=None,
                     method: str = "auto"):
    """Transposed-direct-form-II biquad via associative scan.

    y[n]  = b0 x[n] + z1[n]
    z1[n+1] = b1 x[n] - a1 y[n] + z2[n]
    z2[n+1] = b2 x[n] - a2 y[n]

    Substituting y[n] gives a linear state recurrence in (z1, z2):
      z1' = -a1 z1 + z2 + (b1 - a1 b0) x
      z2' = -a2 z1      + (b2 - a2 b0) x

    Coefficients are scalars or arrays broadcastable against the batch
    shape x.shape[:-1]; time is the last axis of x.

    method:
      "2x2"  — fused companion-matrix scan (fastest on TPU v5e: 1291x vs
               646x chain RTF for the diag variant).
      "diag" — pole-diagonalized (complex partial fractions / cascaded real
               one-poles).  Numerically essential for near-DC poles in f32:
               companion-matrix prefix products grow like k*r^k (up to
               ~1/(e*(1-r))) before cancelling, so an 18 Hz biquad at 48 kHz
               (r≈0.9983) loses ~6e-2 relative accuracy in the 2x2 scan but
               only ~7e-4 diagonalized (the f32 sequential floor is ~4e-4).
      "auto" — 2x2, except scalar-coefficient f32 biquads with pole radius
               > POLE_RADIUS_DIAG_F32 route to diag.
    """
    x = jnp.asarray(x)
    dt = x.dtype
    batch = x.shape[:-1]
    scalar_coeffs = all(np.ndim(c) == 0 for c in (b0, b1, b2, a1, a2))
    if method == "auto":
        method = "2x2"
        if scalar_coeffs and dt != jnp.float64:
            rmax = _biquad_pole_radius(float(a1), float(a2))
            if rmax > POLE_RADIUS_DIAG_F32:
                method = "diag"
            elif s0 is None and rmax <= POLE_RADIUS_FIR_F32:
                # fast-decaying poles: the truncated impulse response is
                # exact to beyond f32 precision (r^128 < 1e-9), and the
                # FIR runs as one banded-Toeplitz GEMM pass instead of a
                # scan (ops.oversample._fir_matmul)
                method = "fir"
        elif (scalar_coeffs and s0 is None
                and jax.default_backend() != "cpu"):
            # dd mode (f64 on an accelerator): XLA's f64 emulation carries
            # a few extra ulps per op, and the companion-matrix prefix
            # products amplify them by ~1/(1-r) for near-DC poles (the
            # 18 Hz output-filter biquad measured 1.5e-9 rel on v5e vs
            # 1e-14 diagonalized) — route high-radius poles to the
            # well-conditioned diagonal form, like the f32 path.
            rmax = _biquad_pole_radius(float(a1), float(a2))
            if rmax > POLE_RADIUS_DIAG_F32:
                method = "diag"
    if method == "fir" and scalar_coeffs and s0 is None:
        return _biquad_fir_f32(x, float(b0), float(b1), float(b2),
                               float(a1), float(a2))
    if method == "diag" and scalar_coeffs:
        return _biquad_scan_diag(x, float(b0), float(b1), float(b2),
                                 float(a1), float(a2), s0)

    b0 = jnp.broadcast_to(jnp.asarray(b0, dt), batch)
    b1 = jnp.broadcast_to(jnp.asarray(b1, dt), batch)
    b2 = jnp.broadcast_to(jnp.asarray(b2, dt), batch)
    a1 = jnp.broadcast_to(jnp.asarray(a1, dt), batch)
    a2 = jnp.broadcast_to(jnp.asarray(a2, dt), batch)

    one = jnp.ones(batch, dt)
    zero = jnp.zeros(batch, dt)
    A = jnp.stack([
        jnp.stack([-a1, one], axis=-1),
        jnp.stack([-a2, zero], axis=-1),
    ], axis=-2)
    c1 = (b1 - a1 * b0)[..., None]
    c2 = (b2 - a2 * b0)[..., None]
    bu = jnp.stack([x * c1, x * c2], axis=-1)

    if s0 is None:
        s0 = jnp.zeros(batch + (2,), dt)
    pre, final = affine_scan_2x2(A, bu, s0)
    y = b0[..., None] * x + pre[..., 0]
    return y, final


def _complex_one_pole(v, p, w0, chunk: int = 128):
    """w[n] = p*w[n-1] + v[n] (constant complex p), inclusive outputs as a
    split (real, imag) pair of real arrays.

    MXU formulation: within a chunk of `chunk` samples the recurrence is a
    lower-triangular Toeplitz matmul, win[i] = sum_{j<=i} p^(i-j) v[j]
    (T built on host, |entries| = r^k <= 1 so it is well-conditioned in
    f32, unlike companion-matrix prefix products); chunk boundary states
    follow a scalar one-pole with coefficient p^chunk (short associative
    scan over N/chunk elements); the chunk-start state enters each sample
    through a precomputed p^(i+1) ramp.

    Everything is split re/im real arithmetic — no complex dtypes anywhere,
    both because the tunneled TPU backend lacks several complex ops (eager
    dispatch hits UNIMPLEMENTED) and so the TPU matmul stays controllable
    via Precision.HIGHEST (not silently bf16).  `v` is a real array;
    `w0` is a Python scalar/complex initial state.
    """
    f64 = v.dtype == jnp.float64
    dtr = jnp.float64 if f64 else jnp.float32
    vr = jnp.asarray(v, dtr)
    batch = vr.shape[:-1]
    n = vr.shape[-1]
    chunk = min(chunk, n)
    nc = -(-n // chunk)
    npad = nc * chunk
    if npad != n:
        vr = jnp.pad(vr, [(0, 0)] * (vr.ndim - 1) + [(0, npad - n)])
    shp = batch + (nc, chunk)
    vr = vr.reshape(shp)

    pc = complex(p)
    k = np.subtract.outer(np.arange(chunk), np.arange(chunk))
    T = np.where(k >= 0, pc ** np.maximum(k, 0), 0.0)     # T[i, j] = p^(i-j)
    Ttr = jnp.asarray(T.T.real, dtr)
    Tti = jnp.asarray(T.T.imag, dtr)
    hi = jax.lax.Precision.HIGHEST
    win_r = jnp.matmul(vr, Ttr, precision=hi)
    win_i = jnp.matmul(vr, Tti, precision=hi)

    # chunk-boundary carry: b[c] = p^chunk b[c-1] + win[c, -1]
    w0c = complex(w0)
    w0r = jnp.full(batch + (1,), w0c.real, dtr)
    w0i = jnp.full(batch + (1,), w0c.imag, dtr)
    if nc > 1:
        pch = pc ** chunk
        bnd_r = win_r[..., -1]
        bnd_i = win_i[..., -1]
        ar = jnp.full(bnd_r.shape, pch.real, dtr)
        ai = jnp.full(bnd_r.shape, pch.imag, dtr)

        def combine(l, r):
            lar, lai, lvr, lvi = l
            rar, rai, rvr, rvi = r
            return (rar * lar - rai * lai, rar * lai + rai * lar,
                    rar * lvr - rai * lvi + rvr, rar * lvi + rai * lvr + rvi)

        cmr, cmi, cvr, cvi = jax.lax.associative_scan(
            combine, (ar, ai, bnd_r, bnd_i), axis=-1)
        post_r = cmr * w0r - cmi * w0i + cvr
        post_i = cmr * w0i + cmi * w0r + cvi
        start_r = jnp.concatenate([w0r, post_r[..., :-1]], axis=-1)
        start_i = jnp.concatenate([w0i, post_i[..., :-1]], axis=-1)
    else:
        start_r, start_i = w0r, w0i

    # w[c, i] = win[c, i] + p^(i+1) * start[c]
    ramp = pc ** (np.arange(chunk) + 1)
    ramp_r = jnp.asarray(ramp.real, dtr)
    ramp_i = jnp.asarray(ramp.imag, dtr)
    sr = start_r[..., None]
    si = start_i[..., None]
    w_r = win_r + sr * ramp_r - si * ramp_i
    w_i = win_i + sr * ramp_i + si * ramp_r
    w_r = w_r.reshape(batch + (npad,))[..., :n]
    w_i = w_i.reshape(batch + (npad,))[..., :n]
    return w_r, w_i


def _biquad_scan_diag(x, b0, b1, b2, a1, a2, s0=None):
    """Scalar-coefficient biquad via pole diagonalization (zero state).

    All-pole part 1/(1 + a1 z^-1 + a2 z^-2): poles p, q.
    - complex pair: y_ap[n] = 2 Re(r w[n]), w = inclusive one-pole(p) of v,
      r = p/(p - conj(p))  (partial fractions)
    - real poles (incl. repeated): two cascaded real one-pole stages.
    v = FIR(b) of x.  A provided initial state routes to the 2x2 form
    (TDF2 state isn't directly transferable to the diagonal basis).
    Returns (y, final TDF2 state).
    """
    x = jnp.asarray(x)
    dt = x.dtype
    if s0 is not None:
        return _biquad_scan_2x2(x, b0, b1, b2, a1, a2, s0)

    # FIR part v[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]
    x1 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    x2 = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(2, 0)])[..., :-2]
    v = b0 * x + b1 * x1 + b2 * x2

    disc = a1 * a1 - 4.0 * a2
    if a1 == 0.0 and a2 == 0.0:
        y = v
    elif disc < 0.0:
        p = complex(-a1 / 2.0, np.sqrt(-disc) / 2.0)
        r = p / (p - np.conj(p))
        wr, wi = _complex_one_pole(v, p, 0.0)
        y = (2.0 * (wr * r.real - wi * r.imag)).astype(dt)
    else:
        sq = np.sqrt(max(disc, 0.0))
        p = (-a1 + sq) / 2.0
        q = (-a1 - sq) / 2.0
        pre_p, _ = one_pole_scan(v, p, 1.0, 0.0)
        u = p * pre_p + v            # inclusive one-pole output
        pre_q, _ = one_pole_scan(u, q, 1.0, 0.0)
        y = q * pre_q + u

    # final TDF2 state for continuity, reconstructed from the tail:
    # z2_final = b2 x[-1] - a2 y[-1]
    # z1_final = b1 x[-1] - a1 y[-1] + (b2 x[-2] - a2 y[-2])
    xm1 = x[..., -1]
    ym1 = y[..., -1]
    xm2 = x[..., -2] if x.shape[-1] >= 2 else jnp.zeros_like(xm1)
    ym2 = y[..., -2] if x.shape[-1] >= 2 else jnp.zeros_like(ym1)
    z1_final = b1 * xm1 - a1 * ym1 + (b2 * xm2 - a2 * ym2)
    z2_final = b2 * xm1 - a2 * ym1
    final = jnp.stack([z1_final, z2_final], axis=-1)
    return y, final


def _biquad_scan_2x2(x, b0, b1, b2, a1, a2, s0):
    """General 2x2 path (nonzero initial state / per-batch coefficients)."""
    x = jnp.asarray(x)
    dt = x.dtype
    batch = x.shape[:-1]
    b0a = jnp.broadcast_to(jnp.asarray(b0, dt), batch)
    b1a = jnp.broadcast_to(jnp.asarray(b1, dt), batch)
    b2a = jnp.broadcast_to(jnp.asarray(b2, dt), batch)
    a1a = jnp.broadcast_to(jnp.asarray(a1, dt), batch)
    a2a = jnp.broadcast_to(jnp.asarray(a2, dt), batch)
    one = jnp.ones(batch, dt)
    zero = jnp.zeros(batch, dt)
    A = jnp.stack([
        jnp.stack([-a1a, one], axis=-1),
        jnp.stack([-a2a, zero], axis=-1),
    ], axis=-2)
    bu = jnp.stack([x * (b1a - a1a * b0a)[..., None],
                    x * (b2a - a2a * b0a)[..., None]], axis=-1)
    pre, final = affine_scan_2x2(A, bu, jnp.asarray(s0, dt))
    y = b0a[..., None] * x + pre[..., 0]
    return y, final


def one_pole_scan(x, a, b, s0=0.0):
    """s[n+1] = a*s[n] + b*x[n]; returns pre-states (s[0..N-1]) and s[N].

    Used for DC blockers and envelope followers.  `a`, `b` broadcast against
    x.shape[:-1]; time is the last axis.
    """
    x = jnp.asarray(x)
    dt = x.dtype
    batch = x.shape[:-1]
    n = x.shape[-1]
    b_b = jnp.broadcast_to(jnp.asarray(b, dt), batch)[..., None]
    bu = b_b * x

    chunk = min(DEFAULT_CHUNK, n)
    nc = -(-n // chunk)
    npad = nc * chunk
    if npad != n:
        bu = jnp.pad(bu, [(0, 0)] * (bu.ndim - 1) + [(0, npad - n)])
    shp = batch + (nc, chunk)
    bu = bu.reshape(shp)
    ae = jnp.broadcast_to(jnp.asarray(a, dt)[..., None, None]
                          if jnp.ndim(a) else jnp.asarray(a, dt), shp)

    def combine(l, r):
        la, lv = l
        ra, rv = r
        return (ra * la, ra * lv + rv)

    ms, vs = jax.lax.associative_scan(combine, (ae, bu), axis=-1)
    s0_b = jnp.broadcast_to(jnp.asarray(s0, dt), batch)
    if nc > 1:
        cm, cv = jax.lax.associative_scan(
            combine, (ms[..., -1], vs[..., -1]), axis=-1)
        post_c = cm * s0_b[..., None] + cv
        start = jnp.concatenate([s0_b[..., None], post_c[..., :-1]], axis=-1)
    else:
        start = s0_b[..., None]
    post = ms * start[..., None] + vs
    pre = jnp.concatenate([start[..., None], post[..., :-1]], axis=-1)
    pre = pre.reshape(batch + (npad,))[..., :n]
    final = post.reshape(batch + (npad,))[..., n - 1]
    return pre, final
