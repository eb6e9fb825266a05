"""TPT (topology-preserving transform) state-variable filter — Zavalishin.

Coefficients and per-sample recurrence follow the reference exactly:
- coefficient formulas: src/eqprocessor/EQProcessor.Coefficients.cpp:431-607
  (calcLowShelfSVF / calcPeakingSVF / calcHighShelfSVF / calcLowPassSVF /
  calcHighPassSVF), message-thread math done here in f64 jax.numpy.
- recurrence: src/eqprocessor/EQProcessor.Processing.cpp:128-186
      v3 = v0 - ic2eq
      v1 = a1*ic1eq + a2*v3
      v2 = ic2eq + a2*ic1eq + a3*v3
      ic1eq' = 2*v1 - ic1eq ; ic2eq' = 2*v2 - ic2eq
      y  = m0*v0 + m1*v1 + m2*v2   (then optional saturation blend + clamp)

TPU-native evaluation: the recurrence is linear in (ic1eq, ic2eq) — the
saturation blend applies only to the *output* and never feeds back — so the
state trajectory is computed with one associative scan per band
(O(log N) depth) and the output equation + saturation + clamps evaluate
elementwise.  This replaces the reference's sequential scalar/SSE2 loops.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fast_tanh import fast_tanh_eq, fast_tanh_eq_v
from .scan_iir import affine_scan_2x2

# Band types (ref: src/eqprocessor/EQProcessor.h:43-62)
LOW_SHELF = 0
PEAKING = 1
HIGH_SHELF = 2
LOW_PASS = 3
HIGH_PASS = 4

# Parameter clamping (ref: EQProcessor.h:174-180, validateAndClampParameters)
DSP_MIN_FREQ = 20.0
DSP_MAX_FREQ = 20000.0
DSP_MAX_FREQ_NYQUIST_RATIO = 0.95
DSP_MIN_Q = 0.01
DSP_MAX_Q = 20.0
DSP_MIN_GAIN_DB = -48.0
DSP_MAX_GAIN_DB = 48.0

# processBand output/state guards (EQProcessor.Processing.cpp:160-180)
STATE_ABS_MAX = 1.0e15
OUTPUT_CLAMP = 100.0


def clamp_params(freq, gain_db, q, sample_rate):
    """validateAndClampParameters (EQProcessor.Coefficients.cpp:84-99).

    Host-side NumPy: the reference computes coefficients on the message
    thread with libm; we do the same on the host because XLA-CPU/TPU
    transcendentals (tan/pow) are not correctly rounded in f64.

    The reference's parameter plane is FLOAT32 (the API takes `float`
    freq/gain/q and jlimit clamps in f32 before widening to double), so
    the clamp runs in f32 here too — e.g. q below the floor clamps to
    0.01f = 0.00999999977..., not f64 0.01.  Pinned bit-for-bit by
    tests/test_ref_vectors.py::test_svf_coeffs_match_reference.
    """
    f32 = np.float32
    nyquist = f32(np.asarray(sample_rate, np.float64) * 0.5)
    max_freq = np.minimum(f32(DSP_MAX_FREQ),
                          nyquist * f32(DSP_MAX_FREQ_NYQUIST_RATIO))
    freq = np.clip(np.asarray(freq, f32), f32(DSP_MIN_FREQ), max_freq)
    q = np.clip(np.asarray(q, f32), f32(DSP_MIN_Q), f32(DSP_MAX_Q))
    gain_db = np.clip(np.asarray(gain_db, f32), f32(DSP_MIN_GAIN_DB),
                      f32(DSP_MAX_GAIN_DB))
    return (freq.astype(np.float64), gain_db.astype(np.float64),
            q.astype(np.float64))


def svf_coeffs(band_type, freq, gain_db, q, sample_rate):
    """Vectorized SVF coefficients for all five band types (host NumPy).

    Args broadcast together; `band_type` is an int array selecting the type
    per element.  Returns (a1, a2, a3, m0, m1, m2) float64 arrays.

    Formula parity (EQProcessor.Coefficients.cpp):
      LowShelf  (:431): A=10^(dB/40), g=tan(pi f/sr)/sqrt(A), k=1/Q,
                        m0=1, m1=k(A-1), m2=A^2-1
      Peaking   (:470): g=tan(pi f/sr), k=1/(Q A), m0=1, m1=(A-1/A)/Q, m2=0
      HighShelf (:508): g=tan(pi f/sr)*sqrt(A), k=1/Q,
                        m0=A^2, m1=k(1-A)A, m2=1-A^2
      LowPass   (:541): g=tan(pi f/sr), k=1/Q, m0=0, m1=0, m2=1
      HighPass  (:573): g=tan(pi f/sr), k=1/Q, m0=1, m1=-k, m2=-1
      all: a1 = 1/(1 + g(g+k)), a2 = g a1, a3 = g a2
    """
    band_type = np.asarray(band_type)
    freq = np.asarray(freq, np.float64)
    gain_db = np.asarray(gain_db, np.float64)
    q = np.asarray(q, np.float64)
    freq, gain_db, q = clamp_params(freq, gain_db, q, sample_rate)
    band_type, freq, gain_db, q = np.broadcast_arrays(band_type, freq, gain_db, q)

    A = np.power(10.0, gain_db / 40.0)
    sqrtA = np.sqrt(A)
    g_base = np.tan(np.pi * freq / sample_rate)

    g = np.where(band_type == LOW_SHELF, g_base / sqrtA,
        np.where(band_type == HIGH_SHELF, g_base * sqrtA, g_base))
    k = np.where(band_type == PEAKING, 1.0 / (q * A), 1.0 / q)

    denom = 1.0 + g * (g + k)
    a1 = 1.0 / denom
    a2 = g * a1
    a3 = g * a2

    m0 = np.where(band_type == LOW_PASS, 0.0,
         np.where(band_type == HIGH_SHELF, A * A, 1.0))
    m1 = np.where(band_type == LOW_SHELF, k * (A - 1.0),
         np.where(band_type == PEAKING, (A - 1.0 / A) / q,
         np.where(band_type == HIGH_SHELF, k * (1.0 - A) * A,
         np.where(band_type == HIGH_PASS, -k, 0.0))))
    m2 = np.where(band_type == LOW_SHELF, A * A - 1.0,
         np.where(band_type == HIGH_SHELF, 1.0 - A * A,
         np.where(band_type == LOW_PASS, 1.0,
         np.where(band_type == HIGH_PASS, -1.0, 0.0))))

    # Division-by-zero / non-finite protection -> bypass coefficients
    bad = (~np.isfinite(g)) | (~np.isfinite(k)) | (np.abs(denom) < 1.0e-15)
    a1 = np.where(bad, 1.0, a1)
    a2 = np.where(bad, 0.0, a2)
    a3 = np.where(bad, 0.0, a3)
    m0 = np.where(bad, 1.0, m0)
    m1 = np.where(bad, 0.0, m1)
    m2 = np.where(bad, 0.0, m2)
    return a1, a2, a3, m0, m1, m2


IDENTITY_COEFFS = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def svf_transition(a1, a2, a3):
    """2x2 state-transition matrix of the TPT SVF recurrence.

    ic1' = (2 a1 - 1) ic1 - 2 a2 ic2 + 2 a2 u
    ic2' =  2 a2 ic1 + (1 - 2 a3) ic2 + 2 a3 u
    """
    a1 = jnp.asarray(a1)
    row0 = jnp.stack([2.0 * a1 - 1.0, -2.0 * jnp.asarray(a2)], axis=-1)
    row1 = jnp.stack([2.0 * jnp.asarray(a2), 1.0 - 2.0 * jnp.asarray(a3)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def svf_process(x, coeffs, state0=None, saturation=0.0, simd_tanh=True):
    """Apply one SVF band to x (time on last axis; leading dims batch).

    coeffs: tuple (a1, a2, a3, m0, m1, m2), each broadcastable to
    x.shape[:-1].  Returns (y, final_state).

    Reference parity: output = (1-sat)*y + sat*fastTanh(y) when sat > 0,
    non-finite or |.|>=1e15 outputs forced to 0, clamp to +-100
    (EQProcessor.Processing.cpp:156-180).  State sanitization (reset on
    non-finite) is not reproduced — it only triggers after divergence, which
    cannot happen for finite inputs with clamped parameters.

    simd_tanh selects the stereo SSE2 tanh form (clamp-then-evaluate) vs the
    scalar exact-+-1 form, mirroring processBandStereo vs processBand.
    """
    x = jnp.asarray(x)
    dt = x.dtype
    batch = x.shape[:-1]
    a1, a2, a3, m0, m1, m2 = [jnp.broadcast_to(jnp.asarray(c, dt), batch)
                              for c in coeffs]

    A = svf_transition(a1, a2, a3)
    bu = jnp.stack([2.0 * a2[..., None] * x, 2.0 * a3[..., None] * x], axis=-1)
    if state0 is None:
        state0 = jnp.zeros(batch + (2,), dt)
    pre, final = affine_scan_2x2(A, bu, state0)

    ic1 = pre[..., 0]
    ic2 = pre[..., 1]
    v3 = x - ic2
    v1 = a1[..., None] * ic1 + a2[..., None] * v3
    v2 = ic2 + a2[..., None] * ic1 + a3[..., None] * v3
    y = m0[..., None] * x + m1[..., None] * v1 + m2[..., None] * v2

    # saturation is static config (matches the reference: `if (saturation >
    # 0.0)` around a memoryless output blend — no state feedback).
    if float(saturation) > 0.0:
        if isinstance(simd_tanh, bool):
            tanh_y = fast_tanh_eq_v(y) if simd_tanh else fast_tanh_eq(y)
        else:
            # per-batch-element selection (stereo bands use the SSE2 clamp
            # form, mono-channel/M/S bands the scalar exact-+-1 form)
            mask = jnp.broadcast_to(jnp.asarray(simd_tanh), batch)[..., None]
            tanh_y = jnp.where(mask, fast_tanh_eq_v(y), fast_tanh_eq(y))
        y = y * (1.0 - float(saturation)) + tanh_y * float(saturation)

    y = jnp.where(jnp.isfinite(y) & (jnp.abs(y) < STATE_ABS_MAX), y, 0.0)
    y = jnp.clip(y, -OUTPUT_CLAMP, OUTPUT_CLAMP)
    return y, final
