"""NumPy golden models — straight per-sample reimplementations of the
reference formulas (SURVEY.md §2.1), used to validate the scan-based JAX
kernels.  Deliberately scalar/loopy: these mirror the C++ semantics
(src/eqprocessor/EQProcessor.Processing.cpp etc.) as directly as possible.
"""
from __future__ import annotations

import numpy as np


def fast_tanh_scalar(x: float) -> float:
    if x >= 4.5:
        return 1.0
    if x <= -4.5:
        return -1.0
    x2 = x * x
    return x * (27.0 + x2) / (27.0 + 9.0 * x2)


def fast_tanh_simd(x: float) -> float:
    x = min(max(x, -4.5), 4.5)
    x2 = x * x
    return x * (27.0 + x2) / (27.0 + 9.0 * x2)


def fast_tanh_softclip(x: float) -> float:
    x = min(max(x, -4.5), 4.5)
    x2 = x * x
    num = x * (10395.0 + x2 * (1260.0 + x2 * 21.0))
    den = 10395.0 + x2 * (4725.0 + x2 * (210.0 + x2))
    return num / den


def svf_coeffs_golden(band_type: int, freq: float, gain_db: float, q: float,
                      sr: float):
    """calcSVFCoeffs — per-sample C++ formulas, types 0..4.

    The reference clamps in FLOAT32 (its parameter API is float); the
    vectors dumped from its own code pin this (tests/test_ref_vectors)."""
    f32 = np.float32
    nyq = f32(sr * 0.5)
    freq = float(min(max(f32(freq), f32(20.0)),
                     min(f32(20000.0), f32(nyq * f32(0.95)))))
    q = float(min(max(f32(q), f32(0.01)), f32(20.0)))
    gain_db = float(min(max(f32(gain_db), f32(-48.0)), f32(48.0)))

    A = 10.0 ** (gain_db / 40.0)
    if band_type == 0:      # LowShelf
        g = np.tan(np.pi * freq / sr) / np.sqrt(A)
        k = 1.0 / q
        m0, m1, m2 = 1.0, k * (A - 1.0), A * A - 1.0
    elif band_type == 1:    # Peaking
        g = np.tan(np.pi * freq / sr)
        k = 1.0 / (q * A)
        m0, m1, m2 = 1.0, (A - 1.0 / A) / q, 0.0
    elif band_type == 2:    # HighShelf
        g = np.tan(np.pi * freq / sr) * np.sqrt(A)
        k = 1.0 / q
        m0, m1, m2 = A * A, k * (1.0 - A) * A, 1.0 - A * A
    elif band_type == 3:    # LowPass
        g = np.tan(np.pi * freq / sr)
        k = 1.0 / q
        m0, m1, m2 = 0.0, 0.0, 1.0
    elif band_type == 4:    # HighPass
        g = np.tan(np.pi * freq / sr)
        k = 1.0 / q
        m0, m1, m2 = 1.0, -k, -1.0
    else:
        raise ValueError(band_type)

    denom = 1.0 + g * (g + k)
    if not np.isfinite(g) or not np.isfinite(k) or abs(denom) < 1e-15:
        return (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    a1 = 1.0 / denom
    a2 = g * a1
    a3 = g * a2
    return (a1, a2, a3, m0, m1, m2)


def process_band_golden(data, coeffs, state, saturation, simd=False):
    """processBand / processBandStereo per-sample loop (Processing.cpp:128-275).

    Mutates nothing; returns (out, final_state).
    """
    a1, a2, a3, m0, m1, m2 = coeffs
    ic1, ic2 = state
    out = np.empty_like(data)
    tanh = fast_tanh_simd if simd else fast_tanh_scalar
    for n, v0 in enumerate(data):
        v3 = v0 - ic2
        v1 = a1 * ic1 + a2 * v3
        v2 = ic2 + a2 * ic1 + a3 * v3
        ic1 = 2.0 * v1 - ic1
        ic2 = 2.0 * v2 - ic2
        y = m0 * v0 + m1 * v1 + m2 * v2
        if saturation > 0.0:
            y = y * (1.0 - saturation) + tanh(y) * saturation
        if not (np.isfinite(y) and abs(y) < 1.0e15):
            y = 0.0
        out[n] = min(max(y, -100.0), 100.0)
        if not (np.isfinite(ic1) and abs(ic1) < 1.0e15):
            ic1 = 0.0
        if not (np.isfinite(ic2) and abs(ic2) < 1.0e15):
            ic2 = 0.0
    return out, (ic1, ic2)


def eq_serial_golden(L, R, bands, sr, saturation=0.0):
    """Serial 20-band EQ (Processing.cpp processSerial).

    bands: list of dicts {type, freq, gain_db, q, mode, enabled}.
    mode: 0=Stereo 1=Left 2=Right 3=Mid 4=Side.
    Zero initial state.  Returns (L, R).
    """
    L = L.copy()
    R = R.copy()
    states = [[np.zeros(2) for _ in range(4)] for _ in bands]
    for bi, b in enumerate(bands):
        if not b.get("enabled", True):
            continue
        if b["type"] not in (3, 4) and abs(np.float32(b["gain_db"])) < np.float32(0.01):
            continue
        c = svf_coeffs_golden(b["type"], b["freq"], b["gain_db"], b["q"], sr)
        mode = b.get("mode", 0)
        if mode == 0:    # Stereo — SSE2 packed kernel (clamped tanh form)
            L, states[bi][0] = process_band_golden(L, c, states[bi][0], saturation, simd=True)
            R, states[bi][1] = process_band_golden(R, c, states[bi][1], saturation, simd=True)
        elif mode == 1:  # Left
            L, states[bi][0] = process_band_golden(L, c, states[bi][0], saturation)
        elif mode == 2:  # Right
            R, states[bi][1] = process_band_golden(R, c, states[bi][1], saturation)
        elif mode == 3:  # Mid
            m = (L + R) * 0.5
            s = (L - R) * 0.5
            m, states[bi][2] = process_band_golden(m, c, states[bi][2], saturation)
            L, R = m + s, m - s
        elif mode == 4:  # Side
            m = (L + R) * 0.5
            s = (L - R) * 0.5
            s, states[bi][3] = process_band_golden(s, c, states[bi][3], saturation)
            L, R = m + s, m - s
    return L, R


def eq_parallel_golden(L, R, bands, sr, saturation=0.0):
    """Parallel structure (Processing.cpp processParallel)."""
    srcL, srcR = L.copy(), R.copy()
    accL = np.zeros_like(L)
    accR = np.zeros_like(R)
    for b in bands:
        if not b.get("enabled", True):
            continue
        if b["type"] not in (3, 4) and abs(np.float32(b["gain_db"])) < np.float32(0.01):
            continue
        c = svf_coeffs_golden(b["type"], b["freq"], b["gain_db"], b["q"], sr)
        mode = b.get("mode", 0)
        st = np.zeros(2)
        if mode == 0:
            wL, _ = process_band_golden(srcL, c, np.zeros(2), saturation, simd=True)
            wR, _ = process_band_golden(srcR, c, np.zeros(2), saturation, simd=True)
            accL += wL - srcL
            accR += wR - srcR
        elif mode == 1:
            wL, _ = process_band_golden(srcL, c, st, saturation)
            accL += wL - srcL
        elif mode == 2:
            wR, _ = process_band_golden(srcR, c, st, saturation)
            accR += wR - srcR
        elif mode in (3, 4):
            m = (srcL + srcR) * 0.5
            s = (srcL - srcR) * 0.5
            if mode == 3:
                m, _ = process_band_golden(m, c, st, saturation)
            else:
                s, _ = process_band_golden(s, c, st, saturation)
            wL, wR = m + s, m - s
            accL += wL - srcL
            accR += wR - srcR
    return srcL + accL, srcR + accR


def agc_golden(pre, post, sr, block_size):
    """processAGC over consecutive blocks.  pre/post: (2, N)."""
    n = pre.shape[1]
    nb = n // block_size
    aA = 1.0 - np.exp(-block_size / (sr * 0.2))
    aR = 1.0 - np.exp(-block_size / (sr * 2.0))
    aS = 1.0 - np.exp(-block_size / (sr * 0.2))
    env_in = env_out = 0.0
    gain = 1.0
    out = post.copy()
    for b in range(nb):
        sl = slice(b * block_size, (b + 1) * block_size)
        rin = max(np.sqrt(np.mean(pre[0, sl] ** 2)), np.sqrt(np.mean(pre[1, sl] ** 2)))
        rout = max(np.sqrt(np.mean(post[0, sl] ** 2)), np.sqrt(np.mean(post[1, sl] ** 2)))
        rin = min(rin, 1000.0)
        rout = min(rout, 1000.0)
        ain = aA if rin > env_in else aR
        aout = aA if rout > env_out else aR
        env_in = env_in * (1 - ain) + rin * ain
        env_out = env_out * (1 - aout) + rout * aout
        if env_in < 1e-20:
            env_in = 0.0
        if env_out < 1e-20:
            env_out = 0.0
        if env_out < 1e-6:
            target = 1.0
        else:
            ratio = env_in / env_out
            if 1.0 / 1.059 < ratio < 1.059:
                target = 1.0
            else:
                target = min(max(ratio, 0.06), 16.0)
        next_gain = gain * (1 - aS) + target * aS
        inc = (next_gain - gain) / block_size
        ramp = gain + inc * np.arange(block_size)
        out[:, sl] = post[:, sl] * ramp
        gain = next_gain
    return out
