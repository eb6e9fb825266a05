"""High-quality IR resampling — the r8brain-equivalent stage.

Spec parity with the reference's usage (src/IRDSP.h:7-13, src/IRDSP.cpp):
transition band 2.0 (percent of input bandwidth), 140 dB stop-band
attenuation, linear phase.  The implementation is an independent
Kaiser-windowed-sinc rational polyphase resampler meeting the same spec
(not a port of r8brain): for conversion L/M the prototype low-pass cuts at
min(in, out)/2 with a transition band of `trans_band`% of the input
bandwidth, Kaiser beta and length from the standard attenuation formulas.
"""
from __future__ import annotations

from math import gcd

import numpy as np

from ..ops.oversample import bessel_i0


def _kaiser_beta(atten_db: float) -> float:
    if atten_db > 50.0:
        return 0.1102 * (atten_db - 8.7)
    if atten_db >= 21.0:
        return 0.5842 * (atten_db - 21.0) ** 0.4 + 0.07886 * (atten_db - 21.0)
    return 0.0


def design_resample_filter(L: int, M: int, trans_band_pct: float = 2.0,
                           atten_db: float = 140.0) -> np.ndarray:
    """Prototype FIR at the upsampled rate L*fs_in, DC gain L."""
    # cutoff at the narrower Nyquist, in units of the upsampled rate
    fc = 0.5 * min(1.0, L / M) / L           # cycles/sample at rate L*fs_in
    # transition width: trans_band% of the input bandwidth (fs_in/2)
    tw = (trans_band_pct / 100.0) * 0.5 / L
    fc_center = fc - tw / 2.0                # place stopband edge at fc
    beta = _kaiser_beta(atten_db)
    ntaps = int(np.ceil((atten_db - 7.95) / (2.285 * 2.0 * np.pi * tw)))
    ntaps |= 1                                # odd, linear phase
    mth = (ntaps - 1) / 2.0
    nn = np.arange(ntaps) - mth
    h = 2.0 * fc_center * np.sinc(2.0 * fc_center * nn)
    frac = nn / mth
    win = bessel_i0(beta * np.sqrt(np.maximum(0.0, 1.0 - frac * frac))) \
        / bessel_i0(beta)
    h = h * win
    # normalize DC gain to L (compensates zero-stuffing)
    return h * (L / h.sum())


def resample_ir(ir: np.ndarray, input_sr: float, target_sr: float,
                trans_band_pct: float = 2.0, atten_db: float = 140.0,
                max_denominator: int = 1000) -> np.ndarray:
    """resampleIR equivalent (src/IRDSP.cpp:1-142).  ir: (..., N).

    Output length = ceil(N * target/input) (r8brain produces the full
    resampled stream; the loader trims afterwards).
    """
    ir = np.asarray(ir, np.float64)
    if input_sr == target_sr:
        return ir.copy()
    from fractions import Fraction
    frac = Fraction(target_sr / input_sr).limit_denominator(max_denominator)
    L, M = frac.numerator, frac.denominator
    g = gcd(L, M)
    L //= g
    M //= g

    h = design_resample_filter(L, M, trans_band_pct, atten_db)
    n = ir.shape[-1]
    out_len = int(np.ceil(n * target_sr / input_sr))
    delay = (len(h) - 1) // 2                 # linear-phase group delay

    flat = ir.reshape(-1, n)
    outs = np.empty((flat.shape[0], out_len))
    for i, x in enumerate(flat):
        up = np.zeros(n * L)
        up[::L] = x
        y = np.convolve(up, h)
        y = y[delay:delay + n * L]            # zero-phase alignment
        outs[i] = np.pad(y[::M], (0, max(0, out_len - len(y[::M]))))[:out_len]
    return outs.reshape(ir.shape[:-1] + (out_len,))
