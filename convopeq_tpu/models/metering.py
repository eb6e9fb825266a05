"""Metering: BS.1770 loudness, true peak, and the spectrum analyzer.

- LoudnessMeter (src/LoudnessMeter.{h,cpp}): ITU-R BS.1770-4/5 K-weighting
  recomputed per sample rate from the analog prototypes — stage 1 is an RBJ
  high-shelf (f0=1500 Hz, Q=1/sqrt2, +4 dB), stage 2 the RLB HPF (38 Hz,
  Q=0.5) (LoudnessMeter.cpp:142-217); block mean-square power feeds the
  Momentary (400 ms) / Short-term (3 s) / Integrated (gated) aggregation
  that the reference runs on a worker thread.  Channel weights 1.0/1.0
  stereo (LoudnessMeter.h:15).
- TruePeakDetector (src/TruePeakDetector.{h,cpp}): 4x oversampling as two
  cascaded 2x halfband stages, 63-tap linear-phase Kaiser FIR at 100 dB
  attenuation (the same stage design as CustomInputOversampler), peak of
  |upsampled|.
- SpectrumAnalyzer (src/SpectrumAnalyzerComponent.h:66-95): 4096-point
  Hann-windowed FFT frames with hop 1024 (OVERLAP_SAMPLES = N/4),
  magnitude scale 2/N, EMA smoothing across frames, 1 s peak hold.

All pure batched transforms: the K-weighting biquads are associative
scans; the STFT is one batched rfft over frames.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.scan_iir import biquad_df2t_scan, one_pole_scan
from ..ops.oversample import design_halfband

LUFS_OFFSET = -0.691             # BS.1770-4 eq. 2
ABSOLUTE_GATE_LUFS = -70.0
RELATIVE_GATE_LU = -10.0
MOMENTARY_SEC = 0.4
SHORT_TERM_SEC = 3.0


def k_weighting_coeffs(sample_rate: float):
    """Exact transcription of updateCoefficients (LoudnessMeter.cpp:154-217).

    Returns (pre, rlb), each (b0, b1, b2, a1, a2) normalized to a0=1.
    """
    fs = sample_rate
    # Stage 2: RLB HPF 38 Hz Q=0.5
    w0 = 2.0 * np.pi * 38.0 / fs
    cw, sw = np.cos(w0), np.sin(w0)
    alpha = sw / (2.0 * 0.50)
    a0 = 1.0 + alpha
    rlb = ((1.0 + cw) / 2.0 / a0, -(1.0 + cw) / a0, (1.0 + cw) / 2.0 / a0,
           -2.0 * cw / a0, (1.0 - alpha) / a0)

    # Stage 1: high-shelf 1500 Hz, Q=1/sqrt2, +4 dB
    w0 = 2.0 * np.pi * 1500.0 / fs
    cw, sw = np.cos(w0), np.sin(w0)
    A = 10.0 ** (4.0 / 40.0)
    alpha = sw / (2.0 * 0.7071067811865476)
    sqrtA = np.sqrt(A)
    b0 = A * ((A + 1.0) + (A - 1.0) * cw + 2.0 * sqrtA * alpha)
    b1 = -2.0 * A * ((A - 1.0) + (A + 1.0) * cw)
    b2 = A * ((A + 1.0) + (A - 1.0) * cw - 2.0 * sqrtA * alpha)
    a0 = (A + 1.0) - (A - 1.0) * cw + 2.0 * sqrtA * alpha
    a1 = 2.0 * ((A - 1.0) - (A + 1.0) * cw)
    a2 = (A + 1.0) - (A - 1.0) * cw - 2.0 * sqrtA * alpha
    pre = (b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)
    return pre, rlb


def k_weight(x, sample_rate: float):
    """Apply the 2-stage K-weighting filter along the last axis."""
    pre, rlb = k_weighting_coeffs(sample_rate)
    y, _ = biquad_df2t_scan(x, *pre)
    y, _ = biquad_df2t_scan(y, *rlb)
    return y


def block_power(x, block_size: int):
    """Mean-square power per non-overlapping block; channels weighted 1.0.

    x: (..., C, N) -> (..., nb): sum over channels of per-block mean square.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    nb = n // block_size
    b = x[..., :nb * block_size].reshape(x.shape[:-1] + (nb, block_size))
    return jnp.sum(jnp.mean(b * b, axis=-1), axis=-2)


def _windowed_power(z, sample_rate, window_sec, hop_sec=0.1):
    """Mean-square over sliding windows (hop 100 ms per BS.1770)."""
    win = int(round(window_sec * sample_rate))
    hop = int(round(hop_sec * sample_rate))
    n = z.shape[-1]
    if n < win:
        # shorter-than-window signals: single gate block over what exists
        win = n
        hop = max(1, n)
    nwin = (n - win) // hop + 1
    idx = jnp.arange(nwin) * hop
    e2 = jnp.sum(z * z, axis=-2) if z.ndim >= 2 else z * z  # channel sum
    csum = jnp.concatenate(
        [jnp.zeros(e2.shape[:-1] + (1,), e2.dtype), jnp.cumsum(e2, axis=-1)],
        axis=-1)
    return (csum[..., idx + win] - csum[..., idx]) / win


def lufs_from_power(p):
    return LUFS_OFFSET + 10.0 * jnp.log10(jnp.maximum(p, 1e-30))


def loudness_momentary(x, sample_rate: float):
    """Momentary loudness (400 ms windows, 100 ms hop).  x: (..., C, N)."""
    z = k_weight(x, sample_rate)
    return lufs_from_power(_windowed_power(z, sample_rate, MOMENTARY_SEC))


def loudness_short_term(x, sample_rate: float):
    z = k_weight(x, sample_rate)
    return lufs_from_power(_windowed_power(z, sample_rate, SHORT_TERM_SEC))


def loudness_integrated(x, sample_rate: float):
    """Gated integrated loudness (BS.1770-4 section 2, two-stage gating)."""
    z = k_weight(x, sample_rate)
    p = _windowed_power(z, sample_rate, MOMENTARY_SEC)
    l = lufs_from_power(p)
    abs_mask = l > ABSOLUTE_GATE_LUFS
    p_abs = jnp.where(abs_mask, p, 0.0)
    n_abs = jnp.maximum(jnp.sum(abs_mask, axis=-1), 1)
    mean_abs = jnp.sum(p_abs, axis=-1) / n_abs
    rel_gate = lufs_from_power(mean_abs) + RELATIVE_GATE_LU
    mask = abs_mask & (l > rel_gate[..., None])
    n_ok = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    mean_p = jnp.sum(jnp.where(mask, p, 0.0), axis=-1) / n_ok
    return jnp.where(jnp.sum(mask, axis=-1) > 0,
                     lufs_from_power(mean_p), -jnp.inf)


def _delay(x, k):
    if k == 0:
        return x
    if k < 0:
        return _advance(x, -k)
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k, 0)])[..., :x.shape[-1]]


def _advance(x, k):
    if k == 0:
        return x
    if k < 0:
        return _delay(x, -k)
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, k)])[..., k:]


def _tp_interpolate2x(x, stage):
    """TruePeakDetector::interpolateStage (TruePeakDetector.cpp:284-311) —
    unlike the input oversampler, BOTH phases combine the 0.5 center tap
    with the half-band arm (DC gain 1, no x2):
      even[n] = 0.5 x[n-d]   + sum_s conv[s] x[n-d-vp+cc-1-s]
      odd[n]  = 0.5 x[n-d+1] + sum_s conv[s] x[n-d-1+vp+cc-1-s]
    """
    from ..ops.oversample import _causal_fir
    cc = len(stage.conv)
    d = stage.center_delay
    vp = stage.conv_parity
    n = x.shape[-1]
    # look-ahead: the arm reads up to cc-1-d samples past the current input
    # (the reference reads them from its zero-initialized history tail)
    la = cc
    xe = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, la)])
    g = _causal_fir(xe, stage.conv)      # g[n] = sum_s conv[s] x[n-s]
    ge = lambda k: g[..., k:k + n] if k >= 0 else _delay(g[..., :n], -k)
    even = 0.5 * _delay(x, d) + ge(cc - 1 - d - vp)
    odd = 0.5 * _delay(x, d - 1) + ge(cc - 2 - d + vp)
    y = jnp.stack([even, odd], axis=-1)
    return y.reshape(x.shape[:-1] + (2 * n,))


def true_peak(x, taps: int = 63, attenuation_db: float = 100.0):
    """BS.1770 true-peak: 4x oversampling as two 2x halfband stages —
    stage 0 uses `taps` (63), stage 1 max(15, taps//2) = 31
    (TruePeakDetector.cpp prepare:24-28) — then max |.| over the 4x signal.

    x: (..., N) -> (...) linear true peak.  (Block-boundary look-ahead in
    the reference is handled by its history buffer; offline we zero-pad,
    so the last ~taps samples see edge roll-off.)
    """
    x = jnp.asarray(x)
    st0 = design_halfband(taps, attenuation_db)
    st1 = design_halfband(max(15, taps // 2), attenuation_db)
    u = _tp_interpolate2x(_tp_interpolate2x(x, st0), st1)
    return jnp.max(jnp.abs(u), axis=-1)


# Spectrum analyzer constants (SpectrumAnalyzerComponent.h:66-95)
ANALYZER_FFT = 4096
ANALYZER_HOP = ANALYZER_FFT // 4
ANALYZER_MAG_SCALE = 2.0 / ANALYZER_FFT


def spectrum_frames(x, fft_size: int = ANALYZER_FFT, hop: int = ANALYZER_HOP):
    """Hann-windowed magnitude STFT frames (scale 2/N).  x: (..., N) ->
    (..., nframes, fft_size//2+1)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n < fft_size:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, fft_size - n)])
        n = fft_size
    nf = (n - fft_size) // hop + 1
    if fft_size % hop == 0:
        # TPU-native framing: when hop | fft_size the frame matrix is a
        # concat of `ratio` shifted CONTIGUOUS row-slices of the
        # (m, hop)-reshaped signal — a gather here costs ~3x the whole
        # 1M-tap NUC on TPU (measured in bench config4)
        ratio = fft_size // hop
        m = n // hop
        r = x[..., :m * hop].reshape(x.shape[:-1] + (m, hop))
        frames = jnp.concatenate([r[..., j:j + nf, :]
                                  for j in range(ratio)], axis=-1)
    else:
        idx = (jnp.arange(nf)[:, None] * hop
               + jnp.arange(fft_size)[None, :])
        frames = x[..., idx]                           # (..., nf, fft)
    # juce::dsp::WindowingFunction hann (symmetric)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(fft_size)
                            / (fft_size - 1))
    spec = jnp.fft.rfft(frames * w.astype(x.dtype), axis=-1)
    return jnp.abs(spec) * ANALYZER_MAG_SCALE


def spectrum_peak_hold(x, sample_rate: float, hold_sec: float = 1.0,
                       fft_size: int = ANALYZER_FFT, hop: int = ANALYZER_HOP):
    """Per-bin peak with hold (SpectrumAnalyzerComponent.h:88,123
    PEAK_HOLD_SEC = 1.0): each frame shows the max magnitude over the
    trailing `hold_sec` of frames — a sliding-window max over the frame
    axis."""
    mags = spectrum_frames(x, fft_size, hop)
    frames_per_hold = max(1, int(round(hold_sec * sample_rate / hop)))
    stacked = [mags]
    for k in range(1, frames_per_hold):
        shifted = jnp.pad(mags, [(0, 0)] * (mags.ndim - 2)
                          + [(k, 0), (0, 0)])[..., :mags.shape[-2], :]
        stacked.append(shifted)
    return jnp.max(jnp.stack(stacked), axis=0)


def spectrum_smoothed(x, ema_alpha: float = 0.15, **kw):
    """EMA-smoothed analyzer frames: s[f] = s[f-1]*(1-a) + mag[f]*a
    (one-pole scan over the frame axis)."""
    mags = spectrum_frames(x, **kw)
    m = jnp.moveaxis(mags, -2, -1)                    # (..., bins, nf)
    pre, fin = one_pole_scan(m, 1.0 - ema_alpha, ema_alpha, 0.0)
    post = jnp.concatenate([pre[..., 1:], fin[..., None]], axis=-1)
    return jnp.moveaxis(post, -1, -2)
