"""2x/4x/8x polyphase Kaiser-halfband oversampling.

Rebuild of src/CustomInputOversampler.{h,cpp}:
- cascade of 2x halfband stages; per-stage taps/attenuation presets
  IIRLike {511,127,31}/{140,110,90 dB}, LinearPhase {1023,255,63}/
  {160,140,120 dB} (cpp:84-105).
- Kaiser-windowed half-rate sinc design (cpp:287-352): odd symmetric taps,
  zero-phase arm zeroed (true halfband), DC normalization, center coeff
  forced to 0.5 and the non-center arm rescaled to sum 0.5.
- interpolation (cpp:498-567): per input sample, even output phase
  (convParity=0) = 2 * sum_r conv[r] x[n-r]; odd phase (centerParity=1)
  = 0.5 * x[n - centerDelay].  NOTE: the reference does NOT double the
  center phase, so the up->down round trip has DC gain 0.75 (the center
  phase carries 0.5x where an ideal interpolator carries 1.0x).  We
  reproduce this exactly by default for output parity;
  `center_phase_gain="unity"` selects the mathematically flat variant.
- decimation (cpp:569-720): y[n] = 0.5 u[2n - M] + sum_r conv[r]
  u[2n - 2r]  (M = center tap index, odd for all preset tap counts).

TPU-native: each stage is two batched FIRs (one per output phase) via
XLA convolution — no per-sample loops, no history ring (state is carried
functionally for the streaming path via input framing upstream).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# Preset (src/CustomInputOversampler.h Preset enum: IIRLike, LinearPhase)
PRESET_IIR_LIKE = 0
PRESET_LINEAR_PHASE = 1

_TAPS = {PRESET_IIR_LIKE: (511, 127, 31), PRESET_LINEAR_PHASE: (1023, 255, 63)}
_ATTEN = {PRESET_IIR_LIKE: (140.0, 110.0, 90.0),
          PRESET_LINEAR_PHASE: (160.0, 140.0, 120.0)}


def bessel_i0(x):
    """Series I0 matching the reference's besselI0 (cpp:144-157)."""
    x = np.asarray(x, np.float64)
    s = np.ones_like(x)
    term = np.ones_like(x)
    xx = x * x
    for n in range(1, 100):
        term = term * xx / (4.0 * n * n)
        s = s + term
        if np.all(term < s * 1e-18):
            break
    return s


@dataclass
class HalfbandStage:
    taps: int
    center_tap: int          # M
    center_parity: int       # M & 1 (always 1 for the preset tap counts)
    conv_parity: int         # 1 - center_parity
    conv: np.ndarray         # non-zero arm coefficients conv[r] = h[convParity+2r]
    center_delay: int        # (M - center_parity) / 2, in input samples
    center_gain: float       # 0.5 (reference) or 1.0 (unity variant)


def design_halfband(taps: int, attenuation_db: float,
                    center_phase_gain: str = "reference") -> HalfbandStage:
    """prepareStage coefficient design (cpp:287-372), host NumPy."""
    taps = max(3, taps | 1)
    M = (taps - 1) // 2
    center_parity = M & 1
    conv_parity = 1 - center_parity

    a = attenuation_db
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    i0b = float(bessel_i0(beta))

    n = np.arange(taps)
    t = (n - M).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        sinc = np.where(t == 0.0, 0.5, np.sin(np.pi * 0.5 * t) / (np.pi * t))
    frac = t / M
    win = bessel_i0(beta * np.sqrt(np.maximum(0.0, 1.0 - frac * frac))) / i0b
    h = sinc * win
    h = np.where((n != M) & ((n & 1) == center_parity), 0.0, h)
    s = h.sum()
    if abs(s) > 1e-20:
        h = h / s
    h[M] = 0.5
    nc = h.sum() - h[M]
    if abs(nc) > 1e-20:
        h = np.where(n != M, h * (0.5 / nc), h)
    h[M] = 0.5

    conv_count = (taps - conv_parity + 1) // 2
    idx = conv_parity + 2 * np.arange(conv_count)
    conv = np.where(idx < taps, h[np.minimum(idx, taps - 1)], 0.0)
    center_gain = 0.5 if center_phase_gain == "reference" else 1.0
    return HalfbandStage(taps=taps, center_tap=M, center_parity=center_parity,
                         conv_parity=conv_parity, conv=conv,
                         center_delay=(M - center_parity) // 2,
                         center_gain=center_gain)


def make_stages(ratio: int, preset: int = PRESET_IIR_LIKE,
                center_phase_gain: str = "reference"):
    """prepare() stage ladder (cpp:416-452): 2->1 stage, 4->2, 8->3."""
    ratio = 8 if ratio >= 8 else 4 if ratio >= 4 else 2 if ratio >= 2 else 1
    num = {8: 3, 4: 2, 2: 1, 1: 0}[ratio]
    return [design_halfband(_TAPS[preset][i], _ATTEN[preset][i],
                            center_phase_gain) for i in range(num)]


def _causal_fir(x, coeffs):
    """y[n] = sum_r coeffs[r] * x[n-r], zero history, batched.

    TPU: XLA convolution.  CPU: explicit shift-accumulate — XLA CPU's
    Eigen conv kernel has an out-of-bounds read that segfaults inside
    large fused graphs (observed as tf_XLAEigen SIGSEGV), so the CPU
    backend never goes through it.
    """
    x = jnp.asarray(x)
    c = np.asarray(coeffs, np.float64)
    r = len(c)
    n = x.shape[-1]
    if jax.default_backend() == "cpu":
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r - 1, 0)])
        y = c[r - 1] * xp[..., :n]          # largest delay first
        for k in range(r - 2, -1, -1):
            y = y + c[k] * xp[..., r - 1 - k:r - 1 - k + n]
        return y
    if r > 8:
        # TPU: long time-domain FIRs through lax.conv lower very poorly
        # (measured 100x slowdowns at 256-tap kernels over megasample
        # signals), and FFT overlap-save runs on the VPU.  A causal FIR is
        # a banded lower-triangular Toeplitz: with chunk >= taps the band
        # spans at most two adjacent chunks, so y = X @ T0^T + Xprev @ T1^T
        # with two host-constant (chunk, chunk) matrices — two clean GEMMs
        # on the MXU (measured ~4x over the FFT path for the 256-arm
        # halfband at 3.8M samples).
        return _fir_matmul(x, c)
    cj = jnp.asarray(c, x.dtype)
    lhs = x.reshape((-1, 1, n))
    rhs = cj[::-1][None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(r - 1, 0)],
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(x.shape)


def _fir_matmul(x, c):
    """Causal FIR as blocked Toeplitz GEMMs (see _causal_fir TPU branch).

    T0[i, j] = c[i-j] (in-chunk part, lower-triangular band);
    T1[i, j] = c[i-j+chunk] (spill from the previous chunk).
    """
    c = np.asarray(c, np.float64)
    r = len(c)
    n = x.shape[-1]
    batch = x.shape[:-1]
    chunk = 1 << int(np.ceil(np.log2(max(r, 128))))
    nc = -(-n // chunk)
    npad = nc * chunk
    xp = x
    if npad != n:
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, npad - n)])
    nb = int(np.prod(batch)) if batch else 1
    xr = xp.reshape((nb, nc, chunk))
    xprev = jnp.concatenate([jnp.zeros((nb, 1, chunk), x.dtype),
                             xr[:, :-1, :]], axis=1)

    d = np.subtract.outer(np.arange(chunk), np.arange(chunk))
    T0 = np.where((d >= 0) & (d < r), c[np.clip(d, 0, r - 1)], 0.0)
    dp = d + chunk
    T1 = np.where(dp < r, c[np.clip(dp, 0, r - 1)], 0.0)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.matmul(xr.reshape((nb * nc, chunk)), jnp.asarray(T0.T, x.dtype),
                   precision=hi)
    y = y + jnp.matmul(xprev.reshape((nb * nc, chunk)),
                       jnp.asarray(T1.T, x.dtype), precision=hi)
    return y.reshape(batch + (npad,))[..., :n]


def _stage_full_response(stage: HalfbandStage, for_up: bool) -> np.ndarray:
    """Dense tap vector g of the stage as one polyphase-merged filter.

    Up:   y[m] = sum_j g[m - 2j] x[j], g[vp+2r] = 2 conv[r],
          g[M] = center_gain  (interpolateStage semantics).
    Down: y[n] = sum_k g[k] u[2n - k], g[vp+2r] = conv[r], g[M] = 0.5
          (decimateStage semantics).
    """
    g = np.zeros(stage.taps, np.float64)
    idx = stage.conv_parity + 2 * np.arange(len(stage.conv))
    keep = idx < stage.taps
    g[idx[keep]] = (2.0 if for_up else 1.0) * stage.conv[keep]
    g[stage.center_tap] = stage.center_gain if for_up else 0.5
    return g


def _resample2_matmul(x, g, up: bool):
    """Rate-2 polyphase FIR as blocked Toeplitz GEMMs (no strided slices —
    TPU executes ::2 gathers ~50x slower than a fused GEMM).

    up:   out chunk 2C from in chunk C;  T0[i, j] = g[i - 2j],
          T1[i, j] = g[i - 2j + 2C]  (spill from the previous chunk).
    down: out chunk C from in chunk 2C; T0[i, j] = g[2i - j],
          T1[i, j] = g[2i - j + 2C].
    Requires 2C >= len(g) so the band spans at most two chunks.
    """
    r = len(g)
    n = x.shape[-1]
    batch = x.shape[:-1]
    half = max(128, 1 << int(np.ceil(np.log2(max((r + 1) // 2, 1)))))
    cin = half if up else 2 * half
    cout = 2 * half if up else half
    nc = -(-n // cin)
    xp = x
    if nc * cin != n:
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nc * cin - n)])
    nb = int(np.prod(batch)) if batch else 1
    xr = xp.reshape((nb, nc, cin))
    xprev = jnp.concatenate([jnp.zeros((nb, 1, cin), x.dtype),
                             xr[:, :-1, :]], axis=1)

    i = np.arange(cout)[:, None]
    j = np.arange(cin)[None, :]
    d = (i - 2 * j) if up else (2 * i - j)
    T0 = np.where((d >= 0) & (d < r), g[np.clip(d, 0, r - 1)], 0.0)
    dp = d + 2 * half
    T1 = np.where((dp >= 0) & (dp < r), g[np.clip(dp, 0, r - 1)], 0.0)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.matmul(xr.reshape((nb * nc, cin)), jnp.asarray(T0.T, x.dtype),
                   precision=hi)
    y = y + jnp.matmul(xprev.reshape((nb * nc, cin)),
                       jnp.asarray(T1.T, x.dtype), precision=hi)
    n_out = 2 * n if up else n // 2
    return y.reshape(batch + (nc * cout,))[..., :n_out]


def upsample2(x, stage: HalfbandStage):
    """One 2x interpolation stage (interpolateStage semantics)."""
    x = jnp.asarray(x)
    if jax.default_backend() != "cpu":
        return _resample2_matmul(x, _stage_full_response(stage, True), True)
    conv_phase = 2.0 * _causal_fir(x, stage.conv)
    d = stage.center_delay
    center_phase = stage.center_gain * jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(d, 0)])[..., :x.shape[-1]]
    phases = [None, None]
    phases[stage.conv_parity] = conv_phase
    phases[stage.center_parity] = center_phase
    y = jnp.stack(phases, axis=-1)                 # (..., N, 2)
    return y.reshape(x.shape[:-1] + (2 * x.shape[-1],))


def downsample2(u, stage: HalfbandStage):
    """One 2x decimation stage (decimateStage semantics):
    y[n] = 0.5 u[2n - M] + sum_r conv[r] u[2n - convParity - 2r]."""
    u = jnp.asarray(u)
    if jax.default_backend() != "cpu":
        return _resample2_matmul(u, _stage_full_response(stage, False), False)
    n_out = u.shape[-1] // 2
    # center path
    M = stage.center_tap
    uc = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(M, 0)])[..., :u.shape[-1]]
    center = 0.5 * uc[..., ::2][..., :n_out]
    # conv path: operates on phase (0 - convParity) of u: u[2n - vp - 2r]
    vp = stage.conv_parity
    up = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(vp, 0)])[..., :u.shape[-1]]
    phase = up[..., ::2][..., :n_out]               # = u[2n - vp]
    conv = _causal_fir(phase, stage.conv)
    return center + conv


def oversample_up(x, stages):
    """processUp: cascade of 2x stages (cpp:771-800)."""
    for st in stages:
        x = upsample2(x, st)
    return x


def oversample_down(u, stages):
    """processDown: reverse cascade of 2x decimators (cpp:831-860)."""
    for st in reversed(stages):
        u = downsample2(u, st)
    return u


def oversampler_latency(stages, factor=None):
    """FIR group delay per stage at base rate: sum((taps-1)/2 / 2^i) is the
    engine's model (AudioEngine.Processing.Latency.cpp:22-23,80-124);
    returns the per-stage (taps-1)//2 list for the latency model."""
    return [st.center_tap for st in stages]
