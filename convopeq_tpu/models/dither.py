"""Dither / noise-shaping engines — rebuild of the four reference shapers.

- PsychoacousticDither (src/PsychoacousticDither.h): 12th-order
  error-feedback shaper, kCoeffTable[6 SR bands][3 bit depths][12], TPDF
  dither added BEFORE quantization together with the shaped error:
    tmp = x*headroom + tpdf*scale + sum_i c_i z_i ; q = round(tmp/scale)*scale
    z = shift(z, error = tmp - q)
- FixedNoiseShaper (src/FixedNoiseShaper.h): 4th-order, 10 SR presets with
  linear interpolation;  y = x*headroom - sum c_i e_i; q = quantize(y)
  where quantize clamps to [-1, 1-scale], adds TPDF, rounds; error
  e0 = clamp(q - y, +-2*scale).
- Fixed15TapNoiseShaper (src/Fixed15TapNoiseShaper.h): same structure,
  ORDER=16 (default table has 15 non-zero coefficients).
- LatticeNoiseShaper (src/LatticeNoiseShaper.h): 9th-order lattice-ladder;
  feedback = sum c_i s_i; tmp = x*headroom + feedback; q = quantize(tmp)
  (with the additional +-fullscale integer clamp); err = clamp(q-tmp,
  +-2*scale); lattice state advance with per-stage clamp +-2.0; consumes
  learned reflection coefficients (clamped to |k| <= 0.85).

The error-feedback loop is nonlinear through the quantizer, so it cannot
be an associative scan: each shaper is a `lax.scan` over samples, batched
across streams/channels (throughput comes from the batch dim).

RNG: the dither draws do not depend on the audio, so they are precomputed
as an input array.  Two sources:
- `xoshiro_uniforms` — exact NumPy transcription of the reference's
  Xoshiro256++ fallback (bit-parity testing);
- `jax.random.uniform` — fast on-device generation for production.
(The reference's primary RNG is an MKL VSL SFMT19937 ring; SFMT is not
reimplemented — dither output is compared statistically, SURVEY.md §7.6.)

Rounding: round-half-to-even, matching SSE4.1 _MM_FROUND_TO_NEAREST_INT.

Parity note: error-feedback quantizers are chaotic at the ULP level —
FP contraction (FMA) differences between compilers flip occasional
half-LSB rounding decisions and the noise trajectory diverges (this is
equally true between two builds of the reference itself under fp:fast).
The testable contract is: identical quantization grid, divergence bounded
by the shaper's feedback gain, determinism, and spectral equivalence.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dsputil import K_OUTPUT_HEADROOM

# Noise shaper types (AudioEngine NoiseShaperType)
PSYCHOACOUSTIC, FIXED4, FIXED15, ADAPTIVE9 = 0, 1, 2, 3

NS_ORDER_PSYCHO = 12
NS_ORDER_FIXED4 = 4
NS_ORDER_FIXED15 = 16
NS_ORDER_LATTICE = 9

# kCoeffTable (src/PsychoacousticDither.h:192-250): [SR band][bit preset][12]
PSYCHO_COEFF_TABLE = np.array([
    [[2.93, -5.06, 6.97, -7.66, 7.11, -5.63, 3.96, -2.18, 0.80, -0.24, 0.10, -0.04],
     [2.49, -4.30, 5.92, -6.51, 6.05, -4.79, 3.37, -1.86, 0.68, -0.20, 0.08, -0.03],
     [2.04, -3.52, 4.85, -5.34, 4.95, -3.92, 2.76, -1.52, 0.56, -0.17, 0.07, -0.03]],
    [[2.85, -4.92, 6.78, -7.45, 6.92, -5.48, 3.85, -2.12, 0.78, -0.23, 0.09, -0.04],
     [2.42, -4.18, 5.75, -6.32, 5.87, -4.65, 3.27, -1.80, 0.66, -0.20, 0.08, -0.03],
     [1.98, -3.42, 4.71, -5.18, 4.81, -3.81, 2.68, -1.47, 0.54, -0.16, 0.06, -0.03]],
    [[3.28, -5.66, 7.80, -8.57, 7.96, -6.30, 4.43, -2.44, 0.90, -0.27, 0.11, -0.05],
     [2.78, -4.80, 6.61, -7.26, 6.75, -5.34, 3.75, -2.07, 0.76, -0.23, 0.09, -0.04],
     [2.28, -3.94, 5.42, -5.95, 5.53, -4.38, 3.08, -1.69, 0.62, -0.19, 0.07, -0.03]],
    [[3.71, -6.40, 8.82, -9.69, 9.00, -7.12, 5.01, -2.76, 1.02, -0.31, 0.12, -0.05],
     [3.15, -5.44, 7.50, -8.24, 7.65, -6.05, 4.25, -2.34, 0.86, -0.26, 0.10, -0.04],
     [2.58, -4.46, 6.15, -6.75, 6.27, -4.96, 3.48, -1.92, 0.70, -0.21, 0.08, -0.03]],
    [[4.12, -7.10, 9.78, -10.75, 9.98, -7.89, 5.55, -3.06, 1.13, -0.34, 0.14, -0.06],
     [3.49, -6.03, 8.31, -9.13, 8.47, -6.70, 4.71, -2.59, 0.95, -0.29, 0.11, -0.05],
     [2.86, -4.94, 6.81, -7.48, 6.94, -5.49, 3.86, -2.12, 0.78, -0.23, 0.09, -0.04]],
    [[4.48, -7.73, 10.64, -11.70, 10.86, -8.59, 6.04, -3.33, 1.23, -0.37, 0.15, -0.06],
     [3.80, -6.56, 9.04, -9.93, 9.22, -7.29, 5.13, -2.82, 1.04, -0.31, 0.12, -0.05],
     [3.11, -5.37, 7.41, -8.13, 7.55, -5.97, 4.20, -2.31, 0.85, -0.26, 0.10, -0.04]],
])

# FixedNoiseShaper presets (src/FixedNoiseShaper.h:298-314)
FIXED4_PRESET_RATES = np.array([44100.0, 48000.0, 88200.0, 96000.0, 176400.0,
                                192000.0, 352800.0, 384000.0, 705600.0, 768000.0])
FIXED4_PRESETS = np.array([
    [0.394958, 0.319775, 0.145569, 0.139697],
    [0.460000, 0.280000, 0.170000, 0.090000],
    [0.727810, 0.189547, 0.125028, -0.042385],
    [0.742333, 0.185474, 0.106133, -0.033940],
    [0.775904, 0.126967, 0.043467, 0.053661],
    [0.774132, 0.117440, 0.047291, 0.061137],
    [0.724647, 0.094403, 0.113208, 0.067743],
    [0.714605, 0.097798, 0.124553, 0.063045],
    [0.635851, 0.161114, 0.194506, 0.008529],
    [0.624827, 0.174509, 0.201424, -0.000760],
])

# Fixed15TapNoiseShaper default (src/Fixed15TapNoiseShaper.h:466; ORDER=16,
# the 16th coefficient is zero)
FIXED15_DEFAULT = np.array([2.172009, -2.313034, 2.092949, -1.698718,
                            1.304487, -0.946581, 0.645299, -0.415598,
                            0.251068, -0.141026, 0.072650, -0.033120,
                            0.012821, -0.004274, 0.001068, 0.0])

# Fixed15TapNoiseShaper COEFF_PRESETS (src/Fixed15TapNoiseShaper.h:352-374):
# prepare() interpolates these by sample rate over FIXED4_PRESET_RATES
# (same grid); the 48 kHz row equals FIXED15_DEFAULT.
FIXED15_PRESETS = np.array([
    [2.157553, -2.356649, 2.179194, -1.802605, 1.429476, -1.073975,
     0.775233, -0.535496, 0.360294, -0.229526, 0.143225, -0.081483,
     0.045992, -0.021109, 0.009877, 0.0],
    [2.172009, -2.313034, 2.092949, -1.698718, 1.304487, -0.946581,
     0.645299, -0.415598, 0.251068, -0.141026, 0.072650, -0.033120,
     0.012821, -0.004274, 0.001068, 0.0],
    [1.458665, -1.271063, 1.372588, -1.257752, 1.186326, -1.042666,
     0.931875, -0.787020, 0.671068, -0.541164, 0.438950, -0.333234,
     0.250772, -0.174640, 0.097295, 0.0],
    [1.366976, -1.123204, 1.234291, -1.119397, 1.063887, -0.931030,
     0.838107, -0.707665, 0.608977, -0.492384, 0.404256, -0.308827,
     0.236248, -0.167088, 0.096853, 0.0],
    [0.892356, -0.425055, 0.645737, -0.531778, 0.565511, -0.483687,
     0.474500, -0.404025, 0.379228, -0.317474, 0.286683, -0.233505,
     0.199702, -0.166141, 0.117948, 0.0],
    [0.842437, -0.356337, 0.593464, -0.477529, 0.519248, -0.440863,
     0.438827, -0.372969, 0.354221, -0.297057, 0.271334, -0.222591,
     0.192842, -0.164283, 0.119255, 0.0],
    [0.576947, -0.000943, 0.355358, -0.225398, 0.306449, -0.241465,
     0.271718, -0.228634, 0.237327, -0.205281, 0.201703, -0.179310,
     0.166143, -0.176849, 0.142236, 0.0],
    [0.550200, 0.035746, 0.334748, -0.202925, 0.287573, -0.223403,
     0.255932, -0.214959, 0.225551, -0.196308, 0.194281, -0.175339,
     0.163224, -0.180050, 0.145728, 0.0],
    [0.403358, 0.274330, 0.229984, -0.085257, 0.190310, -0.131467,
     0.169688, -0.142598, 0.154703, -0.144947, 0.142117, -0.148598,
     0.132904, -0.195545, 0.151017, 0.0],
    [0.390229, 0.306061, 0.221612, -0.075413, 0.182734, -0.125438,
     0.162912, -0.138648, 0.149015, -0.142960, 0.137870, -0.149116,
     0.130580, -0.202133, 0.152692, 0.0],
])

LATTICE_COEFF_LIMIT = 0.85       # clampCoeff (LatticeNoiseShaper.h:116)
LATTICE_STATE_LIMIT = 2.0        # kLatticeStateLimit (advanceState)
ERROR_CLAMP_FACTOR = 2.0         # error clamp +-2*scale


def psycho_sr_band(sample_rate: float) -> int:
    """SR band select (PsychoacousticDither.h:253-258)."""
    for band, limit in enumerate([46050.0, 72000.0, 144000.0, 264600.0, 529200.0]):
        if sample_rate < limit:
            return band
    return 5


def psycho_coeffs(sample_rate: float, bit_depth: int) -> np.ndarray:
    bp = 0 if bit_depth <= 16 else 1 if bit_depth <= 24 else 2
    return PSYCHO_COEFF_TABLE[psycho_sr_band(sample_rate)][bp].copy()


def _preset_interp(sample_rate: float, presets: np.ndarray) -> np.ndarray:
    """selectPresetWithInterpolation (FixedNoiseShaper.h:316-340 /
    Fixed15TapNoiseShaper.h:372-398 — same logic, same rate grid)."""
    r = FIXED4_PRESET_RATES
    if sample_rate <= r[0]:
        return presets[0].copy()
    if sample_rate >= r[-1]:
        return presets[-1].copy()
    i = int(np.searchsorted(r, sample_rate, side="right")) - 1
    t = (sample_rate - r[i]) / (r[i + 1] - r[i])
    return (1.0 - t) * presets[i] + t * presets[i + 1]


def fixed4_coeffs(sample_rate: float) -> np.ndarray:
    return _preset_interp(sample_rate, FIXED4_PRESETS)


def fixed15_coeffs(sample_rate: float) -> np.ndarray:
    """The reference's prepare() selects from COEFF_PRESETS, not the
    member default (Fixed15TapNoiseShaper.h:88-107)."""
    return _preset_interp(sample_rate, FIXED15_PRESETS)


def quant_scales(bit_depth: int):
    scale = 1.0 / (2.0 ** (bit_depth - 1))
    inv_scale = 2.0 ** (bit_depth - 1)
    return scale, inv_scale


# ---------------------------------------------------------------------------
# RNG
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


class Xoshiro256pp:
    """Exact transcription of the reference Xoshiro256++ (python ints)."""

    def __init__(self, s):
        self.s = [int(v) & _M64 for v in s]

    @staticmethod
    def _rotl(x, k):
        return ((x << k) | (x >> (64 - k))) & _M64

    def next_u64(self):
        s = self.s
        result = (self._rotl((s[0] + s[3]) & _M64, 23) + s[0]) & _M64
        t = (s[1] << 17) & _M64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = self._rotl(s[3], 45)
        return result

    def uniform(self):
        return (self.next_u64() >> 11) * (1.0 / 9007199254740992.0)


# Reference per-channel seeds (FixedNoiseShaper.h / LatticeNoiseShaper.h)
XOSHIRO_SEEDS = [
    (0x123456789ABCDEF0, 0xFEDCBA9876543210, 0x0123456789ABCDEF, 0xEFCDAB8967452301),
    (0x89ABCDEF01234567, 0x76543210FEDCBA98, 0xABCDEF0123456789, 0x67452301EFCDAB89),
]


def xoshiro_uniforms(n: int, channel: int = 0, seeds=None) -> np.ndarray:
    """Uniform stream from the reference's Xoshiro256++; `seeds` overrides
    the per-channel constant seeds (e.g. fixed15_xoshiro_seeds)."""
    if seeds is None:
        seeds = XOSHIRO_SEEDS[channel % len(XOSHIRO_SEEDS)]
    rng = Xoshiro256pp(seeds)
    return np.array([rng.uniform() for _ in range(n)])


def _splitmix64(state: int):
    state = (state + 0x9E3779B97F4A7C15) & _M64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return state, z ^ (z >> 31)


def fixed15_xoshiro_seeds(sample_rate: float, bit_depth: int,
                          channel: int = 0):
    """Fixed15TapNoiseShaper::initializeRandomStates
    (Fixed15TapNoiseShaper.h:407-427): splitmix64 stream seeded from
    bit_cast(sampleRate) ^ (bits<<32) ^ const, decorrelated per channel."""
    import struct
    seed = struct.unpack("<Q", struct.pack("<d", float(sample_rate)))[0]
    seed ^= (int(bit_depth) & _M64) << 32
    seed &= _M64
    seed ^= 0xD1B54A32D192ED03
    stream = seed ^ ((0x9E3779B97F4A7C15 * (channel + 1)) & _M64)
    s = []
    for _ in range(4):
        stream, v = _splitmix64(stream)
        s.append(v)
    if (s[0] | s[1] | s[2] | s[3]) == 0:
        s[0] = 1
    return tuple(s)


def psycho_fallback_uniforms(n: int, channel: int,
                             base_seed: int) -> np.ndarray:
    """The PsychoacousticDither deterministic non-MKL RNG: the ctor
    seeds a SplitMix64 from `base_seed` and draws one 64-bit seed per
    channel 0..7 (PsychoacousticDither.h:122-137); the per-channel
    fallback state is seed ^ 0xd1b54a32d192ed03, stepped by xorshift64
    (12/25/27) with a Marsaglia multiplier and a 53-bit mantissa map
    (PsychoacousticDither.h:477-489).  Bit-exact vs the reference
    binary (tests/ref_harness/dump_shapers.cpp psycho_* vectors)."""
    stream = int(base_seed) & _M64
    seed_ch = 0
    for _ in range(channel + 1):
        stream, seed_ch = _splitmix64(stream)
    x = (seed_ch ^ 0xD1B54A32D192ED03) & _M64
    out = np.empty(n, np.float64)
    mul = 2685821657736338717
    inv53 = 1.0 / 9007199254740992.0
    for i in range(n):
        x ^= x >> 12
        x = (x ^ (x << 25)) & _M64
        x ^= x >> 27
        z = (x * mul) & _M64
        out[i] = float(z >> 11) * inv53
    return out


def tpdf_from_uniforms(u: jnp.ndarray) -> jnp.ndarray:
    """TPDF in [-1, 1]: (u1-0.5)+(u2-0.5); u shape (..., N, 2)."""
    return (u[..., 0] - 0.5) + (u[..., 1] - 0.5)


def make_uniforms(key, shape):
    """On-device uniforms for production dithering (counter-based PRNG)."""
    return jax.random.uniform(key, shape, dtype=jnp.float64
                              if jax.config.jax_enable_x64 else jnp.float32)


# ---------------------------------------------------------------------------
# Shaper kernels (lax.scan over samples, batch on leading dims)
# ---------------------------------------------------------------------------

def _round_half_even(v):
    return jnp.round(v)   # jnp.round is round-half-to-even, matching SSE4.1


def _scan_unroll() -> int:
    """Unroll factor for the per-sample scans: TPU scan-iteration overhead
    dominates the tiny body (measured 1.08 us/sample at unroll=1 vs 252 ns
    at 128 on v5e); CPU keeps compile times short."""
    return 128 if jax.default_backend() != "cpu" else 4


def _use_pallas_quantizer(x) -> bool:
    """Route f32 batches on a real TPU through the Pallas sequential
    quantizer (ops/pallas_kernels.error_feedback_quantize): bit-compatible
    with the lax.scan kernels and ~4x faster than even the unrolled scan."""
    if os.environ.get("CONVOPEQ_DITHER_BACKEND", "auto") == "scan":
        return False
    return (jax.default_backend() not in ("cpu",)
            and jnp.asarray(x).dtype == jnp.float32)


def _use_residual_quantizer(x) -> bool:
    """Route f64 dithering on a real TPU through the LSB-residual
    quantizer (below): TPU f64 is software-emulated and the per-sample
    scan step costs ~3.5 us/sample emulated vs ~0.25 us in f32 (a 14x
    wall difference on the sequential path that batch cannot hide).
    CONVOPEQ_DD_DITHER=scan forces the plain f64 scans; =residual forces
    the residual kernels even on CPU (used by the equivalence tests)."""
    mode = os.environ.get("CONVOPEQ_DD_DITHER", "auto")
    if mode == "scan":
        return False
    if mode == "residual":
        return True
    return (jax.default_backend() not in ("cpu",)
            and jnp.asarray(x).dtype == jnp.float64)


# ---------------------------------------------------------------------------
# LSB-residual dd quantizers
#
# The reference runs its dither/noise-shaping loops in full f64
# (PsychoacousticDither.h:323-354, LatticeNoiseShaper.h:229-295).  A TPU
# has no native f64, and the error-feedback loop is sequential — the
# emulated-f64 scan is the single slowest stage of any dd chain.  The
# TPU-native carry of the 64-bit contract splits the computation by SCALE
# instead of by operation:
#
#   t = x*headroom/scale  (exact f64: scale is a power of two)
#   M = round(t)          (integer part, |M| <= inv_scale = 2^(bits-1))
#   f = t - M             (EXACT f64 fractional part, |f| <= 0.5)
#
# M, f, the TPDF draw d = u1+u2-1, and the clip bounds relative to M are
# all vectorized f64 precomputes.  Every quantity the SEQUENTIAL loop
# touches — f, d, the shaper states (error-feedback history), the
# feedback sum, the rounding offset r = q - M — is O(1) in LSB units, so
# the loop runs in plain f32 with ~2^-24 ABSOLUTE accuracy, which is
# 2^-24 * scale ~= 2^-47 in signal units: tighter than the dd conv
# pipeline's own ~2^-42 truncation.  The output (M + r) * scale is
# reconstructed exactly in f64 (M and r are exact small integers in f32;
# scale is a power of two).
#
# Deviation from the all-f64 scan: a rounding decision flips only when
# the f64 pre-quantization value sits within ~2^-23 LSB of a half-integer
# boundary (accumulated f32 roundoff in the ladder), i.e. ~1e-7
# probability per sample; each flip is one LSB at one sample.  On a 60 s
# stereo fixture the expected contribution is ~1e-10 relative RMS — two
# orders under the 1e-9 contract, and measured directly by the
# PARITY_TPU.json dd semi-folded artifact (TPU residual vs CPU f64 scan).
# Exact-tie semantics differ (round(M+w) ties to even of M+w, the
# residual ties to even of w): reachable only when the f64 dither sum
# lands the value on an exactly representable .5 — measure-zero for
# continuous uniforms.
# ---------------------------------------------------------------------------


def _residual_inputs(x, uniforms, bit_depth: int, headroom: float):
    """Vectorized f64 precompute for the residual quantizers: returns
    (M64, f, d, lo, hi) with f/d/lo/hi in f32 LSB units."""
    scale, inv_scale = quant_scales(bit_depth)
    t64 = (x * headroom) / scale          # exact: scale = 2^-(bits-1)
    m64 = jnp.round(t64)
    f = (t64 - m64).astype(jnp.float32)   # exact in f64; one f32 cast
    u = jnp.asarray(uniforms)
    if u.dtype == jnp.float32:
        # f32 uniforms stay native: the TPDF draw is consumed at f32 in
        # the residual loop anyway, and on TPU an f64 threefry draw is
        # itself emulated (~400 ms for a 123M-draw batch, measured) —
        # production dd dithering generates uniforms as f32
        d = u[..., 0] + u[..., 1] - 1.0
    else:
        u = u.astype(jnp.float64)
        d = (u[..., 0] + u[..., 1] - 1.0).astype(jnp.float32)
    # clip bounds relative to M: integers of magnitude <= 2^bits, exact
    # in f32
    lo = (-inv_scale - m64).astype(jnp.float32)
    hi = (inv_scale - 1.0 - m64).astype(jnp.float32)
    return m64, f, d, lo, hi


def _residual_state_in(state, batch, order, scale):
    """External shaper carries are f64 signal-unit arrays (the scan
    kernels' contract); the residual loop carries f32 LSB units."""
    if state is None:
        return jnp.zeros(batch + (order,), jnp.float32)
    return (jnp.asarray(state, jnp.float64) / scale).astype(jnp.float32)


def _residual_pallas(x, uniforms, coeffs, bit_depth: int, headroom: float,
                     mode: str):
    """Residual quantizer on the Pallas sequential kernel.

    FP arithmetic is scale-invariant under exact power-of-2 scaling, so
    the f32 LSB-unit loop is BIT-IDENTICAL to running the standard
    kernel on the scaled residual signal x_res = f * scale with
    headroom 1: every intermediate is the residual loop's value times
    scale (no over/underflow at |values| ~ 2^-23..2^-8).  The kernel's
    fullscale clamps never engage for INTERIOR signals (|x*h| bounded
    away from 1) — callers assert that via apply_dither's
    assume_interior flag (e.g. a soft-clipped chain bounds |y| <= 0.85).
    ~10x the scan's sequential rate (the per-sample body is a handful
    of (1, R) vector ops instead of an XLA scan iteration)."""
    from ..ops.pallas_kernels import error_feedback_quantize
    scale, _inv = quant_scales(bit_depth)
    t64 = (x * headroom) / scale
    m64 = jnp.round(t64)
    f32s = ((t64 - m64) * scale).astype(jnp.float32)   # exact x2^-k
    u32 = jnp.asarray(uniforms, jnp.float32)
    n = x.shape[-1]
    # tracing pallas_call under x64 recurses in JAX's lowering cache
    # (see tests/test_pallas.py lowering-gate note); every operand here
    # is f32, so scope x64 off around the kernel call
    with jax.enable_x64(False):
        q_std = error_feedback_quantize(
            f32s.reshape((-1, n)), u32.reshape((-1, n, 2)), coeffs,
            scale, 1.0, mode=mode)
    r = jnp.round(q_std.astype(jnp.float64) / scale).reshape(x.shape)
    return (m64 + r) * scale


def _residual_finish(m64, r, state_f32, scale, return_state):
    q = (m64 + r.astype(jnp.float64)) * scale
    if not return_state:
        return q
    return q, state_f32.astype(jnp.float64) * scale


def psycho_dither_residual(x, uniforms, sample_rate: float, bit_depth: int,
                           headroom: float = K_OUTPUT_HEADROOM,
                           state=None, return_state: bool = False):
    """LSB-residual form of `psycho_dither` (see block comment above).
    The psychoacoustic loop has no clamps: tmp = x*h + d*scale + sum c z;
    q = round(tmp/scale); err = (tmp - q*scale)/scale — all O(1) in LSB
    units once M is split off."""
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x, jnp.float64)
    scale, _ = quant_scales(bit_depth)
    c = jnp.asarray(psycho_coeffs(sample_rate, bit_depth), jnp.float32)
    m64, f, d, _lo, _hi = _residual_inputs(x, uniforms, bit_depth, headroom)
    batch = x.shape[:-1]
    z0 = _residual_state_in(state, batch, NS_ORDER_PSYCHO, scale)

    def step(z, inp):
        fi, di = inp
        shaped = (c[0] * z[..., 0])
        for i in range(1, NS_ORDER_PSYCHO):
            shaped = shaped + (c[i] * z[..., i])
        w = fi + di + shaped
        r = _round_half_even(w)
        err = w - r
        z = jnp.concatenate([err[..., None], z[..., :-1]], axis=-1)
        return z, r

    xs = (jnp.moveaxis(f, -1, 0), jnp.moveaxis(d, -1, 0))
    zf, r = jax.lax.scan(step, z0, xs, unroll=_scan_unroll())
    return _residual_finish(m64, jnp.moveaxis(r, 0, -1), zf, scale,
                            return_state)


def fixed_shaper_dither_residual(x, uniforms, coeffs, bit_depth: int,
                                 headroom: float = K_OUTPUT_HEADROOM,
                                 range_clamp: bool = False,
                                 state=None, return_state: bool = False):
    """LSB-residual form of `fixed_shaper_dither`: y = x*h - fb;
    quantize clamps y to fullscale (the lo/hi bounds relative to M),
    adds TPDF, rounds, and (Fixed15) clamps the integer; err = clip(q -
    y, +-2) in LSB units."""
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x, jnp.float64)
    scale, _ = quant_scales(bit_depth)
    c = jnp.asarray(coeffs, jnp.float32)
    order = c.shape[0]
    m64, f, d, lo, hi = _residual_inputs(x, uniforms, bit_depth, headroom)
    batch = x.shape[:-1]
    e0 = _residual_state_in(state, batch, order, scale)

    def step(e, inp):
        fi, di, loi, hii = inp
        fb = (c[0] * e[..., 0])
        for i in range(1, order):
            fb = fb + (c[i] * e[..., i])
        t = fi - fb                       # y - M in LSB units
        y1 = jnp.clip(t, loi, hii)
        r = _round_half_even(y1 + di)
        if range_clamp:
            r = jnp.clip(r, loi, hii)
        err = jnp.clip(r - t, -ERROR_CLAMP_FACTOR, ERROR_CLAMP_FACTOR)
        e = jnp.concatenate([err[..., None], e[..., :-1]], axis=-1)
        return e, r

    xs = tuple(jnp.moveaxis(v, -1, 0) for v in (f, d, lo, hi))
    ef, r = jax.lax.scan(step, e0, xs, unroll=_scan_unroll())
    return _residual_finish(m64, jnp.moveaxis(r, 0, -1), ef, scale,
                            return_state)


def lattice_dither_residual(x, uniforms, reflection_coeffs, bit_depth: int,
                            headroom: float = K_OUTPUT_HEADROOM,
                            state=None, return_state: bool = False,
                            ladder: str = "reference"):
    """LSB-residual form of `lattice_dither`: tmp = x*h + fb; quantize
    with fullscale + integer clamps; err = clip(q - tmp, +-2); ladder
    advance with the +-2.0-signal-unit state clamp expressed in LSB
    units (+-2*inv_scale <= 2^24, exactly representable in f32)."""
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x, jnp.float64)
    scale, inv_scale = quant_scales(bit_depth)
    k = jnp.clip(jnp.nan_to_num(
        jnp.asarray(reflection_coeffs, jnp.float32)),
        -LATTICE_COEFF_LIMIT, LATTICE_COEFF_LIMIT)
    order = k.shape[0]
    state_lim = jnp.float32(LATTICE_STATE_LIMIT * inv_scale)
    m64, f, d, lo, hi = _residual_inputs(x, uniforms, bit_depth, headroom)
    batch = x.shape[:-1]
    s0 = _residual_state_in(state, batch, order, scale)

    def step(s, inp):
        fi, di, loi, hii = inp
        fb = (k[0] * s[..., 0])
        for i in range(1, order):
            fb = fb + (k[i] * s[..., i])
        t = fi + fb                       # tmp - M in LSB units
        y1 = jnp.clip(t, loi, hii)
        r = jnp.clip(_round_half_even(y1 + di), loi, hii)
        err = jnp.clip(r - t, -ERROR_CLAMP_FACTOR, ERROR_CLAMP_FACTOR)

        fwd = err
        new_s = []
        if ladder == "fir":
            gprev = err
            for i in range(order):
                nf = fwd + (k[i] * s[..., i])
                ng = (k[i] * fwd) + s[..., i]
                new_s.append(jnp.clip(gprev, -state_lim, state_lim))
                gprev = ng
                fwd = nf
        else:
            for i in range(order):
                nf = fwd + (k[i] * s[..., i])
                nb = jnp.clip((k[i] * fwd) + s[..., i], -state_lim,
                              state_lim)
                fwd = nf
                new_s.append(nb)
        s = jnp.stack(new_s, axis=-1)
        return s, r

    xs = tuple(jnp.moveaxis(v, -1, 0) for v in (f, d, lo, hi))
    sf, r = jax.lax.scan(step, s0, xs, unroll=_scan_unroll())
    return _residual_finish(m64, jnp.moveaxis(r, 0, -1), sf, scale,
                            return_state)


def psycho_dither(x, uniforms, sample_rate: float, bit_depth: int,
                  headroom: float = K_OUTPUT_HEADROOM,
                  state=None, return_state: bool = False):
    """PsychoacousticDither.processStereoBlock (PsychoacousticDither.h:280+).

    x: (..., N); uniforms: (..., N, 2) in [0,1).  Returns quantized signal.

    state / return_state: the (..., order) error-feedback carry for
    block-at-a-time streaming — the reference's shaper state persists
    across callbacks, so ours must too for streaming == offline parity.
    """
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x)
    dt = x.dtype
    c = jnp.asarray(psycho_coeffs(sample_rate, bit_depth), dt)
    scale, _ = quant_scales(bit_depth)
    d = tpdf_from_uniforms(jnp.asarray(uniforms, dt)) * scale
    batch = x.shape[:-1]

    def step(z, inp):
        xi, di = inp
        # explicit left-to-right sum: error-feedback loops are chaotic at
        # the ULP level, so the reduction order is part of the contract
        shaped = (c[0] * z[..., 0])
        for i in range(1, NS_ORDER_PSYCHO):
            shaped = shaped + (c[i] * z[..., i])
        tmp = (xi * headroom) + di + shaped
        q = _round_half_even(tmp / scale) * scale
        err = tmp - q
        z = jnp.concatenate([err[..., None], z[..., :-1]], axis=-1)
        return z, q

    z0 = jnp.zeros(batch + (NS_ORDER_PSYCHO,), dt) if state is None \
        else jnp.asarray(state, dt)
    xs = (jnp.moveaxis(x, -1, 0), jnp.moveaxis(d, -1, 0))
    zf, q = jax.lax.scan(step, z0, xs, unroll=_scan_unroll())
    q = jnp.moveaxis(q, 0, -1)
    return (q, zf) if return_state else q


def _ef_quantize(y, u1, u2, scale, inv_scale, extra_clamp: bool):
    """FixedNoiseShaper/Lattice quantize(): clamp -> TPDF -> round(-half-even).

    extra_clamp adds the Lattice variant's integer-range clamp
    (LatticeNoiseShaper.h:203-227)."""
    y = jnp.clip(y, -1.0, 1.0 - 1.0 / inv_scale)
    y = y + ((u1 + u2 - 1.0) * scale)
    q = _round_half_even(y * inv_scale)
    if extra_clamp:
        q = jnp.clip(q, -inv_scale, inv_scale - 1.0)
    return q * scale


def fixed_shaper_dither(x, uniforms, coeffs, bit_depth: int,
                        headroom: float = K_OUTPUT_HEADROOM,
                        range_clamp: bool = False,
                        state=None, return_state: bool = False):
    """FixedNoiseShaper / Fixed15TapNoiseShaper processSample loop:
    y = x*headroom - sum c_i e_i; q = quantize(y); e0 = clamp(q-y, 2 scale).

    range_clamp=True adds Fixed15Tap's post-round integer-range clamp
    (Fixed15TapNoiseShaper.h:318-349 clamps q to [-invScale, invScale-1];
    FixedNoiseShaper's quantize has no such clamp).

    state / return_state: streaming error-feedback carry (see
    psycho_dither)."""
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x)
    dt = x.dtype
    c = jnp.asarray(coeffs, dt)
    order = c.shape[0]
    scale, inv_scale = quant_scales(bit_depth)
    u = jnp.asarray(uniforms, dt)
    batch = x.shape[:-1]

    def step(e, inp):
        xi, u1, u2 = inp
        fb = (c[0] * e[..., 0])
        for i in range(1, order):
            fb = fb + (c[i] * e[..., i])
        y = (xi * headroom) - fb
        q = _ef_quantize(y, u1, u2, scale, inv_scale,
                         extra_clamp=range_clamp)
        err = jnp.clip(q - y, -ERROR_CLAMP_FACTOR * scale,
                       ERROR_CLAMP_FACTOR * scale)
        e = jnp.concatenate([err[..., None], e[..., :-1]], axis=-1)
        return e, q

    e0 = jnp.zeros(batch + (order,), dt) if state is None \
        else jnp.asarray(state, dt)
    xs = (jnp.moveaxis(x, -1, 0),
          jnp.moveaxis(u[..., 0], -1, 0), jnp.moveaxis(u[..., 1], -1, 0))
    ef, q = jax.lax.scan(step, e0, xs, unroll=_scan_unroll())
    q = jnp.moveaxis(q, 0, -1)
    return (q, ef) if return_state else q


def lattice_dither(x, uniforms, reflection_coeffs, bit_depth: int,
                   headroom: float = K_OUTPUT_HEADROOM,
                   state=None, return_state: bool = False,
                   ladder: str = "reference"):
    """LatticeNoiseShaper (LatticeNoiseShaper.h:229-295):
    feedback = sum c_i s_i (ladder tap-out); tmp = x*h + feedback;
    q = quantize(tmp) with fullscale clamp; err clamped +-2*scale drives the
    lattice state advance with per-stage clamp +-2.0.

    ladder: "reference" reproduces the reference's advanceState
    bit-for-bit — INCLUDING ITS DEFECT: the "[P7]" store
    (LatticeNoiseShaper.h:276-280, state[i] <- own-stage nextBackward)
    makes the state map unipotent (I + strictly-lower coupling, all
    eigenvalues 1), so states drift polynomially into the +-2.0 clamp
    and the shaper rails — the REFERENCE BINARY outputs ~fullscale
    noise (~33k LSB RMS at 16-bit) within 32k samples for ANY
    multi-coefficient bank (pinned: tests/test_ref_vectors.py::
    test_lattice_long_horizon_rail_matches_reference_binary).
    "fir" stores the PREVIOUS stage's backward output (s[i] <- g_i(n),
    the textbook analysis-ladder recursion g_{i+1}(n) = k_{i+1} f_i(n)
    + g_i(n-1) — the semantics the reference's pre-P7 code had): every
    state is then a FINITE impulse response of the last <= 9 clamped
    errors, bounded by prod(1+|k_j|) * 2 LSB, with the same
    computeFeedback tap-out.  Finite memory also makes the fir ladder
    testable: a flipped rounding perturbs at most 9 samples of state,
    so trajectories cannot chaotically diverge.  Production paths
    (engine, bench, factory banks) use "fir"; "reference" remains the
    parity mode.

    state / return_state: streaming ladder-state carry (see
    psycho_dither)."""
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    x = jnp.asarray(x)
    dt = x.dtype
    # jnp (not np) coercion so reflection_coeffs may be a traced array —
    # the learner vmaps candidates through this kernel
    k = jnp.clip(jnp.nan_to_num(jnp.asarray(reflection_coeffs, dt)),
                 -LATTICE_COEFF_LIMIT, LATTICE_COEFF_LIMIT)
    order = k.shape[0]
    scale, inv_scale = quant_scales(bit_depth)
    u = jnp.asarray(uniforms, dt)
    batch = x.shape[:-1]

    def step(s, inp):
        xi, u1, u2 = inp
        fb = (k[0] * s[..., 0])
        for i in range(1, order):
            fb = fb + (k[i] * s[..., i])
        tmp = (xi * headroom) + fb
        q = _ef_quantize(tmp, u1, u2, scale, inv_scale, extra_clamp=True)
        err = jnp.clip(q - tmp, -ERROR_CLAMP_FACTOR * scale,
                       ERROR_CLAMP_FACTOR * scale)

        fwd = err
        new_s = []
        if ladder == "fir":
            gprev = err
            for i in range(order):
                nf = fwd + (k[i] * s[..., i])
                ng = (k[i] * fwd) + s[..., i]
                new_s.append(jnp.clip(gprev, -LATTICE_STATE_LIMIT,
                                      LATTICE_STATE_LIMIT))
                gprev = ng
                fwd = nf
        else:
            for i in range(order):
                nf = fwd + (k[i] * s[..., i])
                nb = jnp.clip((k[i] * fwd) + s[..., i],
                              -LATTICE_STATE_LIMIT, LATTICE_STATE_LIMIT)
                new_s.append(nb)
                fwd = nf
        s = jnp.stack(new_s, axis=-1)
        return s, q

    s0 = jnp.zeros(batch + (order,), dt) if state is None \
        else jnp.asarray(state, dt)
    xs = (jnp.moveaxis(x, -1, 0),
          jnp.moveaxis(u[..., 0], -1, 0), jnp.moveaxis(u[..., 1], -1, 0))
    sf, q = jax.lax.scan(step, s0, xs, unroll=_scan_unroll())
    q = jnp.moveaxis(q, 0, -1)
    return (q, sf) if return_state else q


def dither_state_init(x_batch_shape, shaper_type: int, dtype=None):
    """Zero shaper carry for block streaming: (batch..., order)."""
    order = {PSYCHOACOUSTIC: NS_ORDER_PSYCHO, FIXED4: NS_ORDER_FIXED4,
             FIXED15: NS_ORDER_FIXED15,
             ADAPTIVE9: NS_ORDER_LATTICE}[int(shaper_type)]
    return jnp.zeros(tuple(x_batch_shape) + (order,),
                     dtype or jnp.float64)


def apply_dither(x, shaper_type: int, sample_rate: float, bit_depth: int,
                 uniforms=None, key=None, adaptive_coeffs=None,
                 headroom: float = K_OUTPUT_HEADROOM,
                 state=None, return_state: bool = False,
                 lattice_ladder: str = "fir",
                 assume_interior: bool = False):
    """Dither dispatch (DSPCoreDouble.cpp:644-653).  x: (..., N).

    uniforms: (..., N, 2) in [0,1); generated from `key` if omitted.
    bit_depth <= 0 disables quantization (headroom only).

    state / return_state: block-streaming shaper carry (the reference's
    shaper state persists across callbacks).  When a carry is involved
    the scan kernels run unconditionally — the Pallas quantizer keeps
    its state inside the kernel and cannot resume from a caller carry.
    """
    x = jnp.asarray(x)
    if bit_depth <= 0:
        out = x * headroom
        return (out, state) if return_state else out
    if uniforms is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        uniforms = jax.random.uniform(key, x.shape + (2,), dtype=x.dtype)
    stateful = state is not None or return_state
    if shaper_type in (PSYCHOACOUSTIC, FIXED4, FIXED15, ADAPTIVE9) \
            and not stateful and _use_pallas_quantizer(x) \
            and (shaper_type != ADAPTIVE9
                 or not isinstance(adaptive_coeffs, jax.core.Tracer)):
        from ..ops.pallas_kernels import error_feedback_quantize
        if shaper_type == PSYCHOACOUSTIC:
            coeffs, mode = psycho_coeffs(sample_rate, bit_depth), "psycho"
        elif shaper_type == FIXED4:
            coeffs, mode = fixed4_coeffs(sample_rate), "fixed"
        elif shaper_type == ADAPTIVE9:
            # the kernel bakes coefficients in as scalars, so a traced
            # candidate array (the learner's vmap path) falls through to
            # the scan kernel above this gate
            k9 = np.zeros(NS_ORDER_LATTICE) if adaptive_coeffs is None \
                else np.asarray(adaptive_coeffs, np.float64)
            coeffs = np.clip(np.nan_to_num(k9),
                             -LATTICE_COEFF_LIMIT, LATTICE_COEFF_LIMIT)
            mode = "lattice_fir" if lattice_ladder == "fir" else "lattice"
        else:
            coeffs, mode = fixed15_coeffs(sample_rate), "fixed15"
        scale, _ = quant_scales(bit_depth)
        n = x.shape[-1]
        xr = x.reshape((-1, n))
        ur = jnp.asarray(uniforms, x.dtype).reshape((-1, n, 2))
        q = error_feedback_quantize(xr, ur, coeffs, scale, headroom,
                                    mode=mode)
        return q.reshape(x.shape)
    if _use_residual_quantizer(x):
        # f64 contract on a chip with no native f64: LSB-residual
        # kernels (sequential path in f32 LSB units, ~2^-47 signal-unit
        # accuracy — see the block comment above their definitions).
        # The sequential loop rides the Pallas quantizer when possible:
        # psycho unconditionally (its loop has no fullscale clamps);
        # the clamped shapers only under assume_interior (the caller
        # guarantees |x*h| bounded away from fullscale, e.g. a
        # soft-clipped chain), since the scaled-residual form cannot
        # represent the clamp boundaries.
        rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        pallas_ok = (not stateful
                     and os.environ.get("CONVOPEQ_DITHER_BACKEND",
                                        "auto") != "scan"
                     and jax.default_backend() not in ("cpu",)
                     # the kernel lays rows on VPU lanes (padded to
                     # 128): a near-single-stream call would pad its
                     # whole time axis 16-64x in HBM (measured: a
                     # (2, 2.9M) fixture OOMs at 20 GB) — the scan path
                     # is the right engine at low row counts
                     and rows >= 16)
        if pallas_ok and shaper_type == PSYCHOACOUSTIC:
            return _residual_pallas(x, uniforms,
                                    psycho_coeffs(sample_rate, bit_depth),
                                    bit_depth, headroom, "psycho")
        if pallas_ok and assume_interior and shaper_type == ADAPTIVE9 \
                and not isinstance(adaptive_coeffs, jax.core.Tracer):
            k9 = np.zeros(NS_ORDER_LATTICE) if adaptive_coeffs is None \
                else np.asarray(adaptive_coeffs, np.float64)
            k9 = np.clip(np.nan_to_num(k9), -LATTICE_COEFF_LIMIT,
                         LATTICE_COEFF_LIMIT)
            mode = "lattice_fir" if lattice_ladder == "fir" else "lattice"
            return _residual_pallas(x, uniforms, k9, bit_depth, headroom,
                                    mode)
        if shaper_type == PSYCHOACOUSTIC:
            return psycho_dither_residual(
                x, uniforms, sample_rate, bit_depth, headroom,
                state=state, return_state=return_state)
        if shaper_type == FIXED4:
            return fixed_shaper_dither_residual(
                x, uniforms, fixed4_coeffs(sample_rate), bit_depth,
                headroom, state=state, return_state=return_state)
        if shaper_type == FIXED15:
            return fixed_shaper_dither_residual(
                x, uniforms, fixed15_coeffs(sample_rate), bit_depth,
                headroom, range_clamp=True,
                state=state, return_state=return_state)
        if shaper_type == ADAPTIVE9:
            k = adaptive_coeffs if adaptive_coeffs is not None \
                else np.zeros(9)
            return lattice_dither_residual(
                x, uniforms, k, bit_depth, headroom,
                state=state, return_state=return_state,
                ladder=lattice_ladder)
    if shaper_type == PSYCHOACOUSTIC:
        return psycho_dither(x, uniforms, sample_rate, bit_depth, headroom,
                             state=state, return_state=return_state)
    if shaper_type == FIXED4:
        return fixed_shaper_dither(x, uniforms, fixed4_coeffs(sample_rate),
                                   bit_depth, headroom,
                                   state=state, return_state=return_state)
    if shaper_type == FIXED15:
        return fixed_shaper_dither(x, uniforms, fixed15_coeffs(sample_rate),
                                   bit_depth, headroom, range_clamp=True,
                                   state=state, return_state=return_state)
    if shaper_type == ADAPTIVE9:
        k = adaptive_coeffs if adaptive_coeffs is not None else np.zeros(9)
        return lattice_dither(x, uniforms, k, bit_depth, headroom,
                              state=state, return_state=return_state,
                              ladder=lattice_ladder)
    raise ValueError(f"unknown shaper type {shaper_type}")
