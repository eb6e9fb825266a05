"""20-band parametric EQ — TPU-native rebuild of the reference EQProcessor.

Behavioral parity with src/eqprocessor/EQProcessor.* :
- 20 bands (NUM_BANDS=20), 4 filter channels L/R/Mid/Side
  (EQProcessor.h:153-155), 5 band types, 5 channel modes, Serial/Parallel
  structures, per-band enable + the "|gain| < 0.01 dB => inactive" skip for
  non-LP/HP bands (EQProcessor.Coefficients.cpp:49-53).
- Serial structure: bands cascade in index order
  (EQProcessor.Processing.cpp:676-760).
- Parallel structure: out = src + sum_b(band_b(src) - src)
  (EQProcessor.Processing.cpp:776-860).
- Mid/Side: m=(L+R)/2, s=(L-R)/2; filtered component recombined as
  L=m'+s / R=m'-s (Processing.cpp:700-740).
- AGC: block-rate RMS envelope follower with attack 0.2 s / release 2.0 s /
  smoothing 0.2 s, gain in [0.06, 16], +-0.5 dB dead zone
  (EQProcessor.h:166-171, Processing.cpp:343-446).

TPU-first design: EQ *parameters* are static configuration (the reference
also treats them as non-RT state, rebuilt off the audio thread and published
via RCU — here a param change is a retrace, cached by config hash at the
engine layer).  Band routing is therefore resolved at trace time: only the
filters a band actually needs are evaluated, each as an O(log N)-depth
associative scan batched across streams.  The only sequential scan is the
AGC block-rate envelope (over blocks, not samples).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import svf as svf_ops
from ..ops.svf import svf_coeffs, svf_process

NUM_BANDS = 20
# Channel modes (EQProcessor.h: enum class EQChannelMode)
STEREO, LEFT, RIGHT, MID, SIDE = 0, 1, 2, 3, 4
# Structures (EQProcessor.h: enum class FilterStructure)
SERIAL, PARALLEL = 0, 1

# Default band frequencies (EQProcessor.h:158-163)
DEFAULT_FREQS = np.array([
    25.0, 40.0, 63.0, 100.0, 160.0,
    250.0, 400.0, 630.0, 1000.0, 1600.0,
    2500.0, 4000.0, 6300.0, 10000.0, 11000.0,
    12500.0, 14000.0, 16500.0, 18000.0, 19500.0,
])
DEFAULT_Q = 0.707

# AGC constants (EQProcessor.h:166-171, Processing.cpp:343-446)
AGC_ATTACK_TIME_SEC = 0.2
AGC_RELEASE_TIME_SEC = 2.0
AGC_SMOOTH_TIME_SEC = 0.2
AGC_MIN_GAIN = 0.06
AGC_MAX_GAIN = 16.0
AGC_MAX_ENV = 1000.0
AGC_MIN_ENV = 1e-6
AGC_DEAD_ZONE_RATIO = 1.059
AGC_DENORM = 1.0e-20


@dataclass
class EQParams:
    """Full EQ parameter set (mirrors the reference EQState snapshot)."""
    band_types: np.ndarray = field(
        default_factory=lambda: np.full(NUM_BANDS, svf_ops.PEAKING, np.int32))
    freqs: np.ndarray = field(default_factory=lambda: DEFAULT_FREQS.copy())
    gains_db: np.ndarray = field(default_factory=lambda: np.zeros(NUM_BANDS))
    qs: np.ndarray = field(default_factory=lambda: np.full(NUM_BANDS, DEFAULT_Q))
    modes: np.ndarray = field(default_factory=lambda: np.zeros(NUM_BANDS, np.int32))
    enabled: np.ndarray = field(default_factory=lambda: np.ones(NUM_BANDS, bool))
    structure: int = SERIAL
    saturation: float = 0.0
    agc_enabled: bool = False

    def set_band(self, i, band_type=None, freq=None, gain_db=None, q=None,
                 mode=None, enabled=None):
        if band_type is not None:
            self.band_types[i] = band_type
        if freq is not None:
            self.freqs[i] = freq
        if gain_db is not None:
            self.gains_db[i] = gain_db
        if q is not None:
            self.qs[i] = q
        if mode is not None:
            self.modes[i] = mode
        if enabled is not None:
            self.enabled[i] = enabled
        return self

    def config_key(self):
        """Hashable content key (the engine's compiled-fn cache key).

        Plays the role of the reference's EQCoeffCache paramsHash
        (EQProcessor.h:121-138).
        """
        return (self.band_types.tobytes(), self.freqs.tobytes(),
                self.gains_db.tobytes(), self.qs.tobytes(),
                self.modes.tobytes(), self.enabled.tobytes(),
                self.structure, float(self.saturation), bool(self.agc_enabled))


def band_active_mask(params: EQParams) -> np.ndarray:
    """createBandNode activity rule (EQProcessor.Coefficients.cpp:35-53).

    The gain skip compares the float32 band gain against 0.01f.
    """
    types = np.asarray(params.band_types)
    gains_f32 = np.abs(np.asarray(params.gains_db, np.float32))
    not_passband = (types != svf_ops.LOW_PASS) & (types != svf_ops.HIGH_PASS)
    tiny_gain = gains_f32 < np.float32(0.01)
    return np.asarray(params.enabled, bool) & ~(not_passband & tiny_gain)


def _band_apply(L, R, coeffs_b, mode: int, saturation: float):
    """Apply one band (static mode) and return (L_out, R_out).

    Only the channel filters the mode needs are evaluated.  Stereo bands
    batch L and R into one scan (the analog of the reference's SSE2-packed
    processBandStereo, which also uses the clamped-tanh saturation form).
    """
    if mode == STEREO:
        lr = jnp.stack([L, R], axis=-2)
        f, _ = svf_process(lr, coeffs_b, saturation=saturation, simd_tanh=True)
        return f[..., 0, :], f[..., 1, :]
    if mode == LEFT:
        f, _ = svf_process(L, coeffs_b, saturation=saturation, simd_tanh=False)
        return f, R
    if mode == RIGHT:
        f, _ = svf_process(R, coeffs_b, saturation=saturation, simd_tanh=False)
        return L, f
    if mode == MID:
        m = (L + R) * 0.5
        s = (L - R) * 0.5
        fm, _ = svf_process(m, coeffs_b, saturation=saturation, simd_tanh=False)
        return fm + s, fm - s
    if mode == SIDE:
        m = (L + R) * 0.5
        s = (L - R) * 0.5
        fs, _ = svf_process(s, coeffs_b, saturation=saturation, simd_tanh=False)
        return m + fs, m - fs
    raise ValueError(f"bad channel mode {mode}")


def _band_matrix_response(params: EQParams, sample_rate, freqs):
    """2x2 complex MIMO response of the active bands at `freqs` (host f64).

    Every channel mode is a 2x2 LTI map on (L, R):
      Stereo: diag(H, H); Left: diag(H, 1); Right: diag(1, H);
      Mid:  [[(H+1)/2, (H-1)/2], [(H-1)/2, (H+1)/2]]
      Side: [[(H+1)/2, (1-H)/2], [(1-H)/2, (H+1)/2]]
    Serial structure = ordered matrix product; Parallel = I + sum(T_b - I).
    Returns (h11, h12, h21, h22) complex128 arrays.
    """
    from ..engine.eq_analysis import svf_to_biquad, biquad_response
    active = band_active_mask(params)
    coeffs = svf_coeffs(params.band_types, params.freqs, params.gains_db,
                        params.qs, sample_rate)
    nf = len(freqs)
    eye = (np.ones(nf, complex), np.zeros(nf, complex),
           np.zeros(nf, complex), np.ones(nf, complex))

    def band_T(b):
        bq = svf_to_biquad(*(float(c[b]) for c in coeffs))
        H = biquad_response(bq, freqs, sample_rate)
        mode = int(params.modes[b])
        one = np.ones(nf, complex)
        if mode == STEREO:
            return (H, 0 * H, 0 * H, H)
        if mode == LEFT:
            return (H, 0 * H, 0 * H, one)
        if mode == RIGHT:
            return (one, 0 * H, 0 * H, H)
        if mode == MID:
            return ((H + 1) / 2, (H - 1) / 2, (H - 1) / 2, (H + 1) / 2)
        return ((H + 1) / 2, (1 - H) / 2, (1 - H) / 2, (H + 1) / 2)  # SIDE

    def mat_mul(a, b):
        a11, a12, a21, a22 = a
        b11, b12, b21, b22 = b
        return (a11 * b11 + a12 * b21, a11 * b12 + a12 * b22,
                a21 * b11 + a22 * b21, a21 * b12 + a22 * b22)

    if params.structure == SERIAL:
        T = eye
        for b in range(NUM_BANDS):
            if active[b]:
                T = mat_mul(band_T(b), T)   # band applied after T
        return T
    acc = [np.zeros(nf, complex) for _ in range(4)]
    for b in range(NUM_BANDS):
        if not active[b]:
            continue
        Tb = band_T(b)
        for i in range(4):
            acc[i] = acc[i] + (Tb[i] - eye[i])
    return tuple(eye[i] + acc[i] for i in range(4))


def _band_matrix_response_device(params: EQParams, sample_rate, m, csize,
                                 cdt):
    """On-device evaluation of the 2x2 band-response matrix: biquad
    coefficients are host f64; only the per-bin polynomial evaluation and
    the 20-band matrix product run on device."""
    from ..engine.eq_analysis import svf_to_biquad
    active = band_active_mask(params)
    coeffs = svf_coeffs(params.band_types, params.freqs, params.gains_db,
                        params.qs, sample_rate)
    w = 2.0 * np.pi * np.arange(csize) / m          # host f64 angles
    z = jnp.asarray(np.exp(1j * w), cdt)
    z2 = z * z
    one = jnp.ones((csize,), cdt)
    zero = jnp.zeros((csize,), cdt)

    def band_H(b):
        b0, b1, b2, a0, a1, a2 = svf_to_biquad(
            *(float(c[b]) for c in coeffs))
        num = b0 * z2 + b1 * z + b2
        den = a0 * z2 + a1 * z + a2
        return num / den

    def band_T(b):
        H = band_H(b)
        mode = int(params.modes[b])
        if mode == STEREO:
            return (H, zero, zero, H)
        if mode == LEFT:
            return (H, zero, zero, one)
        if mode == RIGHT:
            return (one, zero, zero, H)
        hp = (H + 1.0) * 0.5
        hm = (H - 1.0) * 0.5
        if mode == MID:
            return (hp, hm, hm, hp)
        return (hp, -hm, -hm, hp)   # SIDE

    T = (one, zero, zero, one)
    if params.structure == SERIAL:
        for b in range(NUM_BANDS):
            if not active[b]:
                continue
            Tb = band_T(b)
            T = (Tb[0] * T[0] + Tb[1] * T[2], Tb[0] * T[1] + Tb[1] * T[3],
                 Tb[2] * T[0] + Tb[3] * T[2], Tb[2] * T[1] + Tb[3] * T[3])
    else:
        acc = [zero, zero, zero, zero]
        eye = (one, zero, zero, one)
        for b in range(NUM_BANDS):
            if not active[b]:
                continue
            Tb = band_T(b)
            for i in range(4):
                acc[i] = acc[i] + (Tb[i] - eye[i])
        T = tuple(eye[i] + acc[i] for i in range(4))
    return T


def _eq_ring_tail_samples(params: EQParams, sample_rate, eps=1e-10):
    """Padding needed so truncated IIR ringing is below eps: from the max
    pole radius of the active bands (host-side, static)."""
    active = band_active_mask(params)
    coeffs = svf_coeffs(params.band_types, params.freqs, params.gains_db,
                        params.qs, sample_rate)
    max_r = 0.0
    for b in range(NUM_BANDS):
        if not active[b]:
            continue
        A = np.array([[2 * coeffs[0][b] - 1.0, -2 * coeffs[1][b]],
                      [2 * coeffs[1][b], 1.0 - 2 * coeffs[2][b]]])
        r = float(np.max(np.abs(np.linalg.eigvals(A))))
        max_r = max(max_r, min(r, 1.0 - 1e-12))
    if max_r <= 0.0:
        return 0
    return int(np.ceil(np.log(eps) / np.log(max_r)))


def eq_process_bands_fft(x, params: EQParams, sample_rate, eps=1e-10):
    """Frequency-domain EQ: one FFT convolution with the combined 2x2 band
    response — the TPU fast path (saturation must be 0; the +-100 output
    clamp is not applied, it only matters for >100 FS signals).

    Exactness: equals the scan path up to the truncated ringing tail
    (bounded by `eps`) and fp rounding.  Zero-padding is sized from the
    active bands' pole radii, so high-Q bands automatically get longer
    tails.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    from ..utils.dsputil import next_pow2
    pad = _eq_ring_tail_samples(params, sample_rate, eps)
    if pad == 0:
        # no active bands: the combined 2x2 response is the identity
        # (the blocked path below would otherwise build a 0-tap IR)
        return x
    if (x.dtype != jnp.float64 and jax.default_backend() != "cpu"
            and n >= 4 * pad):
        # long buffers on TPU: blocked overlap-save convolution with the
        # truncated EQ impulse response (error bounded by the same eps
        # tail analysis) — the monolithic VPU FFT over next_pow2(n) is
        # the bottleneck at megasample lengths (~100 ms for 60 s x 32
        # signals vs ~15 ms blocked on the MXU pipelines)
        return _eq_fft_blocked(x, params, sample_rate, pad)
    m = next_pow2(n + pad)
    csize = m // 2 + 1
    cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    if x.dtype == jnp.float64:
        # exactness path: host f64 response, embedded as constants
        freqs = np.arange(csize) * (sample_rate / m)
        h11, h12, h21, h22 = _band_matrix_response(params, sample_rate, freqs)
        h11 = jnp.asarray(h11, cdt)
        h12 = jnp.asarray(h12, cdt)
        h21 = jnp.asarray(h21, cdt)
        h22 = jnp.asarray(h22, cdt)
    else:
        # fast path: evaluate the response on device (avoids shipping
        # csize-sized complex constants with the graph); coefficients stay
        # host-side f64
        h11, h12, h21, h22 = _band_matrix_response_device(
            params, sample_rate, m, csize, cdt)

    X = jnp.fft.rfft(x, n=m, axis=-1)
    XL = X[..., 0, :]
    XR = X[..., 1, :]
    YL = h11 * XL + h12 * XR
    YR = h21 * XL + h22 * XR
    y = jnp.fft.irfft(jnp.stack([YL, YR], axis=-2), n=m, axis=-1)[..., :n]
    return y.astype(x.dtype)


def _eq_fft_blocked(x, params: EQParams, sample_rate, tail: int):
    """Blocked EQ convolution: extract the (truncated) 2x2 impulse
    response from the sampled frequency response and run partitioned
    overlap-save convolution (ops.partitioned_conv MXU pipelines).

    The response grid is 2*tail so circular time-aliasing of the IR is
    below the same eps bound as the truncation itself."""
    from ..utils.dsputil import next_pow2
    from ..ops.partitioned_conv import (partition_spectra,
                                        uniform_partitioned_conv)
    n = x.shape[-1]
    m = next_pow2(2 * tail)
    csize = m // 2 + 1
    cdt = jnp.complex64
    h11, h12, h21, h22 = _band_matrix_response_device(
        params, sample_rate, m, csize, cdt)

    active = band_active_mask(params)
    diag_only = all(int(params.modes[b]) == STEREO
                    for b in range(NUM_BANDS) if active[b])
    p = int(np.clip(next_pow2(max(tail // 4, 1)), 1024, 8192))

    def conv_with(resp, sig):
        ir = jnp.fft.irfft(resp, n=m)[..., :tail].astype(x.dtype)
        H = partition_spectra(ir, p, dtype=x.dtype)
        return uniform_partitioned_conv(sig, H, p)

    xL = x[..., 0, :]
    xR = x[..., 1, :]
    if diag_only:
        # all active bands stereo: h12 = h21 = 0 and h11 == h22 — one
        # response convolves both channels
        y = conv_with(h11, x)
        return y[..., :n]
    yL = conv_with(h11, xL) + conv_with(h12, xR)
    yR = conv_with(h21, xL) + conv_with(h22, xR)
    return jnp.stack([yL, yR], axis=-2)[..., :n]


def eq_process_bands(x, params: EQParams, sample_rate, method: str = "auto"):
    """Run the 20 band filters (no AGC). x: (..., 2, N) stereo, time last.

    method: "scan" (associative-scan cascade, exact reference semantics),
    "fft" (combined-response FFT convolution, linear-path fast mode), or
    "auto" (fft when saturation == 0, scan otherwise).
    """
    if method == "auto":
        method = "scan" if float(params.saturation) > 0.0 else "fft"
        if (method == "fft" and jnp.asarray(x).dtype == jnp.float64
                and jax.default_backend() != "cpu"):
            # dd/f64 mode on an accelerator: no f64 FFT kernel on TPU —
            # the scan cascade is exact reference semantics and runs as
            # f64-emulated matmuls/elementwise ops.
            method = "scan"
    if method == "fft":
        if float(params.saturation) > 0.0:
            raise ValueError("fft EQ path requires saturation == 0")
        return eq_process_bands_fft(x, params, sample_rate)
    x = jnp.asarray(x)
    L = x[..., 0, :]
    R = x[..., 1, :]
    active = band_active_mask(params)
    coeffs = svf_coeffs(params.band_types, params.freqs, params.gains_db,
                        params.qs, sample_rate)
    sat = float(params.saturation)

    if params.structure == SERIAL:
        for b in range(NUM_BANDS):
            if not active[b]:
                continue
            cb = tuple(float(c[b]) for c in coeffs)
            L, R = _band_apply(L, R, cb, int(params.modes[b]), sat)
    else:
        srcL, srcR = L, R
        accL = jnp.zeros_like(L)
        accR = jnp.zeros_like(R)
        for b in range(NUM_BANDS):
            if not active[b]:
                continue
            cb = tuple(float(c[b]) for c in coeffs)
            Lb, Rb = _band_apply(srcL, srcR, cb, int(params.modes[b]), sat)
            accL = accL + (Lb - srcL)
            accR = accR + (Rb - srcR)
        L = srcL + accL
        R = srcR + accR
    return jnp.stack([L, R], axis=-2)


def _agc_gain_target(env_in, env_out):
    """calculateAGCGain (EQProcessor.Processing.cpp:343-360)."""
    ratio = env_in / jnp.maximum(env_out, AGC_MIN_ENV)
    in_dead_zone = (ratio > 1.0 / AGC_DEAD_ZONE_RATIO) & (ratio < AGC_DEAD_ZONE_RATIO)
    target = jnp.clip(ratio, AGC_MIN_GAIN, AGC_MAX_GAIN)
    target = jnp.where(in_dead_zone, 1.0, target)
    return jnp.where(env_out < AGC_MIN_ENV, 1.0, target)


def agc_apply(x_pre, x_post, sample_rate, block_size, state0=None,
              return_state=False):
    """Block-rate AGC over the whole signal (processAGC semantics).

    x_pre:  EQ input (..., 2, N)  -> input RMS envelope source
    x_post: post-band signal (..., 2, N) -> output RMS + gain applied here.
    N must be a multiple of block_size (pad upstream).
    Returns gain-ramped x_post; with return_state=True returns
    (y, final_state) where state is (..., 3) [env_in, env_out, gain] —
    the streaming runtime's carried AGC state (state0 resumes it).
    """
    x_pre = jnp.asarray(x_pre)
    x_post = jnp.asarray(x_post)
    dt = x_post.dtype
    n = x_post.shape[-1]
    nb = n // block_size
    assert nb * block_size == n, "signal length must be a block multiple"

    def block_rms_max(sig):
        blocks = sig[..., :nb * block_size].reshape(
            sig.shape[:-1] + (nb, block_size))
        r = jnp.sqrt(jnp.mean(blocks * blocks, axis=-1))   # (..., 2, nb)
        return jnp.max(r, axis=-2)                          # (..., nb)

    in_rms = jnp.minimum(block_rms_max(x_pre), AGC_MAX_ENV)
    out_rms = jnp.minimum(block_rms_max(x_post), AGC_MAX_ENV)

    # blockAlpha = agc*CoeffTable[numSamples] = 1 - exp(-N/(sr*T))
    # (EQProcessor.Core.cpp:776-778) — host libm for exact parity.
    aA = 1.0 - np.exp(-block_size / (sample_rate * AGC_ATTACK_TIME_SEC))
    aR = 1.0 - np.exp(-block_size / (sample_rate * AGC_RELEASE_TIME_SEC))
    aS = 1.0 - np.exp(-block_size / (sample_rate * AGC_SMOOTH_TIME_SEC))

    def step(carry, rms_b):
        env_in, env_out, gain = carry
        rin, rout = rms_b
        ain = jnp.where(rin > env_in, aA, aR)
        aout = jnp.where(rout > env_out, aA, aR)
        env_in = env_in * (1.0 - ain) + rin * ain
        env_out = env_out * (1.0 - aout) + rout * aout
        env_in = jnp.where(env_in < AGC_DENORM, 0.0, env_in)
        env_out = jnp.where(env_out < AGC_DENORM, 0.0, env_out)
        target = _agc_gain_target(env_in, env_out)
        next_gain = gain * (1.0 - aS) + target * aS
        return (env_in, env_out, next_gain), (gain, next_gain)

    batch = in_rms.shape[:-1]
    if state0 is None:
        init = (jnp.zeros(batch, dt), jnp.zeros(batch, dt),
                jnp.ones(batch, dt))
    else:
        state0 = jnp.asarray(state0, dt)
        init = (state0[..., 0], state0[..., 1], state0[..., 2])
    rms_seq = (jnp.moveaxis(in_rms, -1, 0), jnp.moveaxis(out_rms, -1, 0))
    carry, (g0, g1) = jax.lax.scan(step, init, rms_seq)    # (nb, ...)
    g0 = jnp.moveaxis(g0, 0, -1)                            # (..., nb)
    g1 = jnp.moveaxis(g1, 0, -1)

    # Per-sample ramp: gain_n = g0 + n * (g1-g0)/block_size (applyGainRamp)
    ramp = (jnp.arange(block_size, dtype=dt) / block_size)
    gains = g0[..., None] + (g1 - g0)[..., None] * ramp     # (..., nb, bs)
    gains = gains.reshape(gains.shape[:-2] + (n,))[..., None, :]  # (...,1,N)
    y = x_post * gains
    if return_state:
        return y, jnp.stack(carry, axis=-1)
    return y


def eq_process(x, params: EQParams, sample_rate, block_size=512,
               method: str = "scan"):
    """Full EQ: bands + optional AGC.  x: (..., 2, N), time on last axis.

    With AGC disabled the result is block-size-invariant (linear state
    threading); with AGC enabled `block_size` reproduces the reference's
    callback-block-rate envelope updates.
    """
    y = eq_process_bands(x, params, sample_rate, method=method)
    if params.agc_enabled:
        y = agc_apply(x, y, sample_rate, block_size)
    return y
