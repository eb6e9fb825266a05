"""Partitioned overlap-save FFT convolution — uniform layer primitive.

TPU-native rebuild of the reference's frequency-domain-delay-line (FDL)
convolution (ref: src/MKLNonUniformConvolver.cpp:1245-1336 processLayerBlock):
50%-overlap-save frames of size P with 2P-point real FFTs, partition spectra
H_p, and the per-frame MAC  Y_k = sum_p X_{k-p} * H_p.

Instead of a per-callback sequential FDL ring, the offline/batch form
computes ALL frame FFTs at once (one batched rfft), evaluates the causal
MAC over the frame axis as a depthwise convolution (complex multiply via
4 real convs), and runs one batched inverse rfft — embarrassingly parallel
over frames, bins, channels, and streams.  A streaming single-frame step
(`PartitionedStreamState`) provides the block-at-a-time path for serving.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def partition_spectra(h, part_size: int, num_parts: int | None = None,
                      dtype=jnp.float64):
    """Partition an impulse response and FFT each zero-padded partition.

    Mirrors SetImpulse's per-partition precompute
    (MKLNonUniformConvolver.cpp:905-955): partition p covers
    h[p*P : (p+1)*P], zero-padded to 2P, real FFT -> (num_parts, P+1).
    """
    h = jnp.asarray(h, dtype)
    n = h.shape[-1]
    p = part_size
    nparts = -(-n // p) if num_parts is None else num_parts
    pad = nparts * p - n
    if pad:
        h = jnp.pad(h, [(0, 0)] * (h.ndim - 1) + [(0, pad)])
    parts = h.reshape(h.shape[:-1] + (nparts, p))
    parts = jnp.pad(parts, [(0, 0)] * (h.ndim - 1) + [(0, 0), (0, p)])
    if (dtype == jnp.float64 and not isinstance(parts, jax.core.Tracer)
            and jax.default_backend() != "cpu"):
        # dd/f64 prep on an accelerator: XLA:TPU has neither an f64 FFT
        # kernel nor complex128 arrays AT ALL (device_put of c128 fails) —
        # IR preparation is a host-side one-off, so run the exact f64 FFT
        # in NumPy and ship SPLIT re/im f64 planes to the device.  The
        # split-tuple representation flows through uniform_partitioned_conv
        # and the spectrum-gain multiplies.
        import numpy as np
        H = np.fft.rfft(np.asarray(parts), axis=-1)
        return (jnp.asarray(H.real), jnp.asarray(H.imag))
    return jnp.fft.rfft(parts, axis=-1)


def _causal_frame_mac(X, H):
    """Y[..., k, b] = sum_p X[..., k-p, b] * H[p, b]  (zero for k-p < 0).

    X: (..., K, B) complex frames; H: (P, B) complex partition spectra.
    Causal convolution along the frame axis, depthwise over bins, done as
    4 real depthwise convolutions (complex multiply).
    """
    K = X.shape[-2]
    P = H.shape[0]
    nbins = H.shape[1]
    batch = X.shape[:-2]

    # conv_general_dilated: feature_group_count = bins (depthwise over bins)
    # lhs: (N, C=bins, W=K), rhs: (bins, 1, P) with flipped kernel for conv.
    def dconv(x, h):
        lhs = jnp.moveaxis(x, -1, -2).reshape((-1, nbins, K))
        rhs = h.T[:, None, :]                      # (bins, 1, P)
        out = jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=(1,),
            padding=[(P - 1, 0)],                  # causal
            feature_group_count=nbins,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out.reshape(batch + (nbins, K)), -2, -1)

    Xr, Xi = jnp.real(X), jnp.imag(X)
    Hr, Hi = jnp.real(H), jnp.imag(H)
    # conv flips the kernel; we want correlation-with-delay => flip H first
    Hr = Hr[::-1]
    Hi = Hi[::-1]
    Yr = dconv(Xr, Hr) - dconv(Xi, Hi)
    Yi = dconv(Xr, Hi) + dconv(Xi, Hr)
    return jax.lax.complex(Yr, Yi)


# GEMM precision for the real-DFT/MAC pipeline.  Measured on v5e at the
# 4x-oversampled shape: HIGHEST 3.0e-7 rel err / 91 ms; HIGH 2.7e-5 /
# 77 ms; DEFAULT 3.8e-3 / 57 ms.  HIGHEST is the default — the 15% win
# from HIGH is not worth 100x the error; f64 (CPU tests) is unaffected.
RDFT_GEMM_PRECISION = jax.lax.Precision.HIGHEST

_RDFT_MAT_CACHE: dict = {}


def _rdft_mats(p: int, dtype):
    """Host-built real-DFT GEMM operands for frame size 2p.

    Forward: X = osa @ (Ct + i St), Ct/St (2p, p+1).
    Inverse (valid half only): y[p + n] = Yr @ Gr + Yi @ Gi, Gr/Gi
    (p+1, p) — the standard irfft synthesis restricted to the second half
    of the frame (overlap-save discards the first half, so computing it
    would be wasted MXU work).
    """
    import numpy as np
    key = p
    mats = _RDFT_MAT_CACHE.get(key)
    if mats is None:
        n2 = 2 * p
        k = np.arange(n2)[:, None]
        b = np.arange(p + 1)[None, :]
        ang = -2.0 * np.pi * k * b / n2
        Ct = np.cos(ang)
        St = np.sin(ang)
        w = np.full(p + 1, 2.0 / n2)
        w[0] = 1.0 / n2
        w[-1] = 1.0 / n2
        nn = (np.arange(p) + p)[None, :]
        bang = 2.0 * np.pi * b.T * nn / n2           # (p+1, p)
        Gr = np.cos(bang) * w[:, None]
        Gi = -np.sin(bang) * w[:, None]
        mats = (Ct, St, Gr, Gi)                      # host np: jit-safe cache
        _RDFT_MAT_CACHE[key] = mats
    return tuple(jnp.asarray(m, dtype) for m in mats)


def _rfft_matmul(osa, p: int):
    """rfft of (..., 2p) frames as two GEMMs (MXU path)."""
    Ct, St, _, _ = _rdft_mats(p, osa.dtype)
    hi = RDFT_GEMM_PRECISION
    return (jnp.matmul(osa, Ct, precision=hi),
            jnp.matmul(osa, St, precision=hi))


def _rfft_matmul_frames(xp, p: int):
    """rfft of overlap-save frames WITHOUT materializing the (..., K, 2p)
    [prev|cur] tensor: X_k = prev_k @ Ct[:p] + cur_k @ Ct[p:].

    The concatenates that build the osa tensor lower to strided HBM
    copies that cost ~25x the GEMMs themselves at small p (measured
    23.8 ms vs 0.9 ms for the 4x-oversampled config3 shape on v5e);
    splitting the DFT matrix instead reads the signal twice through the
    MXU at identical total FLOPs.  prev frames are a flat pad/shift of
    the signal (one contiguous copy).

    xp: (..., K*p) frame-aligned signal (already zero-padded).
    Returns (Xr, Xi): (..., K, p+1).
    """
    Ct, St, _, _ = _rdft_mats(p, xp.dtype)
    k = xp.shape[-1] // p
    cur = xp.reshape(xp.shape[:-1] + (k, p))
    xsh = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(p, 0)])[..., :-p]
    prev = xsh.reshape(xsh.shape[:-1] + (k, p))
    hi = RDFT_GEMM_PRECISION
    Xr = (jnp.matmul(prev, Ct[:p], precision=hi)
          + jnp.matmul(cur, Ct[p:], precision=hi))
    Xi = (jnp.matmul(prev, St[:p], precision=hi)
          + jnp.matmul(cur, St[p:], precision=hi))
    return Xr, Xi


def _irfft_valid_matmul(Yr, Yi, p: int):
    """Valid (second) half of irfft(Y, n=2p) as two GEMMs."""
    _, _, Gr, Gi = _rdft_mats(p, Yr.dtype)
    hi = RDFT_GEMM_PRECISION
    return (jnp.matmul(Yr, Gr, precision=hi)
            + jnp.matmul(Yi, Gi, precision=hi))


# Largest partition size routed through the GEMM DFT on TPU: flops grow
# like p^2 per frame (vs p log p for FFT) and the synthesis matrices grow
# like p^2 in memory, so big tail partitions stay on the FFT.
RDFT_MATMUL_MAX_P = 1024


def _pallas_fft_enabled() -> bool:
    """Fused Pallas transforms for large partitions on TPU (opt-out via
    CONVOPEQ_PALLAS_FFT=0)."""
    import os
    if os.environ.get("CONVOPEQ_PALLAS_FFT", "1") == "0":
        return False
    # accelerator backends here are TPU-family ("tpu" or the tunneled
    # "axon"); the CPU case is already routed to the frame-FFT form
    return jax.default_backend() != "cpu"


def _mac_matmul_ri(Xr, Xi, Hr, Hi, chunk: int = 128):
    """Split-real banded block-Toeplitz GEMM frame MAC: with chunk >= P
    the causal band spans at most two frame-chunks, so per bin
    Y_chunk = X_chunk @ T0^T + X_prevchunk @ T1^T with
    T0[b, i, j] = H[i-j, b], T1[b, i, j] = H[i-j+chunk, b].  The GEMMs
    run on the MXU; the grouped-conv form lowers to per-bin loops.

    Xr/Xi: (..., K, B); Hr/Hi: (P, B).  Returns (Yr, Yi) (..., K, B).
    """
    import numpy as np
    K = Xr.shape[-2]
    P = Hr.shape[0]
    B = Hr.shape[1]
    batch = Xr.shape[:-2]
    chunk = max(chunk, 1 << int(np.ceil(np.log2(max(P, 2)))))
    nc = -(-K // chunk)
    kpad = nc * chunk - K

    def prep(x):                                # (..., K, B) -> (F, B, nc, c)
        x = jnp.moveaxis(x, -1, -2)             # (..., B, K)
        if kpad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, kpad)])
        return x.reshape((-1, B, nc, chunk))

    Xr = prep(Xr)
    Xi = prep(Xi)
    zeros = jnp.zeros(Xr.shape[:-2] + (1, chunk), Xr.dtype)
    Xr_p = jnp.concatenate([zeros, Xr[..., :-1, :]], axis=-2)
    Xi_p = jnp.concatenate([zeros, Xi[..., :-1, :]], axis=-2)

    d = np.subtract.outer(np.arange(chunk), np.arange(chunk))
    idx0 = jnp.asarray(np.clip(d, 0, P - 1))
    m0 = jnp.asarray((d >= 0) & (d < P), Xr.dtype)
    dp = d + chunk
    idx1 = jnp.asarray(np.clip(dp, 0, P - 1))
    m1 = jnp.asarray((dp >= 0) & (dp < P), Xr.dtype)
    Hr = jnp.asarray(Hr, Xr.dtype)
    Hi = jnp.asarray(Hi, Xr.dtype)
    # T[b, i, j]: take along the partition axis, bins batched
    t = lambda Ha, idx, m: jnp.moveaxis(jnp.take(Ha, idx, axis=0)
                                        * m[..., None], -1, 0)
    T0r, T0i = t(Hr, idx0, m0), t(Hi, idx0, m0)
    T1r, T1i = t(Hr, idx1, m1), t(Hi, idx1, m1)

    hi = RDFT_GEMM_PRECISION
    mm = lambda x, T: jnp.einsum("fbnj,bij->fbni", x, T, precision=hi)
    Yr = mm(Xr, T0r) - mm(Xi, T0i) + mm(Xr_p, T1r) - mm(Xi_p, T1i)
    Yi = mm(Xr, T0i) + mm(Xi, T0r) + mm(Xr_p, T1i) + mm(Xi_p, T1r)

    def unprep(y):                              # (F, B, nc, c) -> (..., K, B)
        y = y.reshape((-1, B, nc * chunk))[..., :K]
        return jnp.moveaxis(y, -2, -1).reshape(batch + (K, B))

    return unprep(Yr), unprep(Yi)


def _causal_frame_mac_matmul(X, H, chunk: int = 128):
    """Complex wrapper over `_mac_matmul_ri` (same contract as
    `_causal_frame_mac`)."""
    Yr, Yi = _mac_matmul_ri(jnp.real(X), jnp.imag(X),
                            jnp.real(H), jnp.imag(H), chunk)
    return jax.lax.complex(Yr, Yi)


def _mac_shift_ri(Xr, Xi, Hr, Hi):
    """Split-real causal frame MAC by explicit partition shifts:
    Y[k] = sum_p X[k-p] * H[p] as P shifted elementwise multiply-adds
    (complex-free — the dd/f64 TPU path, where c128 does not exist).
    Xr/Xi: (..., K, B); Hr/Hi: (P, B)."""
    P = Hr.shape[0]
    acc_r = Xr * Hr[0] - Xi * Hi[0]
    acc_i = Xr * Hi[0] + Xi * Hr[0]
    pad = [(0, 0)] * (Xr.ndim - 2)
    for p in range(1, P):
        Xr_s = jnp.pad(Xr, pad + [(p, 0), (0, 0)])[..., :-p, :]
        Xi_s = jnp.pad(Xi, pad + [(p, 0), (0, 0)])[..., :-p, :]
        acc_r = acc_r + Xr_s * Hr[p] - Xi_s * Hi[p]
        acc_i = acc_i + Xr_s * Hi[p] + Xi_s * Hr[p]
    return acc_r, acc_i


def _causal_frame_mac_fft(X, H):
    """Same contract as `_causal_frame_mac`, via FFT along the frame axis.

    Zero-pads frames to K+P-1 (next pow2), multiplies spectra, inverse FFT,
    truncates — exact linear (causal) convolution over the frame index.
    Preferred on TPU: one batched c64 FFT instead of a grouped conv.
    """
    K = X.shape[-2]
    P = H.shape[0]
    L = 1
    while L < K + P - 1:
        L *= 2
    Xf = jnp.fft.fft(X, n=L, axis=-2)
    Hf = jnp.fft.fft(jnp.asarray(H), n=L, axis=-2 if H.ndim > 1 else 0)
    Y = jnp.fft.ifft(Xf * Hf, axis=-2)[..., :K, :]
    return Y.astype(X.dtype)


def uniform_partitioned_conv(x, Hparts, part_size: int, frame_mac="auto"):
    """Overlap-save partitioned convolution of x with precomputed spectra.

    x: (..., N) real signal, time last.
    Hparts: (P, part_size+1) complex partition spectra from
      `partition_spectra` (optionally spectrally filtered — the reference
      applies HC/LC and air-absorption gains directly to these spectra,
      MKLNonUniformConvolver.cpp:336-440, which is circular per-partition
      filtering; operating on the spectra reproduces that exactly).

    Returns y: (..., N) — frames k cover [k*P,(k+1)*P); equals linear
    convolution x*h truncated to N when Hparts are unfiltered.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    p = part_size
    k = -(-n // p)
    pad = k * p - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
    frames = xp.reshape(x.shape[:-1] + (k, p))

    def build_osa():
        # overlap-save input frame = [prev | cur]; the Pallas forward
        # builds this in VMEM instead (carried prev), so it is lazy here
        prev = jnp.concatenate(
            [jnp.zeros(frames.shape[:-2] + (1, p), x.dtype),
             frames[..., :-1, :]], axis=-2)
        return jnp.concatenate([prev, frames], axis=-1)   # (..., K, 2P)
    if isinstance(Hparts, tuple):
        # split re/im spectra (the dd/f64 accelerator mode: no complex128
        # on TPU) — all-GEMM/elementwise, complex-free pipeline
        Hr, Hi = Hparts
        # fused dd Pallas pipeline (double-f32 planes, Ozaki-sliced
        # MXU GEMM stages + dd phase-copy MAC in VMEM): measured
        # ~1.4e-11 conv RMS vs f64 — the path that takes the <=1e-9
        # fidelity mode past the >=1000x RTF bar (the all-XLA form
        # below is bounded by HBM-materialized slice products).
        # Tried for EVERY partition size (round 4): the nuc3 staged
        # layers run small partitions (512/4096) whose all-XLA f64
        # emulation was the dd-unfused wall; dd_pipeline_supported
        # gates the shapes the kernels can hold in VMEM.
        from .pallas_dd_fft import (dd_pallas_enabled,
                                    dd_pipeline_supported,
                                    uniform_partitioned_conv_dd)
        if dd_pallas_enabled() and dd_pipeline_supported(
                p, n, Hr.shape[0]):
            return uniform_partitioned_conv_dd(x, Hr, Hi, p)
        if p <= RDFT_MATMUL_MAX_P:
            Xr, Xi = _rfft_matmul_frames(xp, p)
            Yr, Yi = _mac_matmul_ri(Xr, Xi, Hr, Hi)
            y = _irfft_valid_matmul(Yr, Yi, p)
        else:
            from .gemm_fft import rfft_gemm, irfft_valid_gemm
            Xr, Xi = rfft_gemm(build_osa(), p)
            Yr, Yi = _mac_shift_ri(Xr, Xi, Hr, Hi)
            y = irfft_valid_gemm(Yr, Yi, p)
        y = y.reshape(x.shape[:-1] + (k * p,))
        return y[..., :n]
    H = jnp.asarray(Hparts)
    if frame_mac == "auto":
        # CPU always takes the frame-FFT form: XLA CPU's Eigen conv kernel
        # has an OOB-read bug that segfaults inside large fused graphs.
        # On TPU small partitions go through the full-GEMM pipeline (real
        # DFT + banded-Toeplitz MAC + valid-half synthesis, all MXU — the
        # VPU FFT is the bottleneck at these sizes); large tail partitions
        # keep the FFT + GEMM MAC.
        from .pallas_gemm_fft import pallas_xform_supported
        if jax.default_backend() == "cpu":
            frame_mac = "fft"
        elif p <= RDFT_MATMUL_MAX_P:
            frame_mac = "rdft"
        elif _pallas_fft_enabled() and pallas_xform_supported(p):
            # tail partitions: fused two-stage Pallas transforms — both
            # GEMM stages + twiddle stay in VMEM, one HBM read/write per
            # frame vs the XLA pipeline's materialized intermediates
            # (measured the dominant cost of the single-layer headline)
            frame_mac = "pallas"
        else:
            # tail partitions: two-stage (Cooley-Tukey) GEMM transforms —
            # the direct DFT's O(p^2) matrices don't scale, and the VPU
            # FFT pair costs ~3x the frame MAC at these sizes.  The GEMM
            # MAC's Toeplitz operands also scale with bins*chunk^2, so the
            # MAC stays on the depthwise conv (few frames).
            frame_mac = "gemmfft"
    if frame_mac == "pallas":
        import os
        from .pallas_gemm_fft import (rfft_frames_two_stage_pallas,
                                      rfft_two_stage_pallas,
                                      irfft_valid_two_stage_pallas,
                                      causal_mac_grid_pallas,
                                      causal_mac_grid_supported,
                                      grid_bins,
                                      spectra_to_grid)
        # the Pallas kernels tile the frame axis in 8s (Mosaic sublane
        # constraint); pad K up with zero frames — causality makes the
        # kept rows exact, and the tail is trimmed to n below anyway
        kpad8 = (-k) % 8
        if kpad8:
            frames = jnp.pad(
                frames, [(0, 0)] * (frames.ndim - 2) + [(0, kpad8), (0, 0)])
        from .pallas_gemm_fft import (fused_conv_supported,
                                      fused_conv_frames_pallas,
                                      spectra_to_grid)
        if fused_conv_supported(p, H.shape[0]) and \
                os.environ.get("CONVOPEQ_PALLAS_FUSED", "1") != "0":
            # P <= 8: the fully-fused fwd+MAC+inv kernel — X/Y stage
            # grids never touch HBM (see pallas_gemm_fft fused block)
            Gr, Gi = spectra_to_grid(jnp.real(H), jnp.imag(H), p)
            y = fused_conv_frames_pallas(frames, Gr, Gi, p)
            if kpad8:
                y = y[..., :k, :]
            y = y.reshape(x.shape[:-1] + (k * p,))
            return y[..., :n]
        if os.environ.get("CONVOPEQ_PALLAS_FRAMES_FWD", "1") != "0":
            # raw frames in: the overlap-save prev half is carried in
            # VMEM scratch by the kernel — no materialized 2p osa tensor
            Xr, Xi = rfft_frames_two_stage_pallas(frames, p)
        else:
            # build_osa() closes over the (already padded) frames
            Xr, Xi = rfft_two_stage_pallas(build_osa(), p)
        Gr, Gi = spectra_to_grid(jnp.real(H), jnp.imag(H), p)
        mac_ok = causal_mac_grid_supported(
            k + kpad8, grid_bins(p)[2], H.shape[0])
        if mac_ok and os.environ.get("CONVOPEQ_PALLAS_MAC", "1") != "0":
            # phase-copy MAC kernel: one HBM read of X + one Y write and
            # no complex materialization (the grouped-conv form costs two
            # extra full passes just building complex X/H)
            Yr, Yi = causal_mac_grid_pallas(Xr, Xi, Gr, Gi, p)
        else:
            Y = _causal_frame_mac(jax.lax.complex(Xr, Xi),
                                  jax.lax.complex(Gr, Gi))
            Yr, Yi = jnp.real(Y), jnp.imag(Y)
        y = irfft_valid_two_stage_pallas(Yr, Yi, p)
        if kpad8:
            y = y[..., :k, :]                    # drop the pad frames
    elif frame_mac == "rdft":
        Xr, Xi = _rfft_matmul_frames(xp, p)
        Yr, Yi = _mac_matmul_ri(Xr, Xi, jnp.real(H), jnp.imag(H))
        y = _irfft_valid_matmul(Yr, Yi, p)
    elif frame_mac == "gemmfft":
        from .gemm_fft import rfft_gemm, irfft_valid_gemm
        Xr, Xi = rfft_gemm(build_osa(), p)
        Y = _causal_frame_mac(jax.lax.complex(Xr, Xi), H)
        y = irfft_valid_gemm(jnp.real(Y), jnp.imag(Y), p)
    else:
        X = jnp.fft.rfft(build_osa(), axis=-1)            # (..., K, P+1)
        if frame_mac == "fft":
            Y = _causal_frame_mac_fft(X, H)
        elif frame_mac == "matmul":
            Y = _causal_frame_mac_matmul(X, H)
        else:
            Y = _causal_frame_mac(X, H)
        y = jnp.fft.irfft(Y, n=2 * p, axis=-1)[..., p:]   # valid half
    y = y.reshape(x.shape[:-1] + (k * p,))
    return y[..., :n]


@dataclass
class PartitionedStreamState:
    """Carry for the streaming one-frame-per-step path (serving mode).

    fdl:  (..., P, bins) complex — newest frame spectrum at index 0.
    prev: (..., part_size) — previous input frame (overlap-save left half).
    """
    fdl: jnp.ndarray
    prev: jnp.ndarray

    @staticmethod
    def init(batch_shape, num_parts, part_size, cdtype=jnp.complex128,
             rdtype=jnp.float64):
        return PartitionedStreamState(
            fdl=jnp.zeros(batch_shape + (num_parts, part_size + 1), cdtype),
            prev=jnp.zeros(batch_shape + (part_size,), rdtype),
        )


def partitioned_conv_step(state: PartitionedStreamState, frame, Hparts):
    """One streaming overlap-save step (the Add/processLayerBlock analog).

    frame: (..., P) new input frame.  Returns (new_state, y_frame).
    """
    p = frame.shape[-1]
    osa = jnp.concatenate([state.prev, frame], axis=-1)
    X = jnp.fft.rfft(osa, axis=-1)                        # (..., P+1)
    fdl = jnp.concatenate([X[..., None, :], state.fdl[..., :-1, :]], axis=-2)
    Y = jnp.sum(fdl * jnp.asarray(Hparts), axis=-2)
    y = jnp.fft.irfft(Y, n=2 * p, axis=-1)[..., p:]
    return PartitionedStreamState(fdl=fdl, prev=frame), y
