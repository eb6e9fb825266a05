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
    # overlap-save input frame = [prev | cur]
    prev = jnp.concatenate(
        [jnp.zeros(frames.shape[:-2] + (1, p), x.dtype), frames[..., :-1, :]],
        axis=-2)
    osa = jnp.concatenate([prev, frames], axis=-1)        # (..., K, 2P)
    X = jnp.fft.rfft(osa, axis=-1)                        # (..., K, P+1)
    H = jnp.asarray(Hparts)
    if frame_mac == "auto":
        # CPU always takes the frame-FFT form: XLA CPU's Eigen conv kernel
        # has an OOB-read bug that segfaults inside large fused graphs.
        # On TPU the depthwise-conv MAC measures faster at every layer
        # size (no pow2 frame padding) — see PROGRESS notes.
        frame_mac = "fft" if jax.default_backend() == "cpu" else "conv"
    if frame_mac == "fft":
        Y = _causal_frame_mac_fft(X, H)
    else:
        Y = _causal_frame_mac(X, H)
    y = jnp.fft.irfft(Y, n=2 * p, axis=-1)[..., p:]       # valid half
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
