"""Partitioned convolution: JAX batched form vs NumPy FDL simulator and
direct convolution."""
import numpy as np
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops.partitioned_conv import (
    partition_spectra, uniform_partitioned_conv,
    PartitionedStreamState, partitioned_conv_step,
)
from convopeq_tpu.models.nuc import (
    FilterSpec, NUCState, nuc_prepare, nuc_convolve, plan_layers,
    spectrum_filter_gain, air_absorption_gain,
    TAIL_AIR_ABSORPTION, TAIL_CONTOUR, TAIL_BYPASS,
)

RNG = np.random.default_rng(11)


def fdl_golden(x, h, part_size, gain_curve=None):
    """NumPy blockwise overlap-save FDL — mirrors processLayerBlock
    (frame loop with frequency-domain partition MAC)."""
    P = part_size
    nparts = -(-len(h) // P)
    hp = np.zeros((nparts, 2 * P))
    for p in range(nparts):
        seg = h[p * P:(p + 1) * P]
        hp[p, :len(seg)] = seg
    H = np.fft.rfft(hp, axis=-1)
    if gain_curve is not None:
        H = H * gain_curve

    n = len(x)
    K = -(-n // P)
    xp = np.zeros(K * P)
    xp[:n] = x
    fdl = np.zeros((nparts, P + 1), complex)
    prev = np.zeros(P)
    out = np.zeros(K * P)
    for k in range(K):
        cur = xp[k * P:(k + 1) * P]
        X = np.fft.rfft(np.concatenate([prev, cur]))
        prev = cur
        fdl = np.roll(fdl, 1, axis=0)
        fdl[0] = X
        Y = np.sum(fdl * H, axis=0)
        out[k * P:(k + 1) * P] = np.fft.irfft(Y)[P:]
    return out[:n]


def test_uniform_partitioned_conv_matches_direct():
    x = RNG.normal(size=3000)
    h = RNG.normal(size=900) * np.exp(-np.arange(900) / 200)
    P = 256
    H = partition_spectra(h, P)
    y = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P))
    ref = np.convolve(x, h)[:3000]
    err = np.sqrt(np.mean((y - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-13, err


def test_uniform_partitioned_conv_matches_fdl_golden():
    x = RNG.normal(size=2048)
    h = RNG.normal(size=700)
    P = 128
    H = partition_spectra(h, P)
    y = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P))
    ref = fdl_golden(x, h, P)
    np.testing.assert_allclose(y, ref, atol=1e-10)


def test_streaming_step_matches_batch():
    x = RNG.normal(size=1024)
    h = RNG.normal(size=500)
    P = 128
    H = partition_spectra(h, P)
    batch = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P))
    st = PartitionedStreamState.init((), H.shape[0], P)
    outs = []
    for k in range(1024 // P):
        st, y = partitioned_conv_step(st, jnp.asarray(x[k * P:(k + 1) * P]), H)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), batch, atol=1e-11)


def test_batched_streams_conv():
    x = RNG.normal(size=(2, 3, 1500))
    h = RNG.normal(size=400)
    P = 128
    H = partition_spectra(h, P)
    y = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P))
    for i in range(2):
        for j in range(3):
            ref = np.convolve(x[i, j], h)[:1500]
            np.testing.assert_allclose(y[i, j], ref, atol=1e-11)


def test_plan_layers_sizing_contract():
    # 1M-tap IR @48k, block 512, default contour mode:
    # L0 part 512, span = clamp(round(0.12*48000)=5760, 512, 16384) = 5760
    # L1 part 4096, span = min(rest, 64*4096)
    # L2 part 32768, rest
    plan = plan_layers(1_000_000, 512, FilterSpec())
    assert [l.part_size for l in plan.layers] == [512, 4096, 32768]
    assert plan.layers[0].length == 5760
    assert plan.layers[1].length == 64 * 4096
    assert plan.layers[2].length == 1_000_000 - 5760 - 64 * 4096
    assert plan.layers[1].offset == 5760
    assert plan.layers[2].offset == 5760 + 64 * 4096
    assert plan.latency == 512

    # tail bypass: only L0, IR truncated to 32 parts
    plan2 = plan_layers(1_000_000, 512, FilterSpec(tail_mode=TAIL_BYPASS))
    assert len(plan2.layers) == 1
    assert plan2.layers[0].length == 32 * 512

    # short IR fits in L0 alone
    plan3 = plan_layers(4000, 512, FilterSpec())
    assert [l.part_size for l in plan3.layers] == [512]


def test_nuc_convolve_no_filter_matches_direct():
    """Contour mode with neutral gains: layer gains are not 1.0 in contour
    mode, so emulate with golden using per-layer gain+offset."""
    sr = 48000.0
    x = RNG.normal(size=30000)
    h = RNG.normal(size=20000) * np.exp(-np.arange(20000) / 5000)
    spec = FilterSpec(sample_rate=sr, tail_mode=TAIL_CONTOUR)
    state = nuc_prepare(jnp.asarray(h), 512, spec, apply_spectrum_filter=False)
    y = np.asarray(nuc_convolve(jnp.asarray(x), state))

    ref = np.zeros_like(x)
    for lp in state.plan.layers:
        seg = h[lp.offset:lp.offset + lp.length]
        contrib = np.convolve(x, seg)[:len(x)]
        delayed = np.zeros_like(x)
        delayed[lp.offset:] = contrib[:len(x) - lp.offset]
        ref += lp.gain * delayed
    err = np.sqrt(np.mean((y - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-12, err


def test_nuc_direct_head():
    x = RNG.normal(size=5000)
    h = RNG.normal(size=3000)
    spec = FilterSpec()
    state = nuc_prepare(jnp.asarray(h), 512, spec, enable_direct_head=True,
                        apply_spectrum_filter=False)
    assert state.plan.direct_taps == 32
    y = np.asarray(nuc_convolve(jnp.asarray(x), state))
    # head contributes at zero delay; FFT path covers taps 32.. at offsets
    head = np.convolve(x, h[:32])[:5000]
    h_rest = h.copy()
    h_rest[:32] = 0.0
    ref = head.copy()
    for lp in state.plan.layers:
        seg = h_rest[lp.offset:lp.offset + lp.length]
        contrib = np.convolve(x, seg)[:len(x)]
        delayed = np.zeros_like(x)
        delayed[lp.offset:] = contrib[:len(x) - lp.offset]
        ref += lp.gain * delayed
    np.testing.assert_allclose(y, ref, atol=1e-9)


def test_nuc_spectrum_filter_matches_golden_fdl():
    """HC/LC filtered spectra: circular per-partition filtering must match
    the golden FDL simulator using the same gain curve."""
    sr = 48000.0
    x = RNG.normal(size=4096)
    h = RNG.normal(size=1500)
    spec = FilterSpec(sample_rate=sr, tail_mode=TAIL_BYPASS)
    state = nuc_prepare(jnp.asarray(h), 512, spec, apply_spectrum_filter=True)
    y = np.asarray(nuc_convolve(jnp.asarray(x), state))

    lp = state.plan.layers[0]
    gain = spectrum_filter_gain(2 * lp.part_size, spec)
    seg = h[:lp.length]
    ref = fdl_golden(x, seg, lp.part_size, gain_curve=gain)
    np.testing.assert_allclose(y, ref, atol=1e-10)


def test_air_absorption_damping_applied():
    sr = 48000.0
    x = RNG.normal(size=60000)
    h = RNG.normal(size=50000)
    spec = FilterSpec(sample_rate=sr, tail_mode=TAIL_AIR_ABSORPTION,
                      tail_start_seconds=0.085, tail_strength=1.0)
    state = nuc_prepare(jnp.asarray(h), 512, spec, apply_spectrum_filter=False)
    y = np.asarray(nuc_convolve(jnp.asarray(x), state))

    ref = np.zeros_like(x)
    for li, lp in enumerate(state.plan.layers):
        seg = h[lp.offset:lp.offset + lp.length]
        gain = np.ones(lp.part_size + 1)
        if lp.damping is not None:
            gain = gain * air_absorption_gain(2 * lp.part_size, lp.damping)
        contrib = fdl_golden(x, seg, lp.part_size, gain_curve=gain)
        delayed = np.zeros_like(x)
        delayed[lp.offset:] = contrib[:len(x) - lp.offset]
        ref += lp.gain * delayed
    err = np.sqrt(np.mean((y - ref) ** 2)) / max(np.sqrt(np.mean(ref ** 2)), 1e-30)
    assert err < 1e-11, err


def test_frame_mac_fft_matches_conv():
    x = RNG.normal(size=5000)
    h = RNG.normal(size=2000)
    P = 128
    H = partition_spectra(h, P)
    y_conv = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P,
                                                 frame_mac="conv"))
    y_fft = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, P,
                                                frame_mac="fft"))
    np.testing.assert_allclose(y_fft, y_conv, atol=1e-10)


def test_frame_mac_rdft_matches_fft():
    """The all-GEMM pipeline (real-DFT + banded-Toeplitz MAC + valid-half
    synthesis) equals the FFT pipeline and the direct convolution."""
    rng = np.random.default_rng(23)
    for n, p, hl in [(10000, 512, 8192), (4096, 256, 300), (700, 64, 100)]:
        x = rng.normal(size=(2, n))
        h = rng.normal(size=hl) * 0.1
        H = partition_spectra(jnp.asarray(h), p)
        for mode in ("rdft", "matmul", "gemmfft"):
            y = np.asarray(uniform_partitioned_conv(jnp.asarray(x), H, p,
                                                    frame_mac=mode))
            ref = np.stack([np.convolve(x[c], h)[:n] for c in range(2)])
            np.testing.assert_allclose(y, ref, atol=1e-10, err_msg=mode)
