"""Pallas FDL-MAC kernel vs reference reduction (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops import pallas_kernels as pk

pytestmark = pytest.mark.skipif(not pk.HAVE_PALLAS,
                                reason="pallas unavailable")
RNG = np.random.default_rng(71)


def test_error_feedback_quantize_matches_scan():
    """The Pallas sequential quantizer is bit-compatible with the lax.scan
    reference kernels (same op order, same rounding) — verified here in
    interpret mode; the TPU path is exercised by bench config6."""
    from convopeq_tpu.models.dither import (
        psycho_dither, fixed_shaper_dither, psycho_coeffs, quant_scales,
        FIXED15_DEFAULT)
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM
    r, n = 3, 700
    x = (RNG.normal(size=(r, n)) * 0.4).astype(np.float32)
    u = RNG.random(size=(r, n, 2)).astype(np.float32)
    scale, _ = quant_scales(16)

    qp = pk.error_feedback_quantize(
        jnp.asarray(x), jnp.asarray(u), psycho_coeffs(48000.0, 16), scale,
        K_OUTPUT_HEADROOM, mode="psycho", chunk=256, interpret=True)
    ref = psycho_dither(jnp.asarray(x), jnp.asarray(u), 48000.0, 16)
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(ref))

    qf = pk.error_feedback_quantize(
        jnp.asarray(x), jnp.asarray(u), FIXED15_DEFAULT, scale,
        K_OUTPUT_HEADROOM, mode="fixed", chunk=256, interpret=True)
    reff = fixed_shaper_dither(jnp.asarray(x), jnp.asarray(u),
                               FIXED15_DEFAULT, 16)
    np.testing.assert_array_equal(np.asarray(qf), np.asarray(reff))


def test_error_feedback_quantize_lattice_matches_scan():
    """Lattice mode (the adaptive 9th-order shaper, bench config6's
    384 kHz path) against the lax.scan ladder kernel.

    The full f32 sequence is NOT bitwise-stable across the two program
    structures on XLA:CPU: the ladder recurrence (nf = fwd + k*s,
    nb = k*fwd + s) gets FMA-contracted differently in the scan body vs
    the interpreted kernel, and a 1-ULP tmp difference at a rounding
    boundary flips a quantize decision which the (marginally stable,
    |k| up to 0.85) ladder then amplifies chaotically.  On TPU both
    lower identically and agree bitwise (verified on-chip; bench config6
    self-checks it).  The CPU contract here is therefore:
      (a) f64 full sequence, bitwise — validates op order, quantize
          semantics and the chunk-boundary state carry (chunk=256 < N,
          so the VMEM scratch handoff is exercised); at 2^-53 relative
          FMA noise a rounding flip is probabilistically nil;
      (b) f32 single-step, bitwise, over a large batch of random ladder
          states incl. the ±2.0 clamp region — validates the arithmetic
          at the production dtype.
    """
    from convopeq_tpu.models.dither import (
        lattice_dither, quant_scales, LATTICE_COEFF_LIMIT)
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM
    r, n = 3, 700
    x64 = RNG.normal(size=(r, n)) * 0.6
    u64 = RNG.random(size=(r, n, 2))
    # modest |k| like a converged learner bank: large random k
    # (sum|k| >~ 1/(2*state_limit)) rails the ladder into a limit cycle
    # at the ±2.0 clamps, where bitwise f64 comparison is chaotic too;
    # the clamp arithmetic itself is covered by (b)
    k9 = np.clip(RNG.normal(size=9) * 0.15, -LATTICE_COEFF_LIMIT,
                 LATTICE_COEFF_LIMIT)
    # (a) f64 full sequence, both bit depths
    for bits in (16, 24):
        scale, _ = quant_scales(bits)
        ql = pk.error_feedback_quantize(
            jnp.asarray(x64), jnp.asarray(u64), k9, scale,
            K_OUTPUT_HEADROOM, mode="lattice", chunk=256, interpret=True)
        ref = lattice_dither(jnp.asarray(x64), jnp.asarray(u64), k9, bits)
        np.testing.assert_array_equal(np.asarray(ql), np.asarray(ref))
    # (b) f32 single-step state advance over 4096 random states
    b = 4096
    s0 = (RNG.normal(size=(b, 9)) * np.linspace(0.1, 2.5, b)[:, None]
          ).astype(np.float32)                              # hits ±2 clamps
    xb = (RNG.normal(size=(b, 1)) * 0.6).astype(np.float32)
    ub = RNG.random(size=(b, 1, 2)).astype(np.float32)
    scale, _ = quant_scales(16)
    q1, s1 = lattice_dither(jnp.asarray(xb), jnp.asarray(ub), k9, 16,
                            state=jnp.asarray(s0), return_state=True)
    qp = pk.error_feedback_quantize(
        jnp.asarray(xb), jnp.asarray(ub), k9, scale,
        K_OUTPUT_HEADROOM, mode="lattice", chunk=1, interpret=True,
        state=jnp.asarray(s0))
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(q1))


def test_two_stage_pallas_fft_matches_numpy():
    """Fused fwd/inv two-stage GEMM-FFT kernels (interpret mode) vs
    numpy rfft / valid-half irfft, both dot modes, two partition sizes,
    plus the grid round trip through the frame MAC layout."""
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(7)
    for p in (512, 2048):
        osa = jnp.asarray(rng.normal(size=(2, 3, 2 * p)), jnp.float32)
        ref = np.fft.rfft(np.asarray(osa), axis=-1)
        sig = rng.normal(size=(2, 2 * p)).astype(np.float32)
        S = np.fft.rfft(sig, axis=-1)
        ref_y = np.fft.irfft(S, n=2 * p, axis=-1)[..., p:]
        for mode, tol in (("f32", 3e-6), ("bf16x3", 6e-5)):
            old = pg.PALLAS_DOT_MODE
            pg.PALLAS_DOT_MODE = mode
            try:
                Xr, Xi = pg.rfft_two_stage_pallas(osa, p, True)
                scale = np.abs(ref).max()
                np.testing.assert_allclose(
                    np.asarray(Xr)[..., :p + 1], ref.real, rtol=0,
                    atol=tol * scale, err_msg=f"fwd re p={p} {mode}")
                np.testing.assert_allclose(
                    np.asarray(Xi)[..., :p + 1], ref.imag, rtol=0,
                    atol=tol * scale, err_msg=f"fwd im p={p} {mode}")
                Gr, Gi = pg.spectra_to_grid(
                    jnp.asarray(S.real, jnp.float32),
                    jnp.asarray(S.imag, jnp.float32), p)
                y = pg.irfft_valid_two_stage_pallas(Gr, Gi, p, True)
                np.testing.assert_allclose(
                    np.asarray(y), ref_y, rtol=0,
                    atol=tol * max(1.0, np.abs(ref_y).max()),
                    err_msg=f"inv p={p} {mode}")
            finally:
                pg.PALLAS_DOT_MODE = old


@pytest.mark.parametrize("batched", [False, True])
def test_rfft_frames_pallas_matches_materialized_osa(batched):
    """The frames-input forward (prev half carried in VMEM scratch)
    equals the rfft of the materialized [prev | cur] overlap-save
    tensor, including the zero prev of frame 0 and channel resets —
    in both the per-frame-loop and the tile-batched stage variants."""
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(13)
    p = 512
    C, K = 3, 6
    frames = rng.normal(size=(C, K, p)).astype(np.float32)
    prev = np.concatenate([np.zeros((C, 1, p), np.float32),
                           frames[:, :-1]], axis=1)
    osa = np.concatenate([prev, frames], axis=-1)
    ref = np.fft.rfft(osa, axis=-1)
    Xr, Xi = pg._rfft_frames_impl(jnp.asarray(frames), p, True,
                                  pg.PALLAS_DOT_MODE, batched)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(Xr)[..., :p + 1], ref.real,
                               rtol=0, atol=6e-5 * scale)
    np.testing.assert_allclose(np.asarray(Xi)[..., :p + 1], ref.imag,
                               rtol=0, atol=6e-5 * scale)


def test_irfft_valid_batched_matches_looped():
    """The tile-batched inverse stage variant equals numpy's valid-half
    irfft, same contract as the looped variant."""
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(17)
    p = 512
    sig = rng.normal(size=(4, 2 * p)).astype(np.float32)
    S = np.fft.rfft(sig, axis=-1)
    ref_y = np.fft.irfft(S, n=2 * p, axis=-1)[..., p:]
    Gr, Gi = pg.spectra_to_grid(jnp.asarray(S.real, jnp.float32),
                                jnp.asarray(S.imag, jnp.float32), p)
    y = pg._irfft_valid_two_stage_impl(Gr, Gi, p, True,
                                       pg.PALLAS_DOT_MODE, True)
    np.testing.assert_allclose(
        np.asarray(y), ref_y, rtol=0,
        atol=6e-5 * max(1.0, np.abs(ref_y).max()))


def test_causal_mac_grid_pallas_matches_reference():
    """The VMEM-ring frame MAC kernel (interpret mode) equals the direct
    causal reduction Y[f] = sum_j X[f-j] H[j] on the stage grid, across
    warmup (f < P), ring wrap (K > P), and multi-channel batches."""
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(11)
    p = 512
    _N1, _K2, g = pg.grid_bins(p)
    for batch, K, P in (((2,), 11, 4), ((2, 2), 16, 7), ((1,), 5, 9)):
        Xr = rng.normal(size=batch + (K, g)).astype(np.float32)
        Xi = rng.normal(size=batch + (K, g)).astype(np.float32)
        Hr = rng.normal(size=(P, g)).astype(np.float32)
        Hi = rng.normal(size=(P, g)).astype(np.float32)
        Yr, Yi = pg.causal_mac_grid_pallas(
            jnp.asarray(Xr), jnp.asarray(Xi), jnp.asarray(Hr),
            jnp.asarray(Hi), p, interpret=True)
        X = Xr + 1j * Xi
        H = Hr + 1j * Hi
        ref = np.zeros(batch + (K, g), np.complex64)
        for f in range(K):
            for j in range(min(P, f + 1)):
                ref[..., f, :] += X[..., f - j, :] * H[j]
        np.testing.assert_allclose(np.asarray(Yr), ref.real, rtol=0,
                                   atol=2e-5 * np.abs(ref).max(),
                                   err_msg=f"re K={K} P={P}")
        np.testing.assert_allclose(np.asarray(Yi), ref.imag, rtol=0,
                                   atol=2e-5 * np.abs(ref).max(),
                                   err_msg=f"im K={K} P={P}")


def test_pallas_kernels_lower_for_tpu():
    """AOT cross-lowering of every conv Pallas kernel for the TPU
    platform at the HEADLINE partition size (p=16384, where the stage
    grid's odd K2=129 axis makes Mosaic's block-divisibility rules
    bite).  Interpret mode never checks these constraints, and the TPU
    is not always reachable from CI — lowering is the earliest
    hardware-free gate that catches them.  x64 is forced off: the TPU
    runtime never runs these kernels under x64, and cross-lowering
    pallas_call under x64 hits an unbounded recursion inside JAX's
    lowering cache."""
    import jax
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    p = 16384
    C, K, P = 2, 8, 66
    _N1, _K2, g = pg.grid_bins(p)
    with jax.enable_x64(False):
        frames = jnp.zeros((C, K, p), jnp.float32)
        X = jnp.zeros((C, K, g), jnp.float32)
        G = jnp.zeros((P, g), jnp.float32)
        osa = jnp.zeros((C, K, 2 * p), jnp.float32)

        cases = [
            ("ring-mac", lambda a, b, c, d: pg.causal_mac_grid_pallas(
                a, b, c, d, p), (X, X, G, G)),
            ("fwd-osa", lambda o: pg.rfft_two_stage_pallas(o, p), (osa,)),
        ]
        for batched in (False, True):
            cases += [
                (f"fwd-frames-b{batched}",
                 (lambda bt: lambda fr: pg._rfft_frames_impl(
                     fr, p, False, pg.PALLAS_DOT_MODE, bt))(batched),
                 (frames,)),
                (f"inverse-b{batched}",
                 (lambda bt: lambda a, b: pg._irfft_valid_two_stage_impl(
                     a, b, p, False, pg.PALLAS_DOT_MODE, bt))(batched),
                 (X, X)),
            ]
        for name, fn, args in cases:
            jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_quantizer_kernel_lowers_for_tpu():
    """AOT cross-lowering of the sequential dither quantizer for every
    mode (incl. the round-5 lattice_fir state store) — the bench
    config6 path compiles this on-chip with no fallback gate."""
    import jax
    from convopeq_tpu.ops import pallas_kernels as pk

    with jax.enable_x64(False):
        x = jnp.zeros((8, 1024), jnp.float32)
        u = jnp.zeros((8, 1024, 2), jnp.float32)
        c9 = np.linspace(-0.2, 0.2, 9)
        c12 = np.linspace(-0.5, 0.5, 12)
        for mode, c in (("psycho", c12), ("fixed", c9[:4]),
                        ("fixed15", np.linspace(-0.5, 0.5, 16)),
                        ("lattice", c9), ("lattice_fir", c9)):
            fn = lambda a, b, _c=c, _m=mode: pk.error_feedback_quantize(
                a, b, _c, 1.0 / 32768.0, 0.89, mode=_m, chunk=256)
            jax.jit(fn).trace(x, u).lower(lowering_platforms=("tpu",))


def test_uniform_partitioned_conv_pallas_path():
    """frame_mac='pallas' (interpret via monkeypatched kernels on CPU)
    equals the frame-FFT reference path."""
    from convopeq_tpu.ops import partitioned_conv as pc
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(3)
    p = 512
    x = jnp.asarray(rng.normal(size=(2, 5000)), jnp.float32)
    h = rng.normal(size=3 * p + 100) * np.exp(-np.arange(3 * p + 100) / 800.0)
    H = pc.partition_spectra(jnp.asarray(h, jnp.float32), p,
                             dtype=jnp.float32)
    y_ref = pc.uniform_partitioned_conv(x, H, p, frame_mac="fft")

    orig_f = pg.rfft_frames_two_stage_pallas
    orig_i = pg.irfft_valid_two_stage_pallas
    orig_m = pg.causal_mac_grid_pallas
    orig_u = pg.fused_conv_frames_pallas
    pc_f = lambda fr, pp, interpret=False: orig_f(fr, pp, True)
    pc_i = lambda Yr, Yi, pp, interpret=False: orig_i(Yr, Yi, pp, True)
    pc_m = lambda Xr, Xi, Gr, Gi, pp, interpret=False: orig_m(
        Xr, Xi, Gr, Gi, pp, True)
    pc_u = lambda fr, Gr, Gi, pp, interpret=False: orig_u(
        fr, Gr, Gi, pp, True)
    import convopeq_tpu.ops.pallas_gemm_fft as mod
    mod.rfft_frames_two_stage_pallas = pc_f
    mod.irfft_valid_two_stage_pallas = pc_i
    mod.causal_mac_grid_pallas = pc_m
    mod.fused_conv_frames_pallas = pc_u
    try:
        # P = 4 parts: routes through the FUSED fwd+MAC+inv kernel
        y = pc.uniform_partitioned_conv(x, H, p, frame_mac="pallas")
        # P = 12 parts: the three-kernel pipeline
        h2 = rng.normal(size=11 * p + 60) \
            * np.exp(-np.arange(11 * p + 60) / 2500.0)
        H2 = pc.partition_spectra(jnp.asarray(h2, jnp.float32), p,
                                  dtype=jnp.float32)
        y2_ref = pc.uniform_partitioned_conv(x, H2, p, frame_mac="fft")
        y2 = pc.uniform_partitioned_conv(x, H2, p, frame_mac="pallas")
    finally:
        mod.rfft_frames_two_stage_pallas = orig_f
        mod.irfft_valid_two_stage_pallas = orig_i
        mod.causal_mac_grid_pallas = orig_m
        mod.fused_conv_frames_pallas = orig_u
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=6e-5 * float(jnp.abs(y_ref).max()),
        err_msg="fused pallas conv path diverges from the FFT path")
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y2_ref), rtol=0,
        atol=6e-5 * float(jnp.abs(y2_ref).max()),
        err_msg="pallas conv path diverges from the FFT path")


def test_uniform_partitioned_conv_pallas_mac_fallback(monkeypatch):
    """The mac_ok=False branch (Pallas transforms + XLA grid MAC, with
    the K frame padding/trim) matches the frame-FFT reference path.
    Covers the fallback uniform_partitioned_conv takes when
    causal_mac_grid_supported rejects the shape (ADVICE r2: previously
    untested)."""
    from convopeq_tpu.ops import partitioned_conv as pc
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(9)
    p = 512
    x = jnp.asarray(rng.normal(size=(2, 6000)), jnp.float32)
    h = rng.normal(size=2 * p + 77) * np.exp(-np.arange(2 * p + 77) / 600.0)
    H = pc.partition_spectra(jnp.asarray(h, jnp.float32), p,
                             dtype=jnp.float32)
    y_ref = pc.uniform_partitioned_conv(x, H, p, frame_mac="fft")

    orig_f = pg.rfft_frames_two_stage_pallas
    orig_i = pg.irfft_valid_two_stage_pallas
    monkeypatch.setattr(pg, "rfft_frames_two_stage_pallas",
                        lambda fr, pp, interpret=False: orig_f(fr, pp, True))
    monkeypatch.setattr(pg, "irfft_valid_two_stage_pallas",
                        lambda Yr, Yi, pp, interpret=False: orig_i(
                            Yr, Yi, pp, True))
    # force the gates shut: no fused small-P kernel (this fixture is 3
    # parts), no grid MAC — the XLA MAC fallback must run
    monkeypatch.setattr(pg, "fused_conv_supported", lambda pp, P: False)
    monkeypatch.setattr(pg, "causal_mac_grid_supported",
                        lambda K, g, P: False)
    mac_calls = []
    orig_m = pg.causal_mac_grid_pallas
    monkeypatch.setattr(pg, "causal_mac_grid_pallas",
                        lambda *a, **k: mac_calls.append(1) or orig_m(*a, **k))
    y = pc.uniform_partitioned_conv(x, H, p, frame_mac="pallas")
    assert not mac_calls, "gate did not route to the XLA MAC fallback"
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=6e-5 * float(jnp.abs(y_ref).max()),
        err_msg="mac fallback path diverges from the FFT path")


def test_fused_conv_small_p_matches_reference():
    """The fully-fused fwd+MAC+inv kernel (P <= 8, X ring in VMEM —
    the near layer of the fused2 throughput plan) vs a numpy f64
    overlap-save partitioned convolution, across partition counts and
    frame-tile boundaries (K spanning multiple 8-frame tiles, so the
    VMEM X-ring handoff between grid steps is exercised), plus batch."""
    from convopeq_tpu.ops import pallas_gemm_fft as pg

    rng = np.random.default_rng(11)
    p = 1024
    for P, C, K in ((1, 1, 8), (3, 2, 16), (8, 2, 24), (5, 1, 11)):
        assert pg.fused_conv_supported(p, P)
        n = K * p
        x = rng.normal(size=(C, n)).astype(np.float32)
        ir = (rng.normal(size=P * p)
              * np.exp(-np.arange(P * p) / (P * p / 4.0))).astype(np.float64)
        hp = np.zeros((P, 2 * p))
        hp[:, :p] = ir.reshape(P, p)
        H = np.fft.rfft(hp, axis=-1)
        # numpy f64 golden: plain linear convolution truncated to n
        y_ref = np.stack([np.convolve(x[c].astype(np.float64), ir)[:n]
                          for c in range(C)])
        Gr, Gi = pg.spectra_to_grid(
            jnp.asarray(H.real, jnp.float32),
            jnp.asarray(H.imag, jnp.float32), p)
        frames = jnp.asarray(x.reshape(C, K, p))
        y = np.asarray(pg.fused_conv_frames_pallas(
            frames, Gr, Gi, p, interpret=True)).reshape(C, n)
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(y, y_ref, rtol=0, atol=1e-4 * scale,
                                   err_msg=f"P={P} C={C} K={K}")
