"""Fused dd (double-f32) Pallas conv pipeline vs f64 references.

The dd kernels (ops/pallas_dd_fft.py) carry the reference's 64-bit
numerical contract (ref: /root/reference/README.md:18) on a TPU with no
native f64: Ozaki-sliced bf16 GEMM transform stages + dd phase-copy MAC,
all in VMEM.  These tests run the kernels in interpret mode on CPU
against numpy f64; the on-chip path is exercised by tools/tpu_parity.py
(PARITY_TPU.json pins RMS <=1e-9 with RTF >=1000x on the headline
config).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convopeq_tpu.ops import pallas_dd_fft as dd
from convopeq_tpu.ops.pallas_gemm_fft import _pfactor

pytestmark = pytest.mark.skipif(dd.pl is None,
                                reason="pallas unavailable")
RNG = np.random.default_rng(42)


def _split(x):
    hi = np.asarray(x, np.float32)
    return jnp.asarray(hi), jnp.asarray(np.asarray(x - hi, np.float32))


def test_dd_forward_matches_numpy_rfft():
    """dd forward kernel (interpret) == f64 rfft of the overlap-save
    frames on the (k2, k1) stage grid, to ~2^-40 relative."""
    p = 512
    C, K = 2, 4
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    fr = RNG.normal(size=(C, K, p)) * 0.5          # |x| <= 1 (normalized)
    frh, frl = _split(fr)
    Xrh, Xrl, Xih, Xil = dd._rfft_frames_dd_impl(frh, frl, p,
                                                 dd.dd_slices(), True)
    # reference: osa frame f = [frame f-1 | frame f], f64 rfft
    osa = np.zeros((C, K, 2 * p))
    osa[:, :, p:] = fr
    osa[:, 1:, :p] = fr[:, :-1]
    ref = np.fft.rfft(osa, axis=-1)                # (C, K, p+1)
    # grid flat index == rfft bin for k <= p; compare the first p+1 bins
    Xr = (np.asarray(Xrh, np.float64)
          + np.asarray(Xrl, np.float64)).reshape(C, K, K2 * N1)
    Xi = (np.asarray(Xih, np.float64)
          + np.asarray(Xil, np.float64)).reshape(C, K, K2 * N1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(Xr[..., :p + 1], ref.real, rtol=0,
                               atol=2e-12 * scale)
    np.testing.assert_allclose(Xi[..., :p + 1], ref.imag, rtol=0,
                               atol=2e-12 * scale)


def test_dd_inverse_matches_numpy_irfft():
    """dd inverse kernel (interpret) == valid half of f64 irfft."""
    p = 512
    rows = 3
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    Y = (RNG.normal(size=(rows, p + 1))
         + 1j * RNG.normal(size=(rows, p + 1))) * 0.5
    Y[:, 0] = Y[:, 0].real
    Y[:, -1] = Y[:, -1].real
    ref = np.fft.irfft(Y, n=2 * p, axis=-1)[:, p:]
    # grid layout: flat (k2, k1) index == bin for k <= p, pad above
    Yg = np.zeros((rows, K2 * N1), np.complex128)
    Yg[:, :p + 1] = Y
    Yrh, Yrl = _split(Yg.real.reshape(rows, K2, N1))
    Yih, Yil = _split(Yg.imag.reshape(rows, K2, N1))
    oh, ol = dd._irfft_valid_dd_impl(Yrh, Yrl, Yih, Yil, p,
                                     dd.dd_slices(), True)
    y = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    # error floor scales with the INPUT spectrum magnitude (~2^-41 of
    # |Y|), not the much smaller time-domain output
    np.testing.assert_allclose(y, ref, rtol=0,
                               atol=2e-12 * np.abs(Y).max())


def test_dd_mac_matches_f64_reference():
    """dd phase-copy MAC kernel (interpret) == f64 causal reduction
    Y[f] = sum_j X[f-j] H[j], across warmup, wrap and batch cases."""
    g = 256
    for batch, K, P in (((2,), 8, 4), ((1,), 16, 7), ((2,), 8, 11)):
        X = (RNG.normal(size=batch + (K, g))
             + 1j * RNG.normal(size=batch + (K, g)))
        H = (RNG.normal(size=(P, g)) + 1j * RNG.normal(size=(P, g)))
        Xrh, Xrl = _split(X.real)
        Xih, Xil = _split(X.imag)
        Grh, Grl = _split(H.real)
        Gih, Gil = _split(H.imag)
        Yrh, Yrl, Yih, Yil = dd._causal_mac_dd_impl(
            Xrh, Xrl, Xih, Xil, Grh, Grl, Gih, Gil, 0, True)
        ref = np.zeros(batch + (K, g), np.complex128)
        for f in range(K):
            for j in range(min(P, f + 1)):
                ref[..., f, :] += X[..., f - j, :] * H[j]
        yr = np.asarray(Yrh, np.float64) + np.asarray(Yrl, np.float64)
        yi = np.asarray(Yih, np.float64) + np.asarray(Yil, np.float64)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(yr, ref.real, rtol=0,
                                   atol=5e-13 * scale,
                                   err_msg=f"re K={K} P={P}")
        np.testing.assert_allclose(yi, ref.imag, rtol=0,
                                   atol=5e-13 * scale,
                                   err_msg=f"im K={K} P={P}")


@pytest.mark.slow
def test_dd_conv_pipeline_matches_f64_convolution():
    """Full dd partitioned conv (interpret) vs numpy f64 linear
    convolution: the end-to-end pipeline error sits ~1e-11 relative,
    far inside the <=1e-9 chain contract."""
    p = 1024
    n = 3 * 4096
    ir_len = 3000
    x = RNG.standard_normal((2, n))
    ir = RNG.standard_normal(ir_len) * np.exp(-np.arange(ir_len) / 800.0)

    nparts = -(-ir_len // p)
    hp = np.zeros((nparts, 2 * p))
    hp[:, :p] = np.pad(ir, (0, nparts * p - ir_len)).reshape(nparts, p)
    H = np.fft.rfft(hp, axis=-1)
    assert dd.dd_pipeline_supported(p, n, nparts)
    y = dd.uniform_partitioned_conv_dd(
        jnp.asarray(x), jnp.asarray(H.real), jnp.asarray(H.imag), p,
        interpret=True)
    ref = np.stack([np.convolve(x[c], ir)[:n] for c in range(2)])
    err = (np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref))
    assert err < 1e-9, err


def test_dd_supported_gate():
    """The fit gate accepts the headline shape and rejects impossible
    ones (bad factorization, MAC over budget)."""
    # headline: p=32768, 1M-tap -> 31 partitions, 20 s signal
    assert dd.dd_pipeline_supported(32768, 48000 * 20, 31)
    # tiny p fails the N1/N2 factorization floor
    assert not dd.dd_pipeline_supported(64, 48000, 4)
    # absurd partition count blows the MAC VMEM budget
    assert not dd.dd_pipeline_supported(32768, 48000 * 3600, 100000)


def test_dd_kernels_lower_for_tpu():
    """AOT cross-lowering of the dd kernels for the TPU platform at the
    HEADLINE partition size (p=32768).  Interpret mode never checks
    Mosaic's block rules; lowering is the earliest hardware-free gate.
    x64 off: the kernels run on f32 planes (see test_pallas.py note)."""
    p = 32768
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    C, K, P = 1, 8, 31
    g = K2 * N1
    s = dd.dd_slices()
    with jax.enable_x64(False):
        fr = jnp.zeros((C, K, p), jnp.float32)
        X = jnp.zeros((C, K, K2, N1), jnp.float32)
        Xg = jnp.zeros((C, K, g), jnp.float32)
        G = jnp.zeros((P, g), jnp.float32)
        cases = [
            ("fwd", lambda a, b: dd._rfft_frames_dd_impl(a, b, p, s, False),
             (fr, fr)),
            ("inv", lambda a, b, c, d: dd._irfft_valid_dd_impl(
                a.reshape(C * K, K2, N1), b.reshape(C * K, K2, N1),
                c.reshape(C * K, K2, N1), d.reshape(C * K, K2, N1),
                p, s, False), (X, X, X, X)),
            ("mac", lambda *a: dd._causal_mac_dd_impl(*a, p, False),
             (Xg, Xg, Xg, Xg, G, G, G, G)),
        ]
        for name, fn, args in cases:
            jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_dd_numerics_probe_on_tpu():
    """On-chip probe: Mosaic performs neither the unsafe algebraic
    rewrites nor FMA contraction, so two_sum / Dekker split / two_prod
    hold EXACTLY inside a compiled TPU kernel.  This is the ground truth
    the interpret-mode workarounds (_dd_jit strict mode, _ob barriers)
    are calibrated against.  Skipped without TPU hardware; run it via
    the verify skill / tools/tpu_parity.py environment."""
    import os
    import subprocess
    import sys
    if os.environ.get("CONVOPEQ_TPU_TESTS", "0") != "1":
        pytest.skip("TPU probe (set CONVOPEQ_TPU_TESTS=1 with a chip)")
    # run in a clean subprocess: the suite's conftest pins JAX to CPU
    code = r"""
import jax, numpy as np, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from convopeq_tpu.ops import pallas_dd_fft as dd

def probe(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    s, e = dd._two_sum(a, b)
    a1, a2 = dd._split12(a)
    b1, b2 = dd._split12(b)
    p, pe = dd._two_prod(a, a1, a2, b, b1, b2)
    o_ref[...] = jnp.stack([s, e, p, pe])

rng = np.random.default_rng(5)
a = rng.normal(size=(8, 128)).astype(np.float32)
b = (rng.normal(size=(8, 128)) * 1e-4).astype(np.float32)
wrapped = dd._kernel_body(probe)
out = pl.pallas_call(
    wrapped, out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
)(jnp.asarray(a), jnp.asarray(b))
s, e, p, pe = np.asarray(out, np.float64)
a64 = a.astype(np.float64); b64 = b.astype(np.float64)
assert np.array_equal(s + e, a64 + b64), "two_sum not exact on-chip"
assert np.array_equal(p + pe, a64 * b64), "two_prod not exact on-chip"
print("PROBE-OK")
"""
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=600,
                       env={k: v for k, v in os.environ.items()
                            if k not in ("JAX_PLATFORMS", "XLA_FLAGS")})
    assert "PROBE-OK" in r.stdout, r.stderr[-2000:]


def test_dd_routing_in_uniform_partitioned_conv(monkeypatch):
    """The split-spectra (dd) branch of uniform_partitioned_conv routes
    through the fused dd pipeline when enabled and supported, and the
    result matches the all-XLA shift-MAC form."""
    from convopeq_tpu.ops import partitioned_conv as pc

    p = 2048                                # > RDFT_MATMUL_MAX_P
    n = 3 * p + 100
    ir_len = 2 * p + 50
    x = jnp.asarray(RNG.normal(size=(2, n)))
    ir = RNG.standard_normal(ir_len) * np.exp(-np.arange(ir_len) / 500.0)
    nparts = -(-ir_len // p)
    hp = np.zeros((nparts, 2 * p))
    hp[:, :p] = np.pad(ir, (0, nparts * p - ir_len)).reshape(nparts, p)
    H = np.fft.rfft(hp, axis=-1)
    Hr, Hi = jnp.asarray(H.real), jnp.asarray(H.imag)

    y_ref = pc.uniform_partitioned_conv(x, (Hr, Hi), p)  # XLA shift-MAC

    calls = []
    real_dd = dd.uniform_partitioned_conv_dd

    def fake_dd(xx, hr, hi, pp):
        calls.append(pp)
        return real_dd(xx, hr, hi, pp, interpret=True)

    monkeypatch.setattr(dd, "dd_pallas_enabled", lambda: True)
    monkeypatch.setattr(dd, "uniform_partitioned_conv_dd", fake_dd)
    y = pc.uniform_partitioned_conv(x, (Hr, Hi), p)
    assert calls == [p], "dd pipeline was not routed"
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=1e-10 * float(jnp.abs(y_ref).max()))


def test_dd_routing_small_partition(monkeypatch):
    """Round 4: the dd pipeline is tried for EVERY partition size (the
    nuc3 staged layers run p=512/4096, previously left on the all-XLA
    f64 path); small-p routing must produce the same result as the
    rdft-matmul form."""
    from convopeq_tpu.ops import partitioned_conv as pc

    p = 512
    n = 5 * p + 37
    ir_len = 3 * p + 21
    x = jnp.asarray(RNG.normal(size=(2, n)))
    ir = RNG.standard_normal(ir_len) * np.exp(-np.arange(ir_len) / 300.0)
    nparts = -(-ir_len // p)
    hp = np.zeros((nparts, 2 * p))
    hp[:, :p] = np.pad(ir, (0, nparts * p - ir_len)).reshape(nparts, p)
    H = np.fft.rfft(hp, axis=-1)
    Hr, Hi = jnp.asarray(H.real), jnp.asarray(H.imag)

    y_ref = pc.uniform_partitioned_conv(x, (Hr, Hi), p)   # rdft matmul

    calls = []
    real_dd = dd.uniform_partitioned_conv_dd

    def fake_dd(xx, hr, hi, pp):
        calls.append(pp)
        return real_dd(xx, hr, hi, pp, interpret=True)

    monkeypatch.setattr(dd, "dd_pallas_enabled", lambda: True)
    monkeypatch.setattr(dd, "uniform_partitioned_conv_dd", fake_dd)
    y = pc.uniform_partitioned_conv(x, (Hr, Hi), p)
    assert calls == [p], "dd pipeline was not routed at p=512"
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=1e-10 * float(jnp.abs(y_ref).max()))
