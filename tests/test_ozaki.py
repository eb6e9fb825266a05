"""Ozaki-scheme sliced GEMMs (ops/ozaki.py) — the dd-mode f64 MXU path.

CPU tests: the slicing algebra is backend-independent (power-of-2 scaling
and grid rounding are exact everywhere), and XLA:CPU's bf16 dot also
accumulates in f32, so the error bounds transfer to the TPU wiring
(whose end-to-end parity artifact is PARITY_TPU.json)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convopeq_tpu.ops.ozaki import (
    Q_BITS, MAX_EXACT_K, slice_f64, slice_const, contract_sliced, preslice)


def test_slice_f64_reconstruction_and_bf16_exactness():
    rng = np.random.default_rng(1)
    # wide dynamic range rows incl. a zero row and tiny values
    A = rng.normal(size=(6, 128)) * np.logspace(-12, 3, 6)[:, None]
    A[3] = 0.0
    s = 6
    slices, scale = jax.jit(
        lambda a: slice_f64(a, s, scale_axis=-1))(jnp.asarray(A))
    # each slice is exactly representable in bf16 (q=7 <= 8 mantissa bits)
    rec = np.zeros_like(A)
    for i, sl in enumerate(slices):
        sl64 = np.asarray(sl, np.float64)
        assert np.array_equal(
            sl64, np.asarray(np.asarray(sl, np.float32), np.float64))
        rec += sl64 * 2.0 ** (-i * Q_BITS)
    rec *= np.asarray(scale)
    err = np.abs(rec - A).max(axis=-1)
    # runtime slicer scales by 2^{e+1} (f32-cast headroom): scale <= 4*mx,
    # so the s-slice truncation residual is <= 2^{-qs+2} * mx
    bound = 2.0 ** (-Q_BITS * s + 2) * np.abs(A).max(axis=-1)
    assert (err <= np.maximum(bound, 1e-300)).all()


def test_slice_const_matches_runtime_slicer_semantics():
    rng = np.random.default_rng(2)
    B = np.cos(rng.normal(size=(64, 32)))
    slices, scale = slice_const(B, 6, scale_axis=0)
    rec = np.zeros_like(B)
    for i, sl in enumerate(slices):
        # host NumPy (not device arrays — cacheable across backends),
        # every value exactly bf16-representable
        assert isinstance(sl, np.ndarray) and sl.dtype == np.float32
        assert np.array_equal(
            sl, np.asarray(np.asarray(jnp.asarray(sl, jnp.bfloat16))))
        rec += np.asarray(sl, np.float64) * 2.0 ** (-i * Q_BITS)
    rec *= np.asarray(scale)
    assert np.abs(rec - B).max() <= 2.0 ** (-Q_BITS * 6 + 1)


@pytest.mark.parametrize("pattern,ashape,bshape,ref", [
    ("mk,kn->mn", (3, 40, 256), (256, 96),
     lambda A, B: A @ B),
    ("nj,nk->kj", (3, 256, 96), (256, 128),
     lambda A, B: np.einsum("bnj,nk->bkj", A, B)),
    ("kj,ki->ji", (3, 256, 96), (256, 64),
     lambda A, B: np.einsum("bkj,ki->bji", A, B)),
])
def test_contract_sliced_accuracy(pattern, ashape, bshape, ref):
    rng = np.random.default_rng(3)
    A = rng.normal(size=ashape) * np.exp(rng.normal(size=ashape))
    ang = rng.normal(size=bshape)
    B = np.cos(ang)                      # DFT-matrix-like constant
    Bsl = slice_const(B, 6, scale_axis=0)
    got = np.asarray(jax.jit(
        lambda a: contract_sliced(pattern, a, *Bsl))(jnp.asarray(A)))
    want = ref(A, B)
    rel = (np.sqrt(np.mean((got - want) ** 2))
           / np.sqrt(np.mean(want ** 2)))
    # 2^{-42} slice truncation (x4 runtime-slicer scale headroom on the
    # A side) + f64 recombination roundoff; measured ~7e-12 worst case —
    # three orders below the <=1e-9 chain contract
    assert rel < 2e-11, rel


def test_preslice_reuse_matches_direct():
    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.normal(size=(2, 128, 64)))
    B1 = slice_const(np.cos(rng.normal(size=(128, 32))), 5, scale_axis=0)
    B2 = slice_const(np.sin(rng.normal(size=(128, 32))), 5, scale_axis=0)
    @jax.jit
    def both(A):
        pA = preslice("nj,nk->kj", A, 5)
        return [(contract_sliced("nj,nk->kj", A, *B),
                 contract_sliced("nj,nk->kj", A, *B, presliced=pA))
                for B in (B1, B2)]

    for a, b in both(A):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_contraction_size_guard():
    A = jnp.zeros((4, MAX_EXACT_K + 1))
    B = slice_const(np.zeros((MAX_EXACT_K + 1, 8)), 3, scale_axis=0)
    with pytest.raises(ValueError):
        contract_sliced("mk,kn->mn", A, *B)


def test_gemm_fft_cpu_path_unaffected():
    """On CPU the Ozaki route is disabled; rfft_gemm stays at native-f64
    FFT equivalence (regression guard for the wiring)."""
    from convopeq_tpu.ops.gemm_fft import rfft_gemm, irfft_valid_gemm
    rng = np.random.default_rng(5)
    p = 2048
    x = rng.normal(size=(2, 2 * p))
    Xr, Xi = jax.jit(lambda v: rfft_gemm(v, p))(jnp.asarray(x))
    ref = np.fft.rfft(x, axis=-1)
    sc = np.abs(ref).max()
    assert np.abs(np.asarray(Xr) - ref.real).max() / sc < 1e-12
    assert np.abs(np.asarray(Xi) - ref.imag).max() / sc < 1e-12
    y = jax.jit(lambda a, b: irfft_valid_gemm(a, b, p))(
        jnp.asarray(ref.real), jnp.asarray(ref.imag))
    want = np.fft.irfft(ref, n=2 * p, axis=-1)[:, p:]
    assert np.abs(np.asarray(y) - want).max() / np.abs(want).max() < 1e-12


def test_gemm_fft_ozaki_branch_matches_fft(monkeypatch):
    """Force the TPU-only Ozaki branch on CPU (XLA:CPU's bf16 dot also
    accumulates in f32) and check the full two-stage wiring — slicing,
    cos/sin recombination, twiddles, transposes — against np.fft at the
    slice-truncation floor.  This validates the exact graph the TPU dd
    mode runs, minus only the MXU."""
    from convopeq_tpu.ops import gemm_fft

    monkeypatch.setattr(gemm_fft, "_ozaki_enabled", lambda dt: dt == jnp.float64)
    rng = np.random.default_rng(11)
    for p in (512, 2048):
        x = rng.normal(size=(3, 2 * p)) * np.exp(rng.normal(size=(3, 2 * p)))
        Xr, Xi = jax.jit(lambda v: gemm_fft.rfft_gemm(v, p))(jnp.asarray(x))
        ref = np.fft.rfft(x, axis=-1)
        sc = np.abs(ref).max()
        assert np.abs(np.asarray(Xr) - ref.real).max() / sc < 5e-11
        assert np.abs(np.asarray(Xi) - ref.imag).max() / sc < 5e-11
        y = jax.jit(lambda a, b: gemm_fft.irfft_valid_gemm(a, b, p))(
            jnp.asarray(ref.real), jnp.asarray(ref.imag))
        want = np.fft.irfft(ref, n=2 * p, axis=-1)[:, p:]
        rel = np.abs(np.asarray(y) - want).max() / np.abs(want).max()
        assert rel < 5e-11, (p, rel)
