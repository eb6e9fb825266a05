"""Fused double-f32 ("dd") two-stage GEMM-FFT + MAC Pallas kernels.

The dd precision mode carries the reference's 64-bit numerical contract
(ref: /root/reference/README.md:18; every hot path is double, e.g.
src/MKLNonUniformConvolver.cpp:1407) on a TPU that has no native f64:
values ride as two f32 planes (hi, lo) with hi + lo accurate to ~2^-48.
The previous dd pipeline (ops/gemm_fft.py Ozaki GEMMs + the shift MAC in
ops/partitioned_conv.py) ran entirely in XLA's emulated-f64 graph: every
slice product and every shift pass materialized to HBM, which bounded the
dd folded chain at ~270x realtime.  These kernels keep a frame's whole
transform (both Cooley-Tukey stages + twiddle) and the causal frame MAC
in VMEM, mirroring the f32 kernels in ops/pallas_gemm_fft.py.

Numerics, from first principles (nothing here derives from the
reference's code):

- GEMM stages use the Ozaki error-free splitting: operands are cut into
  q=7-bit INTEGER-valued bf16 slices (|t| <= 64), so every slice product
  is exact in the MXU's f32 accumulator (2q + log2(K) <= 24 for the
  contraction sizes here) and the only rounding is the dd recombination.
  Slice i+j >= s products are dropped: relative truncation ~2^{-qs}
  (s=6 default: 2^-42).
- Elementwise dd arithmetic uses FMA-free error-free transforms:
  Knuth two_sum and Dekker split/two_prod (split constant 2^12+1).
- All dynamic scaling happens OUTSIDE the kernels as exact global
  power-of-2 normalization (see `uniform_partitioned_conv_dd`), so the
  in-kernel slice grids are static powers of two.

Layout contract is shared with ops/pallas_gemm_fft.py: forward output is
the flattened (k2, k1) stage grid (flat index == rfft bin index for
k <= p), the MAC is elementwise per grid bin, and the inverse synthesis
weights zero the k > p pad.  NUC semantics being reproduced:
MKLNonUniformConvolver.cpp:1245-1336 (overlap-save FDL convolution).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:          # pragma: no cover - pallas ships with jax
    pl = pltpu = None

from .gemm_fft import _mats
from .pallas_gemm_fft import _pfactor, _round8

Q = 7                         # slice mantissa bits (2q + log2(K) <= 24)


def _c32(v: float):
    """Explicit f32 constant.  Python-float literals are weak f64 under
    x64, and a weak operand PROMOTES f32 kernel math to f64 — silently
    breaking every error-free transform here in interpret mode (and
    failing to lower at all under Mosaic).  Every scalar constant in the
    kernel-side helpers must go through this."""
    return jnp.float32(v)


# Inside a Mosaic kernel body optimization_barrier has no lowering (and
# Mosaic performs no unsafe FP rewrites, verified on-chip by
# tests/test_pallas_dd.py's TPU probe); outside (XLA tracing), the
# barrier guards the error-free transforms against the algebraic
# simplifier.  Kernel bodies flip this flag at trace time — EXCEPT in
# interpret mode, where the body executes through XLA CPU (which DOES
# apply the unsafe rewrites) and the barriers must stay live.
_IN_KERNEL = False


def _ob(x):
    if _IN_KERNEL:
        return x
    return jax.lax.optimization_barrier(x)


def _kernel_body(fn):
    """Mark fn as a Pallas kernel body: traced with the barrier no-op'd
    for Mosaic (see _ob), kept live under interpret=True."""
    from functools import wraps

    @wraps(fn)
    def wrapper(*args, interpret: bool = False, **kwargs):
        global _IN_KERNEL
        prev = _IN_KERNEL
        _IN_KERNEL = not interpret
        try:
            return fn(*args, **kwargs)
        finally:
            _IN_KERNEL = prev
    return wrapper




def dd_slices() -> int:
    """Slice count for the dd GEMMs (truncation ~2^{-7s}).  s=6 = 2^-42;
    CONVOPEQ_DD_SLICES=5 trades ~30% of the MXU passes for 2^-35."""
    return int(os.environ.get("CONVOPEQ_DD_SLICES", "6"))


def _dd_jit(fn, static_argnums):
    """jit wrapper dispatching on the trailing `interpret` static arg.

    interpret=False (the TPU path) compiles normally — Mosaic performs
    no unsafe FP rewrites and no FMA contraction, so the error-free
    transforms hold as written.  interpret=True executes the kernel
    bodies through XLA:CPU, whose machine codegen contracts mul+add/sub
    into FMA inside fused loops AND whose fusion pass duplicates cheap
    producers — together these recompute a two_sum's operand with
    DIFFERENT rounding than the error term saw (optimization_barrier
    does not help: it is expanded away before fusion).  Disabling the
    fusion pass materializes every op once, restoring strict IEEE
    evaluation; interpret mode is test-only, so the lost fusion
    performance is irrelevant."""
    fast = jax.jit(fn, static_argnums=static_argnums)
    strict = jax.jit(fn, static_argnums=static_argnums,
                     compiler_options={"xla_disable_hlo_passes": "fusion"})
    def wrapper(*args):
        return (strict if args[-1] else fast)(*args)
    return wrapper


# ------------------------------------------------------------ dd helpers
# All operate on f32 jnp values inside kernels (and trace fine outside).

def _two_sum(a, b):
    """Knuth two_sum: s + e == a + b exactly (no FMA, no ordering req).

    The barriers are load-bearing: XLA's algebraic simplifier applies
    the unsafe FP rewrites  sub(add(a,b), a) -> b  and
    sub(A, sub(A, B)) -> B,  either of which collapses the error term
    to garbage.  optimization_barrier hides the producer from the
    pattern matcher at zero arithmetic cost; both the sum s (rule 1 on
    z) and z itself (rule 2 on s - z) must be hidden."""
    s = _ob(a + b)
    z = _ob(s - a)
    e = (a - (s - z)) + (b - z)
    return s, e


def _split12(a):
    """Dekker split of f32 into 12 + 12 significand halves (exact).

    TWO hazards under XLA CPU (interpret/tracing; Mosaic has neither):
    - FP contraction: the sub c - a fused with the mul becomes
      fma(a, 4097, -a) = a * 4096 EXACTLY — losing the rounding of c
      that Dekker depends on, so h comes out full-width and every
      two_prod 'exact' product silently isn't.  The barrier on c keeps
      the mul's rounding observable.
    - simplifier: c - (c - a) matches sub(A, sub(A, B)) -> B, so the
      inner difference t must be hidden too (as in _two_sum)."""
    c = _ob(a * _c32(4097.0))                             # 2^12 + 1
    t = _ob(c - a)
    h = c - t
    return h, a - h


def _two_prod(ah, a1, a2, bh, b1, b2):
    """Dekker two_prod with pre-split operands: p + e == ah*bh exactly.

    The barrier on p is load-bearing on XLA:CPU (interpret mode): the
    machine codegen contracts a mul feeding an add/sub into an FMA even
    though the emitted IR is strict, and XLA's fusion pass DUPLICATES
    cheap producers — so a naked p = ah*bh gets recomputed inside the
    consuming two_sum's fusion as fma(ah, bh, -q), a DIFFERENTLY
    ROUNDED sum than the one the error term is computed against
    (verified bit-for-bit: jit s == fma(ah, bh, -p2h) while e matched
    the strict mul+sub).  The barrier materializes p once, so every
    consumer sees the same rounding.  Mosaic contracts nothing and
    _ob is identity there (see _kernel_body)."""
    p = _ob(ah * bh)
    e = (((a1 * b1) - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def _dd_add_f32(h, l, t):
    """(h, l) += t where t is an exact f32 value (unnormalized lo)."""
    s, e = _two_sum(h, t)
    return s, l + e


def _dd_add_dd(ah, al, bh, bl):
    """(ah, al) + (bh, bl), lo parts folded (sufficient accuracy here)."""
    s, e = _two_sum(ah, bh)
    return s, al + bl + e


def _dd_mul_dd(ah, al, bh, bl, b1=None, b2=None):
    """(ah+al) * (bh+bl) as an unnormalized dd pair.

    b1/b2: optional precomputed Dekker split of bh (constants)."""
    a1, a2 = _split12(ah)
    if b1 is None:
        b1, b2 = _split12(bh)
    p, e = _two_prod(ah, a1, a2, bh, b1, b2)
    return p, e + (ah * bl + al * bh)


def _renorm(h, l):
    s = _ob(h + l)   # see _two_sum
    return s, l - (s - h)


# ------------------------------------------------ in-kernel Ozaki slicing

def _slice_dd(rh, rl, s: int, lg: int):
    """Cut a dd value (|r| <= 2^lg) into s integer-valued bf16 slices.

    Slice i holds t_i = round(residual / lvl_i) with lvl_i =
    2^{lg - (i+1)q + 1}; |t_i| <= 2^{q-1} = 64, exactly representable in
    bf16.  r == 2^{lg+1-q} * sum_i t_i 2^{-iq} + trunc, |trunc| <~
    2^{lg - sq + 1}.  The hi residual is exhausted after ~3 slices
    (21 of 24 bits), so the lo plane is folded in by an exact two_sum
    renormalization before slice 3."""
    slices = []
    for i in range(s):
        if i == 3:
            rh, rl = _two_sum(rh, rl)
        lvl = _c32(2.0 ** (lg - (i + 1) * Q + 1))
        inv = _c32(2.0 ** (-(lg - (i + 1) * Q + 1)))
        # round-to-nearest-even integer as an EXPLICIT op: the add-magic
        # trick ((t + 1.5*2^23) - 1.5*2^23) is algebraically folded away
        # by XLA's simplifier (constant reassociation), which silently
        # disables the slicing under jit/interpret
        t = jnp.round(rh * inv)
        slices.append(t.astype(jnp.bfloat16))
        rh = rh - t * lvl                  # exact: t*lvl is rh's top bits
    return slices


def _slice_const_host(M, s: int, q: int = Q):
    """Host-side integer-valued slicing of a constant matrix, |M| <= 1
    (lg = 0).  Returns s f32 arrays of integers |t| <= 64 (exact in
    bf16) such that M == 2^{1-q} sum_i t_i 2^{-iq} + O(2^{-sq})."""
    M = np.asarray(M, np.float64)
    assert np.max(np.abs(M)) <= 1.0 + 1e-12
    r = M.copy()
    out = []
    for i in range(s):
        lvl = 2.0 ** (-(i + 1) * q + 1)
        t = np.round(r / lvl)
        out.append(np.asarray(t, np.float32))
        r = r - t * lvl
    return out


def _ozaki_combine(prods, s: int, lg_out: int):
    """Recombine the triangular {dot(A_i, B_j): i+j < s} exact products.

    prods[d] = list of the exact f32 products on diagonal d (= i+j).
    Result scale: A = 2^{lgA+1-q} sum t_i 2^{-iq}, B likewise with
    lgB = 0, so out = 2^{lgA+2-2q} sum_d 2^{-dq} (sum of diag d);
    lg_out = lgA + 2 - 2q is folded in at the end (exact pow2).

    Accuracy: diagonals 0-2 are dd-accumulated term by term; d >= 3
    terms are f32-summed first (their magnitude is <= 2^{-3q} of the
    total, so the f32 sum's rounding sits at ~2^{-3q-24} = 2^-45
    relative) and folded with one dd add per diagonal."""
    h = prods[0][0]
    l = jnp.zeros_like(h)
    for d in range(1, s):
        sc = _c32(2.0 ** (-d * Q))
        if d <= 2:
            for t in prods[d]:
                h, l = _dd_add_f32(h, l, t * sc)
        else:
            acc = prods[d][0]
            for t in prods[d][1:]:
                acc = acc + t
            h, l = _dd_add_f32(h, l, acc * sc)
    sc = _c32(2.0 ** lg_out)
    return h * sc, l * sc


def _dot_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ozaki_gemm(Asl, Bsl, lgA: int, swap: bool = False):
    """dd GEMM of sliced operands: sum_k A[.., k] B[k, ..].

    Asl: bf16 integer slices of the data operand (lg = lgA); Bsl: bf16
    integer slices of the constant (lg = 0).  The kept product set is
    the triangle i + j < len(Asl): intermediate re-slices carry ONE
    slice more than the constants (len(Asl) = s + 1 vs len(Bsl) = s)
    because their static scale bound wastes ~half the top slice —
    measured on-chip this is the dominant pipeline error (the inverse's
    spectrum-peak-normalized stage-2 input vs its time-domain output).
    swap=True computes dot(B_j, A_i) (constant on the left)."""
    keep = len(Asl)
    prods = [[] for _ in range(keep)]
    for i in range(keep):
        for j in range(min(len(Bsl), keep - i)):
            p = (_dot_bf16(Bsl[j], Asl[i]) if swap
                 else _dot_bf16(Asl[i], Bsl[j]))
            prods[i + j].append(p)
    return _ozaki_combine(prods, keep, lgA + 2 - 2 * Q)


# ---------------------------------------------------------- host constants

_DD_CONST_CACHE: dict = {}


def _dd_maps(p: int, s: int):
    """Stage matrices / twiddles for the dd kernels: GEMM operands as
    integer bf16 slices, twiddles and synthesis weights as (hi, lo) f32
    plane pairs with precomputed Dekker splits of hi."""
    key = (p, s)
    got = _DD_CONST_CACHE.get(key)
    if got is not None:
        return got
    (_N1, _N2, _K2, f1c, f1s, ftc, fts, f2c, f2s,
     w, i1c, i1s, itc, its, i2c, i2s) = _mats(p, _pfactor(2 * p)[0])

    def sl(m):
        return tuple(_slice_const_host(m, s))

    def dd(m):
        m = np.asarray(m, np.float64)
        h = np.asarray(m, np.float32)
        lo = np.asarray(m - h, np.float32)
        c = h * np.float32(4097.0)
        h1 = c - (c - h)
        return h, lo, h1, h - h1

    fwd = dict(
        f1c=sl(f1c), f1s=sl(f1s),
        f2cT=sl(f2c.T.copy()), f2sT=sl(f2s.T.copy()),
        ftcT=dd(ftc.T.copy()), ftsT=dd(fts.T.copy()),
    )
    # inverse synthesis weights w are exact powers of two (+-1/N, +-2/N,
    # 0) — a single f32 plane multiplies EXACTLY, no dd needed
    wT = np.asarray(w.T.copy(), np.float32)
    nz = wT[wT != 0]
    assert np.all(np.log2(np.abs(nz)) % 1 == 0)
    inv = dict(
        wT=wT,
        i1cT=sl(i1c.T.copy()), i1sT=sl(i1s.T.copy()),
        itcT=dd(itc.T.copy()), itsT=dd(its.T.copy()),
        i2c=sl(i2c), i2s=sl(i2s),
    )
    _DD_CONST_CACHE[key] = (fwd, inv)
    return fwd, inv


# ------------------------------------------------------------ fwd kernel


@_kernel_body
def _fwd_dd_kernel(frh_ref, frl_ref, *refs, s: int, n1: int, n2: int,
                   p: int):
    # refs: 4s const slice refs (f1c, f1s, f2cT, f2sT) + 8 twiddle planes
    # (ftcT h/l/h1/h2, ftsT h/l/h1/h2) + 4 outs + 2 scratch
    f1c = refs[0:s]
    f1s = refs[s:2 * s]
    f2cT = refs[2 * s:3 * s]
    f2sT = refs[3 * s:4 * s]
    (tch_r, tcl_r, tc1_r, tc2_r, tsh_r, tsl_r, ts1_r, ts2_r,
     xrh_ref, xrl_ref, xih_ref, xil_ref, osah, osal) = refs[4 * s:]

    ft = pl.program_id(1)

    @pl.when(ft == 0)
    def _():
        osah[:] = jnp.zeros_like(osah)
        osal[:] = jnp.zeros_like(osal)

    # overlap-save assembly: [prev | cur], prev carried in VMEM scratch
    osah[0, p:] = frh_ref[0, 0]
    osal[0, p:] = frl_ref[0, 0]
    ath = osah[0].reshape(n1, n2).T            # (n2, n1)
    atl = osal[0].reshape(n1, n2).T
    osah[0, :p] = frh_ref[0, 0]                # next frame's prev half
    osal[0, :p] = frl_ref[0, 0]


    # stage 1 (contract n1 -> k1): Ozaki GEMMs against f1c/f1s
    Asl = _slice_dd(ath, atl, s, 1)            # input normalized: |a| <= 1
    brh, brl = _ozaki_gemm(Asl, [r[:] for r in f1c], 1)
    bih, bil = _ozaki_gemm(Asl, [r[:] for r in f1s], 1)

    # twiddle W_N^{n2 k1} in (n2, k1) layout: dd complex multiply
    tch, tcl, tc1, tc2 = tch_r[:], tcl_r[:], tc1_r[:], tc2_r[:]
    tsh, tsl, ts1, ts2 = tsh_r[:], tsl_r[:], ts1_r[:], ts2_r[:]
    p1h, p1l = _dd_mul_dd(brh, brl, tch, tcl, tc1, tc2)
    p2h, p2l = _dd_mul_dd(bih, bil, tsh, tsl, ts1, ts2)
    crh, crl = _dd_add_dd(p1h, p1l, -p2h, -p2l)
    p3h, p3l = _dd_mul_dd(brh, brl, tsh, tsl, ts1, ts2)
    p4h, p4l = _dd_mul_dd(bih, bil, tch, tcl, tc1, tc2)
    cih, cil = _dd_add_dd(p3h, p3l, p4h, p4l)

    # stage 2 (contract n2 -> k2): re-slice C, const on the left;
    # one extra data slice (see _ozaki_gemm)
    lg_c = int(np.log2(n1)) + 2                # |C| <= 2 n1
    Crsl = _slice_dd(crh, crl, s + 1, lg_c)
    Cisl = _slice_dd(cih, cil, s + 1, lg_c)
    c2 = [r[:] for r in f2cT]
    s2 = [r[:] for r in f2sT]
    arh, arl = _ozaki_gemm(Crsl, c2, lg_c, swap=True)
    sih, sil = _ozaki_gemm(Cisl, s2, lg_c, swap=True)
    xrh, xrl = _dd_add_dd(arh, arl, -sih, -sil)
    a2h, a2l = _ozaki_gemm(Crsl, s2, lg_c, swap=True)
    s2h, s2l = _ozaki_gemm(Cisl, c2, lg_c, swap=True)
    xih, xil = _dd_add_dd(a2h, a2l, s2h, s2l)

    xrh_ref[0], xrl_ref[0] = _renorm(xrh, xrl)
    xih_ref[0], xil_ref[0] = _renorm(xih, xil)


def _rfft_frames_dd_raw(frh, frl, p: int, s: int, interpret: bool):
    """dd rfft of raw overlap-save frames (C, K, p) -> four (C, K, K2, N1)
    planes (Xr_hi, Xr_lo, Xi_hi, Xi_lo) on the (k2, k1) stage grid.
    Inputs must be globally normalized: |hi + lo| <= 1."""
    C, K, _ = frh.shape
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    fwd, _ = _dd_maps(p, s)

    consts = ([jnp.asarray(m, jnp.bfloat16) for grp in
               ("f1c", "f1s", "f2cT", "f2sT") for m in fwd[grp]]
              + [jnp.asarray(m, jnp.float32)
                 for tw in ("ftcT", "ftsT") for m in fwd[tw]])
    # index maps cast to i32 explicitly: under x64 (the dd mode always
    # runs with jax_enable_x64) literal indices trace as i64, which
    # Mosaic cannot legalize
    z = np.int32(0)
    K32 = np.int32(K)
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda c, ft: (z,) * nd)(
        m.ndim), memory_space=pltpu.VMEM) for m in consts]
    # Mosaic block rule: the last two block dims must divide (8, 128) or
    # equal the array dims — a (1, 1, p) block over (C, K, p) is illegal
    # (middle 1 != K), so frames ride flat as (C*K, 1, p) and outputs as
    # (C*K, K2, N1); the grid keeps the (channel, frame) structure the
    # prev-carry needs.
    f3h = frh.reshape(C * K, 1, p)
    f3l = frl.reshape(C * K, 1, p)
    fspec = pl.BlockSpec((1, 1, p), lambda c, ft: (c * K32 + ft, z, z),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, K2, N1), lambda c, ft: (c * K32 + ft, z, z),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_fwd_dd_kernel, s=s, n1=N1, n2=N2, p=p,
                interpret=interpret),
        grid=(C, K),
        in_specs=[fspec, fspec] + cspec,
        out_specs=[ospec] * 4,
        out_shape=[jax.ShapeDtypeStruct((C * K, K2, N1), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)] * 2,
        interpret=interpret,
    )(f3h, f3l, *consts)
    return tuple(a.reshape(C, K, K2, N1) for a in outs)


# ------------------------------------------------------------ inv kernel


@_kernel_body
def _inv_dd_kernel(yrh_ref, yrl_ref, yih_ref, yil_ref, *refs, s: int,
                   n1: int, n2: int, p: int):
    w_r = refs[0]
    i1cT = refs[1:1 + s]
    i1sT = refs[1 + s:1 + 2 * s]
    i2c = refs[1 + 2 * s:1 + 3 * s]
    i2s = refs[1 + 3 * s:1 + 4 * s]
    (tch_r, tcl_r, tc1_r, tc2_r, tsh_r, tsl_r, ts1_r, ts2_r,
     oh_ref, ol_ref) = refs[1 + 4 * s:]

    w = w_r[:]                                  # exact powers of two
    urh = yrh_ref[0] * w
    url = yrl_ref[0] * w
    uih = yih_ref[0] * w
    uil = yil_ref[0] * w

    # stage 1 (contract k2 -> j2): |U| <= 4/N after w (input |Y| <= 1)
    lg_u = 2 - int(np.log2(2 * p))
    Ursl = _slice_dd(urh, url, s, lg_u)
    Uisl = _slice_dd(uih, uil, s, lg_u)
    c1 = [r[:] for r in i1cT]
    s1 = [r[:] for r in i1sT]
    ach, acl = _ozaki_gemm(Ursl, c1, lg_u, swap=True)
    ash, asl_ = _ozaki_gemm(Uisl, s1, lg_u, swap=True)
    drh, drl = _dd_add_dd(ach, acl, -ash, -asl_)
    bsh, bsl = _ozaki_gemm(Ursl, s1, lg_u, swap=True)
    bch, bcl = _ozaki_gemm(Uisl, c1, lg_u, swap=True)
    dih, dil = _dd_add_dd(bsh, bsl, bch, bcl)

    # twiddle e^{+2 pi i k1 j2 / N} in (j2, k1) layout
    tch, tcl, tc1, tc2 = tch_r[:], tcl_r[:], tc1_r[:], tc2_r[:]
    tsh, tsl, ts1, ts2 = tsh_r[:], tsl_r[:], ts1_r[:], ts2_r[:]
    p1h, p1l = _dd_mul_dd(drh, drl, tch, tcl, tc1, tc2)
    p2h, p2l = _dd_mul_dd(dih, dil, tsh, tsl, ts1, ts2)
    erh, erl = _dd_add_dd(p1h, p1l, -p2h, -p2l)
    p3h, p3l = _dd_mul_dd(drh, drl, tsh, tsl, ts1, ts2)
    p4h, p4l = _dd_mul_dd(dih, dil, tch, tcl, tc1, tc2)
    eih, eil = _dd_add_dd(p3h, p3l, p4h, p4l)

    # stage 2 (contract k1 -> j1, real part): |D| <= K2 |U| * 2;
    # one extra data slice (see _ozaki_gemm)
    lg_d = lg_u + int(np.ceil(np.log2(n2 // 2 + 1))) + 2
    Ersl = _slice_dd(erh, erl, s + 1, lg_d)
    Eisl = _slice_dd(eih, eil, s + 1, lg_d)
    zch, zcl = _ozaki_gemm(Ersl, [r[:] for r in i2c], lg_d)
    zsh, zsl = _ozaki_gemm(Eisl, [r[:] for r in i2s], lg_d)
    yh, yl = _dd_add_dd(zch, zcl, -zsh, -zsl)
    yh, yl = _renorm(yh, yl)
    oh_ref[0, 0] = yh.T.reshape(-1)             # j = j2 + n2*j1
    ol_ref[0, 0] = yl.T.reshape(-1)


def _irfft_valid_dd_raw(Yrh, Yrl, Yih, Yil, p: int, s: int,
                        interpret: bool = False):
    """dd valid-half irfft from grid spectra (rows, K2, N1) -> (rows, p)
    hi/lo.  Inputs must be globally normalized: |hi + lo| <= 1."""
    rows = Yrh.shape[0]
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    _, inv = _dd_maps(p, s)

    consts = ([jnp.asarray(inv["wT"], jnp.float32)]
              + [jnp.asarray(m, jnp.bfloat16) for grp in
                 ("i1cT", "i1sT", "i2c", "i2s") for m in inv[grp]]
              + [jnp.asarray(m, jnp.float32)
                 for tw in ("itcT", "itsT") for m in inv[tw]])
    z = np.int32(0)
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda r: (z,) * nd)(m.ndim),
                          memory_space=pltpu.VMEM) for m in consts]
    yspec = pl.BlockSpec((1, K2, N1), lambda r: (r, z, z),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_inv_dd_kernel, s=s, n1=N1, n2=N2, p=p,
                interpret=interpret),
        grid=(rows,),
        in_specs=[yspec] * 4 + cspec,
        # (1, 1, p) block over (rows, 1, p): see the fwd layout note
        out_specs=[pl.BlockSpec((1, 1, p), lambda r: (r, z, z),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, 1, p), jnp.float32)] * 2,
        interpret=interpret,
    )(Yrh, Yrl, Yih, Yil, *consts)
    return tuple(a.reshape(rows, p) for a in out)


# ------------------------------------------------------------ dd frame MAC
#
# Same phase-copy alignment scheme as pallas_gemm_fft._mac_kernel (8
# shifted copies of the frame column make every causal slice start
# 8-aligned), with dd complex arithmetic: Dekker two_prod for the hi*hi
# products (exact), f32 cross terms (2^-48 relative), dd accumulation.

_DD_MAC_VMEM_BUDGET = 11 * 2 ** 20


def _dd_mac_tile(K: int, g: int, P: int) -> int | None:
    K = _round8(K)
    P8 = _round8(max(P - 1, 1))
    rows = P8 + 8 + K

    def need(d: int) -> int:
        # 4 phase-copy scratches (x2 double-buffer-free, they are
        # scratch) + 4 x-in + 4 y-out blocks (x2 for pipelining) + 4 h
        return (4 * 8 * rows + 8 * 4 * K + 4 * P + 10 * K) * d * 4

    cands = [d for d in range(128, g + 1, 128)
             if g % d == 0 and need(d) <= _DD_MAC_VMEM_BUDGET]
    if g % 128 and need(g) <= _DD_MAC_VMEM_BUDGET:
        cands.append(g)
    return max(cands) if cands else None


def _acc_dd(h_ref, l_ref, ph, plo):
    h = h_ref[0]
    s, e = _two_sum(h, ph)
    h_ref[0] = s
    l_ref[0] += e + plo


@_kernel_body
def _dd_mac_kernel(xrh_ref, xrl_ref, xih_ref, xil_ref,
                   hrh_ref, hrl_ref, hih_ref, hil_ref,
                   yrh_ref, yrl_ref, yih_ref, yil_ref,
                   prh, prl, pih, pil, *, K: int, P: int):
    P8 = _round8(max(P - 1, 1))
    tb = prh.shape[2]

    zhead = jnp.zeros((P8, tb), jnp.float32)
    for buf, src in ((prh, xrh_ref), (prl, xrl_ref), (pih, xih_ref),
                     (pil, xil_ref)):
        x = src[0]
        for b in range(8):
            buf[b, pl.ds(0, P8)] = zhead
            tail = jnp.zeros((8 - b, tb), jnp.float32)
            if b == 0:
                sh = jnp.concatenate([x, tail], axis=0)
            else:
                head = jnp.zeros((b, tb), jnp.float32)
                sh = jnp.concatenate([head, x, tail], axis=0)
            buf[b, pl.ds(P8, K + 8)] = sh

    zf = jnp.zeros((K, tb), jnp.float32)
    yrh_ref[0] = zf
    yrl_ref[0] = zf
    yih_ref[0] = zf
    yil_ref[0] = zf

    na = (P + 7) // 8
    for a in range(na):
        start = P8 - 8 * a
        nb = min(8, P - 8 * a)

        def body(b, _, a=a, start=start):
            j = 8 * a + b
            arh = prh[b, pl.ds(start, K)]
            arl = prl[b, pl.ds(start, K)]
            aih = pih[b, pl.ds(start, K)]
            ail = pil[b, pl.ds(start, K)]
            hrh = hrh_ref[pl.ds(j, 1)]
            hrl = hrl_ref[pl.ds(j, 1)]
            hih = hih_ref[pl.ds(j, 1)]
            hil = hil_ref[pl.ds(j, 1)]
            ar1, ar2 = _split12(arh)
            ai1, ai2 = _split12(aih)
            hr1, hr2 = _split12(hrh)
            hi1, hi2 = _split12(hih)
            # yr += ar*hr - ai*hi ; yi += ar*hi + ai*hr   (dd)
            p1, e1 = _two_prod(arh, ar1, ar2, hrh, hr1, hr2)
            _acc_dd(yrh_ref, yrl_ref, p1, e1 + (arh * hrl + arl * hrh))
            p2, e2 = _two_prod(aih, ai1, ai2, hih, hi1, hi2)
            _acc_dd(yrh_ref, yrl_ref, -p2, -(e2 + (aih * hil + ail * hih)))
            p3, e3 = _two_prod(arh, ar1, ar2, hih, hi1, hi2)
            _acc_dd(yih_ref, yil_ref, p3, e3 + (arh * hil + arl * hih))
            p4, e4 = _two_prod(aih, ai1, ai2, hrh, hr1, hr2)
            _acc_dd(yih_ref, yil_ref, p4, e4 + (aih * hrl + ail * hrh))
            return jnp.int32(0)

        # i32 bounds AND carry: under x64 plain-int literals make the
        # loop index/carry i64, which Mosaic cannot legalize
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))


def _causal_mac_dd_raw(Xrh, Xrl, Xih, Xil, Grh, Grl, Gih, Gil,
                       p: int, interpret: bool):
    shape = Xrh.shape
    K = shape[-2]
    g = shape[-1]
    P = Grh.shape[0]
    C = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    tb = _dd_mac_tile(K, g, P)
    if tb is None:
        raise ValueError(
            f"dd MAC shape (K={K}, g={g}, P={P}) exceeds the VMEM budget "
            "— gate with causal_mac_dd_supported()")
    P8 = _round8(max(P - 1, 1))
    rows = P8 + 8 + K

    xs = [a.reshape(C, K, g) for a in (Xrh, Xrl, Xih, Xil)]
    z = np.int32(0)
    xspec = pl.BlockSpec((1, K, tb), lambda c, bt: (c, z, bt),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((P, tb), lambda c, bt: (z, bt),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_dd_mac_kernel, K=K, P=P, interpret=interpret),
        grid=(C, g // tb),
        in_specs=[xspec] * 4 + [hspec] * 4,
        out_specs=[xspec] * 4,
        out_shape=[jax.ShapeDtypeStruct((C, K, g), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((8, rows, tb), jnp.float32)] * 4,
        interpret=interpret,
    )(*xs, Grh, Grl, Gih, Gil)
    return tuple(a.reshape(shape) for a in outs)


def causal_mac_dd_supported(K: int, g: int, P: int) -> bool:
    return _dd_mac_tile(K, g, P) is not None


# ------------------------------------------------------- full dd pipeline


def _fwd_vmem_bytes(p: int, s: int) -> int:
    """Rough fwd-kernel VMEM demand (dominant terms) for the fit gate."""
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    b = 0
    b += 2 * N * 4 * 2                 # osa scratch hi/lo (+ dbl buffer)
    b += 2 * s * N * 2                 # A slices + C slices (bf16)
    b += 10 * N1 * N2 * 4              # B/C dd planes + twiddle consts
    b += 4 * s * (N1 * N1 + N2 * K2) * 2   # stage matrices (bf16)
    b += 4 * K2 * N1 * 4 * 2           # outputs (dbl buffered)
    b += 6 * N1 * N2 * 4               # combine temporaries
    return b


def dd_pipeline_supported(p: int, n: int, num_parts: int,
                          s: int | None = None) -> bool:
    """Whether the fused dd kernels can run this shape in VMEM."""
    if pl is None:
        return False
    s = dd_slices() if s is None else s
    N1, N2 = _pfactor(2 * p)
    if N1 < 8 or N2 < 128 or N1 * N2 != 2 * p:
        return False
    if 2 ** (2 * Q) * max(N1, N2, N2 // 2 + 1) > 2 ** 24:
        return False                   # slice products no longer exact
    K = _round8(-(-n // p))
    g = (N2 // 2 + 1) * N1
    if not causal_mac_dd_supported(K, g, num_parts):
        return False
    return _fwd_vmem_bytes(p, s) <= 14 * 2 ** 20


def _pow2_ge(mx):
    """Exact power-of-2 >= mx (f32 scalar), via frexp/ldexp."""
    mx32 = jnp.clip(mx.astype(jnp.float32) * (1.0 + 2.0 ** -20),
                    jnp.finfo(jnp.float32).tiny, 2.0 ** 120)
    _, e = jnp.frexp(mx32)
    return jnp.ldexp(jnp.ones((), jnp.float32), e)


def _split_dd(x):
    """f64 (or dd-capable) array -> exact (hi, lo) f32 planes."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def uniform_partitioned_conv_dd(x, Hr, Hi, part_size: int,
                                interpret: bool = False):
    """dd-precision overlap-save partitioned convolution on TPU.

    x: (..., N) float64 signal (XLA-emulated f64 outside the kernels);
    Hr/Hi: (P, part_size+1) float64 split partition spectra (the dd mode
    of ops/partitioned_conv.partition_spectra).  Returns float64 y with
    ~2^-40-level accuracy — far inside the <=1e-9 chain contract.

    All dynamic scaling is exact global power-of-2 normalization out
    here; the kernels use static slice grids (see module docstring).
    """
    s = dd_slices()
    p = part_size
    x = jnp.asarray(x)
    f64 = x.dtype
    n = x.shape[-1]
    k = -(-n // p)
    kpad = _round8(k) - k              # MAC tiles the frame axis in 8s
    K = k + kpad
    C = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1

    # normalize + split the signal (exact)
    sx = _pow2_ge(jnp.max(jnp.abs(x)))
    xh, xl = _split_dd(x * (1.0 / sx.astype(f64)))
    pad = [(0, 0)] * (x.ndim - 1) + [(0, K * p - n)]
    xh = jnp.pad(xh, pad).reshape(C, K, p)
    xl = jnp.pad(xl, pad).reshape(C, K, p)

    # normalize + split the partition spectra (exact)
    sh = _pow2_ge(jnp.maximum(jnp.max(jnp.abs(Hr)), jnp.max(jnp.abs(Hi))))
    inv_h = 1.0 / sh.astype(f64)
    grh, grl = _split_dd(Hr * inv_h)
    gih, gil = _split_dd(Hi * inv_h)
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    g = K2 * N1
    gpad = [(0, 0), (0, g - (p + 1))]
    grh, grl, gih, gil = (jnp.pad(a, gpad) for a in (grh, grl, gih, gil))

    # forward -> MAC -> normalize -> inverse
    Xrh, Xrl, Xih, Xil = _rfft_frames_dd_impl(xh, xl, p, s, interpret)
    Xs = [a.reshape(C, K, g) for a in (Xrh, Xrl, Xih, Xil)]
    Yrh, Yrl, Yih, Yil = _causal_mac_dd_impl(
        *Xs, grh, grl, gih, gil, p, interpret)
    sy = _pow2_ge(jnp.maximum(jnp.max(jnp.abs(Yrh)), jnp.max(jnp.abs(Yih))))
    inv_y = 1.0 / sy
    ys = [(a * inv_y).reshape(C * K, K2, N1)
          for a in (Yrh, Yrl, Yih, Yil)]
    oh, ol = _irfft_valid_dd_impl(*ys, p, s, interpret)

    scale = (sx * sh * sy).astype(f64)
    y = (oh.astype(f64) + ol.astype(f64)) * scale
    y = y.reshape(x.shape[:-1] + (K * p,))
    return y[..., :n]


_rfft_frames_dd_impl = _dd_jit(_rfft_frames_dd_raw, (2, 3, 4))
_irfft_valid_dd_impl = _dd_jit(_irfft_valid_dd_raw, (4, 5, 6))
_causal_mac_dd_impl = _dd_jit(_causal_mac_dd_raw, (8, 9))


def dd_pallas_enabled() -> bool:
    """Fused dd kernels for the f64/dd conv path on TPU (opt-out via
    CONVOPEQ_PALLAS_DD=0)."""
    if os.environ.get("CONVOPEQ_PALLAS_DD", "1") == "0":
        return False
    return jax.default_backend() != "cpu" and pl is not None
