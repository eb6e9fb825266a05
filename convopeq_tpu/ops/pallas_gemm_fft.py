"""Fused two-stage GEMM-FFT Pallas kernels for the NUC transforms.

Why this exists: the XLA form of the Cooley-Tukey GEMM FFT
(`ops/gemm_fft.py`) must materialize every stage to HBM — stage-1 GEMM,
twiddle multiply, stage-2 GEMM each read and write the full (rows, 2p)
intermediate.  Profiled on v5e at the headline shape (p=16384, 64
channel-streams x 60 s), the fwd+inv transform pair is ~100 ms of the
~117 ms single-layer NUC call while the frame MAC is ~25 ms, and the
pair's wall is nearly precision-insensitive (HIGHEST->HIGH changes it
<5%) — i.e. it is bound by HBM pass count, not MXU flops.

These kernels run both stages and the twiddle for a tile of frames
entirely in VMEM: per frame ONE HBM read (the 2p-sample overlap-save
frame) and ONE write (the p+1-bin split spectrum on a stage grid).  The
stage matrices (a few hundred KB) ride along as replicated VMEM blocks.

Layout contract (shared by forward, MAC, and inverse — callers never
reorder bins): the forward output is the (k2, k1) STAGE GRID of the
rfft, flattened to gbins = K2*N1 entries per frame:

    grid[k2, k1]  <->  rfft bin k = k1 + N1*k2      (k <= p kept,
                                                     k > p zeroed)

`spectra_to_grid` maps partition spectra (P, p+1) onto the same grid, so
the causal frame MAC is elementwise-per-gbin exactly as on natural-order
bins.  The inverse kernel consumes the grid directly (its synthesis
weights are zero on the k > p pad) and emits the valid second half of
each overlap-save frame.

Reference parity: pinned against jnp.fft.rfft / the valid half of
jnp.fft.irfft by tests/test_pallas.py (same contract as ops/gemm_fft,
which these kernels accelerate; the NUC semantics being reproduced are
MKLNonUniformConvolver.cpp:1245-1336 overlap-save).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:          # pragma: no cover - pallas ships with jax
    pl = pltpu = None

from .gemm_fft import _factor, _mats

# Per-kernel matmul mode.  Mosaic lowers dot precision only as DEFAULT
# (bf16x1) or HIGHEST (bf16x6 ~ f32); "bf16x3" is a manual split-operand
# scheme (a = hi + lo in bf16; hi@hi + hi@lo + lo@hi with f32
# accumulation) matching XLA Precision.HIGH accuracy at 3 full-rate MXU
# passes.  Measured at the headline shape (p=16384, 64 ch-streams x
# 60 s, v5e): full conv 118 ms bf16x3 vs 140 ms f32-HIGHEST vs 147 ms
# XLA pipeline; chain-level error 7.4e-6 relative — two orders below
# the f32 chain floor (~5.6e-4), so bf16x3 is the fast-mode default.
PALLAS_DOT_MODE = "bf16x3"     # "f32" (HIGHEST) | "bf16x3"


def _split_bf16(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(mode):
    if mode == "bf16x3":
        def dot(a, b):
            ah, al = _split_bf16(a)
            bh, bl = _split_bf16(b)
            return (jnp.dot(ah, bh, preferred_element_type=jnp.float32)
                    + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
                    + jnp.dot(al, bh, preferred_element_type=jnp.float32))
        return dot

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return dot

_GRID_CACHE: dict = {}


def _pfactor(N: int) -> tuple[int, int]:
    """Pallas factorization N = N1*N2: balanced, but N2 >= 128 so the
    in-kernel (N1, N2) reshape meets the TPU lane-tile minimum."""
    N1, N2 = _factor(N)
    if N2 < 128:
        N2 = 128
        N1 = N // 128
    return N1, N2


def grid_bins(p: int) -> tuple[int, int, int]:
    """(N1, K2, gbins) for frame size N = 2p on the two-stage grid."""
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    return N1, K2, N1 * K2


def _grid_maps(p: int):
    """Host-built transposed stage operands for the fused kernels."""
    got = _GRID_CACHE.get(p)
    if got is not None:
        return got
    (_N1, _N2, _K2, f1c, f1s, ftc, fts, f2c, f2s,
     w, i1c, i1s, itc, its, i2c, i2s) = _mats(p, _pfactor(2 * p)[0])
    # forward works in (n2, k1) layout: needs ftc/fts/f2c/f2s transposed
    fwd = (f1c, f1s, ftc.T.copy(), fts.T.copy(), f2c.T.copy(),
           f2s.T.copy())
    # inverse works in (k2, k1) -> (j2, k1) layout
    inv = (w.T.copy(), i1c.T.copy(), i1s.T.copy(), itc.T.copy(),
           its.T.copy(), i2c, i2s)
    _GRID_CACHE[p] = (fwd, inv)
    return fwd, inv


def spectra_to_grid(Hr, Hi, p: int):
    """Map natural-order partition spectra (..., p+1) onto the flattened
    (k2, k1) stage grid (..., gbins).

    Because k = k1 + N1*k2 and the grid flattens row-major over (k2, k1),
    the flat grid index of bin k IS k — the map is a zero-pad from p+1 to
    gbins (the pad covers the conjugate-symmetric k > p positions the
    inverse synthesis weights already zero)."""
    _N1, _K2, g = grid_bins(p)
    pad = [(0, 0)] * (Hr.ndim - 1) + [(0, g - (p + 1))]
    return jnp.pad(Hr, pad), jnp.pad(Hi, pad)


def _fwd_kernel(osa_ref, f1c_ref, f1s_ref, ftcT_ref, ftsT_ref, f2cT_ref,
                f2sT_ref, xr_ref, xi_ref, *, tile: int, n1: int, n2: int,
                mode: str):
    # blocks are (1, tile, ...): the frame axis is reshaped to exactly
    # `tile` so any tile size is Mosaic-legal (see _xform_tile)
    dot = _make_dot(mode)
    f1c = f1c_ref[:]
    f1s = f1s_ref[:]
    ftcT = ftcT_ref[:]
    ftsT = ftsT_ref[:]
    f2cT = f2cT_ref[:]
    f2sT = f2sT_ref[:]
    for t in range(tile):
        at = osa_ref[0, t].reshape(n1, n2).T       # (n2, n1)
        # stage 1 (contract n1 -> k1); f1c/f1s are symmetric
        br = dot(at, f1c)
        bi = dot(at, f1s)
        # twiddle W_N^{n2 k1} in (n2, k1) layout
        cr = br * ftcT - bi * ftsT
        ci = br * ftsT + bi * ftcT
        # stage 2 (contract n2 -> k2): output (k2, k1)
        xr_ref[0, t] = dot(f2cT, cr) - dot(f2sT, ci)
        xi_ref[0, t] = dot(f2sT, cr) + dot(f2cT, ci)


def _inv_kernel(yr_ref, yi_ref, wT_ref, i1cT_ref, i1sT_ref, itcT_ref,
                itsT_ref, i2c_ref, i2s_ref, out_ref, *, tile: int, n1: int,
                n2: int, mode: str, batched: bool = False):
    dot = _make_dot(mode)
    wT = wT_ref[:]
    i1cT = i1cT_ref[:]
    i1sT = i1sT_ref[:]
    itcT = itcT_ref[:]
    itsT = itsT_ref[:]
    i2c = i2c_ref[:]
    i2s = i2s_ref[:]
    if batched:
        p = out_ref.shape[-1]
        _inv_stages_batched(yr_ref[0], yi_ref[0], wT, i1cT, i1sT, itcT,
                            itsT, i2c, i2s, out_ref.at[0], tile=tile,
                            n1=n1, n2=n2, p=p, dot=dot)
        return
    for t in range(tile):
        ur = yr_ref[0, t] * wT                     # (k2, k1)
        ui = yi_ref[0, t] * wT
        # stage 1 (contract k2 -> j2): (j2, k1)
        dr = dot(i1cT, ur) - dot(i1sT, ui)
        di = dot(i1sT, ur) + dot(i1cT, ui)
        # twiddle e^{+2 pi i k1 j2 / N} in (j2, k1) layout
        er = dr * itcT - di * itsT
        ei = dr * itsT + di * itcT
        # stage 2 (contract k1 -> j1, real part): (j2, j1) -> (j1, j2)
        yj = dot(er, i2c) - dot(ei, i2s)
        out_ref[0, t] = yj.T.reshape(-1)           # j = j2 + n2*j1


def _pick_tile(rows: int) -> int:
    for t in (8, 4, 2, 1):
        if rows % t == 0:
            return t
    return 1


_XFORM_VMEM_BUDGET = 14 * 2 ** 20


def _xform_need(p: int, tile: int = 8) -> int:
    """Per-cell VMEM footprint of the transform kernels: frame block +
    two grid blocks (each DOUBLE-buffered — Mosaic pipelines in/out
    blocks on any multi-step grid, observed on-chip: a (1,1)-grid probe
    at p=65536 compiles, the same kernel on a real grid fails scoped
    vmem) + every stage operand + osa scratch."""
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    g = K2 * N1
    consts = 4 * (2 * N1 * N1 + 2 * N2 * N1 + 2 * K2 * N2
                  + K2 * N1 + 2 * N2 * K2 + 2 * N2 * N1 + 2 * N1 * N1)
    return 2 * (tile * 2 * p * 4 + 2 * tile * g * 4) + consts + 2 * p * 4


def pallas_xform_supported(p: int) -> bool:
    """Whether the two-stage transform kernels fit the 16 MB scoped-vmem
    limit at SOME frame tile (the impls reshape the frame axis so any
    tile down to 1 is legal — see _xform_tile).  Callers fall back to
    the XLA gemmfft path when even tile=1 cannot fit."""
    if pl is None:
        return False
    N1, N2 = _pfactor(2 * p)
    if N1 < 8 or N2 < 128 or N1 * N2 != 2 * p:
        return False
    return _xform_need(p, 1) <= _XFORM_VMEM_BUDGET


def _xform_tile(rows: int, p: int) -> int:
    """Frame tile for the transform kernels.  Mosaic requires the
    second-to-last block dim to be divisible by 8 OR equal to the full
    axis — the impls reshape the frame axis to (rows/tile, tile, ...)
    so ANY tile is the full size of its axis and therefore legal; the
    tile is then chosen purely by the VMEM fit (large partitions force
    smaller tiles: p=65536 fits at tile 4, p=131072 at tile 2)."""
    for t in (8, 4, 2, 1):
        if rows % t == 0 and _xform_need(p, t) <= _XFORM_VMEM_BUDGET:
            return t
    return 1


def _batch_stages() -> bool:
    """Batch the per-frame stage GEMMs across the frame tile (one
    (tile*n2, n1) GEMM instead of `tile` small ones) — better MXU
    pipeline occupancy at the cost of in-VMEM relayouts between stages.
    Opt-in until measured on hardware: CONVOPEQ_PALLAS_BATCHSTAGE=1."""
    import os
    return os.environ.get("CONVOPEQ_PALLAS_BATCHSTAGE", "0") == "1"


def _fwd_stages_batched(osa_tile, f1c, f1s, ftcT, ftsT, f2cT, f2sT,
                        xr_ref, xi_ref, *, tile, n1, n2, dot):
    """Both forward stages + twiddle for a whole (tile, N) frame block as
    batched GEMMs.  osa_tile: (tile, N) VMEM value."""
    k1 = f1c.shape[1]
    k2 = f2cT.shape[0]
    A = jnp.swapaxes(osa_tile.reshape(tile, n1, n2), 1, 2)  # (tile, n2, n1)
    A2 = A.reshape(tile * n2, n1)
    br = dot(A2, f1c).reshape(tile, n2, k1)
    bi = dot(A2, f1s).reshape(tile, n2, k1)
    cr = br * ftcT[None] - bi * ftsT[None]
    ci = br * ftsT[None] + bi * ftcT[None]
    # stage 2 contracts n2: gather all frames' k1 columns side by side
    cr2 = jnp.swapaxes(cr, 0, 1).reshape(n2, tile * k1)
    ci2 = jnp.swapaxes(ci, 0, 1).reshape(n2, tile * k1)
    xr = (dot(f2cT, cr2) - dot(f2sT, ci2)).reshape(k2, tile, k1)
    xi = (dot(f2sT, cr2) + dot(f2cT, ci2)).reshape(k2, tile, k1)
    xr_ref[:] = jnp.swapaxes(xr, 0, 1)
    xi_ref[:] = jnp.swapaxes(xi, 0, 1)


def _inv_stages_batched(yr, yi, wT, i1cT, i1sT, itcT, itsT, i2c, i2s,
                        out_ref, *, tile, n1, n2, p, dot):
    """Both inverse stages + twiddle for a (tile, K2, k1) block as
    batched GEMMs (valid-half synthesis)."""
    k2 = wT.shape[0]
    k1 = wT.shape[1]
    ur = yr * wT[None]                              # (tile, k2, k1)
    ui = yi * wT[None]
    ur2 = jnp.swapaxes(ur, 0, 1).reshape(k2, tile * k1)
    ui2 = jnp.swapaxes(ui, 0, 1).reshape(k2, tile * k1)
    dr = dot(i1cT, ur2) - dot(i1sT, ui2)            # (n2, tile*k1)
    di = dot(i1sT, ur2) + dot(i1cT, ui2)
    dr = jnp.swapaxes(dr.reshape(n2, tile, k1), 0, 1)
    di = jnp.swapaxes(di.reshape(n2, tile, k1), 0, 1)
    er = dr * itcT[None] - di * itsT[None]          # (tile, n2, k1)
    ei = dr * itsT[None] + di * itcT[None]
    yj = (dot(er.reshape(tile * n2, k1), i2c)
          - dot(ei.reshape(tile * n2, k1), i2s))    # (tile*n2, j1)
    j1 = yj.shape[1]
    yj = jnp.swapaxes(yj.reshape(tile, n2, j1), 1, 2)
    out_ref[:] = yj.reshape(tile, p)                # j = j2 + n2*j1


@partial(jax.jit, static_argnums=(1, 2, 3))
def _rfft_two_stage_impl(osa, p: int, interpret: bool, mode: str):
    """rfft of (..., 2p) f32 overlap-save frames -> split grid spectra
    (..., gbins) on the (k2, k1) stage grid (see module docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = osa.shape
    rows = int(np.prod(shape[:-1]))
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    (f1c, f1s, ftcT, ftsT, f2c, f2s), _ = _grid_maps(p)
    tile = min(_pick_tile(rows), _xform_tile(rows, p))
    # frame axis reshaped to exactly `tile`: any tile is Mosaic-legal
    # (block dim == full axis), which lets big partitions shrink their
    # VMEM blocks below the 8-frame tile (see _xform_tile)
    x2 = osa.reshape(rows // tile, tile, N).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (f1c, f1s, ftcT, ftsT, f2c, f2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda r: (_Z0,) * nd)(m.ndim),
                          memory_space=pltpu.VMEM) for m in consts]
    xr, xi = pl.pallas_call(
        partial(_fwd_kernel, tile=tile, n1=N1, n2=N2, mode=mode),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((1, tile, N), lambda r: (r, _Z0, _Z0),
                               memory_space=pltpu.VMEM)] + cspec,
        out_specs=[pl.BlockSpec((1, tile, K2, N1),
                                lambda r: (r, _Z0, _Z0, _Z0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows // tile, tile, K2, N1),
                                        jnp.float32)] * 2,
        interpret=interpret,
    )(x2, *consts)
    g = K2 * N1
    return (xr.reshape(shape[:-1] + (g,)), xi.reshape(shape[:-1] + (g,)))


def rfft_two_stage_pallas(osa, p: int, interpret: bool = False):
    return _rfft_two_stage_impl(osa, p, interpret, PALLAS_DOT_MODE)


def _fwd_frames_kernel(fr_ref, f1c_ref, f1s_ref, ftcT_ref, ftsT_ref,
                       f2cT_ref, f2sT_ref, xr_ref, xi_ref, osa_buf, *,
                       tile: int, n1: int, n2: int, p: int, mode: str,
                       batched: bool):
    ft = pl.program_id(1)

    @pl.when(ft == 0)
    def _():
        osa_buf[:] = jnp.zeros_like(osa_buf)

    dot = _make_dot(mode)
    f1c = f1c_ref[:]
    f1s = f1s_ref[:]
    ftcT = ftcT_ref[:]
    ftsT = ftsT_ref[:]
    f2cT = f2cT_ref[:]
    f2sT = f2sT_ref[:]
    if batched:
        # assemble the whole (tile, N) overlap-save block, then run both
        # stages as tile-wide GEMMs; osa_buf row 0's first half carries
        # the previous step's last frame
        fr = fr_ref[0, 0]                          # (tile, p)
        osa_buf[:, p:] = fr
        if tile > 1:
            osa_buf[1:, :p] = fr[:tile - 1]
        _fwd_stages_batched(osa_buf[:], f1c, f1s, ftcT, ftsT, f2cT, f2sT,
                            xr_ref.at[0, 0], xi_ref.at[0, 0], tile=tile,
                            n1=n1, n2=n2, dot=dot)
        osa_buf[0, :p] = fr[tile - 1]              # next step's prev
        return
    for t in range(tile):
        cur = fr_ref[0, 0, t]
        osa_buf[0, p:] = cur
        at = osa_buf[0].reshape(n1, n2).T          # (n2, n1)
        br = dot(at, f1c)
        bi = dot(at, f1s)
        cr = br * ftcT - bi * ftsT
        ci = br * ftsT + bi * ftcT
        xr_ref[0, 0, t] = dot(f2cT, cr) - dot(f2sT, ci)
        xi_ref[0, 0, t] = dot(f2sT, cr) + dot(f2cT, ci)
        osa_buf[0, :p] = cur                       # becomes next frame's prev


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _rfft_frames_impl(frames, p: int, interpret: bool, mode: str,
                      batched: bool = False):
    """rfft of the overlap-save frames [prev | cur] built IN VMEM from raw
    p-sample frames (..., K, p): the previous frame is carried in kernel
    scratch across the (sequential, frames-innermost) grid, so the 2p osa
    tensor never exists in HBM — the XLA concatenate pass that built it
    (a full extra write + read of 2x the signal) is gone.  Frame 0's prev
    half is zero, the same boundary as the materialized form."""
    shape = frames.shape
    K = shape[-2]
    C = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    (f1c, f1s, ftcT, ftsT, f2c, f2s), _ = _grid_maps(p)
    tile = min(next((t for t in (8, 4, 2, 1) if K % t == 0), 1),
               _xform_tile(K, p))
    x4 = frames.reshape(C, K // tile, tile, p).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (f1c, f1s, ftcT, ftsT, f2c, f2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda c, ft: (_Z0,) * nd)(
        m.ndim), memory_space=pltpu.VMEM) for m in consts]
    xr, xi = pl.pallas_call(
        partial(_fwd_frames_kernel, tile=tile, n1=N1, n2=N2, p=p,
                mode=mode, batched=batched),
        grid=(C, K // tile),
        in_specs=[pl.BlockSpec((1, 1, tile, p),
                               lambda c, ft: (c, ft, _Z0, _Z0),
                               memory_space=pltpu.VMEM)] + cspec,
        out_specs=[pl.BlockSpec((1, 1, tile, K2, N1),
                                lambda c, ft: (c, ft, _Z0, _Z0, _Z0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((C, K // tile, tile, K2, N1),
                                        jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((tile if batched else 1, N),
                                   jnp.float32)],
        interpret=interpret,
    )(x4, *consts)
    g = K2 * N1
    return (xr.reshape(shape[:-1] + (g,)), xi.reshape(shape[:-1] + (g,)))


def rfft_frames_two_stage_pallas(frames, p: int, interpret: bool = False):
    """Split grid spectra of overlap-save frames, from RAW (..., K, p)
    frames (prev half carried in VMEM — see `_rfft_frames_impl`)."""
    return _rfft_frames_impl(frames, p, interpret, PALLAS_DOT_MODE,
                             _batch_stages())


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _irfft_valid_two_stage_impl(Yr, Yi, p: int, interpret: bool,
                                mode: str, batched: bool = False):
    """Valid (second) half of irfft from split grid spectra (..., gbins)
    -> (..., p) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = Yr.shape
    rows = int(np.prod(shape[:-1]))
    N = 2 * p
    N1, N2 = _pfactor(N)
    K2 = N2 // 2 + 1
    _, (wT, i1cT, i1sT, itcT, itsT, i2c, i2s) = _grid_maps(p)
    tile = min(_pick_tile(rows), _xform_tile(rows, p))
    yr2 = Yr.reshape(rows // tile, tile, K2, N1).astype(jnp.float32)
    yi2 = Yi.reshape(rows // tile, tile, K2, N1).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (wT, i1cT, i1sT, itcT, itsT, i2c, i2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda r: (_Z0,) * nd)(m.ndim),
                          memory_space=pltpu.VMEM) for m in consts]
    out = pl.pallas_call(
        partial(_inv_kernel, tile=tile, n1=N1, n2=N2, mode=mode,
                batched=batched),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((1, tile, K2, N1),
                               lambda r: (r, _Z0, _Z0, _Z0),
                               memory_space=pltpu.VMEM)] * 2 + cspec,
        out_specs=pl.BlockSpec((1, tile, p), lambda r: (r, _Z0, _Z0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows // tile, tile, p),
                                       jnp.float32),
        interpret=interpret,
    )(yr2, yi2, *consts)
    return out.reshape(shape[:-1] + (p,))


def irfft_valid_two_stage_pallas(Yr, Yi, p: int, interpret: bool = False):
    return _irfft_valid_two_stage_impl(Yr, Yi, p, interpret,
                                       PALLAS_DOT_MODE, _batch_stages())


# ---------------------------------------------------------------- frame MAC
#
# The causal frame MAC  Y[f] = sum_j X[f-j] * H[j]  is elementwise per
# grid bin (H differs per bin), so it is VPU work no matter how it is
# phrased; what distinguishes implementations is HBM traffic and VPU
# efficiency.  XLA's grouped-conv form (partitioned_conv._causal_frame_mac)
# needs X/H materialized as complex (two extra full passes to build).
# This kernel streams X through once (one HBM read, one Y write) and runs
# the complex multiply-accumulate as split-real FMAs over FULL (K, tb)
# frame columns — every VPU op is 8-sublane wide, unlike a per-frame FDL
# ring whose (1, tb) row ops leave 7/8 of the VPU idle.
#
# Alignment: Mosaic requires multi-row dynamic-slice starts to be
# provably 8-aligned, and the causal shift  X[f-j]  is not.  Standard
# fix: 8 phase copies of the frame column in VMEM scratch, copy b
# holding X shifted down by b rows (xp[b, P8 + b + f] = X[f], zeros
# elsewhere).  For j = 8a + b the read  xp[b, P8 - 8a : + K]  has a
# static 8-aligned row start (a is unrolled; only the phase b and the
# single-row H loads are dynamic).  The copies cost 16 VMEM passes per
# cell once; the MAC loop does ~6.P passes, so the overhead is ~4%.

_MAC_VMEM_BUDGET = 10 * 2 ** 20   # phase copies + x/y/h blocks per cell


_Z0 = np.int32(0)   # index maps must return i32: a Python-int 0 lowers
# as i64 under jax_enable_x64 and Mosaic fails to legalize func.return
# (observed on-chip; the dd kernels already use np.int32(0))


def _round8(x: int) -> int:
    return (x + 7) & ~7


def _mac_tile(K: int, g: int, P: int) -> int | None:
    """Bin tile: the largest 128-multiple divisor of the flattened grid
    axis (or the full axis when it has no such divisor) whose phase
    copies + streamed x/y/h blocks fit the VMEM budget.  None when no
    tile fits — the caller must fall back to the XLA MAC (e.g. small-p
    long-signal shapes, where the whole K-column scratch is too tall).

    K convention: callers must pass the 8-ROUNDED frame count (the gate
    `causal_mac_grid_supported` rounds; `_causal_mac_grid_impl` asserts
    its K is already a multiple of 8 — the conv pipeline pads frames).

    The estimate counts phase-copy scratch (x2 planes), x/y streamed
    blocks (2 planes each, x2 for Pallas double-buffering) and H blocks
    (x2 double-buffered); the in-kernel concatenate temporaries of the
    copy build (~3 (K+8, tb) arrays) ride in the deliberate headroom
    between the budget and real VMEM (~16 MiB)."""
    P8 = _round8(max(P - 1, 1))
    rows = P8 + 8 + K

    def need(d: int) -> int:
        return (8 * rows * 2        # phase-copy scratch, re+im planes
                + 4 * 2 * K         # x in + y out blocks, double-buffered
                + 2 * 2 * P         # h blocks, double-buffered
                + 3 * (K + 8)       # copy-build concat temporaries
                ) * d * 4

    cands = [d for d in range(128, g + 1, 128)
             if g % d == 0 and need(d) <= _MAC_VMEM_BUDGET]
    if g % 128 and need(g) <= _MAC_VMEM_BUDGET:
        cands.append(g)
    return max(cands) if cands else None


def causal_mac_grid_supported(K: int, g: int, P: int) -> bool:
    """Whether the phase-copy MAC kernel can run this shape in VMEM."""
    return _mac_tile(_round8(K), g, P) is not None


def _mac_kernel(xr_ref, xi_ref, hr_ref, hi_ref, yr_ref, yi_ref,
                xpr, xpi, *, K: int, P: int):
    P8 = _round8(max(P - 1, 1))
    tb = xpr.shape[2]

    xr = xr_ref[0]
    xi = xi_ref[0]
    zhead = jnp.zeros((P8, tb), jnp.float32)
    for b in range(8):
        xpr[b, pl.ds(0, P8)] = zhead
        xpi[b, pl.ds(0, P8)] = zhead
        # aligned store of the b-shifted frame column: rows [P8, P8+K+8)
        tail = jnp.zeros((8 - b, tb), jnp.float32)
        if b == 0:
            shr = jnp.concatenate([xr, tail], axis=0)
            shi = jnp.concatenate([xi, tail], axis=0)
        else:
            head = jnp.zeros((b, tb), jnp.float32)
            shr = jnp.concatenate([head, xr, tail], axis=0)
            shi = jnp.concatenate([head, xi, tail], axis=0)
        xpr[b, pl.ds(P8, K + 8)] = shr
        xpi[b, pl.ds(P8, K + 8)] = shi

    zf = jnp.zeros((K, tb), jnp.float32)
    yr_ref[0] = zf
    yi_ref[0] = zf

    na = (P + 7) // 8
    for a in range(na):                     # static: aligned row starts
        start = P8 - 8 * a
        nb = min(8, P - 8 * a)              # j = 8a + b < P

        def body(b, _, a=a, start=start):
            # i32 arithmetic throughout: under x64 a bare `8 * a + b`
            # mixes an i64 literal with the i32 loop index, which Mosaic
            # rejects ('arith.addi' operand type mismatch) — x64 is live
            # here when the f64-emulated chain drives the f32 kernels
            # (tools/tpu_parity.py)
            j = jnp.int32(8 * a) + b
            ar = xpr[b, pl.ds(start, K)]
            ai = xpi[b, pl.ds(start, K)]
            hr = hr_ref[pl.ds(j, 1)]
            hi = hi_ref[pl.ds(j, 1)]
            yr_ref[0] += ar * hr - ai * hi
            yi_ref[0] += ar * hi + ai * hr
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), body, jnp.int32(0))


@partial(jax.jit, static_argnums=(4, 5))
def _causal_mac_grid_impl(Xr, Xi, Gr, Gi, p: int, interpret: bool):
    shape = Xr.shape
    K = shape[-2]
    g = shape[-1]
    P = Gr.shape[0]
    C = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    if K % 8:
        raise ValueError(f"frame count K={K} must be a multiple of 8 "
                         "(the conv pipeline pads; the gate rounds)")
    tb = _mac_tile(K, g, P)
    if tb is None:
        raise ValueError(
            f"causal MAC shape (K={K}, g={g}, P={P}) exceeds the VMEM "
            "budget — gate with causal_mac_grid_supported()")
    P8 = _round8(max(P - 1, 1))
    rows = P8 + 8 + K

    xr = Xr.reshape(C, K, g)
    xi = Xi.reshape(C, K, g)

    xspec = pl.BlockSpec((1, K, tb), lambda c, bt: (c, _Z0, bt),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((P, tb), lambda c, bt: (_Z0, bt),
                         memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        partial(_mac_kernel, K=K, P=P),
        grid=(C, g // tb),
        in_specs=[xspec, xspec, hspec, hspec],
        out_specs=[xspec, xspec],
        out_shape=[jax.ShapeDtypeStruct((C, K, g), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((8, rows, tb), jnp.float32)] * 2,
        interpret=interpret,
    )(xr, xi, Gr, Gi)
    return yr.reshape(shape), yi.reshape(shape)


# ------------------------------------------------------- fused conv (P<=8)
#
# The three-kernel pipeline (frames-fwd -> MAC -> inverse) materializes
# the X and Y stage grids to HBM between kernels: per frame that is 4
# extra grid-sized HBM transfers (X write+read, Y write+read) against
# ONE frame read + ONE valid-half write of useful IO — measured ~4x the
# streamed-HBM roofline at the 1M-tap headline (PERF.md).  For P <= 8
# partitions everything fits in VMEM at once: the kernel below runs
# forward transform, causal MAC, and inverse synthesis per frame with
# the X spectra held in a VMEM ring that persists across the sequential
# frame grid — zero intermediate HBM traffic.
#
# The ring trick: with a frame tile of 8, the MAC for in-tile frame t
# needs X[8*ft + t - j] for j < P <= 8, which is ring row (8 + t - j)
# with rows 8..15 = this tile's spectra and rows 0..7 = the previous
# tile's — a STATIC index for every (t, j), so there is no Mosaic
# dynamic-slice alignment problem at all (contrast the phase-copy
# scratch the standalone MAC kernel needs).
#
# IRs longer than 8 partitions use this kernel as the NEAR layer of the
# two-level throughput plan (models/chain.py partition="fused2"): the
# tail runs at partition 8p where its per-frame traffic is ~1/8th.

_FUSED_VMEM_BUDGET = 13 * 2 ** 20


def fused_conv_supported(p: int, P: int) -> bool:
    """Whether the fused fwd+MAC+inv kernel can hold this shape in VMEM:
    X ring (16, g) x2 planes + H (P, g) x2 + stage operands + per-frame
    temporaries (~8 grid-sized arrays)."""
    if pl is None or P > 8:
        return False
    N1, N2 = _pfactor(2 * p)
    if N1 < 8 or N2 < 128 or N1 * N2 != 2 * p:
        return False
    K2 = N2 // 2 + 1
    g = K2 * N1
    mats = 4 * (N1 * N1 + 2 * N2 * N1 + K2 * N2      # fwd
                + K2 * N1 + 2 * N2 * K2 + 2 * N2 * N1 + 2 * N1 * N1)
    need = (16 * g * 2 * 4      # X ring, re+im
            + P * g * 2 * 4     # H resident
            + mats
            + 2 * p * 4         # osa carry
            + 10 * g * 4)       # per-frame temporaries (cr/ci/yr/yi/...)
    return need <= _FUSED_VMEM_BUDGET


def _fused_conv_kernel(fr_ref, f1c_ref, f1s_ref, ftcT_ref, ftsT_ref,
                       f2cT_ref, f2sT_ref, wT_ref, i1cT_ref, i1sT_ref,
                       itcT_ref, itsT_ref, i2c_ref, i2s_ref, hr_ref,
                       hi_ref, out_ref, osa_buf, xr_ring, xi_ring, *,
                       tile: int, n1: int, n2: int, p: int, P: int,
                       mode: str):
    ft = pl.program_id(1)

    @pl.when(ft == 0)
    def _():
        osa_buf[:] = jnp.zeros_like(osa_buf)
        xr_ring[0:8] = jnp.zeros_like(xr_ring[0:8])
        xi_ring[0:8] = jnp.zeros_like(xi_ring[0:8])

    dot = _make_dot(mode)
    f1c = f1c_ref[:]
    f1s = f1s_ref[:]
    ftcT = ftcT_ref[:]
    ftsT = ftsT_ref[:]
    f2cT = f2cT_ref[:]
    f2sT = f2sT_ref[:]
    wT = wT_ref[:]
    i1cT = i1cT_ref[:]
    i1sT = i1sT_ref[:]
    itcT = itcT_ref[:]
    itsT = itsT_ref[:]
    i2c = i2c_ref[:]
    i2s = i2s_ref[:]
    for t in range(tile):
        # ---- forward (osa prev carried in VMEM, as _fwd_frames_kernel)
        cur = fr_ref[0, t]
        osa_buf[0, p:] = cur
        at = osa_buf[0].reshape(n1, n2).T          # (n2, n1)
        br = dot(at, f1c)
        bi = dot(at, f1s)
        cr = br * ftcT - bi * ftsT
        ci = br * ftsT + bi * ftcT
        xr = dot(f2cT, cr) - dot(f2sT, ci)         # (k2, k1)
        xi = dot(f2sT, cr) + dot(f2cT, ci)
        osa_buf[0, :p] = cur
        xr_ring[8 + t] = xr
        xi_ring[8 + t] = xi
        # ---- causal MAC, static ring rows (j ascending, as _mac_kernel)
        yr = xr * hr_ref[0] - xi * hi_ref[0]
        yi = xr * hi_ref[0] + xi * hr_ref[0]
        for j in range(1, P):
            ar = xr_ring[8 + t - j]
            ai = xi_ring[8 + t - j]
            yr += ar * hr_ref[j] - ai * hi_ref[j]
            yi += ar * hi_ref[j] + ai * hr_ref[j]
        # ---- inverse valid-half synthesis (as _inv_kernel)
        ur = yr * wT
        ui = yi * wT
        dr = dot(i1cT, ur) - dot(i1sT, ui)
        di = dot(i1sT, ur) + dot(i1cT, ui)
        er = dr * itcT - di * itsT
        ei = dr * itsT + di * itcT
        yj = dot(er, i2c) - dot(ei, i2s)
        out_ref[0, t] = yj.T.reshape(-1)           # j = j2 + n2*j1
    xr_ring[0:8] = xr_ring[8:16]                   # tile becomes prev
    xi_ring[0:8] = xi_ring[8:16]


@partial(jax.jit, static_argnums=(3, 4, 5))
def _fused_conv_impl(frames, Gr3, Gi3, p: int, interpret: bool, mode: str):
    shape = frames.shape
    K = shape[-2]
    C = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    if K % 8:
        raise ValueError("frame count must be pre-padded to x8")
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    P = Gr3.shape[0]
    (f1c, f1s, ftcT, ftsT, f2c, f2s), \
        (wT, i1cT, i1sT, itcT, itsT, i2c, i2s) = _grid_maps(p)
    tile = 8
    x3 = frames.reshape(C, K, p).astype(jnp.float32)
    consts = [jnp.asarray(m, jnp.float32)
              for m in (f1c, f1s, ftcT, ftsT, f2c, f2s,
                        wT, i1cT, i1sT, itcT, itsT, i2c, i2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda c, ft: (_Z0,) * nd)(
        m.ndim), memory_space=pltpu.VMEM) for m in consts]
    hspec = [pl.BlockSpec((P, K2, N1), lambda c, ft: (_Z0, _Z0, _Z0),
                          memory_space=pltpu.VMEM)] * 2
    out = pl.pallas_call(
        partial(_fused_conv_kernel, tile=tile, n1=N1, n2=N2, p=p, P=P,
                mode=mode),
        grid=(C, K // tile),
        in_specs=[pl.BlockSpec((1, tile, p), lambda c, ft: (c, ft, _Z0),
                               memory_space=pltpu.VMEM)] + cspec + hspec,
        out_specs=pl.BlockSpec((1, tile, p), lambda c, ft: (c, ft, _Z0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, K, p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 2 * p), jnp.float32),
                        pltpu.VMEM((16, K2, N1), jnp.float32),
                        pltpu.VMEM((16, K2, N1), jnp.float32)],
        interpret=interpret,
    )(x3, *consts, Gr3, Gi3)
    return out.reshape(shape)


def fused_conv_frames_pallas(frames, Gr, Gi, p: int,
                             interpret: bool = False):
    """Fully-fused partitioned conv for P <= 8: raw (..., K, p) frames ->
    valid-half outputs (..., K, p), X spectra never leaving VMEM.

    Gr/Gi: (P, gbins) flat grid spectra from `spectra_to_grid`.  K is
    padded to x8 here (causality keeps the kept rows exact)."""
    frames = jnp.asarray(frames, jnp.float32)
    K = frames.shape[-2]
    kpad = _round8(K) - K
    if kpad:
        pad = [(0, 0)] * (frames.ndim - 2) + [(0, kpad), (0, 0)]
        frames = jnp.pad(frames, pad)
    N1, N2 = _pfactor(2 * p)
    K2 = N2 // 2 + 1
    Gr3 = jnp.asarray(Gr, jnp.float32).reshape(-1, K2, N1)
    Gi3 = jnp.asarray(Gi, jnp.float32).reshape(-1, K2, N1)
    y = _fused_conv_impl(frames, Gr3, Gi3, p, interpret, PALLAS_DOT_MODE)
    if kpad:
        y = y[..., :K, :]
    return y


def causal_mac_grid_pallas(Xr, Xi, Gr, Gi, p: int, interpret: bool = False):
    """Split-real causal frame MAC on the (k2, k1) stage grid.

    Xr/Xi: (..., K, gbins) frame spectra from `rfft_two_stage_pallas`;
    Gr/Gi: (P, gbins) partition spectra from `spectra_to_grid`.
    Returns (Yr, Yi) with Y[..., f, :] = sum_j X[..., f-j, :] * H[j, :]
    (complex semantics on split planes; zero for f-j < 0).

    The kernel tiles the frame axis in 8s (Mosaic sublane tiling), so K
    is zero-padded up to a multiple of 8 here and trimmed after —
    causality makes the kept rows exact.  `causal_mac_grid_supported`
    gates on the same rounded K (the VMEM fit is evaluated at _round8(K)
    in both places — ADVICE r2 contract).  The conv pipeline pre-pads,
    making this a no-op there.
    """
    Xr = jnp.asarray(Xr, jnp.float32)
    Xi = jnp.asarray(Xi, jnp.float32)
    K = Xr.shape[-2]
    kpad = _round8(K) - K
    if kpad:
        pad = [(0, 0)] * (Xr.ndim - 2) + [(0, kpad), (0, 0)]
        Xr = jnp.pad(Xr, pad)
        Xi = jnp.pad(Xi, pad)
    Yr, Yi = _causal_mac_grid_impl(
        Xr, Xi,
        jnp.asarray(Gr, jnp.float32), jnp.asarray(Gi, jnp.float32),
        p, interpret)
    if kpad:
        Yr = Yr[..., :K, :]
        Yi = Yi[..., :K, :]
    return Yr, Yi
