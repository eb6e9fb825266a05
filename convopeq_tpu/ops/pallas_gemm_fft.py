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
    dot = _make_dot(mode)
    f1c = f1c_ref[:]
    f1s = f1s_ref[:]
    ftcT = ftcT_ref[:]
    ftsT = ftsT_ref[:]
    f2cT = f2cT_ref[:]
    f2sT = f2sT_ref[:]
    for t in range(tile):
        at = osa_ref[t].reshape(n1, n2).T          # (n2, n1)
        # stage 1 (contract n1 -> k1); f1c/f1s are symmetric
        br = dot(at, f1c)
        bi = dot(at, f1s)
        # twiddle W_N^{n2 k1} in (n2, k1) layout
        cr = br * ftcT - bi * ftsT
        ci = br * ftsT + bi * ftcT
        # stage 2 (contract n2 -> k2): output (k2, k1)
        xr_ref[t] = dot(f2cT, cr) - dot(f2sT, ci)
        xi_ref[t] = dot(f2sT, cr) + dot(f2cT, ci)


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
        _inv_stages_batched(yr_ref[:], yi_ref[:], wT, i1cT, i1sT, itcT,
                            itsT, i2c, i2s, out_ref, tile=tile, n1=n1,
                            n2=n2, p=p, dot=dot)
        return
    for t in range(tile):
        ur = yr_ref[t] * wT                        # (k2, k1)
        ui = yi_ref[t] * wT
        # stage 1 (contract k2 -> j2): (j2, k1)
        dr = dot(i1cT, ur) - dot(i1sT, ui)
        di = dot(i1sT, ur) + dot(i1cT, ui)
        # twiddle e^{+2 pi i k1 j2 / N} in (j2, k1) layout
        er = dr * itcT - di * itsT
        ei = dr * itsT + di * itcT
        # stage 2 (contract k1 -> j1, real part): (j2, j1) -> (j1, j2)
        yj = dot(er, i2c) - dot(ei, i2s)
        out_ref[t] = yj.T.reshape(-1)              # j = j2 + n2*j1


def _pick_tile(rows: int) -> int:
    for t in (8, 4, 2, 1):
        if rows % t == 0:
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
    tile = _pick_tile(rows)
    x2 = osa.reshape(rows, N).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (f1c, f1s, ftcT, ftsT, f2c, f2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda r: (0,) * nd)(m.ndim),
                          memory_space=pltpu.VMEM) for m in consts]
    xr, xi = pl.pallas_call(
        partial(_fwd_kernel, tile=tile, n1=N1, n2=N2, mode=mode),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, N), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)] + cspec,
        out_specs=[pl.BlockSpec((tile, K2, N1), lambda r: (r, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, K2, N1), jnp.float32)] * 2,
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
        fr = fr_ref[0]                             # (tile, p)
        osa_buf[:, p:] = fr
        if tile > 1:
            osa_buf[1:, :p] = fr[:tile - 1]
        _fwd_stages_batched(osa_buf[:], f1c, f1s, ftcT, ftsT, f2cT, f2sT,
                            xr_ref.at[0], xi_ref.at[0], tile=tile, n1=n1,
                            n2=n2, dot=dot)
        osa_buf[0, :p] = fr[tile - 1]              # next step's prev
        return
    for t in range(tile):
        cur = fr_ref[0, t]
        osa_buf[0, p:] = cur
        at = osa_buf[0].reshape(n1, n2).T          # (n2, n1)
        br = dot(at, f1c)
        bi = dot(at, f1s)
        cr = br * ftcT - bi * ftsT
        ci = br * ftsT + bi * ftcT
        xr_ref[0, t] = dot(f2cT, cr) - dot(f2sT, ci)
        xi_ref[0, t] = dot(f2sT, cr) + dot(f2cT, ci)
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
    tile = next((t for t in (8, 4, 2, 1) if K % t == 0), 1)
    x3 = frames.reshape(C, K, p).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (f1c, f1s, ftcT, ftsT, f2c, f2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda c, ft: (0,) * nd)(
        m.ndim), memory_space=pltpu.VMEM) for m in consts]
    xr, xi = pl.pallas_call(
        partial(_fwd_frames_kernel, tile=tile, n1=N1, n2=N2, p=p,
                mode=mode, batched=batched),
        grid=(C, K // tile),
        in_specs=[pl.BlockSpec((1, tile, p), lambda c, ft: (c, ft, 0),
                               memory_space=pltpu.VMEM)] + cspec,
        out_specs=[pl.BlockSpec((1, tile, K2, N1),
                                lambda c, ft: (c, ft, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((C, K, K2, N1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((tile if batched else 1, N),
                                   jnp.float32)],
        interpret=interpret,
    )(x3, *consts)
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
    tile = _pick_tile(rows)
    yr2 = Yr.reshape(rows, K2, N1).astype(jnp.float32)
    yi2 = Yi.reshape(rows, K2, N1).astype(jnp.float32)

    consts = [jnp.asarray(m, jnp.float32)
              for m in (wT, i1cT, i1sT, itcT, itsT, i2c, i2s)]
    cspec = [pl.BlockSpec(m.shape, (lambda nd: lambda r: (0,) * nd)(m.ndim),
                          memory_space=pltpu.VMEM) for m in consts]
    out = pl.pallas_call(
        partial(_inv_kernel, tile=tile, n1=N1, n2=N2, mode=mode,
                batched=batched),
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, K2, N1), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)] * 2 + cspec,
        out_specs=pl.BlockSpec((tile, p), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, p), jnp.float32),
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
# measured 25-30 ms at the headline shape — ~2x its VPU flop bound — and
# needs X/H materialized as complex (two extra full passes to build).
# This kernel streams X through once (one HBM read, one Y write), keeps a
# per-bin-tile FDL ring of the last P frame spectra in VMEM scratch
# (frames iterate innermost in the grid, so the ring persists across
# steps; it is zeroed at frame 0 — warmup slots stay zero, which IS the
# causal boundary, same argument as runtime/streaming's FDL ring), and
# runs the complex multiply-accumulate as split-real FMAs.

_MAC_RING_BUDGET = 6 * 2 ** 20   # ring + H VMEM bytes per bin tile


def _mac_tiles(K: int, g: int, P: int) -> tuple[int, int]:
    """(frame tile, bin tile): frame tile divides K; the bin tile is the
    largest 128-multiple divisor of the flattened grid axis whose ring +
    H tiles fit the VMEM budget (Mosaic needs the lane-dim block to be a
    multiple of 128, the sublane dims of 8 — the grid's K2 axis is odd,
    so tiling happens on the flat axis)."""
    tf = next((t for t in (8, 4, 2, 1) if K % t == 0), 1)
    tb = 128 if g % 128 == 0 else g
    for d in range(128, g + 1, 128):
        if g % d == 0 and P * d * 16 <= _MAC_RING_BUDGET:
            tb = max(tb, d)
    return tf, tb


def _mac_kernel(xr_ref, xi_ref, hr_ref, hi_ref, yr_ref, yi_ref,
                ring_r, ring_i, *, tf: int, P: int):
    ft = pl.program_id(2)

    @pl.when(ft == 0)
    def _():
        ring_r[:] = jnp.zeros_like(ring_r)
        ring_i[:] = jnp.zeros_like(ring_i)

    Pc = jnp.int32(P)
    for t in range(tf):
        f = ft * tf + t
        slot = jax.lax.rem(f, Pc)
        xr = xr_ref[0, pl.ds(t, 1)]                # (1, tb)
        xi = xi_ref[0, pl.ds(t, 1)]
        ring_r[pl.ds(slot, 1)] = xr
        ring_i[pl.ds(slot, 1)] = xi

        def body(j, acc):
            ar, ai = acc
            q = jax.lax.rem(f - j + Pc, Pc)
            rr = ring_r[pl.ds(q, 1)]
            ri = ring_i[pl.ds(q, 1)]
            hr = hr_ref[pl.ds(j, 1)]
            hi = hi_ref[pl.ds(j, 1)]
            return (ar + rr * hr - ri * hi, ai + rr * hi + ri * hr)

        zero = jnp.zeros_like(xr)
        yr, yi = jax.lax.fori_loop(0, P, body, (zero, zero))
        yr_ref[0, pl.ds(t, 1)] = yr
        yi_ref[0, pl.ds(t, 1)] = yi


@partial(jax.jit, static_argnums=(4, 5))
def _causal_mac_grid_impl(Xr, Xi, Gr, Gi, p: int, interpret: bool):
    shape = Xr.shape
    K = shape[-2]
    g = shape[-1]
    P = Gr.shape[0]
    C = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    tf, tb = _mac_tiles(K, g, P)

    xr = Xr.reshape(C, K, g)
    xi = Xi.reshape(C, K, g)

    xspec = pl.BlockSpec((1, tf, tb), lambda c, bt, ft: (c, ft, bt),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((P, tb), lambda c, bt, ft: (0, bt),
                         memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        partial(_mac_kernel, tf=tf, P=P),
        grid=(C, g // tb, K // tf),
        in_specs=[xspec, xspec, hspec, hspec],
        out_specs=[xspec, xspec],
        out_shape=[jax.ShapeDtypeStruct((C, K, g), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((P, tb), jnp.float32)] * 2,
        interpret=interpret,
    )(xr, xi, Gr, Gi)
    return yr.reshape(shape), yi.reshape(shape)


def causal_mac_grid_pallas(Xr, Xi, Gr, Gi, p: int, interpret: bool = False):
    """Split-real causal frame MAC on the (k2, k1) stage grid.

    Xr/Xi: (..., K, gbins) frame spectra from `rfft_two_stage_pallas`;
    Gr/Gi: (P, gbins) partition spectra from `spectra_to_grid`.
    Returns (Yr, Yi) with Y[..., f, :] = sum_j X[..., f-j, :] * H[j, :]
    (complex semantics on split planes; zero for f-j < 0).
    """
    return _causal_mac_grid_impl(
        jnp.asarray(Xr, jnp.float32), jnp.asarray(Xi, jnp.float32),
        jnp.asarray(Gr, jnp.float32), jnp.asarray(Gi, jnp.float32),
        p, interpret)
