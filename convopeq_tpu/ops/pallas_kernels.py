"""Pallas TPU kernel for the sequential dither quantizer.

`error_feedback_quantize` — the sequential dither/noise-shaping quantizer
(PsychoacousticDither.h:323-354 stereo loop; FixedNoiseShaper.h
processSample).  The error-feedback recurrence is nonlinear through the
rounding step, so it cannot scan associatively; the TPU-native form keeps
the whole batch of streams in VPU lanes (time in sublanes), carries the
shaper state in registers through an on-chip loop, and streams the audio
through VMEM chunks — the per-sample cost is a handful of (1, R) vector
ops instead of a full XLA scan iteration (measured ~20x faster than
`lax.scan` at the headline batch).

(The FDL-MAC kernels that used to live here were superseded by the fused
grid kernels in ops/pallas_gemm_fft.py — causal_mac_grid_pallas is the
load-bearing MAC on the batch path — and were removed rather than kept
unwired.)

Falls back to interpreter mode off-TPU (used by the CPU test suite).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:          # pragma: no cover
    HAVE_PALLAS = False


_Z0 = np.int32(0)   # index maps must return i32: a Python-int 0 lowers
# as i64 under jax_enable_x64 and Mosaic fails to legalize func.return


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:       # pragma: no cover
        return False


def error_feedback_quantize(x, d2, coeffs, scale: float,
                            headroom: float,
                            mode: str = "psycho",
                            chunk: int = 512,
                            interpret=None,
                            state=None,
                            return_state: bool = False,
                            unroll: int = 8):
    """Sequential error-feedback quantizer, batched over VPU lanes.

    x:  (R, N) signal rows (streams x channels flattened).
    d2: (R, N, 2) uniform draws in [0, 1).
    coeffs: (order,) feedback coefficients (psycho: kCoeffTable row;
        fixed4/fixed15: preset row).
    mode:
      "psycho" — tmp = x*h + tpdf*scale + c.z;  q = round(tmp/scale)*scale;
                 z <- (tmp - q, z[:-1])              (PsychoacousticDither)
      "fixed"  — y = x*h - c.e; q = quantize(y) with [-1, 1-scale] clamp +
                 TPDF + round; e <- (clamp(q - y, +-2 scale), e[:-1])
                 (FixedNoiseShaper)
      "fixed15" — same, plus Fixed15Tap's post-round integer-range clamp
                 (q clamped to [-1, 1-scale], Fixed15TapNoiseShaper.h:343)
      "lattice" — LatticeNoiseShaper (LatticeNoiseShaper.h:229-295):
                 tmp = x*h + c.s (ladder tap-out); q = quantize(tmp) with
                 the integer-range clamp; err = clamp(q - tmp, +-2 scale)
                 drives the lattice-ladder state advance with per-stage
                 clamp +-2.0.  coeffs must arrive pre-clamped to the
                 +-0.85 reflection limit (models/dither.py does this).
    state: optional (R, order) shaper carry (error history / ladder
        state, matching the lax.scan kernels' state layout); zeros when
        None.  return_state=True additionally returns the final (R,
        order) carry — together these give the streaming/serving path a
        Pallas-rate stateful quantizer.
    Returns q: (R, N), or (q, state_out).  Bit-compatible with the
    lax.scan reference kernels in models/dither.py (same op order, same
    rounding).
    """
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    if interpret is None:
        interpret = not _on_tpu()
    r, n = x.shape
    order = int(np.shape(coeffs)[0])
    dt = x.dtype
    lane = 128
    rp = -(-r // lane) * lane
    nc = -(-n // chunk)
    npad = nc * chunk
    x = jnp.pad(x, [(0, rp - r), (0, npad - n)])
    # precompute the dither term at full rate (elementwise, XLA fuses it)
    if mode == "psycho":
        dterm = ((d2[..., 0] - 0.5) + (d2[..., 1] - 0.5)) * scale
    else:
        dterm = (d2[..., 0] + d2[..., 1] - 1.0) * scale
    dterm = jnp.pad(jnp.asarray(dterm, dt), [(0, rp - r), (0, npad - n)])
    xt = x.T                      # (Npad, Rpad): time-major, rows in lanes
    dtm = dterm.T
    c = [float(v) for v in np.asarray(coeffs)]   # weak-typed: keeps f32 f32
    inv_scale = 1.0 / scale
    err_lim = 2.0 * scale

    if state is None:
        s0 = jnp.zeros((order, rp), dt)
    else:
        s0 = jnp.pad(jnp.asarray(state, dt).T, [(0, 0), (0, rp - r)])
    # Without the mask the padded tail keeps advancing the carry past
    # sample n; only the stateful path pays for the per-sample guard.
    mask_tail = return_state and npad != n

    def kernel(s0_ref, x_ref, d_ref, q_ref, zout_ref, z_ref):
        step0 = pl.program_id(0) == 0
        if mask_tail:
            valid = np.int32(n) - pl.program_id(0) * np.int32(chunk)

        @pl.when(step0)
        def _():
            z_ref[:] = s0_ref[:]

        def body(t, z):
            xi = x_ref[t, :]
            di = d_ref[t, :]
            shaped = c[0] * z[0]
            for i in range(1, order):
                shaped = shaped + c[i] * z[i]
            if mode == "psycho":
                tmp = xi * headroom + di + shaped
                q = jnp.round(tmp * inv_scale) * scale
                err = tmp - q
            elif mode in ("lattice", "lattice_fir"):
                tmp = xi * headroom + shaped
                yc = jnp.clip(tmp, -1.0, 1.0 - scale)
                q = jnp.round((yc + di) * inv_scale) * scale
                q = jnp.clip(q, -1.0, 1.0 - scale)
                err = jnp.clip(q - tmp, -err_lim, err_lim)
                q_ref[t, :] = q
                fwd = err
                new = []
                if mode == "lattice_fir":
                    # textbook analysis-ladder store (finite-memory,
                    # bounded states — see models/dither.lattice_dither
                    # ladder="fir")
                    gprev = err
                    for i in range(order):
                        nf = fwd + c[i] * z[i]
                        ng = c[i] * fwd + z[i]
                        new.append(jnp.clip(gprev, -2.0, 2.0))
                        gprev = ng
                        fwd = nf
                else:
                    # reference advanceState (per-stage clamp +-2.0),
                    # defect included (LatticeNoiseShaper.h:276-280)
                    for i in range(order):
                        nf = fwd + c[i] * z[i]
                        new.append(jnp.clip(c[i] * fwd + z[i], -2.0, 2.0))
                        fwd = nf
                return tuple(new)
            else:
                y = xi * headroom - shaped
                yc = jnp.clip(y, -1.0, 1.0 - scale)
                q = jnp.round((yc + di) * inv_scale) * scale
                if mode == "fixed15":
                    q = jnp.clip(q, -1.0, 1.0 - scale)
                err = jnp.clip(q - y, -err_lim, err_lim)
            q_ref[t, :] = q
            return (err,) + z[:-1]

        if mask_tail:
            inner = body

            def body(t, z):
                nz = inner(t, z)
                keep = t < valid
                return tuple(jnp.where(keep, n_i, z_i)
                             for n_i, z_i in zip(nz, z))

        z = tuple(z_ref[i, :] for i in range(order))
        if unroll > 1 and chunk % unroll == 0:
            # the per-sample body is a handful of (1, R) vector ops;
            # at small row counts the loop bookkeeping is a measurable
            # fraction of the iteration, so unroll the sequential loop
            # (identical math/op order — just fewer loop iterations)
            sbody = body

            def body(i, z):
                t0 = i * np.int32(unroll)
                for uu in range(unroll):
                    z = sbody(t0 + np.int32(uu), z)
                return z

            z = jax.lax.fori_loop(0, chunk // unroll, body, z)
        else:
            z = jax.lax.fori_loop(0, chunk, body, z)
        for i in range(order):
            z_ref[i, :] = z[i]
            zout_ref[i, :] = z[i]

    qt, zf = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[pl.BlockSpec((order, rp), lambda i: (_Z0, _Z0)),
                  pl.BlockSpec((chunk, rp), lambda i: (i, _Z0)),
                  pl.BlockSpec((chunk, rp), lambda i: (i, _Z0))],
        # the (order, rp) state output maps every grid step to the same
        # block; TPU grids run sequentially so the last step's write wins
        out_specs=[pl.BlockSpec((chunk, rp), lambda i: (i, _Z0)),
                   pl.BlockSpec((order, rp), lambda i: (_Z0, _Z0))],
        out_shape=[jax.ShapeDtypeStruct((npad, rp), dt),
                   jax.ShapeDtypeStruct((order, rp), dt)],
        scratch_shapes=[pltpu.VMEM((order, rp), dt)],
        interpret=interpret,
    )(s0, xt, dtm)
    q = qt.T[:r, :n]
    if return_state:
        return q, zf.T[:r, :]
    return q
