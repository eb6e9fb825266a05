"""Stereo convolver processor — wet/dry mix over per-channel NUC engines.

Rebuild of the RT path of src/ConvolverProcessor.h / src/convolver/
ConvolverProcessor.Runtime.cpp:
- StereoConvolver: one NUC instance per channel (ConvolverProcessor.h:661,
  Runtime.cpp StereoConvolver::process = Add + Get per chunk).
- equal-power wet/dry mix (Runtime.cpp:601-603, 675-676):
    wet gain = equalPowerSin(mix) * CONVOLUTION_HEADROOM_GAIN (= 1.0,
    ConvolverProcessor.h:209), dry gain = equalPowerSin(1 - mix),
  where equalPowerSin is the 9th-order Taylor sine of x*pi/2.
- the reference aligns the dry signal through a latency-delay ring; in the
  offline form the convolution path has zero stream offset (see
  models/nuc.py), so dry needs no alignment.

Wet-only (mix=1) skips the dry path; mix=0 is the dry-only fast path.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dsputil import equal_power_sin
from .nuc import FilterSpec, NUCState, nuc_prepare, nuc_convolve

CONVOLUTION_HEADROOM_GAIN = 1.0  # ConvolverProcessor.h:209


@dataclass
class StereoConvolverState:
    """Prepared stereo convolver: one NUCState per channel.

    A JAX pytree — pass it as a jit argument, not a closure constant (see
    NUCState docstring)."""
    left: NUCState
    right: NUCState


jax.tree_util.register_pytree_node(
    StereoConvolverState,
    lambda s: ((s.left, s.right), None),
    lambda _, ch: StereoConvolverState(left=ch[0], right=ch[1]))


def stereo_prepare(ir_stereo, block_size: int, spec: FilterSpec | None = None,
                   scale: float = 1.0, enable_direct_head: bool = False,
                   apply_spectrum_filter: bool = True,
                   unit_layer_gains: bool = False) -> StereoConvolverState:
    """loadImpulseResponse/SetImpulse for both channels.

    ir_stereo: (2, N) or (N,) (mono IR used for both channels, as the
    reference duplicates a mono IR across the stereo pair).
    """
    ir = jnp.asarray(ir_stereo)
    if ir.ndim == 1:
        ir = jnp.stack([ir, ir])
    mk = lambda ch: nuc_prepare(ir[ch], block_size, spec, scale,
                                enable_direct_head, apply_spectrum_filter,
                                unit_layer_gains)
    return StereoConvolverState(left=mk(0), right=mk(1))


def _equal_power_sin_traced(m):
    """equalPowerSin on a traced array (the per-sample smoothing path,
    ConvolverProcessor.Runtime.cpp:601-603: wg[i]=eps(mix_i)*headroom,
    dg[i]=eps(1-mix_i) with mix_i from the LinearRamp).  Same polynomial
    object as the scalar steady-state gain."""
    from ..utils.dsputil import equal_power_sin_poly
    return equal_power_sin_poly(m)


def convolver_process(x, state: StereoConvolverState, mix: float = 1.0,
                      mix_ramp=None):
    """Process (..., 2, N) through the stereo convolver with wet/dry mix.

    mix_ramp: optional per-sample mix values (N,) at the processing rate
    — the reference's mixSmoother path (a LinearRamp over
    smoothingTimeSec, default 0.1 s, evaluated through equalPowerSin per
    sample).  When given it overrides the scalar `mix`.
    """
    x = jnp.asarray(x)
    wet_l = nuc_convolve(x[..., 0, :], state.left)
    wet_r = nuc_convolve(x[..., 1, :], state.right)
    wet = jnp.stack([wet_l, wet_r], axis=-2)
    if mix_ramp is not None:
        m = jnp.asarray(mix_ramp, x.dtype)
        wet_g = _equal_power_sin_traced(m) * CONVOLUTION_HEADROOM_GAIN
        dry_g = _equal_power_sin_traced(1.0 - m)
        return wet * wet_g + x * dry_g
    mix = float(mix)
    if mix >= 1.0:
        wet_g = float(equal_power_sin(1.0)) * CONVOLUTION_HEADROOM_GAIN
        return wet * wet_g
    wet_g = float(np.asarray(equal_power_sin(mix))) * CONVOLUTION_HEADROOM_GAIN
    dry_g = float(np.asarray(equal_power_sin(1.0 - mix)))
    return wet * wet_g + x * dry_g
