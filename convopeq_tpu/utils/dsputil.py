"""Small numeric utilities shared across the DSP chain.

Reference parity notes (lonewolf-jp/ConvoPeq):
- `equal_power_sin`: 9th-order Taylor sine of x*pi/2 used for the equal-power
  wet/dry mix (ref: src/convolver/ConvolverProcessor.Runtime.cpp:26-31).
- dB <-> linear conversions follow the usual 20*log10 convention.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Output headroom applied before dither (= -1 dBFS).
# Ref: src/audioengine/AudioEngine.Processing.DSPCoreDouble.cpp:581
K_OUTPUT_HEADROOM = 0.8912509381337456

# Denormal threshold for audio state flushing.
# Ref: src/DspNumericPolicy.h:132 (kDenormThresholdDouble)
DENORM_THRESHOLD = 1.0e-20


def db_to_linear(db):
    return jnp.power(10.0, jnp.asarray(db) / 20.0)


def linear_to_db(lin, floor_db=-200.0):
    lin = jnp.asarray(lin)
    return jnp.where(lin > 0.0, 20.0 * jnp.log10(jnp.maximum(lin, 1e-30)), floor_db)


def equal_power_sin_poly(x):
    """The equalPowerSin polynomial itself — 9th-order Taylor of
    sin(x*pi/2), no libm, no casting: works on NumPy arrays AND traced
    JAX arrays (the per-sample mix-ramp path evaluates it on device).
    Single definition so the scalar steady-state gain and the per-sample
    ramp gain can never desynchronize.

    Ref: equalPowerSin, src/convolver/ConvolverProcessor.Runtime.cpp:26-31.
    """
    t = x * (np.pi * 0.5)
    t2 = t * t
    return t * (1.0 + t2 * (-1.0 / 6.0 + t2 * (1.0 / 120.0
                + t2 * (-1.0 / 5040.0 + t2 * (1.0 / 362880.0)))))


def equal_power_sin(x):
    """equalPowerSin on host values (mix is configuration, evaluated at
    trace time in float64) — wet gain = equal_power_sin(mix), dry gain =
    equal_power_sin(1-mix)."""
    return equal_power_sin_poly(np.asarray(x, np.float64))


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (host-side, static shapes only)."""
    if n <= 1:
        return 1
    return 1 << (int(n) - 1).bit_length()


def rms(x, axis=-1):
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.mean(x * x, axis=axis))
