"""Simple peak limiter (src/audioengine/SimplePeakLimiter.h).

Zero-attack, adaptive-release peak limiter with a cubic soft knee:
  peak = max(|L|, |R|); clipStart = threshold - knee/2
  knee region:  g = 1 - (1 - threshold/peak) * t^2 (3 - 2t)
  above:        g = threshold / peak
  envelope: attack instant, release one-pole —
      env = g            if g < env
      env = 1 + (env-1)*releaseCoeff   otherwise
  releaseCoeff = exp(-1 / (sr * releaseSec))

TPU-native: substituting e = 1 - env, d = 1 - desiredGain turns the
envelope into  e[n] = max(d[n], r * e[n-1])  — a max-plus linear
recurrence, evaluated with `jax.lax.associative_scan` (O(log N) depth, no
sample loop).  combine((a1,v1),(a2,v2)) = (a1*a2, max(v1*a2, v2)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _maxplus_combine(left, right):
    la, lv = left
    ra, rv = right
    return (la * ra, jnp.maximum(lv * ra, rv))


def desired_gain(peak, threshold: float, knee: float):
    clip_start = threshold - knee * 0.5
    safe = jnp.maximum(peak, 1e-12)
    t = jnp.clip((safe - clip_start) / knee, 0.0, 1.0)
    ks = t * t * (3.0 - 2.0 * t)
    g_knee = 1.0 - (1.0 - threshold / safe) * ks
    g_lim = threshold / safe
    g = jnp.where(safe <= threshold, g_knee, g_lim)
    return jnp.where(safe > clip_start, g, 1.0)


def peak_limiter(x, sample_rate: float, threshold: float = 0.8912509381337456,
                 knee: float = 0.122, release_ms: float = 100.0, env0=None,
                 exact: bool = False):
    """Limit (..., 2, N) stereo (linked channels).  Returns (y, env_final).

    env0: optional (...,) initial envelope (1.0 = no reduction).
    exact=False uses the parallel max-plus scan, which deviates from the
    reference's branchy release only by single-sample dips of magnitude
    <= (1 - releaseCoeff) at attack/release crossings (~2e-4 of the gain
    at 100 ms / 48 kHz); exact=True runs the branch-exact `lax.scan`.
    """
    x = jnp.asarray(x)
    dt = x.dtype
    r = float(np.exp(-1.0 / (sample_rate * release_ms * 0.001))) \
        if release_ms > 0.0 and sample_rate > 0.0 else 0.0

    peak = jnp.max(jnp.abs(x), axis=-2)                # (..., N)
    d = 1.0 - desired_gain(peak, threshold, knee)      # e-domain drive
    batch = d.shape[:-1]
    if env0 is None:
        e0 = jnp.zeros(batch, dt)
    else:
        e0 = 1.0 - jnp.asarray(env0, dt)

    if exact:
        def step(e, dn):
            e = jnp.where(dn > e, dn, r * e)
            return e, e
        _, es = jax.lax.scan(step, e0, jnp.moveaxis(d, -1, 0))
        e = jnp.moveaxis(es, 0, -1)
    else:
        a = jnp.full(d.shape, r, dt)
        am, vm = jax.lax.associative_scan(_maxplus_combine, (a, d), axis=-1)
        # include the initial state: e[n] = max(vm[n], e0 * am[n])
        e = jnp.maximum(vm, e0[..., None] * am)
    env = 1.0 - e
    return x * env[..., None, :], env[..., -1]
