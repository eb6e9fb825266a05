"""Maximum-throughput mode: the folded static-config chain.

For a fixed linear config, the DC blockers + EQ + output filter + HC/LC
curve fold into the impulse response at rebuild time (exact to ~1e-13 vs
the staged cascade) — the runtime chain is one NUC convolution.  This is
the headline-bench path (see PERF.md).

    python examples/04_folded_max_throughput.py          # TPU f32
    JAX_PLATFORMS=cpu python examples/04_folded_max_throughput.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Honor a JAX_PLATFORMS=cpu request even on hosts whose site hooks
# force-register an accelerator plugin and overwrite jax_platforms
# (the env var alone is not authoritative there).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from convopeq_tpu.models.chain import (
    ChainConfig, fused_eligible, prepare_folded_convolver,
    process_chain, process_chain_fused)
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.nuc import FilterSpec


def main():
    sr = 48000.0
    rng = np.random.default_rng(0)
    # CPU demo runs a reduced workload (the full one is a TPU benchmark;
    # an f64 CPU compile+run at 200k taps x 80 s takes many minutes)
    on_cpu = jax.devices()[0].platform == "cpu"
    taps = 30_000 if on_cpu else 200_000
    batch, secs = (2, 2.0) if on_cpu else (8, 10.0)
    ir = np.stack([rng.normal(size=taps) *
                   np.exp(-np.arange(taps) / (taps / 6.7))] * 2) * 0.02

    cfg = ChainConfig(sample_rate=sr)
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)
    assert fused_eligible(cfg, eqp, has_conv=True)

    dtype = None if on_cpu else jnp.float32
    conv = prepare_folded_convolver(ir, 512, FilterSpec(sample_rate=sr),
                                    cfg, eqp, dtype=dtype)
    # reduce to a scalar and read it back: block_until_ready alone does
    # not synchronize through every remote TPU transport
    fn = jax.jit(lambda v, c: jnp.sum(jnp.abs(
        process_chain_fused(v, cfg, c))))

    x = jnp.asarray(rng.normal(size=(batch, 2, int(sr * secs))) * 0.2,
                    dtype or jnp.float64)
    float(fn(x, conv))                        # compile + warm up
    t0 = time.perf_counter()
    float(fn(x, conv))
    wall = time.perf_counter() - t0
    rtf = batch * secs / wall
    print(f"folded chain: {wall*1e3:.1f} ms for {batch * secs:.0f} s of "
          f"audio -> {rtf:.0f}x realtime on {jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
