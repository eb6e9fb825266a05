"""Block-at-a-time serving: the real-time path with functional state.

Feeds 512-sample blocks through the jitted StreamingChain step — the same
per-block semantics as the reference's audio callback, with the carry
(FDL ring positions, IIR states, AGC envelopes) threaded functionally.

    JAX_PLATFORMS=cpu python examples/02_streaming_serving.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from convopeq_tpu.models.chain import ChainConfig
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.nuc import FilterSpec, nuc_prepare
from convopeq_tpu.runtime.streaming import StreamingChain
from convopeq_tpu.runtime.telemetry import XrunDetector


def main():
    sr, block, streams = 48000.0, 512, 8
    rng = np.random.default_rng(0)

    ir = rng.normal(size=40000) * np.exp(-np.arange(40000) / 5000.0) * 0.05
    nuc = nuc_prepare(jnp.asarray(ir), block, FilterSpec(sample_rate=sr))

    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-3.0, 3.0, 20)
    sc = StreamingChain(ChainConfig(sample_rate=sr), eqp, nuc)

    state = sc.init_state((streams,))
    xrun = XrunDetector(sr, block)

    import time
    outs = []
    for k in range(50):
        blk = jnp.asarray(rng.normal(size=(streams, 2, block)) * 0.2)
        t0 = time.perf_counter()
        state, y = sc.step(state, blk)
        y.block_until_ready()
        xrun.record_step(time.perf_counter() - t0)
        outs.append(np.asarray(y))

    import jax
    y = np.concatenate(outs, axis=-1)
    print("served", y.shape[-1], "samples x", streams, "streams on",
          jax.devices()[0].platform + ";",
          "xruns:", xrun.xruns, "(budget", round(block / sr * 1e3, 2),
          "ms; a CPU or tunneled run will miss the budget — see",
          "SERVING.json for the measured TPU serving envelope)")


if __name__ == "__main__":
    main()
