"""Headline benchmark: real-time factor for the 1M-tap stereo IR + 20-band
EQ chain at 48 kHz (BASELINE.json metric of record).

Runs on whatever backend JAX resolves (the driver runs it on one real TPU
chip via axon).  TPU path is float32/complex64 (no f64 FFT on TPU); the
numerical-fidelity contract is carried by the f64 CPU test suite.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1000 (the >=1000x RTF north-star target — the
reference publishes no RTF numbers of its own).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import ChainConfig, process_chain
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.nuc import FilterSpec

    sr = 48000.0
    ir_len = 1_000_000
    # long buffers amortize the fixed host<->device round-trip (~30 ms
    # through the axon tunnel) so the figure reflects chain throughput
    seconds = 60.0
    n = int(sr * seconds)
    batch = 4                     # independent stereo streams per call
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    decay = np.exp(-np.arange(ir_len) / (ir_len / 10.0))
    ir = np.stack([rng.normal(size=ir_len) * decay,
                   rng.normal(size=ir_len) * decay]) * 0.02

    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)   # all 20 bands active

    conv = stereo_prepare(jnp.asarray(ir, dtype), 512,
                          FilterSpec(sample_rate=sr))
    cfg = ChainConfig(sample_rate=sr)

    x = jnp.asarray(rng.normal(size=(batch, 2, n)) * 0.25, dtype)

    # The jitted fn reduces to a scalar and the timing loop reads it back
    # to host: block_until_ready alone does not synchronize through every
    # TPU transport, so a host readback is the only honest fence.
    fn = jax.jit(lambda v, c: jnp.sum(jnp.abs(process_chain(v, cfg, eqp, c))))
    float(fn(x, conv))             # compile + warm up

    runs = 3
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(fn(x, conv))
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    audio_seconds = batch * seconds
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": "RTF 1M-tap stereo IR + 20-band EQ @48kHz (streams x realtime per chip)",
        "value": round(rtf, 1),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 1000.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
