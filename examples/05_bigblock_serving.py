"""Bigblock windowed serving: the 1024-streams-per-chip tier.

The per-block folded chain re-reads the whole FDL state (~16 MB/stream
for a 1M-tap IR) every 512-sample block — an HBM-bandwidth wall at high
stream counts.  The bigblock tier re-plans the SAME folded IR as a
single layer whose partition equals the serving window (e.g. 16 blocks
= 170.7 ms): one step per window, the FDL read once per window, and the
deadline contract unchanged (algorithm latency = the window, exactly as
in the windowed multi/pipelined modes).  Measured on one v5e chip
(SERVING.json latency_frontier*): 1024 concurrent 1M-tap f16-FDL
streams xrun-free at 2747 streams-x-realtime; 512 f32 streams at 1641.

    JAX_PLATFORMS=cpu python examples/05_bigblock_serving.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from convopeq_tpu.engine import ConvoPeqEngine
from convopeq_tpu.runtime.telemetry import XrunDetector


def main():
    sr, block, window_blocks, streams = 48000.0, 512, 16, 8
    rng = np.random.default_rng(0)

    eng = ConvoPeqEngine(sr, block)
    ir = rng.normal(size=100_000) * np.exp(-np.arange(100_000) / 9000.0) * 0.05
    eng.load_impulse_response(np.stack([ir, ir]), sr)
    eng.set_eq_band(0, band_type=1, freq=180.0, gain_db=-4.0, q=1.2,
                    enabled=True)

    # folded + partition = window -> the bigblock tier; fdl_dtype=float16
    # halves the per-stream state for serving scale (precision ladder in
    # SERVING.json serving_fidelity_vs_f64_cpu: f16 -74 dB, f32 -125 dB)
    sc = eng.streaming_chain(folded=True, partition=window_blocks * block,
                             donate_state=True)
    window = sc.block_size
    print(f"window = {window} samples = {window / sr * 1e3:.1f} ms "
          f"(algorithm latency of this tier)")

    state = sc.init_state((streams,))
    xrun = XrunDetector(sr, window)
    import time
    for k in range(8):
        blk = jnp.asarray(rng.normal(size=(streams, 2, window)) * 0.2,
                          sc.dtype)
        t0 = time.perf_counter()
        state, y = sc.step(state, blk)         # ONE dispatch per window
        np.asarray(y[..., -1])                 # honest fence
        xrun.record_step(time.perf_counter() - t0)
    print(f"{streams} streams, 8 windows, xruns={xrun.xruns} "
          f"(budget {window / sr * 1e3:.1f} ms/window)")


if __name__ == "__main__":
    main()
