"""Basic engine usage: load an IR, set EQ bands, process a batch of
stereo streams end to end.

Run on CPU in f64 (exact mode):
    JAX_PLATFORMS=cpu python examples/01_basic_chain.py
or on the TPU (f32 throughput mode) by just running it under the default
backend.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from convopeq_tpu.engine import ConvoPeqEngine


def main():
    sr = 48000.0
    eng = ConvoPeqEngine(sample_rate=sr, block_size=512)

    # a synthetic exponentially-decaying room IR (use eng.load_impulse_
    # response("room.wav") for a file; it resamples/trims/analyzes too)
    rng = np.random.default_rng(0)
    ir = rng.normal(size=48000) * np.exp(-np.arange(48000) / 6000.0) * 0.1
    eng.load_impulse_response(ir, ir_sample_rate=sr)

    # 20-band parametric EQ: same surface as the reference's band table
    eng.set_eq_band(0, band_type=1, freq=80.0, gain_db=3.0, q=1.0)
    eng.set_eq_band(1, band_type=1, freq=2500.0, gain_db=-2.5, q=2.0)
    eng.set_soft_clip(True, saturation=0.25)
    eng.set_auto_gain(True)

    # 4 independent stereo streams x 1 s
    x = jnp.asarray(rng.normal(size=(4, 2, int(sr))) * 0.2)
    y = eng.process(x)

    print("in ", x.shape, "-> out", y.shape)
    print("latency:", eng.latency_breakdown().total_latency_samples,
          "samples")
    print("state JSON bytes:", len(eng.save_state()))


if __name__ == "__main__":
    main()
