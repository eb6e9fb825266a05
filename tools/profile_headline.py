"""Per-stage wall-time breakdown of the headline config on the chip.

Times each chain stage as its own jit (same shapes as the headline bench:
32 streams x 60 s @48 kHz, 1M-tap stereo IR, 20-band EQ) and the
monolithic chain, so PERF.md can attribute the budget.  Stage walls
include one dispatch each (~30 ms through the tunnel) — the dispatch
floor is measured explicitly with a no-op jit.

Usage: python tools/profile_headline.py [--batch 32] [--seconds 60]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 48000.0


def timed(fn, *args, reps=3):
    import jax.numpy as jnp
    float(fn(*args))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=60.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import ChainConfig, process_chain
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.eq import EQParams, eq_process_bands
    from convopeq_tpu.models.nuc import FilterSpec, nuc_convolve
    from convopeq_tpu.models.output_filter import output_filter_process
    from convopeq_tpu.ops.dc_blocker import dc_block
    from convopeq_tpu.ops.partitioned_conv import uniform_partitioned_conv

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n = int(SR * args.seconds)
    ir_len = 1_000_000
    decay = np.exp(-np.arange(ir_len) / (ir_len / 10.0))
    ir = np.stack([rng.normal(size=ir_len) * decay,
                   rng.normal(size=ir_len) * decay]) * 0.02
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)
    conv = stereo_prepare(jax.device_put(jnp.asarray(ir, jnp.float32), dev),
                          512, FilterSpec(sample_rate=SR))
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(args.batch, 2, n)) * 0.25, jnp.float32), dev)
    cfg = ChainConfig(sample_rate=SR)
    audio_s = args.batch * args.seconds

    res = {"batch": args.batch, "seconds": args.seconds,
           "device": str(dev), "stages_ms": {}}
    from convopeq_tpu.models.convolver import convolver_process
    s = lambda f: jax.jit(lambda v: jnp.sum(jnp.abs(f(v))))
    sc = jax.jit(lambda v, c: jnp.sum(jnp.abs(convolver_process(v, c))))

    res["dispatch_floor_ms"] = round(
        timed(jax.jit(lambda v: jnp.sum(v[..., 0])), x) * 1e3, 1)
    res["stages_ms"]["dc_3hz"] = round(
        timed(s(lambda v: dc_block(v, SR, 3.0)[0]), x) * 1e3, 1)
    res["stages_ms"]["eq_fft_blocked"] = round(
        timed(s(lambda v: eq_process_bands(v, eqp, SR)), x) * 1e3, 1)
    res["stages_ms"]["output_filter"] = round(
        timed(s(lambda v: output_filter_process(v, SR, True)), x) * 1e3, 1)
    # NUC per layer (mono left channel to isolate the layer pipelines)
    xl = x[:, 0, :]
    for i, (lp, H) in enumerate(zip(conv.left.plan.layers,
                                    conv.left.layer_spectra)):
        # spectra as jit ARGUMENTS (complex constants can't be read back
        # through the tunneled backend)
        fn = jax.jit(lambda v, Hs, p=lp.part_size: jnp.sum(jnp.abs(
            uniform_partitioned_conv(v, Hs, p))))
        res["stages_ms"][f"nuc_L{i}_p{lp.part_size}_x{lp.num_parts}_mono"] = \
            round(timed(fn, xl, H) * 1e3, 1)
    res["stages_ms"]["nuc_full_stereo"] = round(
        timed(sc, x, conv) * 1e3, 1)
    full = jax.jit(lambda v, c: jnp.sum(jnp.abs(
        process_chain(v, cfg, eqp, c))))
    wall = timed(full, x, conv)
    res["chain_ms"] = round(wall * 1e3, 1)
    res["rtf"] = round(audio_s / wall, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
