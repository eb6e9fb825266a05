"""Scan the folded-chain partition size on the chip with the CURRENT
conv pipeline (fused Pallas transforms + phase-copy MAC).

The single-layer throughput plan's optimum depends on which stage
dominates: under the XLA pipeline (HBM-pass bound) it was p=16384; the
phase-copy Pallas MAC is VPU-bound with cost proportional to the
partition COUNT, so larger partitions may now win.  This measures the
headline workload (1M-tap stereo IR + folded 20-band EQ prefilter,
batch x 60 s @48 kHz) at several partition sizes.

Usage: python tools/scan_partition.py [--batch 64] [--seconds 60]
                                      [--sizes 16384,32768,65536]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--sizes", default="8192,16384,32768,65536")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import (ChainConfig, process_chain_fused,
                                           prepare_folded_convolver)
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec

    ir_len = 1_000_000
    n = int(SR * args.seconds)
    rng = np.random.default_rng(0)
    decay = np.exp(-np.arange(ir_len) / (ir_len / 10.0))
    ir = np.stack([rng.normal(size=ir_len) * decay,
                   rng.normal(size=ir_len) * decay]) * 0.02
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)
    spec = FilterSpec(sample_rate=SR)
    cfg = ChainConfig(sample_rate=SR)
    x = jnp.asarray(rng.normal(size=(args.batch, 2, n)) * 0.25, jnp.float32)

    fn = jax.jit(lambda v, c: jnp.sum(jnp.abs(
        process_chain_fused(v, cfg, c))))

    for p in (int(s) for s in args.sizes.split(",")):
        try:
            conv = prepare_folded_convolver(ir, 512, spec, cfg, eqp,
                                            dtype=jnp.float32, partition=p)
            float(fn(x, conv))    # compile + warm
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(x, conv) for _ in range(args.reps)]
                for o in outs:
                    float(o)
                walls.append((time.perf_counter() - t0) / args.reps)
            wall = min(walls)
            rtf = args.batch * args.seconds / wall
            print(json.dumps({"p": p, "wall_ms": round(wall * 1e3, 1),
                              "rtf": round(rtf, 1)}), flush=True)
        except Exception as e:                          # noqa: BLE001
            print(json.dumps({"p": p, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
