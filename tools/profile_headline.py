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

    # ---- the SHIPPED headline path: folded single-layer plan + fused
    # Pallas transforms/MAC, attributed stage by stage at the same shapes
    # (PERF.md's table of record; VERDICT r2 weak #4)
    if jax.default_backend() != "cpu":
        from convopeq_tpu.models.chain import (prepare_folded_convolver,
                                               process_chain_fused)
        from convopeq_tpu.ops.pallas_gemm_fft import (
            rfft_frames_two_stage_pallas, irfft_valid_two_stage_pallas,
            causal_mac_grid_pallas, spectra_to_grid, grid_bins)
        convf = prepare_folded_convolver(ir, 512, FilterSpec(sample_rate=SR),
                                         cfg, eqp, dtype=jnp.float32)
        lp = convf.left.plan.layers[0]
        p = lp.part_size
        fold = {"partition_plan": f"p{p} x{lp.num_parts}"}
        k = -(-n // p)
        kp = k + ((-k) % 8)
        # mono single-channel frames at the headline length (the chain
        # runs batch*2 of these; scale in the table, not the measurement)
        xl = x[:, 0, :]
        frames = jnp.pad(xl, [(0, 0), (0, kp * p - n)]).reshape(
            args.batch, kp, p)
        H = convf.left.layer_spectra[0]
        Gr, Gi = spectra_to_grid(jnp.real(H), jnp.imag(H), p)
        g = grid_bins(p)[2]
        fwd = jax.jit(lambda fr: jnp.sum(jnp.abs(
            rfft_frames_two_stage_pallas(fr, p)[0])))
        fold["fwd_frames_pallas_mono_ms"] = round(
            timed(fwd, frames) * 1e3, 1)
        Xr, Xi = jax.jit(lambda fr: rfft_frames_two_stage_pallas(fr, p))(
            frames)
        mac = jax.jit(lambda a, b, gr, gi: jnp.sum(jnp.abs(
            causal_mac_grid_pallas(a, b, gr, gi, p)[0])))
        fold["mac_grid_pallas_mono_ms"] = round(
            timed(mac, Xr, Xi, Gr, Gi) * 1e3, 1)
        inv = jax.jit(lambda a, b: jnp.sum(jnp.abs(
            irfft_valid_two_stage_pallas(a, b, p))))
        fold["inv_pallas_mono_ms"] = round(timed(inv, Xr, Xi) * 1e3, 1)
        ffull = jax.jit(lambda v, c: jnp.sum(jnp.abs(
            process_chain_fused(v, cfg, c))))
        fwall = timed(ffull, x, convf)
        fold["folded_chain_ms"] = round(fwall * 1e3, 1)
        fold["folded_rtf"] = round(audio_s / fwall, 1)
        res["folded_path"] = fold
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
