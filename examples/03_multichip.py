"""Multi-chip scaling: stream-data-parallel over a device mesh.

Shards the leading streams axis over every available device (prepared IR
spectra replicated) — the production scaling recipe.  Works identically
on real TPU meshes and on a virtual CPU mesh; with a single local device
it demonstrates on an 8-way virtual CPU mesh:

    python examples/03_multichip.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Demonstrate a real mesh even on a 1-device box: force 8 virtual CPU
# devices and pin the CPU backend (via jax.config BEFORE backend init —
# env-var overrides alone can be undone by sitecustomize hooks).  On a
# real multi-chip host, set EXAMPLE_REAL_MESH=1 to use the default
# backend's devices instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

if not os.environ.get("EXAMPLE_REAL_MESH"):
    jax.config.update("jax_platforms", "cpu")

from convopeq_tpu.models.chain import ChainConfig, process_chain
from convopeq_tpu.models.convolver import stereo_prepare
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.nuc import FilterSpec
from convopeq_tpu.parallel.sharding import (
    make_stream_mesh, replicated, shard_streams, sharded_chain)


def main():
    sr = 48000.0
    mesh = make_stream_mesh()
    n_dev = np.prod(list(mesh.shape.values()))
    print("mesh:", dict(mesh.shape))

    rng = np.random.default_rng(0)
    ir = rng.normal(size=(2, 30000)) * np.exp(-np.arange(30000) / 4000.0) * 0.05
    conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=sr))

    cfg = ChainConfig(sample_rate=sr)
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)

    fn = sharded_chain(lambda v, c: process_chain(v, cfg, eqp, c), mesh)

    # 4 streams per device
    x = rng.normal(size=(4 * int(n_dev), 2, 48000)) * 0.2
    xs = shard_streams(jnp.asarray(x), mesh)
    cs = jax.device_put(conv, replicated(mesh))
    y = fn(xs, cs)
    jax.block_until_ready(y)
    print("processed", y.shape, "across", int(n_dev), "devices;",
          "output sharding:", y.sharding)


if __name__ == "__main__":
    main()
