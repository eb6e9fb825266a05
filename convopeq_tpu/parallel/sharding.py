"""Multi-chip stream parallelism (SURVEY.md §2.6 TPU-native equivalent).

The reference scales by multithreading inside one process; the signal
chain itself has no cross-stream dependency, so the TPU-native scaling
axis is the stream batch dim sharded over a device mesh — prepared IR
spectra and EQ coefficients are replicated (they are shared read-only
state, the analog of the RCU-published RuntimeState), and XLA inserts no
collectives on the data path at all (embarrassingly parallel).  A second
mesh axis ("chan") is available for sharding the stereo-channel/filter
dimension when streams are few and chips are many.
"""
from __future__ import annotations

import numpy as np


def make_stream_mesh(n_devices: int | None = None, devices=None):
    """1-D mesh over the stream axis."""
    import jax
    from jax.sharding import Mesh
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("streams",))


def stream_sharding(mesh, batched_rank: int = 3):
    """NamedSharding placing the leading stream axis on the mesh; trailing
    axes (channels, time) replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(*(("streams",) + (None,) * (batched_rank - 1))))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def shard_streams(x, mesh):
    """Place a (S, C, N) batch across the mesh stream axis."""
    import jax
    return jax.device_put(x, stream_sharding(mesh, np.ndim(x)))


def sharded_chain(fn, mesh, batched_rank: int = 3):
    """jit `fn(x, conv_state)` with stream-sharded IO and replicated
    prepared state."""
    import jax
    sh = stream_sharding(mesh, batched_rank)
    rep = replicated(mesh)
    return jax.jit(fn, in_shardings=(sh, rep), out_shardings=sh)
