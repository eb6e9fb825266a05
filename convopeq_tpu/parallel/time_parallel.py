"""Sequence-parallel convolution — time axis sharded across the mesh.

Stream-batch data parallelism (parallel/sharding.py) is the production
scaling axis, but a SINGLE very long stream (or offline mastering job) can
also be split across chips along TIME: each device convolves its local
chunk, and the convolution tail that spills past the chunk boundary is
exchanged with successor devices via `lax.ppermute` rounds riding the ICI
— the halo-exchange recipe of mesh-parallel stencils applied to
partitioned convolution.

Exactness: identical to the unsharded `nuc_convolve` (linear convolution
truncated to N) — every tail contribution lands on the right successor
chunk; verified to f64 equality on the virtual CPU mesh (tests/
test_parallel.py) and exercised by the driver dryrun.

Cost model: each device convolves chunk + ir_len samples, then
ceil(ir_len / chunk) ppermute rounds of chunk-sized payloads.  Efficient
when chunk >= ir_len (one round, ~2x compute); for ir_len >> chunk prefer
the stream-batch axis instead.

(Ref behavior being modeled: the NUC tail layers' deferred cross-block
contributions, src/MKLNonUniformConvolver.cpp:1497-1545 — re-expressed as
cross-CHIP contributions.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nuc import NUCState, nuc_convolve

TIME_AXIS = "time"


def make_time_mesh(n_devices: int | None = None, devices=None,
                   axis: str = TIME_AXIS):
    from jax.sharding import Mesh
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def time_parallel_nuc_convolve(x, state: NUCState, mesh, axis: str = TIME_AXIS,
                               compiler_options: dict | None = None):
    """Convolve x (..., N) with a prepared NUCState, N sharded over `axis`.

    x must be evenly divisible by the mesh size along time.  Returns the
    sharded (..., N) output equal to `nuc_convolve(x, state)`.

    compiler_options is forwarded to the XLA compile of the sharded
    program (e.g. {"xla_backend_optimization_level": "0"} for
    compile-time-critical CPU-mesh validation runs); None = default jit.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:                                   # jax >= 0.8 (kw-only API)
        from jax import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
            return _sm(f, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=check_rep)
    except ImportError:                    # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    n = x.shape[-1]
    d = mesh.shape[axis]
    if n % d:
        raise ValueError(f"time axis ({n}) must divide the mesh ({d})")
    chunk = n // d
    # Forward reach of the conv operator: the circular per-partition
    # spectrum filter spreads each partition kernel over its full 2P
    # window, so a layer reaches offset + (num_parts + 1) * P — beyond
    # ir_len.  (Unfiltered spectra reach ir_len, covered by the same
    # bound.)
    spill = max(lp.offset + (lp.num_parts + 1) * lp.part_size
                for lp in state.plan.layers)
    rounds = -(-spill // chunk)
    pad_spill = rounds * chunk

    spec_x = P(*((None,) * (x.ndim - 1) + (axis,)))

    def local(xl, st):
        # local chunk convolved with the full NUC; the output past the
        # chunk is this device's contribution to its successors
        xp = jnp.pad(xl, [(0, 0)] * (xl.ndim - 1) + [(0, pad_spill)])
        yf = nuc_convolve(xp, st)
        y = yf[..., :chunk]
        for k in range(1, rounds + 1):
            seg = yf[..., k * chunk:(k + 1) * chunk]
            # send each device's k-th spill chunk to its k-th successor;
            # devices with no sender receive zeros
            recv = jax.lax.ppermute(seg, axis,
                                    [(i, i + k) for i in range(d - k)])
            y = y + recv
        return y

    fn = shard_map(local, mesh=mesh, in_specs=(spec_x, P()),
                   out_specs=spec_x, check_rep=False)
    xs = jax.device_put(x, NamedSharding(mesh, spec_x))
    st = jax.device_put(jax.tree.map(np.asarray, state),
                        NamedSharding(mesh, P()))
    if compiler_options is not None:
        try:
            return jax.jit(fn).lower(xs, st).compile(compiler_options)(xs, st)
        except Exception:
            pass
    return fn(xs, st)
