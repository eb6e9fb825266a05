"""Multi-chip parallelism on the virtual CPU mesh: stream-DP + time-SP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convopeq_tpu.models.nuc import FilterSpec, nuc_prepare, nuc_convolve

SR = 48000.0
RNG = np.random.default_rng(21)


def _need_devices(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip(f"need {n} virtual CPU devices")


def test_time_parallel_nuc_equals_unsharded():
    """Sequence-parallel convolution (time sharded over 8 devices, tail
    halos via ppermute) equals the single-device result to f64 equality —
    including the multi-round case where the IR reach spans several
    chunks."""
    from convopeq_tpu.parallel.time_parallel import (
        make_time_mesh, time_parallel_nuc_convolve)
    _need_devices(8)
    ir_len = 20_000
    t = np.arange(ir_len)
    ir = RNG.normal(size=ir_len) * np.exp(-t / 3000.0) * 0.2
    st = nuc_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=SR))
    n = 8 * 4096                          # chunk 4096 < ir span: 5 rounds
    x = RNG.normal(size=(2, n)) * 0.3

    y_ref = np.asarray(nuc_convolve(jnp.asarray(x), st))
    mesh = make_time_mesh(8)
    y = np.asarray(time_parallel_nuc_convolve(jnp.asarray(x), st, mesh))
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() <= 1e-9 * scale


def test_time_parallel_single_round():
    """chunk >= IR reach: exactly one ppermute round, still exact."""
    from convopeq_tpu.parallel.time_parallel import (
        make_time_mesh, time_parallel_nuc_convolve)
    _need_devices(4)
    ir = RNG.normal(size=2000) * np.exp(-np.arange(2000) / 400.0) * 0.2
    st = nuc_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=SR))
    n = 4 * 4096
    x = RNG.normal(size=(n,)) * 0.3
    y_ref = np.asarray(nuc_convolve(jnp.asarray(x), st))
    mesh = make_time_mesh(4)
    y = np.asarray(time_parallel_nuc_convolve(jnp.asarray(x), st, mesh))
    assert np.abs(y - y_ref).max() <= 1e-9 * np.abs(y_ref).max()
