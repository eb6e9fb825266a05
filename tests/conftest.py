import os

# Must run before jax import: force CPU with 8 virtual devices so sharding
# tests exercise a multi-chip mesh without TPU hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
# Hard override: the environment may point JAX_PLATFORMS at a tunneled TPU
# (axon); unit tests must run on the local CPU backend in f64.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms to "axon,cpu"; override it
# back before any backend is initialized so tests run on local CPU in f64.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-dominated on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_convopeq")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
