"""Test configuration: virtual 8-device CPU mesh, float64 for exact oracles.

Note: the environment's sitecustomize imports jax and registers a TPU
backend before pytest starts, so JAX_PLATFORMS env munging is too late —
use jax.config.update instead (the CPU client is created lazily, so
XLA_FLAGS set here still applies to it)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: big win on the 2-core CI host
# separate cache from the TPU runs (the axon remote-compile server writes
# AOT results for a different host CPU into its cache dir)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu-tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
