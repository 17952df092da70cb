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
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: big win on the 2-core CI host
# separate cache from the TPU runs (the axon remote-compile server writes
# AOT results for a different host CPU into its cache dir)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu-tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Every XLA:CPU executable holds many mmaps (LLVM JIT code sections); a
# full-suite process accumulates compiled programs until it exhausts the
# kernel's vm.max_map_count (65530 default), after which LLVM's mmap
# fails ("LLVM compilation error: Cannot allocate memory") and the next
# compile SEGVs/aborts inside XLA — observed ~50 tests in, always during
# a cache write. Shed all executable caches when the map table gets
# close; the persistent compile cache makes the subsequent reloads cheap.
_MAP_SHED_THRESHOLD = 30_000


@pytest.fixture(autouse=True)
def _shed_executable_maps():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAP_SHED_THRESHOLD:
        jax.clear_caches()
