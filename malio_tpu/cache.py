"""Persistent XLA compile cache setup.

TPU compiles go through the axon remote-compile relay (~30-60 s per
distinct jit); caching executables locally makes reruns start in seconds.
Separate directories per platform because cache entries embed host CPU
features (the remote compiler's host differs from ours)."""
from __future__ import annotations


def enable(platform_hint: str | None = None):
    """Call AFTER any jax_platforms override; does not initialize backends
    (reads the configured platform string, not the live backend)."""
    import jax

    plat = platform_hint or jax.config.jax_platforms or "default"
    plat = str(plat).split(",")[0]
    jax.config.update("jax_compilation_cache_dir", f"/root/.cache/jax-{plat}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # TPU f32 matmuls default to bf16 MXU passes — fatal for the 35x35
    # covariance algebra. The filter's matmuls are tiny; force full f32.
    jax.config.update("jax_default_matmul_precision", "highest")
    # x64 so the IEKF solve island (esekf.update_iterated `sdtype`) can run
    # in f64 while arrays stay f32: the all-f32 solve destabilizes the
    # filter at the City working point (P grows ~1.5x/round, detonates
    # ~round 10 — see esekf.py). The axon TPU backend executes the few
    # (35, 35) f64 ops fine; per-point math remains f32 via explicit
    # dtypes throughout.
    jax.config.update("jax_enable_x64", True)
