"""Test harness config: run on a simulated 8-device CPU mesh.

Tests never require TPU hardware; sharding logic is exercised on
``--xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).
Must run before the first jax import.
"""
import os

# The harness exports JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize on
# PYTHONPATH imports jax at interpreter startup, so env vars are too late —
# use jax.config (safe any time before backend initialization). Tests run on
# simulated CPU devices; opt-in TPU runs via PYGLM_TEST_TPU=1.
if not os.environ.get("PYGLM_TEST_TPU"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The quick lane is compile-bound on this 1-core box (every model
    # instance jits its own sweep closure; the mesh tests trace large SPMD
    # programs). The persistent cache is keyed by HLO hash, so any library
    # change recompiles automatically while unchanged programs deserialize
    # in milliseconds across pytest runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    # TPU lane: remote (axon) compiles are slow — persist them across runs
    # (CLAUDE.md environment note).
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
