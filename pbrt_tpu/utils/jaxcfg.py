"""JAX runtime configuration helpers.

Remote TPU compiles here cost minutes (the axon tunnel re-compiles every
process); the persistent compilation cache brings repeat runs down to
milliseconds. Call enable_compile_cache() from every entry point (CLI,
bench, driver entry) before the first jit execution.
"""
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/pbrt_tpu_jax")


def enable_compile_cache(path=None):
    import jax

    path = path or os.environ.get("PBRT_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
