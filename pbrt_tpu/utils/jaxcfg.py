"""JAX runtime configuration helpers.

Remote TPU compiles here cost minutes (the axon tunnel re-compiles every
process); the persistent compilation cache brings repeat runs down to
milliseconds. Call enable_compile_cache() from every entry point (CLI,
bench, driver entry) before the first jit execution.

The cache directory is suffixed with a HOST FINGERPRINT (CPU feature set):
XLA:CPU AOT executables embed the compile machine's ISA features, and
loading one on a host with different features segfaults (SIGILL) or faults
the device instead of falling back to a recompile. Sharing one cache dir
across heterogeneous hosts (this project's rounds migrate machines) is how
we learned that; the fingerprint makes a foreign cache invisible rather
than fatal.
"""
import hashlib
import os

_BASE_DIR = os.path.expanduser("~/.cache/pbrt_tpu_jax")


def _host_fingerprint():
    """Short stable hash of the CPU feature flags (+ jax version)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = "unknown"
    except OSError:
        feats = "unknown"
    import jax

    return hashlib.sha1(
        (feats + "|" + jax.__version__).encode()
    ).hexdigest()[:12]


def enable_compile_cache(path=None):
    import jax

    path = path or os.environ.get("PBRT_TPU_COMPILE_CACHE", _BASE_DIR)
    path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
