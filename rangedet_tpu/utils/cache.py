"""Persistent XLA compilation cache — first compile of the full train step
costs minutes (especially on remote-compile backends); subsequent process
launches hit this on-disk cache and start in seconds.
"""
import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "RANGEDET_CACHE_DIR", os.path.expanduser("~/.cache/rangedet_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
