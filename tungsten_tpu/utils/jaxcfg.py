"""JAX runtime configuration: persistent compilation cache.

The TPU backend in this environment compiles through a remote service
with very high latency (minutes for large programs), so every entry
point enables the on-disk executable cache — first compile is paid once
per program shape, then reloaded in milliseconds.
"""
import os

import jax

_DONE = False


def setup():
    global _DONE
    if _DONE:
        return
    cache_dir = os.environ.get("TUNGSTEN_TPU_CACHE",
                               os.path.expanduser("~/.tungsten_tpu_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    _DONE = True
