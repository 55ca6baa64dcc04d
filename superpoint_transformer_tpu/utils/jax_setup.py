"""JAX runtime setup: persistent compilation cache etc. Call once at
entry-point start (train.py / eval.py / bench.py)."""
import os

import jax

__all__ = ['setup_jax']


def setup_jax(cache_dir=None):
    if jax.default_backend() == 'cpu':
        # XLA:CPU AOT cache entries are stamped with compile-machine
        # features that fail the loader's host check in this image
        # (SIGILL/SIGSEGV on reload) — persistent caching is
        # TPU/GPU-only. See tests/conftest.py.
        return
    cache_dir = cache_dir or os.environ.get(
        'SPT_JAX_CACHE', '/tmp/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    # If an earlier import (e.g. a PJRT-plugin sitecustomize) already
    # triggered a compile, jax latched its once-per-process "cache
    # used?" check to False BEFORE the cache dir above existed —
    # silently disabling persistent caching. Reset the latch.
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass
