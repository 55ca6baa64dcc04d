"""JAX runtime setup: persistent compilation cache etc. Call once at
entry-point start (train.py / eval.py / bench.py)."""
import os

import jax

__all__ = ['setup_jax']


def setup_jax(cache_dir=None):
    cache_dir = cache_dir or os.environ.get(
        'SPT_JAX_CACHE', '/tmp/jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
