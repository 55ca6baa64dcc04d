"""Memory / failure helpers (reference src/utils/memory.py:19-53 OOM
classification + garbage collection, and utils/utils.py:30
task_wrapper crash-safe logging)."""
import gc
import traceback

__all__ = ['is_oom_error', 'garbage_collection', 'task_wrapper',
           'device_memory_stats']

_OOM_MARKERS = (
    'RESOURCE_EXHAUSTED',            # XLA/TPU OOM
    'Ran out of memory',             # Mosaic scoped vmem
    'Out of memory',
    'Failed to allocate',
)


def is_oom_error(exception):
    """True if the exception smells like a device / host OOM."""
    msg = str(exception)
    return any(m in msg for m in _OOM_MARKERS) \
        or isinstance(exception, MemoryError)


def garbage_collection():
    """Drop python garbage and dead device buffers."""
    gc.collect()
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass


def device_memory_stats():
    """Per-device memory stats when the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def task_wrapper(fn):
    """Run `fn`, always logging exceptions with a traceback before
    re-raising, and flagging OOMs explicitly (reference task_wrapper,
    src/utils/utils.py:30 — keeps multiruns and logs sane on crash)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            traceback.print_exc()
            if is_oom_error(e):
                print('[task_wrapper] device OOM detected — consider '
                      'lowering max_num_nodes / batch_size or enabling '
                      'jax.checkpoint rematerialization')
                garbage_collection()
            raise
    return wrapped
