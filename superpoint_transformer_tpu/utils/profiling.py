"""Tracing / profiling helpers (reference: Lightning profilers via
configs/debug/profiler.yaml + per-transform wall-time printing via
Transform.__call__(verbose=True) and utils/time.py:8).

TPU equivalents: jax.profiler traces (viewable in TensorBoard /
Perfetto) + lightweight host-side timers.
"""
import contextlib
import time
from collections import defaultdict

__all__ = ['timer', 'Timings', 'trace', 'annotate']


@contextlib.contextmanager
def timer(name='', out=None, verbose=True):
    """Wall-clock a block; appends to `out` dict if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out[name] = out.get(name, 0.0) + dt
    if verbose:
        print(f'[timer] {name}: {dt:.3f}s')


class Timings:
    """Accumulating named timers (per-transform timing of the
    preprocessing pipeline, reference BaseDataset.process(verbose))."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def track(self, name):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self):
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return '\n'.join(
            f'{k:<40s} {v:8.3f}s  (x{self.counts[k]})'
            for k, v in rows)


@contextlib.contextmanager
def trace(log_dir='/tmp/jax_trace'):
    """jax.profiler trace around a block; open the resulting trace in
    TensorBoard's profile plugin or Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named annotation context for device traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)
