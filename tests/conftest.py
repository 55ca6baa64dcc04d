import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (the driver dry-runs the real path).
# The axon TPU tunnel is DISABLED for tests: it serializes one chip
# across processes and drops responses under heavy eager dispatch
# (see .claude/skills/verify/SKILL.md); local CPU is reliable and the
# persistent compilation cache keeps repeat runs fast. Unsetting
# PALLAS_AXON_POOL_IPS is what actually disables the axon PJRT plugin
# (sitecustomize registers it only when that var is set).
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Persistent compilation cache: repeated test runs skip XLA compiles.
_CACHE = '/tmp/jax_cache_cpu'
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
# sitecustomize (axon) imports jax and can trigger a compile BEFORE
# this file runs; that latches jax's once-per-process "is the cache
# used?" check to False (jax._src.compilation_cache.is_cache_used)
# and silently disables the cache for the whole pytest process. Reset
# the latch now that the cache dir is configured.
from jax._src import compilation_cache as _cc  # noqa: E402
_cc.reset_cache()

import pytest  # noqa: E402

DEMO_NAG = '/root/reference/notebooks/demo_nag_v3.h5'


@pytest.fixture(scope='session')
def demo_nag_path():
    if not os.path.exists(DEMO_NAG):
        pytest.skip('demo NAG fixture not available')
    return DEMO_NAG
