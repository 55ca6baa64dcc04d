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

# NO persistent compilation cache on the CPU backend: this image's
# jaxlib serializes XLA:CPU executables as AOT results stamped with
# compile-time machine features (+prefer-no-scatter etc.) that do NOT
# match the loader's host-feature detection — reloading such an entry
# warns "could lead to execution errors such as SIGILL" and reliably
# SEGFAULTs the suite partway through (observed at
# test_dp_train_step_8_devices reading an entry written earlier in the
# very same run). Cold compiles cost a few extra minutes per run but
# cannot be poisoned. (The TPU entry points keep their cache —
# utils/jax_setup.py gates it on the backend.)

import pytest  # noqa: E402

DEMO_NAG = '/root/reference/notebooks/demo_nag_v3.h5'


@pytest.fixture(scope='session')
def demo_nag_path():
    if not os.path.exists(DEMO_NAG):
        pytest.skip('demo NAG fixture not available')
    return DEMO_NAG
