"""The driver contract: __graft_entry__.dryrun_multichip must succeed
even when the calling process sees fewer than n devices (round-1
failure mode: MULTICHIP_r01 ok=false). We simulate the driver's
environment — a process with a single JAX device — and assert the
self-bootstrap re-exec path exits 0."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bootstraps_from_single_device():
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('_SPT_TPU_DRYRUN_BOOTSTRAPPED', None)
    env['JAX_PLATFORMS'] = 'cpu'
    # Parent sees ONE device; dryrun_multichip(2) must bootstrap.
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    code = ("import sys; sys.path.insert(0, %r); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(2)" % REPO)
    proc = subprocess.run([sys.executable, '-c', code], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert 'graph-partition-parallel train step ok' in proc.stdout
