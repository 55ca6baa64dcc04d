"""Multi-host (multi-process) data-parallel training.

The reference's multi-node story is Lightning DDP over
torch.distributed (SURVEY §2.11; configs/trainer/ddp.yaml). The
TPU-native equivalent: one JAX process per host, joined through
`jax.distributed.initialize`; every process sees the GLOBAL device
mesh, loads only the batches for its OWN devices, and assembles the
global stacked batch with `jax.make_array_from_process_local_data`
(the per-host data sharding that replaces DDP samplers). The jitted
step is the same `make_dp_train_step` used single-process — gradient
pmean and confusion-matrix psum ride the 'data' mesh axis, which maps
to ICI within a slice and DCN across hosts on real pods.

Validated here on CPU: N processes x D virtual devices each, Gloo
collectives (tests/test_multihost.py + __graft_entry__.dryrun's
multihost leg).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

__all__ = ['make_global_batch', 'launch_multihost_dryrun',
           'worker_main']


def make_global_batch(local_batches, mesh):
    """Assemble the global device-stacked batch from this PROCESS's
    local batches. `local_batches` are the padded batches for this
    process's devices, in mesh order; every process must call this
    with its own shard (single-controller-per-host SPMD).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = mesh.devices.size
    sharding = NamedSharding(mesh, P('data'))

    def leaf(*xs):
        local = np.stack([np.asarray(x) for x in xs])
        return jax.make_array_from_process_local_data(
            sharding, local, (n_global,) + local.shape[1:])

    return jax.tree_util.tree_map(leaf, *local_batches)


def worker_main(coordinator: str, num_processes: int, process_id: int,
                out_path: str) -> None:
    """One multihost worker: join the cluster, build the flagship task
    on tiny synthetic shapes, run ONE global data-parallel train step,
    dump {loss, confmat_mass, n_global_devices} as JSON.

    The batch for global device slot `g` is seeded with `g`, so the
    global batch is identical regardless of the process count — the
    single-process equivalence check in tests/test_multihost.py relies
    on this.
    """
    import jax
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)
    # setup_jax gates the persistent compilation cache on
    # backend != cpu: the CPU simulation stays cache-free (XLA:CPU AOT
    # entries don't reload safely in this image, see tests/conftest.py)
    # while real TPU multihost workers keep compile reuse
    from ..utils.jax_setup import setup_jax
    setup_jax()

    from __graft_entry__ import _make_batch, _make_model
    from ..models.semantic import SemanticTask
    from .mesh import make_data_mesh, make_dp_train_step

    devices = jax.devices()
    mesh = make_data_mesh(devices)
    my_slots = [g for g, d in enumerate(devices)
                if d.process_index == jax.process_index()]
    local_batches = [_make_batch(seed=g, train=False) for g in my_slots]

    task = SemanticTask(net=_make_model(num_graphs=1), num_classes=13,
                        total_steps=100, warmup_steps=10)
    state = task.init_state(jax.random.PRNGKey(0), local_batches[0])
    # init is deterministic in (rng, SHAPES) and shapes are equal on
    # every process, so the params are bitwise-identical across hosts;
    # re-place them as a global fully-replicated array so the
    # global-mesh jit accepts them (committed local arrays would not)
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(jax.device_get(state),
                           NamedSharding(mesh, P()))
    global_batch = make_global_batch(local_batches, mesh)
    step = make_dp_train_step(task, mesh)
    rng = jax.device_put(jax.random.PRNGKey(1),
                         NamedSharding(mesh, P()))
    state, metrics = step(state, global_batch, rng)
    # loss/confmat come back fully replicated (out_specs P()): reading
    # them is process-local
    loss = float(np.asarray(jax.device_get(metrics['loss'])))
    cm = np.asarray(jax.device_get(metrics['confmat']))
    result = {
        'process_id': process_id,
        'n_global_devices': len(devices),
        'n_local_devices': len(my_slots),
        'loss': loss,
        'confmat_mass': int(cm.sum()),
        'finite': bool(np.isfinite(loss)),
    }
    with open(out_path, 'w') as f:
        json.dump(result, f)
    print(f'multihost worker {process_id}: {result}', flush=True)


def _free_port() -> int:
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_multihost_dryrun(n_proc: int = 2, n_dev: int = 4,
                            timeout: float = 900.0) -> list:
    """Spawn `n_proc` CPU processes with `n_dev // n_proc` virtual
    devices each, joined via jax.distributed (Gloo collectives), and
    run one global DP train step. Returns the per-process result
    dicts; raises on any worker failure or cross-process loss
    disagreement."""
    assert n_dev % n_proc == 0, (n_proc, n_dev)
    per_proc = n_dev // n_proc
    port = _free_port()
    coordinator = f'localhost:{port}'
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)  # disable the axon plugin
    env['JAX_PLATFORMS'] = 'cpu'
    import re
    flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '',
                   env.get('XLA_FLAGS', ''))
    env['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={per_proc}'
    ).strip()
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')

    procs, outs = [], []
    for pid in range(n_proc):
        out_path = f'/tmp/spt_multihost_{port}_{pid}.json'
        outs.append(out_path)
        if os.path.exists(out_path):
            os.remove(out_path)
        code = (
            'from superpoint_transformer_tpu.parallel.multihost '
            f'import worker_main; worker_main({coordinator!r}, '
            f'{n_proc}, {pid}, {out_path!r})')
        procs.append(subprocess.Popen(
            [sys.executable, '-c', code], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    results, logs = [], []
    for pid, (p, out_path) in enumerate(zip(procs, outs)):
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f'multihost worker {pid} timed out')
        logs.append(stdout.decode(errors='replace'))
        if p.returncode != 0 or not os.path.exists(out_path):
            raise RuntimeError(
                f'multihost worker {pid} failed (rc={p.returncode}):\n'
                + logs[-1][-4000:])
        with open(out_path) as f:
            results.append(json.load(f))

    losses = [r['loss'] for r in results]
    assert all(r['finite'] for r in results), results
    assert all(r['n_global_devices'] == n_dev for r in results), results
    assert max(losses) - min(losses) < 1e-6, losses
    assert len({r['confmat_mass'] for r in results}) == 1, results
    return results
