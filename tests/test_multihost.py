"""Multi-host (multi-process) data parallelism (SURVEY §2.11: the
TPU-native replacement for Lightning DDP over torch.distributed —
jax.distributed + per-host data sharding via
make_array_from_process_local_data; VERDICT r2 item 7).

The dryrun spawns 2 CPU processes x 2 virtual devices each, joined
through a local coordinator with Gloo collectives, and runs ONE global
data-parallel train step. Equivalence: the same 4-batch global step
run single-process on this suite's virtual mesh must produce the same
loss and the identical confusion matrix.
"""
import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_multihost_dryrun_matches_single_process():
    from superpoint_transformer_tpu.parallel.multihost import (
        launch_multihost_dryrun)
    from superpoint_transformer_tpu.parallel import (
        make_data_mesh, stack_batches, shard_batch, make_dp_train_step)
    from superpoint_transformer_tpu.models.semantic import SemanticTask
    from __graft_entry__ import _make_batch, _make_model

    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip('needs a 4-device virtual mesh')

    # --- multi-process run: 2 hosts x 2 devices ---
    results = launch_multihost_dryrun(n_proc=2, n_dev=n_dev)
    assert len(results) == 2
    mh_loss = results[0]['loss']
    mh_mass = results[0]['confmat_mass']

    # --- single-process run at the identical global batch ---
    batches = [_make_batch(seed=g, train=False) for g in range(n_dev)]
    task = SemanticTask(net=_make_model(num_graphs=1), num_classes=13,
                        total_steps=100, warmup_steps=10)
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    mesh = make_data_mesh(jax.devices()[:n_dev])
    stacked = shard_batch(stack_batches(batches), mesh)
    step = make_dp_train_step(task, mesh)
    _, metrics = step(state, stacked, jax.random.PRNGKey(1))
    sp_loss = float(np.asarray(metrics['loss']))
    sp_mass = int(np.asarray(metrics['confmat']).sum())

    # same model, same batch, same rng folding by GLOBAL device index
    # => same step; loss within float tolerance (gloo reduction order),
    # confusion-matrix mass exact (integer psum)
    assert mh_mass == sp_mass, (mh_mass, sp_mass)
    assert abs(mh_loss - sp_loss) <= 1e-4 * max(1.0, abs(sp_loss)), (
        mh_loss, sp_loss)
