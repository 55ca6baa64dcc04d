"""Data-parallel training over a device mesh.

The reference scales with Lightning DDP (configs/trainer/ddp.yaml;
metric reduction via all_gather at src/models/semantic.py:949). The
TPU-native equivalent: a 1-D ('data',) `jax.sharding.Mesh`; each
device holds one padded NAG batch (leading device axis on every leaf),
`shard_map` runs the per-device loss/grad, gradients and confusion
matrices are `psum`-reduced over ICI, and the optimizer update is
computed redundantly on all devices (fully-replicated params).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
if hasattr(jax, 'shard_map'):
    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        # jax >= 0.8 renamed check_rep -> check_vma
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
else:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

__all__ = ['make_data_mesh', 'stack_batches', 'shard_batch',
           'make_dp_train_step', 'make_shard_mesh',
           'make_sharded_forward', 'make_sharded_train_step']


def make_data_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=('data',))


def stack_batches(padded_batches):
    """Stack D same-capacity PaddedNAGs along a new leading device
    axis. All leaves must agree in shape (use fixed node_caps/k_caps
    in BatchConfig to guarantee this)."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *padded_batches)


def shard_batch(stacked, mesh):
    """Place a stacked batch so its leading axis is split over the
    'data' mesh axis."""
    sharding = jax.sharding.NamedSharding(mesh, P('data'))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, sharding if np.ndim(x) > 0 else
            jax.sharding.NamedSharding(mesh, P())), stacked)


def make_dp_train_step(task, mesh):
    """Build the pjit-ted data-parallel train step for a SemanticTask.

    Per device: drop the leading axis (local shard is [1, ...]),
    compute loss/grads on the local batch, psum grads + metrics over
    'data', apply the optimizer on replicated params.
    """

    def per_device(state, batch, rng):
        local = jax.tree_util.tree_map(
            lambda x: x[0] if jnp.ndim(x) > 0 else x, batch)
        my = jax.lax.axis_index('data')
        step_rng = jax.random.fold_in(rng, my)
        (loss, (logits, _)), grads = jax.value_and_grad(
            task._loss_fn, has_aux=True)(
            state.params, local, step_rng)
        grads = jax.lax.pmean(grads, 'data')
        loss = jax.lax.pmean(loss, 'data')
        from ..metrics.semantic import confusion_matrix_from_histogram
        cm = confusion_matrix_from_histogram(
            logits[0], local[1].y, task.num_classes,
            node_mask=local[1].node_mask)
        cm = jax.lax.psum(cm, 'data')
        new_state = state.apply_gradients(grads=grads)
        return new_state, {'loss': loss, 'confmat': cm}

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P('data'), P()),
        out_specs=(P(), P()),
        check_rep=False)

    @jax.jit
    def step(state, stacked_batch, rng):
        return sharded(state, stacked_batch, rng)

    return step


def make_sharded_train_step(task, mesh):
    """Graph-partition-parallel TRAINING step: one giant cloud's nodes
    sharded across the 'shard' mesh axis (shard_padded_nag layout, the
    model built with shard_axis='shard').

    Exactness: every loss term is a ratio of psum'd numerator /
    denominator (loss/semantic.py `axis_name`), so the sharded loss
    equals the unsharded one; per-device grads cover only the local
    node contributions, so they are psum'd before the (replicated)
    optimizer update — the same recipe as data parallelism, but over
    node shards of a single example (no reference equivalent;
    SURVEY §2.11 free design space).
    """
    from ..metrics.semantic import confusion_matrix_from_histogram
    from ..loss.semantic import multi_stage_loss

    def per_device(state, batch, rng):
        local = jax.tree_util.tree_map(
            lambda x: x[0] if jnp.ndim(x) > 0 else x, batch)
        my = jax.lax.axis_index('shard')
        step_rng = jax.random.fold_in(rng, my)

        def loss_fn(params):
            variables = {'params': params}
            logits = task.model.apply(
                variables, local, train=True,
                rngs={'dropout': step_rng})
            y_hists, masks = task._targets(local)
            cw = None
            if task.class_weight is not None:
                cw = jnp.asarray(task.class_weight, jnp.float32)
            loss = multi_stage_loss(
                logits, y_hists, task.multi_stage_loss_lambdas,
                loss_type=task.loss_type, class_weight=cw,
                node_masks=masks, axis_name='shard')
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, 'shard')
        cm = confusion_matrix_from_histogram(
            logits[0], local[1].y, task.num_classes,
            node_mask=local[1].node_mask)
        cm = jax.lax.psum(cm, 'shard')
        new_state = state.apply_gradients(grads=grads)
        return new_state, {'loss': loss, 'confmat': cm}

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P('shard'), P()),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(sharded)


def make_shard_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=('shard',))


def make_sharded_forward(model, mesh, train=False):
    """Graph-partition-parallel forward: ONE giant cloud's nodes are
    split across the 'shard' mesh axis (parallel/shard_nag.py); each
    device runs the model on its node shard, with cross-shard neighbor
    attention via per-block k/v all_gathers and psum'd norm statistics
    (the model must be built with shard_axis='shard').

    This is the framework's context-parallel analogue for tiles too
    large for one chip (SURVEY §2.11 — free design space vs the
    reference, whose answer is XY tiling).
    """

    def per_device(variables, batch):
        local = jax.tree_util.tree_map(
            lambda x: x[0] if jnp.ndim(x) > 0 else x, batch)
        return model.apply(variables, local, train=train)

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P('shard')),
        out_specs=P('shard'),
        check_rep=False)
    return jax.jit(sharded)
