"""Training-step tests: loss decreases on a synthetic scene; the
data-parallel step runs on the virtual 8-device CPU mesh (the
reference's analogue: tests/test_train.py fast_dev_run + ddp_sim)."""
import numpy as np
import pytest
import jax

from superpoint_transformer_tpu.utils.synthetic import random_nag
from superpoint_transformer_tpu.transforms import (
    BatchConfig, prepare_batch)
from superpoint_transformer_tpu.models import SPT
from superpoint_transformer_tpu.models.semantic import SemanticTask
from superpoint_transformer_tpu.metrics import ConfusionMatrix


def tiny_model(num_graphs=2):
    return SPT(
        point_mlp=(12, 16, 32), down_dim=(16, 16),
        down_in_mlp=((4 + 32, 16), (4 + 16, 16)),
        down_num_heads=4, down_num_blocks=1, up_dim=(16,),
        up_in_mlp=((4 + 16 + 16, 16),), up_num_heads=4,
        up_num_blocks=1, h_edge_mlp=(18, 16, 16), in_rpe_dim=16,
        qk_dim=4, no_ffn=True, k_rpe=True, q_rpe=True, v_rpe=True,
        use_diameter_parent=True, output_stage_wise=True,
        num_graphs=num_graphs)


def make_batch(seed=0, train=False):
    nag = random_nag(seed=seed, n_points=256, n_l1=32, n_l2=8)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0)
    return prepare_batch([nag], cfg, train=train,
                         rng=np.random.default_rng(seed))


def test_train_step_loss_decreases():
    task = SemanticTask(net=tiny_model(), num_classes=13, lr=0.01,
                        total_steps=50, warmup_steps=2)
    batch = make_batch()
    state = task.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(15):
        rng, sub = jax.random.split(rng)
        state, metrics = task.train_step(state, batch, sub)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    # overfitting one small batch must reduce the loss
    assert losses[-1] < losses[0] * 0.9, losses


def test_eval_step_and_metrics():
    task = SemanticTask(net=tiny_model(), num_classes=13)
    batch = make_batch()
    state = task.init_state(jax.random.PRNGKey(0), batch)
    out = task.eval_step(state, batch)
    cm = ConfusionMatrix(13)
    cm.merge(out['confmat'])
    m = cm.all_metrics()
    assert 0 <= m['miou'] <= 100
    assert 0 <= m['oa'] <= 100
    # confmat mass equals the non-void histogram mass of valid nodes
    y = np.asarray(batch[1].y)
    mask = np.asarray(batch[1].node_mask)
    assert cm.confmat.sum() == int(y[mask][:, :13].sum())


def test_grads_flow_everywhere():
    """Every parameter must receive a nonzero gradient somewhere."""
    task = SemanticTask(net=tiny_model(), num_classes=13)
    batch = make_batch()
    state = task.init_state(jax.random.PRNGKey(0), batch)
    (_, _), grads = jax.value_and_grad(
        task._loss_fn, has_aux=True)(
        state.params, batch, jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves_with_path(grads)
    dead = [jax.tree_util.keystr(p) for p, g in flat
            if not np.any(np.abs(np.asarray(g)) > 0)]
    # RPE encoders of self-loop-only edge feats may be dead on tiny
    # graphs; everything else must be alive
    assert len(dead) < 0.1 * len(flat), dead


@pytest.mark.multichip
def test_dp_train_step_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 (virtual) devices — see '
                    'test_dp_train_step_8_devices_subprocess')
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dp_train_step_8_devices_subprocess():
    """The axon sitecustomize pins jax to the single TPU before
    conftest can intervene, so the 8-virtual-device mesh is exercised
    in a subprocess with the platform forced at launch (this is the
    exact environment the driver uses for dryrun_multichip)."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8')
    out = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; '
         'dryrun_multichip(8)'],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'dryrun_multichip(8)' in out.stdout


def test_dp_matches_single_device_loss():
    if len(jax.devices()) < 2:
        pytest.skip('needs 2 devices')
    """pmean of per-device losses == mean of individual losses."""
    from superpoint_transformer_tpu.parallel import (
        stack_batches, shard_batch, make_dp_train_step)
    from jax.sharding import Mesh
    devices = jax.devices()[:2]
    mesh = Mesh(np.asarray(devices), ('data',))
    task = SemanticTask(net=tiny_model(num_graphs=1), num_classes=13,
                        total_steps=50, warmup_steps=2)
    b0, b1 = make_batch(seed=0), make_batch(seed=1)
    state = task.init_state(jax.random.PRNGKey(0), b0)
    stacked = shard_batch(stack_batches([b0, b1]), mesh)
    step = make_dp_train_step(task, mesh)
    _, metrics = step(state, stacked, jax.random.PRNGKey(1))
    l0, _ = task._loss_fn(state.params, b0, jax.random.PRNGKey(0),
                          train=False)
    l1, _ = task._loss_fn(state.params, b1, jax.random.PRNGKey(0),
                          train=False)
    # train=True losses differ by dropout rng; our tiny model has no
    # dropout so pmean(loss) must equal the average of the two
    np.testing.assert_allclose(
        float(metrics['loss']), (float(l0) + float(l1)) / 2, rtol=1e-4)


def test_reduce_on_plateau_controller():
    """Torch ReduceLROnPlateau semantics (reference plateau family,
    src/optim/lr_scheduler.py:236)."""
    from superpoint_transformer_tpu.optim.lr_scheduler import (
        ReduceOnPlateau)
    c = ReduceOnPlateau(mode='max', factor=0.1, patience=2)
    assert not c.step(10.0)      # first = best
    assert not c.step(10.0)      # bad 1
    assert not c.step(10.0)      # bad 2
    assert c.step(10.0)          # bad 3 > patience -> reduce
    assert c.multiplier == pytest.approx(0.1)
    assert not c.step(11.0)      # improvement resets
    assert c.best == 11.0


def test_plateau_optimizer_multiplier_scales_updates():
    """set_lr_multiplier changes the effective LR without retracing
    the jitted step."""
    import jax
    import jax.numpy as jnp
    from superpoint_transformer_tpu.optim.lr_scheduler import (
        make_plateau_optimizer, set_lr_multiplier)
    params = {'w': jnp.ones(4)}
    tx = make_plateau_optimizer(lr=0.1, num_warmup_steps=0,
                                params=None)
    st = tx.init(params)
    traces = []

    @jax.jit
    def step(params, st):
        traces.append(1)
        g = {'w': jnp.ones(4)}
        up, st = tx.update(g, st, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params,
                                      up), st

    p1, st1 = step(params, st)
    d_full = float(jnp.abs(p1['w'] - params['w']).mean())
    st_small = set_lr_multiplier(st, 0.1)
    p2, _ = step(params, st_small)
    d_small = float(jnp.abs(p2['w'] - params['w']).mean())
    assert d_small == pytest.approx(d_full * 0.1, rel=1e-4)
    assert len(traces) == 1  # no retrace on multiplier change


def test_semantic_task_plateau_trains():
    """SemanticTask(scheduler='plateau') trains and the Trainer's
    plateau hook reduces the LR after stale validations."""
    import jax
    from superpoint_transformer_tpu.models.semantic import SemanticTask
    from superpoint_transformer_tpu.optim.lr_scheduler import (
        set_lr_multiplier)
    from superpoint_transformer_tpu.transforms.prepare import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.utils.synthetic import random_nag

    nag = random_nag(seed=0, n_points=256)
    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0)
    batch = prepare_batch([nag], cfg, train=True,
                          rng=np.random.default_rng(0))
    task = SemanticTask(net=tiny_model(), num_classes=13,
                        total_steps=10, warmup_steps=0,
                        scheduler='plateau')
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, m = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m['loss']))
    # multiplier reachable through the real opt_state
    st2 = set_lr_multiplier(state.opt_state, 0.25)
    assert st2 is not state.opt_state


def test_trainer_devices_matches_grad_accumulation(tmp_path):
    """Trainer(devices=8) runs one global step per 8 loader batches;
    its logged loss equals the mean of the 8 per-batch losses at the
    step's params, and its parameter update equals a single-device
    update with the averaged gradients (DDP ≡ grad-accumulation at
    equal global batch; reference configs/trainer/ddp.yaml +
    src/models/semantic.py:949-950 metric reduction)."""
    import csv
    import os.path as osp
    from superpoint_transformer_tpu.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 (virtual) devices')

    task = SemanticTask(net=tiny_model(num_graphs=1), num_classes=13,
                        total_steps=10, warmup_steps=0)
    batches = [make_batch(seed=s) for s in range(8)]
    state = task.init_state(jax.random.PRNGKey(0), batches[0])
    init_params = jax.tree_util.tree_map(np.asarray, state.params)

    cfg = BatchConfig(sample_graph_r=-1, sample_segment_ratio=0)
    tr = Trainer(task=task, batch_cfg=cfg, output_dir=str(tmp_path),
                 max_epochs=1, devices=8)
    state2 = tr.fit(state, batches)
    assert int(state2.step) == 1

    # (a) loss parity: pmean of per-device losses == mean of the 8
    # individual losses at the initial params (tiny model: no dropout)
    losses, grads = [], []
    for b in batches:
        (l, _), g = jax.value_and_grad(
            task._loss_fn, has_aux=True)(
            state.params, b, jax.random.PRNGKey(0))
        losses.append(float(l))
        grads.append(g)
    with open(osp.join(str(tmp_path), 'metrics.csv')) as f:
        row = [r for r in csv.DictReader(f)
               if r['split'] == 'train'][0]
    np.testing.assert_allclose(float(row['loss']), np.mean(losses),
                               rtol=1e-4)

    # (b) update parity: DP step == apply_gradients(mean of grads).
    # Compare only where |grad| is non-tiny: at step 1 Adam's update is
    # lr*g/(|g|+eps), so coordinates with |g|~eps amplify f32
    # summation-order noise (pmean vs host mean differ at ~3e-6
    # relative) into arbitrary update signs — ill-conditioned by
    # construction, not a parity failure.
    gmean = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / len(xs), *grads)
    expect = state.replace(
        params=init_params).apply_gradients(grads=gmean).params
    checked = 0
    for (pa, a), (_, b), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(state2.params),
            jax.tree_util.tree_leaves_with_path(expect),
            jax.tree_util.tree_leaves_with_path(gmean)):
        mask = np.abs(np.asarray(g)) > 1e-3
        if not mask.any():
            continue
        checked += int(mask.sum())
        np.testing.assert_allclose(
            np.asarray(a)[mask], np.asarray(b)[mask], rtol=1e-3,
            atol=1e-6, err_msg=jax.tree_util.keystr(pa))
    assert checked > 100  # the comparison actually covered parameters


def test_flattened_optimizer_matches_multi_transform():
    """make_optimizer(flatten=True) runs each LR group's AdamW on one
    concatenated vector — elementwise math, so updates must match the
    per-leaf optax.multi_transform reference exactly."""
    from superpoint_transformer_tpu.optim.lr_scheduler import (
        make_optimizer)

    model = tiny_model(num_graphs=1)
    batch = make_batch(train=True)
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b, train=False))(batch)
    params = variables['params']

    tx_flat = make_optimizer(lr=0.01, total_steps=100,
                             num_warmup_steps=10, params=params,
                             flatten=True)
    tx_ref = make_optimizer(lr=0.01, total_steps=100,
                            num_warmup_steps=10, params=params,
                            flatten=False)

    def run(tx):
        p = params
        st = tx.init(p)
        for i in range(3):
            g = jax.tree_util.tree_map(
                lambda a: (0.01 * (i + 1)) * jnp_ones_like(a), p)
            upd, st = tx.update(g, st, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
        return p

    import jax.numpy as jnp

    def jnp_ones_like(a):
        return jnp.ones_like(a) * (1.0 + jnp.arange(
            a.size, dtype=a.dtype).reshape(a.shape) * 1e-3)

    pa = run(tx_flat)
    pb = run(tx_ref)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(pa),
            jax.tree_util.tree_leaves_with_path(pb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))


def test_fused_rpe_matmul_matches_separate_encoders():
    """The single concatenated RPE matmul (attention.py fuse_rpe_matmul)
    is numerically equivalent to the three separate k/q/v Dense
    encoders, with an identical param tree."""
    import jax.numpy as jnp
    from superpoint_transformer_tpu.nn.attention import (
        SelfAttentionBlock)

    N, K, H, D, C, De = 16, 8, 4, 4, 32, 18
    kw = dict(dim=C, num_heads=H, qk_dim=D, in_rpe_dim=De,
              k_rpe=True, q_rpe=True, v_rpe=True, use_pallas=False)
    blk_f = SelfAttentionBlock(fuse_rpe_matmul=True, **kw)
    blk_s = SelfAttentionBlock(fuse_rpe_matmul=False, **kw)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    nbr_idx = jnp.asarray(rng.integers(0, N, (N, K)))
    nbr_mask = jnp.asarray(rng.random((N, K)) < 0.8)
    ef = jnp.asarray(rng.normal(size=(N, K, De)), jnp.float32)

    vf = blk_f.init(jax.random.PRNGKey(0), x, nbr_idx, nbr_mask,
                    edge_feat=ef, train=False)
    vs = blk_s.init(jax.random.PRNGKey(0), x, nbr_idx, nbr_mask,
                    edge_feat=ef, train=False)
    # identical param trees (same module names, same shapes)
    fa = jax.tree_util.tree_leaves_with_path(vf)
    fb = jax.tree_util.tree_leaves_with_path(vs)
    assert [jax.tree_util.keystr(p) for p, _ in fa] \
        == [jax.tree_util.keystr(p) for p, _ in fb]
    for (_, a), (_, b) in zip(fa, fb):
        assert a.shape == b.shape

    out_f = blk_f.apply(vf, x, nbr_idx, nbr_mask, edge_feat=ef,
                        train=False)
    out_s = blk_s.apply(vf, x, nbr_idx, nbr_mask, edge_feat=ef,
                        train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)
