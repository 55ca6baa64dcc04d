"""SuperCluster on real geometry (VERDICT r2 item 3): run the FULL
panoptic loop — edge-affinity training -> instance cut-pursuit -> PQ
grid search -> PQ/SQ/RQ — on the reference demo room, with pseudo gt
instances built from connected components of same-label voxels
(utils/pseudo_instances.py). Reference loop:
/root/reference/src/models/panoptic.py:443-1051.
"""
import time

import numpy as np

__all__ = ['run_supercluster_demo']


def run_supercluster_demo(nag, steps=600, crops=4, seed=0,
                          num_classes=13, task=None, log=print):
    """Train PanopticTask on radius crops of `nag` (semantic heads +
    edge-affinity head on the level-1 instance graph), then run the
    instance partition + PQ hyperparameter grid search on the whole
    room. Returns PQ/SQ/RQ (+ precision/recall + mAP) and the
    pseudo-instance panoptic oracle ceiling."""
    import dataclasses
    import jax
    from .pseudo_instances import add_pseudo_instances
    from ..metrics.oracle import panoptic_segmentation_oracle
    from ..transforms import BatchConfig, prepare_batch, discover_caps
    from ..trainer import validate_panoptic

    nag = nag.clone()
    nag, info = add_pseudo_instances(nag, num_classes=num_classes)
    log(f'pseudo-instances: {info}')

    if task is None:
        task = _default_panoptic_task(steps, crops, num_classes)
    stuff = tuple(getattr(task, 'stuff_classes', ()) or ())

    cfg = BatchConfig(instance=True)
    rng = np.random.default_rng(seed)
    probe = [[nag] * crops for _ in range(3)]
    cfg_train = discover_caps(probe, cfg, train=True,
                              rng=np.random.default_rng(seed))
    cfg_eval = dataclasses.replace(
        cfg, sample_graph_r=-1, sample_segment_ratio=0,
        rgb_autocontrast=0, rgb_drop=0)

    batch0 = prepare_batch([nag] * crops, cfg_train, train=True,
                           rng=np.random.default_rng(seed))
    state = task.init_state(jax.random.PRNGKey(seed), batch0)
    key = jax.random.PRNGKey(seed + 1)

    t0 = time.time()
    dev_losses = []
    for s in range(steps):
        batch = prepare_batch([nag] * crops, cfg_train, train=True,
                              rng=rng)
        key, sub = jax.random.split(key)
        state, metrics = task.train_step(state, batch, sub)
        dev_losses.append(metrics['loss'])
    losses = [float(x) for x in jax.device_get(
        [dev_losses[0], dev_losses[-1]])] if dev_losses else [None] * 2

    # whole-room panoptic validation: partition + grid search + PQ
    pm = validate_panoptic(
        task, state, [[nag]], cfg_eval, num_classes,
        stuff_classes=stuff, grid_search=True, seed=seed)

    oracle = panoptic_segmentation_oracle(
        nag[1].obj, num_classes, stuff_classes=stuff)

    out = {k: v for k, v in pm.items()
           if isinstance(v, (int, float))}
    out.update({
        'oracle_pq': float(oracle['pq']),
        'oracle_sq': float(oracle.get('sq', float('nan'))),
        'oracle_rq': float(oracle.get('rq', float('nan'))),
        'n_pseudo_instances': info['n_instances'],
        'loss_first': losses[0], 'loss_last': losses[-1],
        'steps': steps, 'crops': crops,
        'settings': pm.get('settings'),
        'wall_sec': time.time() - t0,
    })
    return out


def _default_panoptic_task(steps, crops, num_classes):
    """The SuperCluster task exactly as the CLI builds it
    (configs/train.yaml + experiment=panoptic/s3dis)."""
    import os
    from ..config.loader import load_config
    from ..experiment import build_task
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, 'configs'), 'train',
                      ['experiment=panoptic/s3dis'])
    return build_task(cfg, total_steps=steps, num_graphs=crops)
