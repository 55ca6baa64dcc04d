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
                          num_classes=13, task=None, log=print,
                          pool=24, edge_affinity_loss_weights=None,
                          experiment='panoptic/s3dis'):
    """Train PanopticTask on radius crops of `nag` (semantic heads +
    edge-affinity head on the level-1 instance graph), then run the
    instance partition + PQ hyperparameter grid search on the whole
    room. Returns PQ/SQ/RQ (+ precision/recall + mAP) and the
    pseudo-instance panoptic oracle ceiling.

    Training cycles through a fixed `pool` of pre-built device-resident
    crop batches instead of preparing a fresh batch per step: a
    per-step host prepare + device_put through the dev relay leaks the
    transfer queue's host copies (a 1500-step run OOM-killed the 20 GB
    host) and serializes ~2 s of host work into every step."""
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
        task = _default_panoptic_task(steps, crops, num_classes,
                                      experiment=experiment)
    if edge_affinity_loss_weights is not None:
        # the pseudo-instance graph is extremely positive-skewed
        # (connected components make ~92% of instance-graph edges
        # same-object) — without upweighting the negative cases the
        # affinity head degenerates to all-positive (the reference's
        # 4-case weighting knob, src/models/panoptic.py:726-758;
        # set BEFORE the first train_step so the jit traces it)
        task.edge_affinity_loss_weights = tuple(
            float(w) for w in edge_affinity_loss_weights)
    stuff = tuple(getattr(task, 'stuff_classes', ()) or ())

    cfg = BatchConfig(instance=True)
    rng = np.random.default_rng(seed)
    probe = [[nag] * crops for _ in range(3)]
    cfg_train = discover_caps(probe, cfg, train=True,
                              rng=np.random.default_rng(seed))
    cfg_eval = dataclasses.replace(
        cfg, sample_graph_r=-1, sample_segment_ratio=0,
        rgb_autocontrast=0, rgb_drop=0)

    pool = max(1, min(pool, steps))
    batches = [prepare_batch([nag] * crops, cfg_train, train=True,
                             rng=rng) for _ in range(pool)]
    state = task.init_state(jax.random.PRNGKey(seed), batches[0])
    key = jax.random.PRNGKey(seed + 1)

    t0 = time.time()
    loss_first = loss_last = None
    for s in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = task.train_step(state, batches[s % pool], sub)
        if s == 0:
            loss_first = metrics['loss']
        loss_last = metrics['loss']
    losses = ([float(x) for x in jax.device_get(
        [loss_first, loss_last])] if steps else [None] * 2)

    # whole-room panoptic validation: partition + grid search + PQ
    pm = validate_panoptic(
        task, state, [[nag]], cfg_eval, num_classes,
        stuff_classes=stuff, grid_search=True, seed=seed)

    # cross-oracle decomposition: partition quality with each trained
    # input swapped for its oracle — pinpoints which prediction breaks
    # the partition (trained logits vs trained affinities)
    cross = _cross_oracle_pq(task, state, nag, cfg_eval, num_classes,
                             stuff)
    pm.update(cross)

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


def _cross_oracle_pq(task, state, nag, cfg_eval, num_classes, stuff):
    """PQ of the instance partition with each trained input swapped
    for its oracle: (trained logits + oracle affinities) and (oracle
    logits + trained affinities). Both-oracle reaches the panoptic
    ceiling (pinned by test_instance_partition_oracle_inputs_...), so
    these two cells attribute the gap."""
    import jax
    from ..models.panoptic import grid_search_panoptic_partition
    from ..transforms import prepare_batch

    batch = prepare_batch([nag], cfg_eval, train=False)
    out = task.eval_step(state, batch)
    lvl1 = batch[1]
    n1 = int(np.asarray(lvl1.num_nodes))
    logits = np.asarray(out['logits_level1'])[:n1]
    emask = np.asarray(lvl1.obj_edge_mask)
    ei = np.asarray(lvl1.obj_edge_index)[:, emask]
    ea = np.asarray(out['edge_affinity_logits'])[emask]
    pos = np.asarray(lvl1.pos)[:n1]
    sizes = (np.asarray(lvl1.node_size)[:n1]
             if lvl1.node_size is not None else None)
    # batch level-1 is sorted by parent (pad.sort_nag_by_super):
    # everything fetched above is in BATCH order; reindex the
    # NAG-order gt (obj, y) into batch order via node_id
    nid = (np.asarray(lvl1.node_id)[:n1]
           if lvl1.node_id is not None else np.arange(n1))

    obj = nag[1].obj[nid][0]
    maj_obj, _, maj_y = obj.major(num_classes=num_classes)
    maj_obj, maj_y = np.asarray(maj_obj), np.asarray(maj_y)
    valid = maj_y < num_classes
    o_logits = np.full((n1, num_classes), -10.0, np.float32)
    o_logits[np.arange(n1)[valid], maj_y[valid]] = 10.0
    same = (maj_obj[ei[0]] == maj_obj[ei[1]]) \
        & valid[ei[0]] & valid[ei[1]]
    o_ea = np.where(same, 10.0, -10.0).astype(np.float32)

    res = {}
    # semantic quality of the panoptic model's level-1 logits (the
    # cross-oracle cells attribute the PQ gap to logits vs affinities;
    # this attributes the LOGIT cell: is the semantic head itself weak,
    # or only its per-instance aggregation?)
    if nag[1].y is not None:
        from ..metrics.semantic import ConfusionMatrix
        y1 = np.asarray(nag[1].y)[nid]
        if y1.ndim == 2:
            y1 = y1[:, :num_classes]  # histogram labels
        cm = ConfusionMatrix(num_classes)
        cm.update(logits.argmax(-1), y1)
        res['semantic_miou_level1'] = float(cm.miou())
        res['semantic_oa_level1'] = float(cm.oa())
    for name, lg, aff in (
            ('pq_trained_logits_oracle_affinity', logits, o_ea),
            ('pq_oracle_logits_trained_affinity', o_logits, ea)):
        _, metrics, obj_index = grid_search_panoptic_partition(
            pos, lg, ei, aff, obj, num_classes, node_size=sizes,
            stuff_classes=stuff)
        res[name] = float(metrics['pq'])
        res[name.replace('pq_', 'n_inst_')] = int(obj_index.max()) + 1
    return res


def _default_panoptic_task(steps, crops, num_classes,
                           experiment='panoptic/s3dis'):
    """The SuperCluster task exactly as the CLI builds it
    (configs/train.yaml + experiment=panoptic/s3dis, or the
    with-stuff variant — ceiling/floor/wall merged to one segment
    per class, reference utils/instance.py:649-672)."""
    import os
    from ..config.loader import load_config
    from ..experiment import build_task
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(repo, 'configs'), 'train',
                      [f'experiment={experiment}'])
    return build_task(cfg, total_steps=steps, num_graphs=crops)
