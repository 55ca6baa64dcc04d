"""EZ-SP on real geometry: learned partition of the reference demo
room.

Runs the full EZ-SP stage-1 recipe (reference
PartitionAndSemanticModule training + GreedyContourPriorPartition
validation, src/models/semantic.py:1400,1671) on the demo room's
level-0 voxels: train the sparse-CNN embedding with the contrastive
edge criterion, partition the room on the learned embeddings with the
greedy contour-prior merge, and score the resulting partition's
purity (oracle mIoU) against the reference's stored cut-pursuit
partition of the SAME room — the metric the reference logs as
partition quality.
"""
import time

import numpy as np

__all__ = ['run_ezsp_demo']


def run_ezsp_demo(nag, steps=200, seed=0, num_classes=13,
                  channels=(32, 32), reg=2e-2, min_size=(5, 30),
                  log=print):
    """Train EZ-SP embeddings on the demo room and partition it.

    Returns dict with the learned partition's level-1 oracle
    mIoU/OA + segment count, the same numbers for the room's stored
    cut-pursuit partition (the reference baseline), and the losses.
    """
    import jax
    from ..data.data import Data
    from ..metrics.oracle import semantic_segmentation_oracle
    from ..models.partition import (PartitionModel, PartitionTask,
                                    partition_purity)
    from ..transforms.prepare import (BatchConfig,
                                      prepare_partition_batch)
    from ..transforms.preprocess import (
        greedy_contour_prior_partition)

    cfg = BatchConfig(num_classes=num_classes)
    rng = np.random.default_rng(seed)
    # the demo room (~41k voxels) fits one batch and the contrastive
    # criterion is deterministic (expected-rate adaptive sampling), so
    # one fixed full-room batch is the exact objective every step
    batch = prepare_partition_batch([nag], cfg, train=True, rng=rng)

    task = PartitionTask(
        net=PartitionModel(channels=tuple(channels), num_graphs=1),
        num_classes=num_classes, lr=1e-3, total_steps=steps)
    state = task.init_state(jax.random.PRNGKey(seed), batch)

    t0 = time.time()
    dev_losses = []
    for s in range(steps):
        state, metrics = task.train_step(state, batch)
        dev_losses.append(metrics['loss'])
    losses = [float(x) for x in jax.device_get(
        [dev_losses[0], dev_losses[-1]])] if dev_losses else [None] * 2

    # embeddings of every voxel (eval batch, no augmentation)
    ebatch = prepare_partition_batch([nag], cfg, train=False)
    emb = task.embed(state, ebatch)

    # greedy contour-prior partition on the learned embeddings over
    # the SAME adjacency the batch used (reference
    # GreedyContourPriorPartition, src/transforms/partition.py:383)
    n = emb.shape[0]
    ei = np.asarray(ebatch.edge_index)[:, np.asarray(ebatch.edge_mask)]
    d0 = nag[0]
    data = Data(pos=np.asarray(d0.pos, np.float32)[:n],
                x=emb.astype(np.float32),
                y=np.asarray(d0.y)[:n],
                edge_index=ei.astype(np.int64))
    part = greedy_contour_prior_partition(
        data, reg=reg, min_size=list(min_size),
        edge_weight_mode='exp_neg_latent_distance')

    def _oracle(y_hist_lvl):
        y = np.asarray(y_hist_lvl)[:, :num_classes].astype(np.int64)
        return semantic_segmentation_oracle(y, num_classes)

    learned = _oracle(part[1].y)
    # the reference's stored cut-pursuit partition of the same room
    ref = _oracle(nag[1].y)

    return {
        'learned_n_segments': int(part[1].num_nodes),
        'learned_oracle_miou': float(learned['miou']),
        'learned_oracle_oa': float(learned['oa']),
        'cutpursuit_n_segments': int(nag[1].num_nodes),
        'cutpursuit_oracle_miou': float(ref['miou']),
        'cutpursuit_oracle_oa': float(ref['oa']),
        'loss_first': losses[0], 'loss_last': losses[1],
        'steps': steps, 'n_voxels': int(n),
        'wall_sec': time.time() - t0,
    }
