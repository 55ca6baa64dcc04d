"""EZ-SP partition criterion: contrastive edge-affinity loss on point
embeddings (reference src/loss/partition_criterion.py:13-246).

The embeddings should be homogeneous within objects and contrasted
across semantic boundaries: for each adjacency edge (i, j), predicted
affinity = exp(-||x_i - x_j|| / T); target affinity = 1 iff the
majority labels of i and j agree; the loss is a binary focal loss.

TPU-native adaptation: the reference randomly SUBSAMPLES majority-class
(intra) edges until inter-edges reach `adaptive_sampling_ratio` of the
kept set — a data-dependent shape. Here the same class balance is
achieved in expectation by REWEIGHTING: every inter edge keeps weight
1 and intra edges get weight n_inter * (1/ratio - 1) / n_intra, which
reproduces the sampled class proportions exactly while remaining a
static-shape jit program (and is lower-variance than sampling).
"""
import jax.numpy as jnp

__all__ = ['partition_criterion', 'edge_affinity_from_features']

INTER_EDGE_LABEL = 0
INTRA_EDGE_LABEL = 1


def edge_affinity_from_features(x, edge_index, temperature=1.0):
    """exp(-||x_i - x_j|| / T) per edge (reference
    features_to_edge_affinity, partition_criterion.py:246)."""
    diff = x[edge_index[0]] - x[edge_index[1]]
    d = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 1e-20))
    return jnp.exp(-d / temperature)


def partition_criterion(
        x, y_hist, edge_index, edge_mask=None, num_classes=None,
        affinity_temperature=1.0, adaptive_sampling_ratio=0.9,
        gamma=1.0, focal_weight=0.5, train=True):
    """Returns (loss, aux) with aux = dict(n_inter_edge, n_valid_edge,
    predicted_affinity, target_affinity, edge_valid).

    x [N, D] embeddings; y_hist [N, C(+1)] class histograms (last
    column may be void); edge_index [2, E] (padded edges masked by
    `edge_mask`)."""
    C = num_classes if num_classes is not None else y_hist.shape[1] - 1
    counts = y_hist[:, :C]
    majority_count = counts.max(axis=1)
    y_major = jnp.argmax(counts, axis=1)

    src, dst = edge_index[0], edge_index[1]
    valid = jnp.ones(src.shape[0], bool) if edge_mask is None \
        else edge_mask
    valid = valid & (src != dst)                       # no self-loops
    void = majority_count == 0                          # pure-void voxel
    valid = valid & ~void[src] & ~void[dst]

    target = (y_major[src] == y_major[dst]).astype(jnp.int32)
    is_inter = (target == INTER_EDGE_LABEL) & valid
    is_intra = (target == INTRA_EDGE_LABEL) & valid
    n_inter = is_inter.sum()
    n_intra = is_intra.sum()

    weight = valid.astype(jnp.float32)
    if train and adaptive_sampling_ratio is not None:
        # expected majority-class keep rate of the reference's
        # binary_adaptive_sampling (partition_criterion.py:176)
        n_keep_intra = n_inter.astype(jnp.float32) * (
            1.0 / adaptive_sampling_ratio - 1.0)
        rate = jnp.clip(
            n_keep_intra / jnp.maximum(n_intra.astype(jnp.float32), 1.0),
            0.0, 1.0)
        weight = jnp.where(is_intra, rate, weight)

    pred = edge_affinity_from_features(
        x, edge_index, temperature=affinity_temperature)
    # weighted binary focal loss: fold the per-edge weights into the
    # mask-average by using a weighted mean
    yb = target.astype(jnp.float32)
    p_t = (1.0 - yb) + pred * (2.0 * yb - 1.0)
    eps = 1e-6
    p_t = eps + (1.0 - 2.0 * eps) * p_t
    cw = yb * focal_weight + (1.0 - yb) * (1.0 - focal_weight)
    per = -((1.0 - p_t) ** gamma) * jnp.log(p_t) * cw * weight
    # guard the no-inter-edge / no-edge case with a zero loss
    # (reference fake_edge_classification_loss)
    denom = jnp.maximum(weight.sum(), 1.0)
    loss = jnp.where(n_inter > 0, per.sum() / denom, 0.0)
    aux = {
        'n_inter_edge': n_inter,
        'n_valid_edge': valid.sum(),
        'predicted_affinity': pred,
        'target_affinity': target,
        'edge_valid': valid,
    }
    return loss, aux
