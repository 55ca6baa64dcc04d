"""Instance-overlap operations on CSR InstanceData (reference
src/data/instance.py): per-cluster major instance, instance-graph
target affinities, and panoptic-quality matching from overlaps — no
dense masks are ever built.
"""
import numpy as np

from ..data.csr import InstanceData

__all__ = ['instance_major', 'instance_graph_affinity',
           'estimate_instance_centroid']


def instance_major(inst: InstanceData, num_classes=None):
    """For each cluster, the instance it overlaps most: returns
    (obj_id [Nc], overlap_count [Nc], semantic_label y [Nc])
    (reference InstanceData.major)."""
    n = inst.num_groups
    idx = inst.to_super_index()
    obj = np.full(n, -1, dtype=np.int64)
    cnt = np.zeros(n, dtype=np.int64)
    y = np.full(n, num_classes if num_classes is not None else -1,
                dtype=np.int64)
    order = np.lexsort((-inst.count, idx))
    first = np.ones(order.shape[0], dtype=bool)
    first[1:] = idx[order][1:] != idx[order][:-1]
    rows = order[first]
    obj[idx[rows]] = inst.obj[rows]
    cnt[idx[rows]] = inst.count[rows]
    y[idx[rows]] = inst.y[rows]
    return obj, cnt, y


def instance_graph_affinity(inst: InstanceData, edge_index,
                            num_classes=None, smooth_affinity=True):
    """Target affinity per (trimmed) edge (reference
    InstanceData.instance_graph, src/data/instance.py:354): smooth
    formulation `(overlap_i_objj/size_i + overlap_j_obji/size_j)/2`."""
    from .graph import to_trimmed_np
    ei, _ = to_trimmed_np(np.asarray(edge_index, dtype=np.int64))
    if ei.shape[1] == 0:
        return ei, np.zeros(0, dtype=np.float32)
    sp_obj, _, _ = instance_major(inst, num_classes=num_classes)
    i_obj = sp_obj[ei[0]]
    j_obj = sp_obj[ei[1]]
    if not smooth_affinity:
        return ei, (i_obj == j_obj).astype(np.float32)
    # overlap lookup (cluster, obj) -> count via dict-free hashing
    base = int(inst.obj.max()) + 1 if inst.obj.size else 1
    idx = inst.to_super_index()
    A = idx * base + inst.obj
    lut_keys, lut_pos = np.unique(A, return_index=True)
    counts = inst.count[lut_pos].astype(np.float64)

    def overlap(cluster, objs):
        q = cluster * base + objs
        pos = np.searchsorted(lut_keys, q)
        pos = np.clip(pos, 0, lut_keys.shape[0] - 1)
        hit = lut_keys[pos] == q
        return np.where(hit & (objs >= 0), counts[pos], 0.0)

    sp_size = np.zeros(inst.num_groups, dtype=np.float64)
    np.add.at(sp_size, idx, inst.count)
    o_ij = overlap(ei[0], j_obj)
    o_ji = overlap(ei[1], i_obj)
    aff = (o_ij / np.maximum(sp_size[ei[0]], 1)
           + o_ji / np.maximum(sp_size[ei[1]], 1)) / 2
    return ei, aff.astype(np.float32)


def estimate_instance_centroid(inst: InstanceData, pos, mode='iou'):
    """Estimate each gt instance's centroid from the clusters
    overlapping it, weighted by IoU or size-ratio product (reference
    InstanceData.estimate_centroid, src/data/instance.py:287).
    Returns (obj_pos [n_obj, 3], obj_ids [n_obj] sorted)."""
    idx = inst.to_super_index()
    sp_size = np.zeros(inst.num_groups, dtype=np.float64)
    np.add.at(sp_size, idx, inst.count)
    objs, obj_inv = np.unique(inst.obj, return_inverse=True)
    obj_size = np.zeros(objs.shape[0], dtype=np.float64)
    np.add.at(obj_size, obj_inv, inst.count)
    c = inst.count.astype(np.float64)
    if mode == 'iou':
        w = c / (sp_size[idx] + obj_size[obj_inv] - c)
    else:  # 'ratio-product'
        w = (c / sp_size[idx]) * (c / obj_size[obj_inv])
    acc = np.zeros((objs.shape[0], pos.shape[1]), dtype=np.float64)
    np.add.at(acc, obj_inv, pos[idx] * w[:, None])
    wsum = np.zeros(objs.shape[0], dtype=np.float64)
    np.add.at(wsum, obj_inv, w)
    return (acc / np.maximum(wsum[:, None], 1e-12)).astype(np.float32), \
        objs
