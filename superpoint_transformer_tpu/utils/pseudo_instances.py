"""Pseudo ground-truth instances for real geometry without instance
labels (VERDICT r2 item 3).

The reference demo NAG (a real preprocessed S3DIS room) carries
semantic label histograms but no InstanceData — S3DIS instance
annotations aren't shipped. Connected components of same-majority-
label level-0 voxels are the standard proxy (the reference builds
S3DIS gt instances the same way conceptually: per-room object
annotations ARE spatially-connected same-class segments). These
pseudo-instances let the full SuperCluster loop — affinity supervision
-> instance cut-pursuit -> PQ grid search (reference
src/models/panoptic.py:443-1051) — run and be scored on real geometry.
"""
import numpy as np

__all__ = ['add_pseudo_instances']


def add_pseudo_instances(nag, k=10, radius=0.35, min_size=4,
                         num_classes=13):
    """Attach pseudo InstanceData to `nag` levels 0 and 1.

    1. majority label per level-0 voxel (void where the histogram is
       empty);
    2. kNN adjacency over voxel positions; keep edges whose endpoints
       share a (non-void) label;
    3. weakly-connected components (ops/components.py label
       propagation) = instance ids;
    4. components smaller than `min_size` voxels are re-labelled void
       (tiny speckles would flood PQ's instance count);
    5. InstanceData at level 0 (one overlap per voxel) and its merge
       to level 1 via super_index.

    Returns (nag, info dict). Raw-point counts per voxel come from the
    label histogram mass so overlap counts match the reference's
    point-count semantics.
    """
    from ..data.csr import InstanceData
    from ..ops.components import wcc_by_max_propagation_np
    from ..ops.native import radius_knn

    d0 = nag[0]
    y_hist = np.asarray(d0.y)
    counts = y_hist[:, :num_classes].astype(np.int64)
    tot = counts.sum(1)
    major = counts.argmax(1)
    void = tot == 0

    pos = np.asarray(d0.pos)
    nbr, _ = radius_knn(pos, r=radius, k=k, exclude_self=True)
    src = np.repeat(np.arange(pos.shape[0]), nbr.shape[1])
    dst = nbr.reshape(-1)
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    same = (major[src] == major[dst]) & ~void[src] & ~void[dst]
    ei = np.stack([src[same], dst[same]])

    comp, _ = wcc_by_max_propagation_np(pos.shape[0], ei)
    # void voxels must not bridge components: give them their own ids
    comp = np.where(void, -1, comp)
    uniq, comp_dense = np.unique(comp[~void], return_inverse=True)
    inst = np.full(pos.shape[0], -1, dtype=np.int64)
    inst[~void] = comp_dense

    # instance weight in raw points; drop tiny speckles to void
    n_inst = int(inst.max()) + 1 if (inst >= 0).any() else 0
    inst_size = np.bincount(inst[inst >= 0], minlength=n_inst)
    tiny = inst_size < min_size
    if tiny.any():
        kill = np.zeros(n_inst + 1, dtype=bool)
        kill[:n_inst] = tiny
        inst = np.where((inst >= 0) & kill[np.clip(inst, 0, n_inst)],
                        -1, inst)
        keep_ids, inst_dense = np.unique(inst[inst >= 0],
                                         return_inverse=True)
        new_inst = np.full_like(inst, -1)
        new_inst[inst >= 0] = inst_dense
        inst = new_inst
        n_inst = len(keep_ids)

    # void semantics (reference: void obj id encoded as an instance
    # with label >= num_classes); assign void voxels one shared void
    # instance so InstanceData stays total
    void_rows = inst < 0
    obj = inst.copy()
    obj[void_rows] = n_inst  # single void object
    y_obj = np.full(n_inst + 1, num_classes, dtype=np.int64)
    for c in range(num_classes):
        sel = (~void_rows) & (major == c)
        if sel.any():
            y_obj[np.unique(obj[sel])] = c

    count = np.maximum(tot, 1).astype(np.int64)
    ptr0 = np.arange(pos.shape[0] + 1, dtype=np.int64)
    inst0 = InstanceData(ptr0, obj, count, y_obj[obj])
    d0['obj'] = inst0

    # level-1 InstanceData: merge voxel overlaps by parent segment
    sup = np.asarray(d0.super_index, dtype=np.int64)
    d1_inst = inst0.merge(sup)
    nag[1]['obj'] = d1_inst

    info = {
        'n_instances': int(n_inst),
        'n_void_voxels': int(void_rows.sum()),
        'mean_instance_voxels': float(
            np.bincount(inst[inst >= 0]).mean()) if n_inst else 0.0,
        'classes_present': sorted(
            int(c) for c in np.unique(major[~void_rows])),
    }
    return nag, info
