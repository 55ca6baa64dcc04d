"""Padded, static-shape device representation of a NAG batch.

This is the host->device boundary of the framework: ragged `NAG`
hierarchies (numpy) are converted once per batch into `PaddedNAG` — a
pytree of fixed-capacity arrays + masks that every jitted computation
consumes. Capacities are bucketed (powers of two by default) so pjit
compiles a small, cached set of programs.

Design notes (vs reference):
  - the reference's scatter-softmax attention edge list
    (src/nn/attention.py) becomes a dense `[N, K]` neighbor layout
    (exact: K >= max degree, no edge dropped);
  - levels are sorted by `super_index` so pooling/unpooling and
    UnitSphereNorm run as sorted segment ops;
  - padded child nodes carry `super_index == parent_capacity`, which
    jax segment ops drop and gathers clamp harmlessly.
"""
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from .nag import NAG
from .csr import Cluster
from ..ops.graph import edges_to_dense_neighbors, _round_up

__all__ = ['PaddedLevel', 'PaddedNAG', 'PaddedPointCloud', 'batch_nags',
           'sort_nag_by_super', 'pad_nag', 'pad_point_cloud', 'bucket']


@struct.dataclass
class PaddedLevel:
    """One partition level, padded to static capacity N (and K dense
    neighbor slots)."""
    pos: jnp.ndarray                      # [N, 3] float32
    node_mask: jnp.ndarray                # [N] bool
    batch: jnp.ndarray                    # [N] int32 graph id (norms)
    num_nodes: jnp.ndarray                # [] int32 actual count
    x: Optional[jnp.ndarray] = None       # [N, Dx] handcrafted features
    node_size: Optional[jnp.ndarray] = None   # [N] float32
    super_index: Optional[jnp.ndarray] = None  # [N] int32 -> parent slot
    nbr_idx: Optional[jnp.ndarray] = None      # [N, K] int32
    nbr_mask: Optional[jnp.ndarray] = None     # [N, K] bool
    edge_feat: Optional[jnp.ndarray] = None    # [N, K, De] float32
    y: Optional[jnp.ndarray] = None       # [N, C+1] label histogram
    v_edge_attr: Optional[jnp.ndarray] = None  # [N, Dv] vertical edge
    obj_edge_index: Optional[jnp.ndarray] = None   # [2, Eo] (panoptic)
    obj_edge_mask: Optional[jnp.ndarray] = None    # [Eo]
    obj_edge_affinity: Optional[jnp.ndarray] = None  # [Eo] target
    cnn_nbr_idx: Optional[jnp.ndarray] = None     # [N, K^3] sparse conv
    # transpose neighbor table (see pad_nag): incoming flattened
    # [N*K] slot ids per node — turns the attention gather's backward
    # scatter into a gather
    nbr_in_idx: Optional[jnp.ndarray] = None      # [N, K_in] int32
    nbr_in_mask: Optional[jnp.ndarray] = None     # [N, K_in] bool
    # original (pre-sort_nag_by_super) row of each node in the batched
    # NAG level, -1 on padding: batch-row outputs (fetched logits,
    # argmax predictions) map back to NAG order via
    # out_nag[node_id[:n]] = out_batch[:n] (the reference keeps the
    # analogous SaveNodeIndex/tta_node_id, src/transforms/sampling.py:56)
    node_id: Optional[jnp.ndarray] = None         # [N] int32

    @property
    def capacity(self):
        return self.pos.shape[0]


@struct.dataclass
class PaddedPointCloud:
    """Padded single-level point cloud for the EZ-SP partition stage
    (stage-1 training consumes voxels + adjacency edges directly,
    reference PartitionAndSemanticModule.forward,
    src/models/semantic.py:1505)."""
    pos: jnp.ndarray                      # [N, 3]
    x: jnp.ndarray                        # [N, D]
    node_mask: jnp.ndarray                # [N] bool
    batch: jnp.ndarray                    # [N] int32
    num_nodes: jnp.ndarray                # [] int32
    cnn_nbr_idx: jnp.ndarray              # [N, K^3] int32
    edge_index: jnp.ndarray               # [2, E] int32
    edge_mask: jnp.ndarray                # [E] bool
    y: Optional[jnp.ndarray] = None       # [N, C+1] histograms

    @property
    def capacity(self):
        return self.pos.shape[0]


@struct.dataclass
class PaddedNAG:
    levels: Tuple[PaddedLevel, ...]
    start_i_level: int = struct.field(pytree_node=False, default=0)
    num_graphs: int = struct.field(pytree_node=False, default=1)

    def __getitem__(self, i):
        return self.levels[i - self.start_i_level]

    @property
    def num_levels(self):
        return len(self.levels)

    @property
    def absolute_num_levels(self):
        return self.start_i_level + len(self.levels)

    @property
    def end_i_level(self):
        return self.absolute_num_levels - 1


def bucket(n, mode='pow2_fine', minimum=128):
    """Round a count up to a bucketed static capacity.

    'pow2_fine' (default) splits every power-of-two octave into 8
    steps (quantum 2^(k-3), clamped to 128 so Pallas' N % 128
    divisibility holds): worst-case padding waste drops from 2x to
    1.125x while the shape vocabulary stays small (8 buckets per
    octave). Measured on the demo x8 batch: level-0 capacity
    524288 -> 368640 (-30% of all level-0 compute+memory)."""
    n = max(int(n), minimum)
    if mode == 'pow2':
        return 1 << (n - 1).bit_length()
    if mode == 'pow2_fine':
        k = (n - 1).bit_length()
        q = max(1 << max(k - 3, 0), 128)
        return -(-n // q) * q
    if mode == 'exact':
        return n
    raise ValueError(mode)


def batch_nags(nag_list):
    """Collate a list of NAGs into one NAG with per-level index offsets
    and a `batch` graph-id vector (reference NAGBatch.from_nag_list,
    src/data/nag.py:879)."""
    if len(nag_list) == 1:
        nag = nag_list[0]
        for i in nag.levels:
            d = nag[i]
            d['batch'] = np.zeros(d.num_nodes, dtype=np.int64)
        return nag
    start = nag_list[0].start_i_level
    n_levels = nag_list[0].num_levels
    out_levels = []
    for li in range(n_levels):
        i = start + li
        datas = [nag[i] for nag in nag_list]
        merged = _collate_level(datas, i, nag_list, start)
        out_levels.append(merged)
    return NAG(out_levels, start_i_level=start)


def _collate_level(datas, i, nag_list, start):
    from .data import Data
    out = Data()
    node_offsets = np.cumsum([0] + [d.num_nodes for d in datas])
    # parent offsets for super_index
    if i < nag_list[0].end_i_level:
        parent_offsets = np.cumsum(
            [0] + [nag[i + 1].num_nodes for nag in nag_list])
    # child offsets for sub: one level down inside the NAG, or — at
    # the bottom level, where `sub` holds FULL-RESOLUTION raw point
    # ids — per-item max()+1 (the reference CSRBatch convention for
    # index values, src/data/csr.py:736-742)
    if i > start:
        child_offsets = np.cumsum(
            [0] + [nag[i - 1].num_nodes for nag in nag_list])
    else:
        child_offsets = None

    keys = set()
    for d in datas:
        keys.update(d.keys())
    for k in keys:
        vals = [d.get(k) for d in datas]
        if any(v is None for v in vals):
            continue
        if k == 'super_index':
            out[k] = np.concatenate([
                v.astype(np.int64) + parent_offsets[j]
                for j, v in enumerate(vals)])
        elif k == 'edge_index':
            out[k] = np.concatenate([
                v.astype(np.int64) + node_offsets[j]
                for j, v in enumerate(vals)], axis=1)
        elif k == 'obj_edge_index':
            out[k] = np.concatenate([
                v.astype(np.int64) + node_offsets[j]
                for j, v in enumerate(vals)], axis=1)
        elif k == 'sub':
            ptr_off = np.cumsum([0] + [v.num_items for v in vals])
            pointers = np.concatenate(
                [vals[0].pointers.astype(np.int64)] + [
                    v.pointers[1:].astype(np.int64) + ptr_off[j + 1]
                    for j, v in enumerate(vals[1:])])
            offs = child_offsets
            if offs is None:
                sizes = [int(v.points.max()) + 1 if v.points.size
                         else 0 for v in vals]
                offs = np.cumsum([0] + sizes)
            points = np.concatenate([
                v.points.astype(np.int64) + offs[j]
                for j, v in enumerate(vals)])
            out._store['sub'] = Cluster(pointers, points)
        elif isinstance(vals[0], np.ndarray):
            axis = 1 if vals[0].ndim == 2 and k == 'edge_index' else 0
            out[k] = np.concatenate(
                [np.asarray(v) for v in vals], axis=axis)
        # non-array values (CSR/Instance) handled level by level later
    out['batch'] = np.concatenate([
        np.full(d.num_nodes, j, dtype=np.int64)
        for j, d in enumerate(datas)])
    return out


def sort_nag_by_super(nag):
    """Reorder each level's nodes so `super_index` is nondecreasing
    (stable, preserves batch contiguity). Enables sorted segment ops
    for pooling and UnitSphereNorm. Top-down so parent ids are final
    before children sort against them.

    Every per-node array (including a caller-stamped `node_id`) rides
    through `Data.select`; node-id-valued side structures that select
    does NOT touch (`obj_edge_index` is copied verbatim — it is in
    data.py _NOT_INDEXABLE_DEFAULT) are remapped here explicitly, or
    the device-side edge-affinity head would gather post-sort feature
    rows with pre-sort edge endpoints."""
    for i in range(nag.end_i_level - 1, nag.start_i_level - 1, -1):
        d = nag[i]
        if 'super_index' not in d:
            continue
        perm = np.argsort(d.super_index, kind='stable')
        if np.array_equal(perm, np.arange(perm.shape[0])):
            inv = perm
        else:
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.shape[0])
            new_d, _ = d.select(perm)
            if 'obj_edge_index' in new_d:
                new_d._store['obj_edge_index'] = \
                    inv[new_d.obj_edge_index]
            nag[i] = new_d
            d = new_d
            # children point at level-i nodes: remap their super_index
            if i > nag.start_i_level and 'super_index' in nag[i - 1]:
                nag[i - 1]._store['super_index'] = \
                    inv[nag[i - 1].super_index]
        # rebuild parent's sub: children now contiguous per parent
        parent = nag[i + 1]
        counts = np.bincount(d.super_index, minlength=parent.num_nodes)
        pointers = np.zeros(parent.num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=pointers[1:])
        parent._store['sub'] = Cluster(
            pointers, np.arange(d.num_nodes, dtype=np.int64))
    return nag


def pad_nag(nag, num_classes=None, node_caps=None, k_caps=None,
            k_in_caps=None, bucket_mode='pow2', with_edges_from=1,
            device=True, with_transpose=True):
    """Convert a (batched, sorted, transform-complete) NAG into a
    PaddedNAG of static-capacity jnp arrays.

    :param num_classes: for converting int labels to histograms
    :param node_caps: dict level->capacity override (else bucketed)
    :param k_caps: dict level->K override for dense neighbors
    :param k_in_caps: dict level->K_in override for the transpose
        neighbor table (max in-degree rounded to 16 otherwise). The
        in-degree max is data-dependent, so WITHOUT a pin every batch
        can land on a different K_in and recompile the step — pin it
        (discover_caps / the e2e shared signature) wherever one
        compiled program must serve many batches.
    :param with_edges_from: lowest level whose horizontal graph is
        converted to dense neighbors (level 0 has no attention)
    :param with_transpose: build the transpose neighbor tables
        (nbr_in_idx/nbr_in_mask). They serve ONLY the training
        backward (nn/attention.py gathers over incoming slots instead
        of scatter-adding); inference batches skip the build (an
        argsort over all edges) and the transfer.
    """
    # Stamp pre-sort row ids so batch-order outputs can be mapped back
    # to the (batched) NAG's node order after the sort below. ONLY
    # level 1: it is the only level whose batch-order outputs leave
    # the device (level-1 logits/argmax; full-res recovery uses the
    # HOST NAG's level-0 maps), and node_id is a pytree leaf that
    # rides every device transfer — a level-0 stamp would ship an
    # unread [cap0] int32 with every batch.
    if 1 in nag.levels and 'node_id' not in nag[1]:
        nag[1]['node_id'] = np.arange(nag[1].num_nodes,
                                      dtype=np.int64)
    nag = sort_nag_by_super(nag)
    levels = []
    caps = {}
    for i in nag.levels:
        n = nag[i].num_nodes
        cap = (node_caps or {}).get(i) or bucket(n, bucket_mode)
        caps[i] = cap
    num_graphs = 1
    for i in nag.levels:
        d = nag[i]
        n = d.num_nodes
        cap = caps[i]
        pad = cap - n
        assert pad >= 0, f"level {i}: {n} nodes > capacity {cap}"

        def pad0(a, fill=0.0, dtype=None):
            a = np.asarray(a)
            if dtype is not None:
                a = a.astype(dtype)
            if pad == 0:
                return a
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, width, constant_values=fill)

        pos = pad0(d.pos, dtype=np.float32)
        mask = np.zeros(cap, dtype=bool)
        mask[:n] = True
        batch_vec = d.get('batch')
        if batch_vec is None:
            batch_vec = np.zeros(n, dtype=np.int64)
        num_graphs = max(num_graphs, int(batch_vec.max()) + 1 if n else 1)
        # padded nodes get a dedicated trailing graph id so graph-wise
        # norms don't mix them with real graphs
        batch_arr = np.full(cap, -1, dtype=np.int32)
        batch_arr[:n] = batch_vec.astype(np.int32)

        kw = {}
        if 'node_id' in d:
            nid = np.full(cap, -1, dtype=np.int32)
            nid[:n] = d.node_id.astype(np.int32)
            kw['node_id'] = nid
        if 'x' in d:
            kw['x'] = pad0(d.x, dtype=np.float32)
        if 'node_size' in d:
            kw['node_size'] = pad0(
                d.node_size.reshape(-1), dtype=np.float32)
        if 'super_index' in d and i < nag.end_i_level:
            parent_cap = caps[i + 1]
            si = np.full(cap, parent_cap, dtype=np.int32)
            si[:n] = d.super_index.astype(np.int32)
            kw['super_index'] = si
        if 'v_edge_attr' in d:
            kw['v_edge_attr'] = pad0(d.v_edge_attr, dtype=np.float32)
        y = d.get('y')
        if y is not None:
            y = np.asarray(y)
            if y.ndim == 1 and num_classes is not None:
                yy = np.zeros((n, num_classes + 1), dtype=np.float32)
                valid = (y >= 0) & (y <= num_classes)
                yy[np.arange(n)[valid], y[valid]] = 1.0
                y = yy
            kw['y'] = pad0(y.astype(np.float32))

        if i >= with_edges_from and 'edge_index' in d and d.num_edges > 0:
            k_cap = (k_caps or {}).get(i)
            nbr_idx, nbr_mask, edge_id = edges_to_dense_neighbors(
                d.edge_index, n, k=k_cap)
            K = nbr_idx.shape[1]
            full_idx = np.zeros((cap, K), dtype=np.int32)
            full_idx[:n] = nbr_idx
            full_mask = np.zeros((cap, K), dtype=bool)
            full_mask[:n] = nbr_mask
            kw['nbr_idx'] = full_idx
            kw['nbr_mask'] = full_mask
            # transpose table: for each node m, the flattened [N*K]
            # slots (n, k) with nbr_idx[n, k] == m. The backward of
            # the attention k/v gather then becomes a GATHER over
            # incoming slots instead of a TPU scatter-add (serial on
            # TPU — the same pathology the one-hot segment reduce
            # fixes for norms); see nn/attention.py gather_nodes.
            if with_transpose:
                tgt = full_idx[full_mask]
                slots = np.flatnonzero(full_mask.reshape(-1)).astype(
                    np.int64)
                order = np.argsort(tgt, kind='stable')
                tgt_s, slots_s = tgt[order], slots[order]
                deg_in = np.bincount(tgt_s, minlength=cap)
                k_in = int(max(
                    _round_up(int(deg_in.max(initial=0)), 16),
                    16, (k_in_caps or {}).get(i, 0)))
                in_idx = np.zeros((cap, k_in), dtype=np.int32)
                in_mask = np.zeros((cap, k_in), dtype=bool)
                starts = np.zeros(cap + 1, dtype=np.int64)
                np.cumsum(deg_in, out=starts[1:])
                rank = np.arange(slots_s.shape[0]) - starts[tgt_s]
                in_idx[tgt_s, rank] = slots_s
                in_mask[tgt_s, rank] = True
                kw['nbr_in_idx'] = in_idx
                kw['nbr_in_mask'] = in_mask
            ea = d.get('edge_attr')
            if ea is not None:
                # invalid slots keep whatever edge 0 carries — finite
                # garbage is fine: attention masks compat AND attn by
                # nbr_mask before any edge_feat contribution survives,
                # and the [N,K,De] mask multiply costs real host time
                ef = np.zeros((cap, K, ea.shape[1]), dtype=np.float32)
                ef[:n] = ea.astype(np.float32, copy=False)[edge_id]
                kw['edge_feat'] = ef

        if 'coords' in d:
            from ..ops.voxel_conv import build_sparse_conv_neighbors
            nbr = build_sparse_conv_neighbors(
                d.coords, batch=batch_vec)
            full = np.full((cap, nbr.shape[1]), -1, dtype=np.int32)
            full[:n] = nbr
            kw['cnn_nbr_idx'] = full

        if 'obj_edge_index' in d:
            oe = d.obj_edge_index
            e_cap = bucket(oe.shape[1], bucket_mode)
            oei = np.zeros((2, e_cap), dtype=np.int32)
            oei[:, :oe.shape[1]] = oe.astype(np.int32)
            oem = np.zeros(e_cap, dtype=bool)
            oem[:oe.shape[1]] = True
            kw['obj_edge_index'] = oei
            kw['obj_edge_mask'] = oem
            aff = d.get('obj_edge_affinity')
            if aff is not None:
                oea = np.zeros(e_cap, dtype=np.float32)
                oea[:aff.shape[0]] = aff.astype(np.float32)
                kw['obj_edge_affinity'] = oea

        levels.append(PaddedLevel(
            pos=pos,
            node_mask=mask,
            batch=batch_arr,
            num_nodes=np.int32(n),
            **kw))

    out = PaddedNAG(levels=tuple(levels),
                    start_i_level=nag.start_i_level,
                    num_graphs=num_graphs)
    if not device:
        # numpy leaves: for worker processes that prepare batches off
        # the main process — the consumer calls jax.device_put once
        return out
    # ONE batched transfer for the whole pytree (a per-leaf
    # jnp.asarray costs a dispatch per array — 40+ round-trips)
    import jax
    return jax.device_put(out)


def pad_point_cloud(data_list, num_classes=None, node_cap=None,
                    edge_cap=None, kernel_size=3, dilation=1,
                    bucket_mode='pow2'):
    """Collate + pad level-0 `Data` objects (pos, x, coords,
    edge_index, y) into a PaddedPointCloud for the EZ-SP partition
    stage. The sparse-conv rulebook is built here, once per batch."""
    from .data import Data
    from ..ops.voxel_conv import build_sparse_conv_neighbors

    node_off = np.cumsum([0] + [d.num_nodes for d in data_list])
    n = int(node_off[-1])
    pos = np.concatenate([np.asarray(d.pos) for d in data_list])
    x = np.concatenate(
        [np.asarray(d.x, np.float32) for d in data_list])
    batch_vec = np.concatenate([
        np.full(d.num_nodes, j, dtype=np.int64)
        for j, d in enumerate(data_list)])
    ei = np.concatenate([
        np.asarray(d.edge_index, np.int64) + node_off[j]
        for j, d in enumerate(data_list)], axis=1)
    coords = np.concatenate(
        [np.asarray(d.coords, np.int64) for d in data_list])
    nbr = build_sparse_conv_neighbors(
        coords, kernel_size=kernel_size, dilation=dilation,
        batch=batch_vec)

    cap = node_cap or bucket(n, bucket_mode)
    e_cap = edge_cap or bucket(ei.shape[1], bucket_mode)
    pad = cap - n
    assert pad >= 0 and e_cap >= ei.shape[1]

    def padn(a, fill=0.0):
        if pad == 0:
            return a
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    mask = np.zeros(cap, bool)
    mask[:n] = True
    batch_arr = np.full(cap, -1, np.int32)
    batch_arr[:n] = batch_vec
    nbr_full = np.full((cap, nbr.shape[1]), -1, np.int32)
    nbr_full[:n] = nbr
    eif = np.zeros((2, e_cap), np.int32)
    eif[:, :ei.shape[1]] = ei
    em = np.zeros(e_cap, bool)
    em[:ei.shape[1]] = True

    y = None
    ys = [d.get('y') for d in data_list]
    if all(v is not None for v in ys):
        ys = [np.asarray(v) for v in ys]
        if ys[0].ndim == 1:
            assert num_classes is not None
            hs = []
            for v in ys:
                h = np.zeros((v.shape[0], num_classes + 1), np.float32)
                valid = (v >= 0) & (v <= num_classes)
                h[np.arange(v.shape[0])[valid], v[valid]] = 1.0
                hs.append(h)
            y = np.concatenate(hs)
        else:
            y = np.concatenate(ys).astype(np.float32)
        y = padn(y)

    return PaddedPointCloud(
        pos=jnp.asarray(padn(pos.astype(np.float32))),
        x=jnp.asarray(padn(x)),
        node_mask=jnp.asarray(mask),
        batch=jnp.asarray(batch_arr),
        num_nodes=jnp.asarray(n, jnp.int32),
        cnn_nbr_idx=jnp.asarray(nbr_full),
        edge_index=jnp.asarray(eif),
        edge_mask=jnp.asarray(em),
        y=None if y is None else jnp.asarray(y))
