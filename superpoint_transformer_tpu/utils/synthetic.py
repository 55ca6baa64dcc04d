"""Synthetic NAG generators for tests, dryruns and benchmarks
(reference analogue: generate_random_segment_data,
src/utils/instance.py:295 and the Mini* datasets)."""
import numpy as np

from ..data.data import Data
from ..data.nag import NAG
from ..data.csr import Cluster

__all__ = ['random_nag']


def random_nag(seed=0, n_points=512, n_l1=64, n_l2=16, num_classes=13,
               k_edges=6, with_features=True, with_instances=False):
    """A small, structurally-valid 3-level NAG with the S3DIS feature
    layout (8 point features, 7-dim stored edge features, histogram
    labels)."""
    rng = np.random.default_rng(seed)
    sup0 = rng.integers(0, n_l1, n_points)
    sup0[:n_l1] = np.arange(n_l1)
    sup1 = rng.integers(0, n_l2, n_l1)
    sup1[:n_l2] = np.arange(n_l2)

    pos0 = rng.normal(size=(n_points, 3)).astype(np.float32) * 5

    def seg_pos(pos, sup, n):
        out = np.zeros((n, 3), dtype=np.float32)
        cnt = np.bincount(sup, minlength=n)[:, None].astype(np.float32)
        np.add.at(out, sup, pos)
        return out / np.maximum(cnt, 1)

    pos1 = seg_pos(pos0, sup0, n_l1)
    pos2 = seg_pos(pos1, sup1, n_l2)

    def edges(n, k):
        s = np.repeat(np.arange(n), k)
        t = rng.integers(0, n, n * k)
        keep = s < t
        return np.stack([s[keep], t[keep]])

    def hist(n, counts):
        h = np.zeros((n, num_classes + 1), dtype=np.int64)
        labels = rng.integers(0, num_classes, n)
        h[np.arange(n), labels] = counts
        return h

    d0 = Data(pos=pos0, super_index=sup0,
              y=rng.integers(0, num_classes, n_points))
    if with_features:
        for k in ('linearity', 'planarity', 'scattering', 'verticality',
                  'elevation'):
            d0[k] = rng.random((n_points, 1)).astype(np.float32)
        d0['rgb'] = rng.random((n_points, 3)).astype(np.float32)

    ei1 = edges(n_l1, k_edges)
    ei2 = edges(n_l2, max(2, k_edges // 2))
    d1 = Data(pos=pos1, super_index=sup1,
              sub=Cluster(sup0, np.arange(n_points), dense=True),
              edge_index=ei1,
              edge_attr=rng.normal(size=(ei1.shape[1], 7)).astype(
                  np.float32),
              y=hist(n_l1, rng.integers(1, 50, n_l1)),
              normal=_unit(rng, n_l1),
              log_length=rng.random((n_l1, 1)).astype(np.float32),
              log_surface=rng.random((n_l1, 1)).astype(np.float32),
              log_volume=rng.random((n_l1, 1)).astype(np.float32),
              log_size=rng.random((n_l1, 1)).astype(np.float32))
    if with_instances:
        from ..data.csr import InstanceData
        # each level-1 segment overlaps its own dominant gt object
        # (id = segment // 2, so pairs of segments share an object)
        obj_of_seg = np.arange(n_l1) // 2
        y_of_obj = rng.integers(0, num_classes, obj_of_seg.max() + 1)
        ptr = np.arange(n_l1 + 1, dtype=np.int64)
        d1['obj'] = InstanceData(
            ptr, obj_of_seg,
            np.bincount(sup0, minlength=n_l1).astype(np.int64),
            y_of_obj[obj_of_seg])
    d2 = Data(pos=pos2,
              sub=Cluster(sup1, np.arange(n_l1), dense=True),
              edge_index=ei2,
              edge_attr=rng.normal(size=(ei2.shape[1], 7)).astype(
                  np.float32),
              y=hist(n_l2, rng.integers(1, 200, n_l2)),
              normal=_unit(rng, n_l2),
              log_length=rng.random((n_l2, 1)).astype(np.float32),
              log_surface=rng.random((n_l2, 1)).astype(np.float32),
              log_volume=rng.random((n_l2, 1)).astype(np.float32),
              log_size=rng.random((n_l2, 1)).astype(np.float32))
    return NAG([d0, d1, d2])


def _unit(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)
