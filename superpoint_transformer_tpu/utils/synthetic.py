"""Synthetic NAG generators for tests, dryruns and benchmarks
(reference analogue: generate_random_segment_data,
src/utils/instance.py:295 and the Mini* datasets)."""
import numpy as np

from ..data.data import Data
from ..data.nag import NAG
from ..data.csr import Cluster

__all__ = ['random_nag', 'synthetic_room_cloud', 'synthetic_aerial_cloud']


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


def synthetic_room_cloud(seed=0, n_points=250_000, extent=(10.0, 8.0, 3.0),
                         n_boxes=12, noise=0.005, num_classes=13):
    """Raw indoor-scan-like point cloud: floor + ceiling + 4 walls +
    axis-aligned furniture boxes, surface-sampled with sensor noise.
    Unlike uniform blobs (the partition's worst case), this matches the
    piecewise-planar statistics real S3DIS rooms feed the partition and
    graph stages — use it for preprocessing benchmarks."""
    from ..data.data import Data

    rng = np.random.default_rng(seed)
    ex, ey, ez = extent

    def plane(n, origin, u, v, label):
        a = rng.random(n).astype(np.float32)[:, None]
        b = rng.random(n).astype(np.float32)[:, None]
        p = (np.asarray(origin, np.float32)[None]
             + a * np.asarray(u, np.float32)[None]
             + b * np.asarray(v, np.float32)[None])
        return p, np.full(n, label, dtype=np.int64)

    # room shell: ~55% of the points (floor/ceiling/4 walls)
    shell_area = 2 * ex * ey + 2 * ex * ez + 2 * ey * ez
    parts = []
    n_shell = int(n_points * 0.55)
    specs = [((0, 0, 0), (ex, 0, 0), (0, ey, 0), 0),        # floor
             ((0, 0, ez), (ex, 0, 0), (0, ey, 0), 1),       # ceiling
             ((0, 0, 0), (ex, 0, 0), (0, 0, ez), 2),        # walls
             ((0, ey, 0), (ex, 0, 0), (0, 0, ez), 2),
             ((0, 0, 0), (0, ey, 0), (0, 0, ez), 2),
             ((ex, 0, 0), (0, ey, 0), (0, 0, ez), 2)]
    areas = np.array([np.linalg.norm(np.cross(u, v))
                      for _, u, v, _ in specs])
    for (o, u, v, lab), w in zip(specs, areas / areas.sum()):
        parts.append(plane(max(int(n_shell * w), 1), o, u, v, lab))

    # furniture boxes: remaining points over 5 faces each (no bottom)
    n_box = (n_points - sum(p.shape[0] for p, _ in parts)) // max(
        n_boxes, 1)
    for i in range(n_boxes):
        cx, cy = rng.random(2) * [ex - 2, ey - 2] + 1
        sx, sy, sz = rng.random(3) * [1.5, 1.5, 1.2] + 0.2
        lab = 3 + (i % (num_classes - 3))
        faces = [((cx, cy, sz), (sx, 0, 0), (0, sy, 0)),     # top
                 ((cx, cy, 0), (sx, 0, 0), (0, 0, sz)),
                 ((cx, cy + sy, 0), (sx, 0, 0), (0, 0, sz)),
                 ((cx, cy, 0), (0, sy, 0), (0, 0, sz)),
                 ((cx + sx, cy, 0), (0, sy, 0), (0, 0, sz))]
        fa = np.array([np.linalg.norm(np.cross(u, v))
                       for _, u, v in faces])
        for (o, u, v), w in zip(faces, fa / fa.sum()):
            parts.append(plane(max(int(n_box * w), 1), o, u, v, lab))

    pos = np.concatenate([p for p, _ in parts])
    y = np.concatenate([l for _, l in parts])
    pos += rng.normal(0, noise, pos.shape).astype(np.float32)
    # color correlated with label (piecewise-constant + noise)
    base = rng.random((num_classes, 3)).astype(np.float32)
    rgb = np.clip(base[y] + rng.normal(0, 0.05, pos.shape), 0, 1
                  ).astype(np.float32)
    perm = rng.permutation(pos.shape[0])
    return Data(pos=pos[perm].astype(np.float32), rgb=rgb[perm],
                y=y[perm])


def synthetic_aerial_cloud(seed=0, n_points=120_000,
                           extent=(60.0, 40.0), n_buildings=5,
                           noise=0.02, num_classes=13):
    """Outdoor/aerial-survey-like tile: undulating ground, buildings
    with LONG planar walls and flat roofs, linear power-line spans and
    scattered vegetation blobs — the DALES-like statistics (large
    planar surfaces with high aspect ratio) that stress a merge-only
    partition solver very differently from indoor rooms.

    Returns (Data(pos, rgb, y), planted) where `planted` assigns each
    point the id of its generating primitive (one id per planar face /
    line / blob): the planted piecewise-planar partition used as the
    energy competitor in the solver-parity goldens
    (tests/test_solver_parity.py)."""
    rng = np.random.default_rng(seed)
    ex, ey = extent
    parts = []  # (pos, label)

    def add(p, label):
        parts.append((p.astype(np.float32),
                      np.full(p.shape[0], label, dtype=np.int64)))

    def ground_z(xy):
        return (0.4 * np.sin(xy[:, 0] * 0.15)
                + 0.3 * np.cos(xy[:, 1] * 0.21)
                + 0.01 * xy[:, 0]).astype(np.float32)

    # ground: ~50% of points over the full tile (label 0)
    n_ground = int(n_points * 0.5)
    xy = rng.random((n_ground, 2)).astype(np.float32) * [ex, ey]
    add(np.column_stack([xy, ground_z(xy)]), 0)

    # buildings: long walls (aspect ratio >= 5) + flat roof (label 2)
    n_bld = int(n_points * 0.35) // max(n_buildings, 1)
    for i in range(n_buildings):
        cx = rng.random() * (ex - 20) + 4
        cy = rng.random() * (ey - 12) + 3
        L = rng.random() * 10 + 8          # long side
        W = rng.random() * 4 + 3
        H = rng.random() * 5 + 4
        z0 = float(ground_z(np.array([[cx, cy]]))[0])
        faces = [((cx, cy, z0 + H), (L, 0, 0), (0, W, 0)),   # roof
                 ((cx, cy, z0), (L, 0, 0), (0, 0, H)),       # walls
                 ((cx, cy + W, z0), (L, 0, 0), (0, 0, H)),
                 ((cx, cy, z0), (0, W, 0), (0, 0, H)),
                 ((cx + L, cy, z0), (0, W, 0), (0, 0, H))]
        areas = np.array([np.linalg.norm(np.cross(u, v))
                          for _, u, v in faces])
        for (o, u, v), w in zip(faces, areas / areas.sum()):
            m = max(int(n_bld * w), 8)
            a = rng.random(m).astype(np.float32)[:, None]
            b = rng.random(m).astype(np.float32)[:, None]
            p = (np.asarray(o, np.float32)[None]
                 + a * np.asarray(u, np.float32)[None]
                 + b * np.asarray(v, np.float32)[None])
            add(p, 2)

    # power lines: long thin catenary-like spans (label 3)
    n_line = int(n_points * 0.05) // 3
    for i in range(3):
        x0, y0 = rng.random(2) * [ex * 0.2, ey]
        x1, y1 = ex * 0.8 + rng.random() * ex * 0.2, rng.random() * ey
        t = rng.random(max(n_line, 16)).astype(np.float32)
        sag = 1.5 * (t - 0.5) ** 2 * 4 - 1.5
        p = np.column_stack([x0 + t * (x1 - x0), y0 + t * (y1 - y0),
                             9.0 + sag + i * 0.4])
        add(p, 3)

    # vegetation: scattered ellipsoidal blobs (label 1)
    n_veg_total = n_points - sum(p.shape[0] for p, _ in parts)
    n_blobs = 8
    for i in range(n_blobs):
        m = max(n_veg_total // n_blobs, 16)
        c = rng.random(2) * [ex, ey]
        z0 = float(ground_z(c[None])[0])
        r = rng.random(3) * [1.5, 1.5, 2.0] + [0.8, 0.8, 1.0]
        p = rng.normal(size=(m, 3)).astype(np.float32) * r * 0.5 \
            + [c[0], c[1], z0 + r[2] + 0.5]
        add(p, 1)

    pos = np.concatenate([p for p, _ in parts])
    y = np.concatenate([l for _, l in parts])
    planted = np.concatenate([
        np.full(p.shape[0], i, dtype=np.int64)
        for i, (p, _) in enumerate(parts)])
    pos += rng.normal(0, noise, pos.shape).astype(np.float32)
    base = rng.random((num_classes, 3)).astype(np.float32)
    rgb = np.clip(base[y] + rng.normal(0, 0.05, pos.shape), 0, 1
                  ).astype(np.float32)
    perm = rng.permutation(pos.shape[0])
    return (Data(pos=pos[perm].astype(np.float32), rgb=rgb[perm],
                 y=y[perm]), planted[perm])
