"""Solver-parity hardening (VERDICT r2 item 6): the demo-room energy
and oracle goldens swept over reg x cutoff, a second geometry
(synthetic aerial tile with long planar structure), and unit tests for
the split move added to the refinement loop (native/greedy_cut.cpp
phase 3; reference objective: cp_d0_dist,
/root/reference/src/transforms/partition.py:199-227)."""
import os.path as osp

import numpy as np
import pytest

DEMO = '/root/reference/notebooks/demo_nag_v3.h5'

REGS = (0.005, 0.01, 0.04, 0.1)
CUTOFFS = (5, 10, 25)


@pytest.fixture(scope='module')
def demo_inputs():
    """The exact partition_hf inputs the reference fed cp_d0_dist on
    the demo room (same recipe as tests/test_golden.py
    demo_repartition), plus the reference's stored level-1 partition."""
    if not osp.exists(DEMO):
        pytest.skip('reference demo NAG not available')
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.data.data import Data
    from superpoint_transformer_tpu.transforms.preprocess import (
        knn_search, adjacency_graph, connect_isolated, add_keys_to)
    from superpoint_transformer_tpu.ops.graph import to_trimmed_np

    demo = NAG.load(DEMO, non_fp_to_long=True, rgb_to_float=True)
    d0 = demo[0]
    data = Data(pos=np.asarray(d0.pos), rgb=np.asarray(d0.rgb),
                linearity=np.asarray(d0.linearity),
                planarity=np.asarray(d0.planarity),
                scattering=np.asarray(d0.scattering),
                verticality=np.asarray(d0.verticality),
                elevation=np.asarray(d0.elevation),
                y=np.asarray(d0.y))
    data = knn_search(data, k=10, r_max=2.0)
    data = adjacency_graph(data, k=10, w=1.0)
    data = connect_isolated(data, k=1)
    data = add_keys_to(data, ['rgb', 'linearity', 'planarity',
                              'scattering', 'verticality', 'elevation'])
    sw = 0.1
    f = np.concatenate([(data.pos - data.pos.mean(0)) * sw, data.x],
                       1).astype(np.float32)
    ei, ea = to_trimmed_np(data.edge_index.astype(np.int64),
                           data.edge_attr.reshape(-1, 1),
                           reduce='mean')
    ew = ea.reshape(-1)
    nw = np.ones(f.shape[0], dtype=np.float32)
    return dict(f=f, ei=ei, ew=ew, nw=nw,
                ref_sup=np.asarray(demo[0].super_index),
                y=np.asarray(d0.y))


@pytest.fixture(scope='module')
def demo_sweep(demo_inputs):
    """One solver run per (reg, cutoff) cell, shared by the energy and
    oracle assertions."""
    from superpoint_transformer_tpu.ops.native import greedy_cut
    d = demo_inputs
    out = {}
    for reg in REGS:
        for cutoff in CUTOFFS:
            out[(reg, cutoff)] = greedy_cut(
                d['f'], d['ei'], edge_weight=d['ew'],
                node_weight=d['nw'], reg=reg, cutoff=cutoff)
    return out


def _oracle_miou(sup, y_point_hist, num_classes=13):
    from superpoint_transformer_tpu.metrics.oracle import (
        semantic_segmentation_oracle)
    n = int(sup.max()) + 1
    hist = np.stack([np.bincount(sup, weights=y_point_hist[:, j],
                                 minlength=n)
                     for j in range(y_point_hist.shape[1])], 1)
    o = semantic_segmentation_oracle(
        hist[:, :num_classes].astype(np.int64), num_classes)
    return float(o['miou'])


def test_demo_sweep_energy_dominance(demo_inputs, demo_sweep):
    """At every (reg, cutoff) cell, our solver's d0 energy must not
    exceed the reference's stored level-1 partition's energy at the
    same reg (equal features, equal graph).

    cutoff <= 10 cells: strict dominance — the reference partition was
    built at min_comp_weight 10 so it satisfies our constraint too.
    cutoff = 25 cells: the reference partition VIOLATES the constraint
    (705 of its 1192 components weigh < 25), which hands it fidelity
    our solver is barred from; tolerance 1.5% (measured r3: the split
    move wins 3 of the 4 cells outright anyway, worst cell +0.3%).
    The equal-constraint comparison is pinned separately below."""
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    d = demo_inputs
    for reg in REGS:
        e_ref, _, _ = d0_partition_energy(
            d['f'], d['ei'], d['ew'], d['nw'], d['ref_sup'], reg)
        for cutoff in CUTOFFS:
            sup, _ = demo_sweep[(reg, cutoff)]
            e, _, _ = d0_partition_energy(
                d['f'], d['ei'], d['ew'], d['nw'], sup, reg)
            tol = 1.0 if cutoff <= 10 else 1.015
            assert e <= e_ref * tol, (reg, cutoff, e, e_ref)


def test_demo_sweep_oracle_floor(demo_inputs, demo_sweep):
    """Per-cell partition-oracle mIoU floors vs the reference stored
    partition's 95.46. Cells at comparable-or-finer granularity
    (cutoff <= 10, reg <= 0.04: 781..2868 segments vs reference 1192)
    must stay within 2 pts; coarser cells (reg=0.1 or cutoff=25, down
    to 262 segments — 4.5x fewer) within 3 pts (measured r3:
    93.6-96.8)."""
    d = demo_inputs
    ref_miou = _oracle_miou(d['ref_sup'], d['y'])
    for (reg, cutoff), (sup, _) in demo_sweep.items():
        got = _oracle_miou(sup, d['y'])
        slack = 2.0 if (cutoff <= 10 and reg <= 0.04) else 3.0
        assert got >= ref_miou - slack, (reg, cutoff, got, ref_miou)


def _enforce_cutoff(sup, cutoff, reg, f, ei, ew, nw):
    """Force-merge undersized components of an EXTERNAL partition into
    their best-gain neighbor (batched passes) until the min-weight
    constraint holds — the honest equal-constraint competitor for
    cutoff values stricter than the partition was built with."""
    sup = sup.copy()
    f64 = f.astype(np.float64)
    for _ in range(64):
        n = int(sup.max()) + 1
        S = np.bincount(sup, weights=nw, minlength=n)
        if not (S < cutoff).any():
            break
        mu = np.stack([np.bincount(sup, weights=f64[:, j] * nw,
                                   minlength=n)
                       for j in range(f.shape[1])], 1)
        mu /= np.maximum(S, 1e-12)[:, None]
        cs, ct = sup[ei[0]], sup[ei[1]]
        cross = cs != ct
        a, b = cs[cross], ct[cross]
        w = ew[cross]
        # accumulate cut weight per directed component pair
        pair = np.concatenate([a * n + b, b * n + a])
        ww = np.concatenate([w, w])
        uniq, inv = np.unique(pair, return_inverse=True)
        W = np.bincount(inv, weights=ww)
        pa, pb = uniq // n, uniq % n
        d2 = ((mu[pa] - mu[pb]) ** 2).sum(1)
        gain = reg * W - S[pa] * S[pb] / (S[pa] + S[pb]) * d2
        # per undersized component: best-gain neighbor
        target = np.arange(n)
        order = np.argsort(gain)  # ascending: last write wins = max
        for i in order:
            if S[pa[i]] < cutoff:
                target[pa[i]] = pb[i]
        # union-find absorbs merge chains AND 2-cycles (a<->b)
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for c in range(n):
            if target[c] != c:
                ra, rb = find(c), find(target[c])
                if ra != rb:
                    parent[rb] = ra
        sup = np.array([find(c) for c in sup])
        _, sup = np.unique(sup, return_inverse=True)
    return sup


def test_demo_cutoff25_equal_constraint_dominance(demo_inputs):
    """The one sweep cell the raw reference 'wins' (reg=0.005,
    cutoff=25) only wins by constraint violation. At EQUAL constraint
    — the reference partition force-merged to the same min weight —
    our solver dominates by a wide margin (measured r3: ~1333 vs
    ~1810)."""
    from superpoint_transformer_tpu.ops.native import greedy_cut
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    d = demo_inputs
    reg, cutoff = 0.005, 25
    ref_c = _enforce_cutoff(d['ref_sup'], cutoff, reg, d['f'], d['ei'],
                            d['ew'], d['nw'])
    S = np.bincount(ref_c, weights=d['nw'])
    # edgeless islands of the adjacency graph can never merge; every
    # other component must satisfy the constraint
    cross = ref_c[d['ei'][0]] != ref_c[d['ei'][1]]
    has_edge = np.zeros(S.shape[0], bool)
    has_edge[ref_c[d['ei'][0]][cross]] = True
    has_edge[ref_c[d['ei'][1]][cross]] = True
    assert (S[has_edge] >= cutoff).all()
    e_refc, _, _ = d0_partition_energy(
        d['f'], d['ei'], d['ew'], d['nw'], ref_c, reg)
    sup, _ = greedy_cut(d['f'], d['ei'], edge_weight=d['ew'],
                        node_weight=d['nw'], reg=reg, cutoff=cutoff)
    e, _, _ = d0_partition_energy(
        d['f'], d['ei'], d['ew'], d['nw'], sup, reg)
    assert e <= e_refc * 0.9, (e, e_refc)


# ---------------------------------------------------------------------
# Second geometry: synthetic aerial tile (long planar structure)
# ---------------------------------------------------------------------

@pytest.fixture(scope='module')
def aerial_inputs():
    """DALES-like tile through the real feature pipeline, plus the
    planted piecewise-planar partition as energy competitor."""
    from superpoint_transformer_tpu.utils.synthetic import (
        synthetic_aerial_cloud)
    from superpoint_transformer_tpu.transforms.preprocess import (
        knn_search, point_features, ground_elevation, adjacency_graph,
        connect_isolated, add_keys_to)
    from superpoint_transformer_tpu.ops.graph import to_trimmed_np

    data, planted = synthetic_aerial_cloud(seed=0, n_points=60_000)
    data = knn_search(data, k=10, r_max=2.0)
    data = point_features(data, keys=('linearity', 'planarity',
                                      'scattering', 'verticality'))
    data = ground_elevation(data, z_threshold=1.5, scale=4.0,
                            rng=np.random.default_rng(0))
    data = adjacency_graph(data, k=10, w=1.0)
    data = connect_isolated(data, k=1)
    data = add_keys_to(data, ['rgb', 'linearity', 'planarity',
                              'scattering', 'verticality',
                              'elevation'])
    sw = 0.1
    f = np.concatenate([(data.pos - data.pos.mean(0)) * sw, data.x],
                       1).astype(np.float32)
    ei, ea = to_trimmed_np(data.edge_index.astype(np.int64),
                           data.edge_attr.reshape(-1, 1),
                           reduce='mean')
    y = np.asarray(data.y).reshape(-1)
    y_hist = np.zeros((y.shape[0], 14), dtype=np.int64)
    y_hist[np.arange(y.shape[0]), y] = 1
    return dict(f=f, ei=ei, ew=ea.reshape(-1),
                nw=np.ones(f.shape[0], dtype=np.float32),
                planted=planted, y=y_hist)


def test_aerial_energy_and_oracle(aerial_inputs):
    """On the aerial geometry, per (reg, cutoff) cell: (a) solver
    energy <= the planted piecewise-planar partition's energy, (b)
    partition-oracle mIoU >= 97 (measured r3: 98.9-99.7 — long walls,
    roofs and power-line spans stay label-pure)."""
    from superpoint_transformer_tpu.ops.native import greedy_cut
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    d = aerial_inputs
    for reg in (0.01, 0.05, 0.2):
        e_pl, _, _ = d0_partition_energy(
            d['f'], d['ei'], d['ew'], d['nw'], d['planted'], reg)
        for cutoff in (10, 25):
            sup, _ = greedy_cut(d['f'], d['ei'], edge_weight=d['ew'],
                                node_weight=d['nw'], reg=reg,
                                cutoff=cutoff)
            e, _, _ = d0_partition_energy(
                d['f'], d['ei'], d['ew'], d['nw'], sup, reg)
            assert e <= e_pl, (reg, cutoff, e, e_pl)
            miou = _oracle_miou(sup, d['y'])
            assert miou >= 97.0, (reg, cutoff, miou)


def test_aerial_refinement_improves(aerial_inputs):
    """Refinement (split + reassign) strictly lowers the energy vs the
    merge-only solver on the planar-structure geometry."""
    from superpoint_transformer_tpu.ops.native import greedy_cut
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    d = aerial_inputs
    reg, cutoff = 0.05, 10
    es = {}
    for sweeps in (0, 8):
        sup, _ = greedy_cut(d['f'], d['ei'], edge_weight=d['ew'],
                            node_weight=d['nw'], reg=reg,
                            cutoff=cutoff, refine_sweeps=sweeps)
        es[sweeps], _, _ = d0_partition_energy(
            d['f'], d['ei'], d['ew'], d['nw'], sup, reg)
    assert es[8] < es[0], es


# ---------------------------------------------------------------------
# Split move unit tests
# ---------------------------------------------------------------------

def test_split_move_separates_fused_blobs():
    """Two well-separated feature blobs adversarially fused into ONE
    component: boundary reassignment alone is a no-op (there is no
    neighboring component to move vertices to); only the split move
    can cut them apart."""
    from superpoint_transformer_tpu.ops.native import _refine_py
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    rng = np.random.default_rng(0)
    n = 80
    f = np.concatenate([rng.normal(0, .05, (40, 2)),
                        rng.normal(3, .05, (40, 2))]).astype(
        np.float32)
    src = np.arange(n - 1, dtype=np.int32)
    dst = (src + 1).astype(np.int32)
    ew = np.ones(n - 1, np.float32)
    nw = np.ones(n, np.float32)
    comp = np.zeros(n, np.int64)
    si, nc = _refine_py(f, src, dst, ew, nw, reg=0.5, cutoff=5,
                        comp=comp.copy(), n_comp=1, sweeps=8)
    ei = np.stack([src, dst])
    e0, _, _ = d0_partition_energy(f, ei, ew, nw, comp, 0.5)
    e1, _, _ = d0_partition_energy(f, ei, ew, nw, si, 0.5)
    assert nc >= 2
    assert e1 < e0 * 0.2, (e0, e1)
    # the two blobs end up in different components
    assert si[:40].max() != si[40:].min() or \
        len(np.unique(si[:40])) != len(np.unique(si))


def test_split_move_native_ramp():
    """Feature ramp: greedy pairwise merging under-segments (each
    adjacent merge looks cheap) and the split move claws energy back
    (native path; measured r3: 17.6 -> 16.3 at reg=2)."""
    from superpoint_transformer_tpu.ops.native import (
        greedy_cut, native_available)
    from superpoint_transformer_tpu.transforms.preprocess import (
        d0_partition_energy)
    if not native_available():
        pytest.skip('native library not built')
    n = 100
    f = (np.arange(n, dtype=np.float32) * 0.05).reshape(-1, 1)
    src = np.arange(n - 1, dtype=np.int64)
    ei = np.stack([src, src + 1])
    ew = np.ones(n - 1, np.float32)
    nw = np.ones(n, np.float32)
    es = {}
    for sweeps in (0, 8):
        sup, _ = greedy_cut(f, ei, edge_weight=ew, node_weight=nw,
                            reg=2.0, cutoff=4, refine_sweeps=sweeps)
        es[sweeps], _, _ = d0_partition_energy(
            f, ei, ew, nw, sup, 2.0)
    assert es[8] <= es[0] - 0.5, es


def test_split_respects_cutoff():
    """Accepted splits never create components below the min weight."""
    from superpoint_transformer_tpu.ops.native import greedy_cut
    rng = np.random.default_rng(3)
    n = 400
    f = rng.random((n, 4)).astype(np.float32) * 2
    from scipy.spatial import cKDTree
    pos = rng.random((n, 3)).astype(np.float32) * 3
    _, nbr = cKDTree(pos).query(pos, k=6)
    src = np.repeat(np.arange(n), 5)
    dst = nbr[:, 1:].reshape(-1)
    keep = src < dst
    ei = np.stack([src[keep], dst[keep]])
    ew = np.ones(ei.shape[1], np.float32)
    nw = np.ones(n, np.float32)
    for cutoff in (5, 15):
        sup, nc = greedy_cut(f, ei, edge_weight=ew, node_weight=nw,
                             reg=0.3, cutoff=cutoff)
        sizes = np.bincount(sup, minlength=nc)
        assert sizes.min() >= cutoff, (cutoff, sizes.min())
