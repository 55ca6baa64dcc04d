"""Unit tests for the reference-grade superedge machinery
(ops/subedges.py): basis construction, anchor nearest-neighbor
search, candidate graph, subedge filters, and edge features."""
import numpy as np
import pytest

from superpoint_transformer_tpu.ops.subedges import (
    base_vectors_3d_np, scatter_nearest_neighbor_np,
    cluster_radius_nn_graph_np, subedges_np,
    minimalistic_edge_features_np, _segment_csr, _edge_wise_points,
    _idx_preserving_mask)


def test_base_vectors_orthonormal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 3))
    x[0] = 0  # zero-vector fallback
    x[1] = [2, 2, 2]  # (v, v, v) fallback for the second axis
    B = base_vectors_3d_np(x)
    eye = np.einsum('nbd,ncd->nbc', B, B)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3),
                                                    eye.shape),
                               atol=1e-10)
    # first axis is along x (for nonzero x)
    xn = x[2:] / np.linalg.norm(x[2:], axis=1, keepdims=True)
    np.testing.assert_allclose(B[2:, 0], xn, atol=1e-12)
    # right-handed: third = first x second
    np.testing.assert_allclose(np.cross(B[:, 0], B[:, 1]), B[:, 2],
                               atol=1e-10)


def test_edge_wise_points_expansion():
    index = np.array([0, 0, 1, 1, 1, 2])
    order, ptr = _segment_csr(index, 3)
    idx, uid, out_ptr = _edge_wise_points(
        order, ptr, np.array([1, 0, 2]))
    # edge 0 expands segment 1 (points 2,3,4), edge 1 segment 0 (0,1),
    # edge 2 segment 2 (5)
    np.testing.assert_array_equal(idx, [2, 3, 4, 0, 1, 5])
    np.testing.assert_array_equal(uid, [0, 0, 0, 1, 1, 2])
    np.testing.assert_array_equal(out_ptr, [0, 3, 5, 6])


def test_scatter_nearest_neighbor_exact_on_two_clusters():
    """Two well-separated clusters: the iterative anchor search must
    find the true closest pair."""
    rng = np.random.default_rng(1)
    a = rng.random((50, 3))
    b = rng.random((60, 3)) + [5.0, 0, 0]
    # plant a known closest pair
    a[7] = [1.5, 0.5, 0.5]
    b[11] = [4.2, 0.5, 0.5]
    points = np.concatenate([a, b])
    index = np.array([0] * 50 + [1] * 60)
    anchors = scatter_nearest_neighbor_np(
        points, index, np.array([[0], [1]]), cycles=3)
    assert anchors[0, 0] == 7
    assert anchors[1, 0] == 50 + 11


def test_cluster_radius_nn_graph_gap():
    """Three collinear clusters: gap selects which pairs connect."""
    rng = np.random.default_rng(2)
    mk = lambda cx: rng.random((40, 3)) * 0.5 + [cx, 0, 0]
    points = np.concatenate([mk(0), mk(1.0), mk(5.0)])
    index = np.repeat([0, 1, 2], 40)
    ei, d = cluster_radius_nn_graph_np(points, index, k_max=5, gap=1.0)
    pairs = set(map(tuple, ei.T.tolist()))
    assert (0, 1) in pairs
    assert (1, 2) not in pairs and (0, 2) not in pairs
    assert (d <= 1.0).all()


def test_idx_preserving_mask_keeps_emptied_groups():
    uid = np.array([0, 0, 1, 1, 2])
    mask = np.array([True, False, False, False, True])
    out = _idx_preserving_mask(mask, uid, 3)
    # group 1 would be emptied -> fully restored
    np.testing.assert_array_equal(out, [True, False, True, True, True])


def _two_planes(n=200, gap=0.3, seed=3):
    """Two collinear strips along y with a `gap` between their facing
    ends. Non-degenerate for the subedge machinery: the anchors sit at
    the facing ends, the anchor axis is ~+y, and the halfspace filter
    keeps each side's boundary points (two *parallel* planes would be
    degenerate — every cross-pair is equidistant and the ordering is
    decided by the anchor-axis tilt, in the reference too)."""
    rng = np.random.default_rng(seed)
    a = np.stack([rng.random(n) * 0.3, rng.random(n) * 2,
                  rng.random(n) * 0.3], 1)
    b = np.stack([rng.random(n) * 0.3, rng.random(n) * 2 + 2 + gap,
                  rng.random(n) * 0.3], 1)
    points = np.concatenate([a, b])
    index = np.repeat([0, 1], n)
    return points, index


def test_subedges_two_planes():
    points, index = _two_planes()
    ei, pairs, uid = subedges_np(
        points, index, np.array([[0], [1]]), ratio=0.3, k_min=20)
    assert ei.shape == (2, 1)
    # subedge sources in segment 0, targets in segment 1
    assert (index[pairs[0]] == 0).all()
    assert (index[pairs[1]] == 1).all()
    assert (uid == 0).all()
    # count respects ratio.size >= k_min
    assert 20 <= pairs.shape[1] <= 60
    # every subedge crosses the gap in +y
    off = points[pairs[1]] - points[pairs[0]]
    assert (off[:, 1] >= 0.3 - 1e-9).all()
    # halfspace+topk keep boundary points: sources near segment 0's
    # top end, targets near segment 1's bottom end
    assert points[pairs[0], 1].min() > 0.5
    assert points[pairs[1], 1].max() < 2.3 + 2.0 - 0.5


def test_minimalistic_edge_features_two_planes():
    points, index = _two_planes()
    ei, pairs, uid = subedges_np(
        points, index, np.array([[0], [1]]), ratio=0.3, k_min=20)
    ea = minimalistic_edge_features_np(points, pairs, uid, 1)
    assert ea.shape == (1, 7)
    mean_off, std_off, mean_dist = ea[0, :3], ea[0, 3:6], ea[0, 6]
    assert mean_off[1] >= 0.3  # mean offset points +y across the gap
    assert abs(mean_off[0]) < 0.3 and abs(mean_off[2]) < 0.3
    # dim 6 is the SQRT of the mean subedge distance (reference
    # sqrt-stabilization, src/transforms/graph.py:1018): with offsets
    # dominated by the 0.3 gap, sqrt(mean_dist) is in [sqrt(0.3), ~1)
    off = points[pairs[1]] - points[pairs[0]]
    np.testing.assert_allclose(
        mean_dist, np.sqrt(np.linalg.norm(off, axis=1).mean()),
        rtol=1e-5)
    assert (std_off >= 0).all() and (std_off <= 2).all()


def test_subedges_filters_toggle():
    """Filters change the selected pairs but preserve invariants."""
    rng = np.random.default_rng(5)
    points = rng.random((300, 3))
    index = (points[:, 0] > 0.5).astype(np.int64)
    ei = np.array([[0], [1]])
    for hs in (True, False):
        for bb in (True, False):
            _, pairs, uid = subedges_np(
                points, index, ei, ratio=0.2, k_min=10,
                halfspace_filter=hs, bbox_filter=bb)
            assert pairs.shape[1] >= 10
            assert (index[pairs[0]] == 0).all()
            assert (index[pairs[1]] == 1).all()


def test_features_multiple_edges_grouping():
    """Three clusters in a row: features are grouped per edge."""
    rng = np.random.default_rng(6)
    mk = lambda cx: rng.random((80, 3)) * 0.4 + [cx, 0, 0]
    points = np.concatenate([mk(0), mk(0.5), mk(1.0)])
    index = np.repeat([0, 1, 2], 80)
    ei = np.array([[0, 1], [1, 2]])
    se, pairs, uid = subedges_np(points, index, ei, ratio=0.3,
                                 k_min=15)
    ea = minimalistic_edge_features_np(points, pairs, uid,
                                       se.shape[1])
    assert ea.shape == (2, 7)
    # both edges point +x on average
    assert (ea[:, 0] > 0).all()
    assert (ea[:, 6] > 0).all()


def _clustered_scene(seed=0, n_seg=120):
    rng = np.random.default_rng(seed)
    centers = rng.random((n_seg, 3)) * 6
    sizes = rng.integers(15, 300, n_seg)
    pts = np.concatenate([c + rng.standard_normal((n, 3)) * 0.25
                          for c, n in zip(centers, sizes)])
    index = np.repeat(np.arange(n_seg), sizes)
    perm = rng.permutation(pts.shape[0])
    return pts[perm], index[perm], centers


def test_native_subedges_twin_parity():
    """The C++ kernels (native/subedges.cpp) must reproduce the numpy
    path bit-for-bit: same anchors, same pairs, same uid — across all
    filter combinations."""
    from superpoint_transformer_tpu.ops.native import native_available
    if not native_available():
        pytest.skip('native library not built')
    from scipy.spatial import cKDTree
    pts, index, centers = _clustered_scene()
    n_seg = centers.shape[0]
    _, nb = cKDTree(centers).query(centers, k=5)
    src = np.repeat(np.arange(n_seg), 4)
    dst = nb[:, 1:].reshape(-1)
    ei = np.stack([src, dst])
    csr = _segment_csr(index, n_seg)

    a_nat = scatter_nearest_neighbor_np(pts, index, ei, csr=csr,
                                        use_native=True)
    a_np = scatter_nearest_neighbor_np(pts, index, ei, csr=csr,
                                       use_native=False)
    np.testing.assert_array_equal(a_nat, a_np)

    for hs in (True, False):
        for bb in (True, False):
            got = subedges_np(pts, index, ei, ratio=0.25, k_min=12,
                              halfspace_filter=hs, bbox_filter=bb,
                              csr=csr, use_native=True)
            want = subedges_np(pts, index, ei, ratio=0.25, k_min=12,
                               halfspace_filter=hs, bbox_filter=bb,
                               csr=csr, use_native=False)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)
