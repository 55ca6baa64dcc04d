"""Data structure + H5 I/O tests, incl. golden-file round-trips against
the reference's demo_nag_v3.h5 (the only binary fixture the reference
ships; see reference notebooks/demo.ipynb)."""
import numpy as np
import pytest

from superpoint_transformer_tpu.data import (
    Data, NAG, Cluster, batch_nags, sort_nag_by_super, pad_nag)


def _toy_nag(seed=0, n0=200, n1=20, n2=5):
    rng = np.random.default_rng(seed)
    sup0 = rng.integers(0, n1, n0)
    sup1 = rng.integers(0, n2, n1)
    # guarantee all parents non-empty
    sup0[:n1] = np.arange(n1)
    sup1[:n2] = np.arange(n2)
    d0 = Data(
        pos=rng.normal(size=(n0, 3)).astype(np.float32),
        rgb=rng.integers(0, 255, (n0, 3)).astype(np.uint8),
        super_index=sup0,
        y=rng.integers(0, 5, n0))
    ei1 = np.stack([rng.integers(0, n1, 60), rng.integers(0, n1, 60)])
    d1 = Data(
        pos=rng.normal(size=(n1, 3)).astype(np.float32),
        super_index=sup1,
        sub=Cluster(sup0, np.arange(n0), dense=True),
        edge_index=ei1,
        edge_attr=rng.normal(size=(60, 7)).astype(np.float32),
        y=_hist(rng, n1, 5))
    d2 = Data(
        pos=rng.normal(size=(n2, 3)).astype(np.float32),
        sub=Cluster(sup1, np.arange(n1), dense=True),
        edge_index=np.stack([rng.integers(0, n2, 10),
                             rng.integers(0, n2, 10)]),
        edge_attr=rng.normal(size=(10, 7)).astype(np.float32),
        y=_hist(rng, n2, 5))
    return NAG([d0, d1, d2])


def _hist(rng, n, c):
    h = rng.integers(0, 10, (n, c + 1))
    return h


def test_data_h5_roundtrip(tmp_path):
    nag = _toy_nag()
    p = str(tmp_path / 'nag.h5')
    nag.save(p)
    nag2 = NAG.load(p, non_fp_to_long=True)
    assert nag2.num_levels == 3
    for i in range(3):
        np.testing.assert_allclose(nag2[i].pos, nag[i].pos, atol=1e-6)
    np.testing.assert_array_equal(nag2[0].super_index, nag[0].super_index)
    np.testing.assert_array_equal(nag2[1].y, nag[1].y)
    np.testing.assert_array_equal(nag2[1].sub.pointers, nag[1].sub.pointers)
    # level-0 int labels become CSR histograms? no: 1D saved as-is
    np.testing.assert_array_equal(nag2[0].y, nag[0].y)


def test_partial_load(tmp_path):
    nag = _toy_nag()
    p = str(tmp_path / 'nag.h5')
    nag.save(p)
    nag2 = NAG.load(p, low=1, keys=['pos', 'y', 'super_index'])
    assert nag2.start_i_level == 1
    assert nag2.num_levels == 2
    assert 'edge_attr' not in nag2[1]
    assert 'pos' in nag2[1]


def test_demo_nag_golden(demo_nag_path):
    nag = NAG.load(demo_nag_path, non_fp_to_long=True)
    assert nag.num_levels == 4
    assert nag[0].num_nodes == 41568
    assert nag[1].num_nodes == 1192
    assert nag[2].num_nodes == 501
    assert nag[3].num_nodes == 166
    # parent maps consistent
    assert nag[0].super_index.max() == nag[1].num_nodes - 1
    assert nag.get_super_index(2, 0).max() == nag[2].num_nodes - 1
    # y histograms decoded dense: level-1 y rows count FULL-RES points
    # inside each segment, hence >= the number of level-0 voxels
    y1 = nag[1].y
    assert y1.ndim == 2
    sizes = nag[1].sub.sizes
    assert (y1.sum(1) >= sizes).all()
    # edge features are the 7-dim minimalistic set
    assert nag[1].edge_attr.shape[1] == 7


def test_nag_select_cascade():
    nag = _toy_nag()
    idx = np.array([0, 3, 7])
    sub_nag = nag.select(1, idx)
    # level 1 selected
    assert sub_nag[1].num_nodes == 3
    np.testing.assert_allclose(sub_nag[1].pos, nag[1].pos[idx])
    # level 0 keeps exactly the children of selected superpoints
    expected_children = np.isin(nag[0].super_index, idx).sum()
    assert sub_nag[0].num_nodes == expected_children
    # super_index of level 0 is dense in [0, 3)
    assert sub_nag[0].super_index.max() == 2
    # level-2 parents: those of the selected level-1 nodes
    kept_parents = np.unique(nag[1].super_index[idx])
    assert sub_nag[2].num_nodes == kept_parents.shape[0]
    np.testing.assert_allclose(sub_nag[2].pos, nag[2].pos[kept_parents])
    # positions of points preserved
    child_mask = np.isin(nag[0].super_index, idx)
    np.testing.assert_allclose(
        np.sort(sub_nag[0].pos.sum(1)), np.sort(nag[0].pos[child_mask].sum(1)),
        atol=1e-6)


def test_batch_and_sort_and_pad():
    nags = [_toy_nag(seed=s) for s in range(3)]
    big = batch_nags(nags)
    assert big[0].num_nodes == sum(n[0].num_nodes for n in nags)
    assert big[1].batch.shape[0] == big[1].num_nodes
    # after sort, super_index nondecreasing
    big = sort_nag_by_super(big)
    for i in (0, 1):
        si = big[i].super_index
        assert (np.diff(si) >= 0).all()
    # sub clusters consistent: children of parent p are [ptr[p], ptr[p+1])
    sub = big[1].sub
    si0 = big[0].super_index
    for p in [0, 5, big[1].num_nodes - 1]:
        lo, hi = sub.pointers[p], sub.pointers[p + 1]
        assert (si0[lo:hi] == p).all()

    padded = pad_nag(big, num_classes=5)
    l1 = padded[1]
    assert l1.pos.shape[0] >= big[1].num_nodes
    assert int(l1.num_nodes) == big[1].num_nodes
    assert l1.nbr_idx is not None
    # dense neighbors reproduce the edge list
    n = big[1].num_nodes
    recon = set()
    nbr = np.asarray(l1.nbr_idx)
    msk = np.asarray(l1.nbr_mask)
    for s in range(n):
        for k in range(nbr.shape[1]):
            if msk[s, k]:
                recon.add((s, int(nbr[s, k])))
    orig = set(zip(big[1].edge_index[0].tolist(),
                   big[1].edge_index[1].tolist()))
    assert recon == orig


def test_convert_nag_v2_to_v3(tmp_path):
    """The v2->v3 converter reads the legacy `partition_<i>` layout
    (plain + _csr_ + _cluster_ + _instance_data_ groups, reference
    convert_nag_v2_to_v3.py) and writes a v3 file our NAG.load reads
    back unchanged."""
    import h5py
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.data.io import (
        save_array, save_dense_to_csr)
    from superpoint_transformer_tpu.utils.backwards_compatibility import (
        convert_nag_v2_to_v3)

    rng = np.random.default_rng(0)
    n0, n1 = 40, 5
    pos0 = rng.normal(size=(n0, 3)).astype(np.float32)
    rgb0 = rng.integers(0, 255, (n0, 3)).astype(np.uint8)
    super_index = np.sort(rng.integers(0, n1, n0)).astype(np.int64)
    y1 = np.zeros((n1, 4), np.int64)
    for i, s in enumerate(super_index):
        y1[s, i % 4] += 1
    # cluster CSR: points of each level-1 segment
    order = np.argsort(super_index, kind='stable')
    counts = np.bincount(super_index, minlength=n1)
    ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    # instance data on level 1
    iptr = np.arange(n1 + 1, dtype=np.int64)
    iobj = rng.integers(0, 3, n1).astype(np.int64)
    icnt = rng.integers(1, 50, n1).astype(np.int64)
    iy = rng.integers(0, 4, n1).astype(np.int64)

    p = tmp_path / 'nag_v2.h5'
    with h5py.File(p, 'w') as f:
        g0 = f.create_group('partition_0')
        save_array(pos0, g0, 'pos')
        save_array(rgb0, g0, 'rgb')
        save_array(super_index, g0, 'super_index')
        g1 = f.create_group('partition_1')
        pos1 = rng.normal(size=(n1, 3)).astype(np.float32)
        save_array(pos1, g1, 'pos')
        save_dense_to_csr(y1, g1.create_group('_csr_/y'))
        cg = g1.create_group('_cluster_/sub')
        save_array(ptr, cg, 'pointers')
        save_array(order.astype(np.int64), cg, 'points')
        ig = g1.create_group('_instance_data_/obj')
        save_array(iptr, ig, 'pointers')
        for i, v in enumerate((iobj, icnt, iy)):
            save_array(v, ig, str(i))
        # batch bookkeeping keys the converter must drop
        f.create_dataset('partition_0/_num_graphs', data=np.array([1]))

    out = convert_nag_v2_to_v3(str(p))
    nag = NAG.load(out)
    assert nag.num_levels == 2
    np.testing.assert_allclose(nag[0].pos, pos0, atol=1e-6)
    np.testing.assert_array_equal(nag[0].rgb, rgb0)
    np.testing.assert_array_equal(nag[0].super_index, super_index)
    np.testing.assert_array_equal(np.asarray(nag[1].y), y1)
    np.testing.assert_array_equal(nag[1].sub.pointers, ptr)
    np.testing.assert_array_equal(nag[1].sub.points, order)
    np.testing.assert_array_equal(nag[1].obj.obj, iobj)
    np.testing.assert_array_equal(nag[1].obj.count, icnt)
    np.testing.assert_array_equal(nag[1].obj.y, iy)
