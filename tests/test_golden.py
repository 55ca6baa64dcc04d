"""Golden-file assertions against the reference's shipped demo NAG
(`notebooks/demo_nag_v3.h5` — a preprocessed S3DIS room). Pins the
H5-reader semantics and the oracle math to exact reference values:
any silent change to CSR unpacking, histogram decoding or the oracle
formulas shows up here."""
import os.path as osp

import numpy as np
import pytest

DEMO = '/root/reference/notebooks/demo_nag_v3.h5'

pytestmark = pytest.mark.skipif(
    not osp.exists(DEMO), reason='reference demo NAG not available')


@pytest.fixture(scope='module')
def demo_nag():
    from superpoint_transformer_tpu.data import NAG
    return NAG.load(DEMO, non_fp_to_long=True, rgb_to_float=True)


def test_demo_structure(demo_nag):
    assert [demo_nag[i].num_nodes for i in demo_nag.levels] == \
        [41568, 1192, 501, 166]
    assert [None if demo_nag[i].get('edge_index') is None
            else demo_nag[i].edge_index.shape[1]
            for i in demo_nag.levels] == [None, 9158, 7232, 2545]
    # total non-void label mass at level 1 (drives the confmat checks
    # in the package drive)
    assert int(np.asarray(demo_nag[1].y)[:, :13].sum()) == 384849
    # rgb decoded from bytes to [0, 1] floats
    rgb = np.asarray(demo_nag[0].rgb)
    assert rgb.dtype == np.float32
    assert 0 <= rgb.min() and rgb.max() <= 1.0


def test_demo_partition_oracles(demo_nag):
    """Per-level semantic oracles (the partition's mIoU upper bound,
    reference Data.semantic_segmentation_oracle) to 1e-2."""
    from superpoint_transformer_tpu.metrics.oracle import (
        semantic_segmentation_oracle)
    expected = {1: (99.1202, 97.7282, 95.4638),
                2: (98.3258, 95.8454, 92.5706),
                3: (96.8659, 89.8838, 85.3567)}
    for lvl, (oa, macc, miou) in expected.items():
        o = semantic_segmentation_oracle(
            np.asarray(demo_nag[lvl].y), 13)
        assert abs(float(o['oa']) - oa) < 1e-2, lvl
        assert abs(float(o['macc']) - macc) < 1e-2, lvl
        assert abs(float(o['miou']) - miou) < 1e-2, lvl


def test_demo_super_index_consistency(demo_nag):
    """Parent maps compose: every level-0 point's level-2 parent via
    get_super_index equals the two-hop composition."""
    s01 = np.asarray(demo_nag[0].super_index)
    s12 = np.asarray(demo_nag[1].super_index)
    s02 = np.asarray(demo_nag.get_super_index(2, low=0))
    np.testing.assert_array_equal(s02, s12[s01])
    # cluster CSR inverts the parent map
    sub = demo_nag[1].sub
    back = sub.to_super_index()
    np.testing.assert_array_equal(back, s01)
