"""Held-out generalization on the reference demo room (VERDICT r2
item 2): spatial split -> train the flagship on one half's crops ->
evaluate the whole other half. The full-scale numbers (1000 steps x 4
crops, both folds, on chip) live in STATUS.md; this test runs a short
CPU version with conservative floors to keep the evidence falsifiable.
Reference protocol being approximated: held-out-area cross-validation
(/root/reference/src/utils/semantic.py:73)."""
import os.path as osp

import numpy as np
import pytest

DEMO = '/root/reference/notebooks/demo_nag_v3.h5'


@pytest.fixture(scope='module')
def demo_nag():
    if not osp.exists(DEMO):
        pytest.skip('reference demo NAG not available')
    from superpoint_transformer_tpu.data import NAG
    return NAG.load(DEMO, non_fp_to_long=True, rgb_to_float=True)


def test_split_nag_spatially(demo_nag):
    from superpoint_transformer_tpu.utils.heldout import (
        split_nag_spatially)
    lo, hi = split_nag_spatially(demo_nag, gap=0.1)
    # both halves carry a meaningful share of the room
    n = demo_nag[1].num_nodes
    assert lo[1].num_nodes > 0.3 * n
    assert hi[1].num_nodes > 0.3 * n
    # the gap band is dropped: node budgets don't sum to the full room
    assert lo[1].num_nodes + hi[1].num_nodes < n
    # spatially disjoint along the split axis
    assert np.asarray(lo[1].pos)[:, 0].max() \
        < np.asarray(hi[1].pos)[:, 0].min()
    # cascade kept the hierarchy consistent on both sides
    for half in (lo, hi):
        for i in (0, 1, 2):
            sup = np.asarray(half[i].super_index)
            assert sup.min() >= 0
            assert sup.max() < half[i + 1].num_nodes


@pytest.mark.slow
def test_heldout_short_training_floor(demo_nag):
    """40 short steps already lift held-out mIoU well above chance
    (13 classes -> 7.7 uniform); measured r3 on CPU: ~27-34 at 20-40
    steps vs oracle ~95.7. Floors are set conservatively."""
    from superpoint_transformer_tpu.utils.heldout import (
        split_nag_spatially, run_heldout)
    lo, hi = split_nag_spatially(demo_nag, gap=0.1)
    res = run_heldout(lo, hi, steps=40, crops=2, seed=0)
    assert res['oracle_miou'] >= 90.0, res
    assert res['miou'] >= 18.0, res
    assert res['miou'] <= res['oracle_miou'], res
    assert res['loss_last'] < res['loss_first'], res
