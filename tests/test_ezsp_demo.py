"""EZ-SP on real geometry: learned partition of the reference demo
room (short CPU version; full-scale on-chip numbers in STATUS.md).
Reference: PartitionAndSemanticModule validation partition purity,
src/models/semantic.py:1671."""
import os.path as osp

import numpy as np
import pytest

DEMO = '/root/reference/notebooks/demo_nag_v3.h5'


@pytest.mark.slow
def test_ezsp_demo_short_floor():
    if not osp.exists(DEMO):
        pytest.skip('reference demo NAG not available')
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.utils.ezsp_demo import run_ezsp_demo

    nag = NAG.load(DEMO, non_fp_to_long=True, rgb_to_float=True)
    res = run_ezsp_demo(nag, steps=15, channels=(16, 16), seed=0)

    # training moves the contrastive loss
    assert res['loss_last'] < res['loss_first'], res
    # the learned partition is a real compression of the room
    assert 50 < res['learned_n_segments'] < res['n_voxels'] // 4, res
    # even a 15-step embedding yields a usable partition: well above
    # chance, below the (near-saturated) cut-pursuit baseline ceiling
    assert res['learned_oracle_miou'] > 40.0, res
    assert res['cutpursuit_oracle_miou'] > 90.0, res
