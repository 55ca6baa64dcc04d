"""Full-scale SuperCluster on real geometry (VERDICT r2 item 3):
pseudo gt instances on the reference demo room, affinity training,
instance cut-pursuit + PQ grid search, PQ/SQ/RQ vs the panoptic
oracle. Prints one JSON line. Numbers recorded in STATUS.md.

Run on the chip:  python tools/run_supercluster_chip.py [steps] [crops]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(steps=600, crops=4, weights=None,
         experiment='panoptic/s3dis'):
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.utils.supercluster_demo import (
        run_supercluster_demo)

    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    res = run_supercluster_demo(nag, steps=steps, crops=crops, seed=0,
                                edge_affinity_loss_weights=weights,
                                experiment=experiment)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items() if k != 'settings'}),
          flush=True)
    print(json.dumps({'settings': res.get('settings')}), flush=True)


if __name__ == '__main__':
    # usage: run_supercluster_chip.py [steps] [crops] [w1,w2,w3,w4]
    #        [experiment]  (e.g. panoptic/s3dis_with_stuff)
    a = sys.argv[1:]
    main(steps=int(a[0]) if a else 600,
         crops=int(a[1]) if len(a) > 1 else 4,
         weights=(tuple(float(x) for x in a[2].split(','))
                  if len(a) > 2 and a[2] != '-' else None),
         experiment=a[3] if len(a) > 3 else 'panoptic/s3dis')
