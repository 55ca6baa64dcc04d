"""Full-scale held-out evidence on the reference demo room (VERDICT
r2 item 2): spatial split at the x-median with a 10 cm gap, train the
CLI-built flagship on radius crops of one half, evaluate the whole
other half — both fold directions. Prints one JSON line per fold.

Run on the chip:  python tools/run_heldout_chip.py [steps] [crops]
Numbers recorded in STATUS.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(steps=1000, crops=4):
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.utils.heldout import (
        split_nag_spatially, run_heldout)

    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    lo, hi = split_nag_spatially(nag, gap=0.1)

    results = {}
    for name, (tr, ev) in (('lo->hi', (lo, hi)),
                           ('hi->lo', (hi, lo))):
        t0 = time.time()
        res = run_heldout(tr, ev, steps=steps, crops=crops, seed=0)
        res['fold'] = name
        results[name] = res
        print(json.dumps({k: (round(v, 3) if isinstance(v, float)
                              else v) for k, v in res.items()}),
              flush=True)
    mean_miou = float(np.mean([r['miou'] for r in results.values()]))
    mean_oracle = float(np.mean(
        [r['oracle_miou'] for r in results.values()]))
    print(json.dumps({'mean_heldout_miou': round(mean_miou, 2),
                      'mean_oracle_miou': round(mean_oracle, 2),
                      'steps': steps, 'crops': crops}), flush=True)


if __name__ == '__main__':
    a = sys.argv[1:]
    main(steps=int(a[0]) if a else 1000,
         crops=int(a[1]) if len(a) > 1 else 4)
