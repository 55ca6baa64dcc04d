"""Full-scale EZ-SP evidence on the reference demo room: train the
sparse-CNN embedding, partition the room on the learned embeddings,
report partition-oracle quality vs the stored cut-pursuit partition.
Prints one JSON line. Numbers recorded in STATUS.md.

Run on the chip:  python tools/run_ezsp_chip.py [steps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(steps=300):
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.utils.ezsp_demo import run_ezsp_demo

    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    res = run_ezsp_demo(nag, steps=steps, seed=0)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}), flush=True)


if __name__ == '__main__':
    a = sys.argv[1:]
    main(steps=int(a[0]) if a else 300)
