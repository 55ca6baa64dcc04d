"""Demo: load a preprocessed NAG, inspect the partition, run the SPT
model, and export an interactive 3D visualization.

The script analogue of the reference's `notebooks/demo.ipynb` /
`demo_nag.ipynb`, driven by the same golden file
(`notebooks/demo_nag_v3.h5` — a preprocessed S3DIS room).

    JAX_PLATFORMS=cpu python examples/demo.py \
        --nag /root/reference/notebooks/demo_nag_v3.h5 \
        --ckpt outputs/checkpoints/best --out demo_out

Without --ckpt the model runs with random weights (the pipeline is
still exercised end to end; expect chance-level mIoU).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--nag',
                    default='/root/reference/notebooks/demo_nag_v3.h5')
    ap.add_argument('--ckpt', default=None)
    ap.add_argument('--out', default='demo_out')
    ap.add_argument('--num-classes', type=int, default=13)
    args = ap.parse_args(argv)

    import jax
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from superpoint_transformer_tpu.models.output import (
        SemanticSegmentationOutput)
    from superpoint_transformer_tpu.metrics.semantic import (
        ConfusionMatrix)
    from superpoint_transformer_tpu.metrics.oracle import (
        semantic_segmentation_oracle)
    from superpoint_transformer_tpu.visualization import visualize_3d
    from __graft_entry__ import _make_model

    # ---- 1. the NAG: hierarchical superpoint partition ---------------
    nag = NAG.load(args.nag, non_fp_to_long=True, rgb_to_float=True)
    print(f'NAG: {nag.num_levels} levels')
    for i in nag.levels:
        print(f'  level {i}: {nag[i].num_nodes} nodes')

    # partition quality upper bound (reference
    # Data.semantic_segmentation_oracle, src/data/data.py:976)
    y1 = np.asarray(nag[1].y)
    oracle = semantic_segmentation_oracle(y1, args.num_classes)
    print(f'level-1 partition oracle: '
          f'miou={oracle["miou"]:.1f} oa={oracle["oa"]:.1f}')

    # ---- 2. model forward --------------------------------------------
    cfg = BatchConfig(num_classes=args.num_classes)
    batch = prepare_batch([nag.clone()], cfg, train=False)
    model = SemanticSegmentationModel(net=_make_model(num_graphs=1),
                                      num_classes=args.num_classes)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    if args.ckpt:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            osp.abspath(args.ckpt))
        variables = {'params': restored['params']}
        print(f'loaded checkpoint {args.ckpt}')
    outs = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)

    from superpoint_transformer_tpu.inference import (
        level1_node_id, to_nag_order)
    n1 = int(np.asarray(batch[1].num_nodes))
    # batch rows are sorted by parent (pad_nag); map back to the NAG's
    # stored order so y1 / super_index below line up
    logits1 = to_nag_order(np.asarray(outs[0])[:n1],
                           level1_node_id(batch, n1))
    out = SemanticSegmentationOutput(logits1)

    cm = ConfusionMatrix(args.num_classes)
    cm.update(out.semantic_pred, y1[:n1])
    m = cm.all_metrics()
    print(f'level-1 prediction: miou={m["miou"]:.1f} oa={m["oa"]:.1f}'
          + ('' if args.ckpt else '  (random weights)'))

    # ---- 3. full-resolution recovery + visualization -----------------
    sup = np.asarray(nag[0].super_index)
    nag[0]['semantic_pred'] = out.voxel_semantic_pred(sup)
    os.makedirs(args.out, exist_ok=True)
    fig = visualize_3d(nag, num_classes=args.num_classes,
                       title='SPT demo')
    path = fig.write_html(osp.join(args.out, 'demo.html'))
    print(f'interactive viewer written to {path}')


if __name__ == '__main__':
    main()
