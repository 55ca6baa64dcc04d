"""Evaluation CLI (analogue of reference src/eval.py):

    python eval.py experiment=semantic/s3dis ckpt_path=<dir>

S3DIS 6-fold protocol (reference compute_semantic_metrics_s3dis_6fold,
src/utils/semantic.py:73 — per-fold confusion matrices are summed):

    python eval.py experiment=semantic/s3dis s3dis_6fold=True \\
        ckpt_path='outputs/fold{fold}/checkpoints/best'
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax

from superpoint_transformer_tpu.utils.jax_setup import setup_jax
setup_jax()


def evaluate(cfg, pq=None, ap=None):
    """Single-run evaluation: build the test set, load the checkpoint,
    run the (TTA/panoptic/submission-aware) test epoch. Returns the
    metric dict; 'confmat' carries the raw counts. `pq`/`ap` are
    optional shared accumulators for cross-fold panoptic metrics."""
    from superpoint_transformer_tpu.experiment import (
        build_task, build_datasets, build_batch_config)
    from superpoint_transformer_tpu.datasets import DataLoader
    from superpoint_transformer_tpu.trainer import Trainer
    from superpoint_transformer_tpu.transforms.prepare import (
        prepare_batch)

    datasets = build_datasets(cfg, stages=('test',))
    datasets['test'].process()

    batch_cfg = build_batch_config(cfg)
    loader = DataLoader(datasets['test'], batch_size=1)
    task = build_task(cfg)
    # pin eval caps from the whole test split: one compiled program
    # per level signature across all tiles (reference whole-tile eval,
    # src/models/semantic.py:1039)
    from superpoint_transformer_tpu.transforms.prepare import (
        discover_caps)
    batch_cfg = discover_caps(list(loader), batch_cfg, train=False,
                              headroom_levels=0)
    nags = next(iter(loader))
    example = prepare_batch(nags, batch_cfg, train=False)
    state = task.init_state(jax.random.PRNGKey(0), example)

    trainer = Trainer(task=task, batch_cfg=batch_cfg,
                      output_dir=str(cfg.get('output_dir', 'outputs')))
    ckpt = cfg.get('ckpt_path')
    if ckpt and ckpt != '???':
        state = trainer.load_checkpoint(state, ckpt)
    # test-time augmentation: eval.py tta_runs=8 (reference
    # step_multi_run_inference, src/models/semantic.py:485)
    tta_runs = int(cfg.get('tta_runs', 0))
    metrics = trainer.validate(state, loader, split='test',
                               tta_runs=tta_runs)
    # per-class IoU table (reference prints it at test end)
    iou = metrics.get('iou_per_class')
    if iou is not None:
        import numpy as _np
        names = list(getattr(datasets['test'], 'class_names', []))
        present = _np.asarray(metrics.get('present'))
        for i, v in enumerate(_np.asarray(iou)):
            name = names[i] if i < len(names) else f'class_{i}'
            tag = '' if present is None or present[i] else '  (absent)'
            print(f'  {name:<14s} IoU {float(v):6.2f}{tag}')
    # SuperCluster: also run the instance partition + PQ/mAP
    # (reference PanopticSegmentationModule test epoch)
    if str(cfg.model.get('task', 'semantic')) == 'panoptic':
        trainer.stuff_classes = tuple(
            cfg.datamodule.get('stuff_classes', ()))
        trainer.panoptic_grid_search = bool(
            cfg.get('panoptic_grid_search', True))
        metrics = {**metrics,
                   **trainer.validate_panoptic(state, loader,
                                               split='test',
                                               pq=pq, ap=ap)}
    # held-out benchmark submission: full-resolution predictions per
    # cloud in the dataset's format (reference
    # BaseDataset.make_submission, src/datasets/base.py:1115)
    if bool(cfg.get('submission', False)):
        import numpy as np
        from superpoint_transformer_tpu.data import NAG
        from superpoint_transformer_tpu.datasets.base import (
            make_submission)
        from superpoint_transformer_tpu.models.output import (
            SemanticSegmentationOutput)
        ds = datasets['test']
        sub_dir = osp.join(str(cfg.get('output_dir', 'outputs')),
                           'submission')
        for i, cid in enumerate(ds.cloud_ids):
            nag = ds[i]
            batch = prepare_batch([nag], batch_cfg, train=False)
            out = task.eval_step(state, batch)
            n1 = int(np.asarray(batch[1].num_nodes))
            from superpoint_transformer_tpu.inference import (
                level1_node_id, to_nag_order)
            # map batch-order rows back to the stored NAG's node order
            # (pad_nag sorts levels by parent; `low`'s super_index
            # below is in stored order)
            logits = to_nag_order(
                np.asarray(out['logits_level1'])[:n1],
                level1_node_id(batch, n1))
            o = SemanticSegmentationOutput(logits)
            low = NAG.load(ds.processed_path(cid), high=0,
                           keys_low=['sub', 'super_index'])
            d0 = low[0]
            if d0.get('sub') is not None:
                pred = o.full_res_semantic_pred(d0.super_index, d0.sub)
            else:
                pred = o.voxel_semantic_pred(d0.super_index)
            make_submission(ds, cid, pred, sub_dir)
        print(f'submission written to {sub_dir}')
    return metrics


def evaluate_s3dis_6fold(cfg_dir, argv):
    """6-fold cross-validation: evaluate each fold's checkpoint on its
    held-out area and sum the confusion matrices (reference
    compute_semantic_metrics_s3dis_6fold — concatenating per-fold
    predictions is equivalent to summing the per-fold counts).
    `ckpt_path` may contain a `{fold}` placeholder."""
    import numpy as np
    from superpoint_transformer_tpu.config.loader import load_config
    from superpoint_transformer_tpu.metrics.semantic import (
        miou_from_confmat, oa_from_confmat, macc_from_confmat)

    base = load_config(cfg_dir, 'eval', argv)
    ckpt_template = str(base.get('ckpt_path', ''))
    # panoptic 6-fold: shared accumulators concatenate the per-fold
    # instance matches before the final PQ/mAP compute
    pq = ap = None
    if str(base.model.get('task', 'semantic')) == 'panoptic':
        from superpoint_transformer_tpu.metrics.panoptic import (
            PanopticQuality3D)
        from superpoint_transformer_tpu.metrics.mean_average_precision \
            import MeanAveragePrecision3D
        n_cls = int(base.datamodule.num_classes)
        stuff = tuple(base.datamodule.get('stuff_classes', ()))
        pq = PanopticQuality3D(n_cls, stuff_classes=stuff)
        ap = MeanAveragePrecision3D(n_cls, stuff_classes=stuff)
    total = None
    for fold in range(1, 7):
        overrides = list(argv) + [f'datamodule.fold={fold}']
        if '{fold}' in ckpt_template:
            overrides.append(
                'ckpt_path=' + ckpt_template.format(fold=fold))
        fcfg = load_config(cfg_dir, 'eval', overrides)
        print(f'=== fold {fold} (test area Area_{fold}) ===')
        m = evaluate(fcfg, pq=pq, ap=ap)
        total = m['confmat'] if total is None else total + m['confmat']
    out = {'miou': miou_from_confmat(total),
           'oa': oa_from_confmat(total),
           'macc': macc_from_confmat(total),
           'confmat': total}
    if pq is not None:
        out.update(pq.compute())
        out.update({f'map_{k}' if not k.startswith('map') else k: v
                    for k, v in ap.compute().items()
                    if k in ('map', 'map_50', 'map_25', 'mar')})
    print(f"6-fold: miou={out['miou']:.2f} oa={out['oa']:.2f} "
          f"macc={out['macc']:.2f}"
          + (f" pq={out['pq']:.2f}" if 'pq' in out else ''))
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    here = osp.dirname(osp.abspath(__file__))
    from superpoint_transformer_tpu.config.loader import load_config
    cfg_dir = osp.join(here, 'configs')
    cfg = load_config(cfg_dir, 'eval', argv)
    if bool(cfg.get('s3dis_6fold', False)):
        return evaluate_s3dis_6fold(cfg_dir, argv)
    return evaluate(cfg)


if __name__ == '__main__':
    main()
