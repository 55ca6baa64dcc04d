"""Evaluation CLI (analogue of reference src/eval.py):

    python eval.py experiment=semantic/s3dis ckpt_path=<dir>
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax

from superpoint_transformer_tpu.utils.jax_setup import setup_jax
setup_jax()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    here = osp.dirname(osp.abspath(__file__))

    from superpoint_transformer_tpu.config.loader import load_config
    from superpoint_transformer_tpu.experiment import (
        build_task, build_datasets, build_batch_config)
    from superpoint_transformer_tpu.datasets import DataLoader
    from superpoint_transformer_tpu.trainer import Trainer
    from superpoint_transformer_tpu.transforms.prepare import (
        prepare_batch)

    cfg = load_config(osp.join(here, 'configs'), 'eval', argv)
    datasets = build_datasets(cfg, stages=('test',))
    datasets['test'].process()

    batch_cfg = build_batch_config(cfg)
    loader = DataLoader(datasets['test'], batch_size=1)
    task = build_task(cfg)
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
    return metrics


if __name__ == '__main__':
    main()
