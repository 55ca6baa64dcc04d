"""Fresh-process inference-forward profile at bench.py's 8x-demo
shape (relay-valid two-length fori scheme). The relay's dispatch
degrades after a process's first device read, so A/B comparisons must
be FIRST measurements of separate fresh processes:

  python tools/profile_infer.py                        # shipped config
  SPT_PROF_FUSED_RPE=0 python tools/profile_infer.py   # XLA-RPE kernel
  SPT_PROF_PALLAS=0    python tools/profile_infer.py   # pure XLA path
  SPT_PROF_BATCH=2     python tools/profile_infer.py   # 2x demo batch
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from __graft_entry__ import _make_model

    from superpoint_transformer_tpu.nn.attention import (
        set_pallas_attention)
    if os.environ.get('SPT_PROF_FUSED_RPE') == '0':
        set_pallas_attention(True, fused_rpe=False)
        print('[knob] fused_rpe=False (XLA-materialized RPE kernel)')
    if os.environ.get('SPT_PROF_PALLAS') == '0':
        set_pallas_attention(False)
        print('[knob] pallas=False (pure XLA attention)')

    BATCH = int(os.environ.get('SPT_PROF_BATCH', 8))
    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    cfg = BatchConfig()
    eval_batch = prepare_batch([nag.clone() for _ in range(BATCH)],
                               cfg, train=False,
                               rng=np.random.default_rng(1),
                               device=False)
    nag2 = nag.clone()
    nag2[0]['pos'] = np.asarray(nag2[0].pos) + np.float32(1e-6)
    eval_batch2 = prepare_batch([nag2.clone() for _ in range(BATCH)],
                                cfg, train=False,
                                rng=np.random.default_rng(1),
                                device=False)
    n_points = int(nag[0].num_nodes) * BATCH
    eval_batch = jax.device_put(eval_batch)
    eval_batch2 = jax.device_put(eval_batch2)

    model = SemanticSegmentationModel(
        net=_make_model(num_graphs=BATCH), num_classes=13)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), eval_batch)

    def _leaf_sum(tree):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    def _perturb(tree, c):
        return jax.tree_util.tree_map(
            lambda a: a + (c * 1e-12).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    @partial(jax.jit, static_argnames='n')
    def fwd_n(v, batch, n):
        def body(i, c):
            out = model.apply(_perturb(v, c), batch, train=False)
            return _leaf_sum(out) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    N_SMALL, N_BIG = 4, 54
    float(fwd_n(variables, eval_batch, N_SMALL))   # sacrificial
    float(fwd_n(variables, eval_batch, N_BIG))
    t0 = time.perf_counter()
    float(fwd_n(variables, eval_batch2, N_SMALL))
    d_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fwd_n(variables, eval_batch2, N_BIG))
    d_big = time.perf_counter() - t0
    fwd_ms = (d_big - d_small) / (N_BIG - N_SMALL) * 1e3
    print(f'inference fwd ({BATCH}x demo, {n_points} voxel pts): '
          f'{fwd_ms:.3f} ms  '
          f'({n_points / fwd_ms * 1e3 / 1e6:.2f}M voxel pts/s)')


if __name__ == '__main__':
    main()
