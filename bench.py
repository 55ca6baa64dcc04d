"""Driver benchmark: north-star projection + measured device numbers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

North star (BASELINE.json / BASELINE.md): full S3DIS preprocessing +
training in < 1 h on a TPU v5e-8 at mIoU parity. This benchmark
measures the three real costs and projects the end-to-end wall time:

  1. TRAIN STEP: jitted train_step wall time on a reference-shaped
     batch (4 clouds, radius-subgraph crops — reference
     configs/datamodule/semantic/s3dis.yaml batch_size=4), on the real
     chip. The reference trains 2000 epochs x ~2 steps/epoch
     (5 training areas / batch 4) = ~4000 steps for S3DIS
     (configs/experiment/semantic/s3dis.yaml:15).
  2. HOST BATCH PREP: augment+sample+pad seconds per batch on one
     core; in production this runs in PreparedDataLoader worker
     processes and overlaps the device step.
  3. PREPROCESSING: measured sec / 1M raw points on one core
     (C++ kernels inside use OpenMP when cores are available),
     projected over the full S3DIS dataset (~273M raw points across
     6 areas, preprocessed once and cached) on `assumed_cores`
     parallel workers (per-cloud fan-out, datasets/base.py).

vs_baseline = (1 h budget) / (projected e2e hours): > 1 means the
north-star budget is met with room to spare.

Secondary detail keys: forward voxel-points/sec on the padded demo
batch, XLA-counted forward FLOPs, and MFU against the v5e bf16 peak
(197 TFLOP/s/chip) — device-compute context, NOT the headline.

TIMING METHODOLOGY (axon tunnel): through the relay,
`block_until_ready` does NOT actually block (dispatch is fire-and-
forget), identical calls are served from a relay cache, and the first
device->host read pays a large one-time stall then leaves the process
with high per-dispatch overhead. The only valid scheme (validated on
a known-FLOPs 8192^3 matmul at 176 TFLOP/s = 89% of v5e peak):

  1. run N iterations inside ONE jitted fori_loop whose carry makes
     iteration i+1 depend on iteration i (non-factorable chaining)
     and consumes the full output (defeats DCE);
  2. a sacrificial first call + scalar read absorbs compile + stall;
  3. the timed call uses FRESH inputs (defeats the relay cache) and
     ends with a single scalar read (the only true sync);
  4. two loop lengths cancel the per-dispatch + read overhead.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BUDGET_HOURS = 1.0               # north-star budget (BASELINE.json)
REF_TOTAL_STEPS = 4000           # 2000 epochs x 2 steps (see docstring)
S3DIS_RAW_POINTS_M = 273.0       # ~273M raw points over 6 areas
ASSUMED_CORES = 16               # preprocessing fan-out on a v5e-8 host
V5E_BF16_PEAK_FLOPS = 197e12     # per chip
BATCH = 8                        # inference throughput batch (demo x8)
PREPROC_N = 250_000              # synthetic cloud for preprocess timing


def _bench_preprocessing():
    """Host-only: seconds per 1M raw points through the full
    pre_transform chain on a surface-sampled synthetic room (matches
    the piecewise-planar statistics of real indoor scans; uniform
    blobs are the partition's worst case and overstate the cost).

    One warmup pass first: production workers preprocess hundreds of
    clouds per process, so the per-cloud cost is the steady state —
    the first call pays one-time imports and allocator pool growth
    (utils/memory.py:tune_host_allocator keeps the pools hot after
    it) that amortize to nothing over a dataset."""
    from superpoint_transformer_tpu.utils.synthetic import (
        synthetic_room_cloud)
    from superpoint_transformer_tpu.transforms.preprocess import (
        preprocess_cloud)
    n = PREPROC_N
    preprocess_cloud(synthetic_room_cloud(seed=0, n_points=n),
                     voxel=0.05, rng=np.random.default_rng(0))
    best = float('inf')
    for _ in range(2):  # min-of-2: allocator pools settle per shape
        data = synthetic_room_cloud(seed=0, n_points=n)
        t0 = time.perf_counter()
        preprocess_cloud(data, voxel=0.05,
                         rng=np.random.default_rng(0))
        best = min(best, time.perf_counter() - t0)
    return best * (1e6 / n)


def main():
    import jax
    from superpoint_transformer_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from superpoint_transformer_tpu.data import NAG
    from superpoint_transformer_tpu.transforms import (
        BatchConfig, prepare_batch)
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel, SemanticTask)
    from __graft_entry__ import _make_model

    platform = jax.devices()[0].platform

    # ---- host-only sections first (no device traffic) ----------------
    preproc_sec_per_1m = _bench_preprocessing()

    demo = '/root/reference/notebooks/demo_nag_v3.h5'
    if os.path.exists(demo):
        nag = NAG.load(demo, non_fp_to_long=True, rgb_to_float=True)
    else:
        from superpoint_transformer_tpu.utils.synthetic import random_nag
        nag = random_nag(seed=0, n_points=40_000, n_l1=1024, n_l2=256)

    # host batch-prep cost: reference-shaped train batch (4 clouds,
    # radius-subgraph sampling, augmentations, padding). Steady-state
    # (one warmup): PreparedDataLoader workers produce thousands of
    # batches per process.
    cfg_train = BatchConfig()
    rng = np.random.default_rng(0)
    prepare_batch([nag.clone() for _ in range(4)], cfg_train,
                  train=True, rng=rng, device=False)
    nags = [nag.clone() for _ in range(4)]
    t0 = time.perf_counter()
    train_batch = prepare_batch(nags, cfg_train, train=True, rng=rng,
                                device=False)
    bprep_sec = time.perf_counter() - t0
    # the device transfer is NOT part of the worker cost: it runs on
    # the consumer side and overlaps the previous step (the train-step
    # fori_loop below reuses one resident batch, like training reuses
    # the double-buffered next batch)

    # inference batch for throughput/FLOPs (demo room x BATCH); a
    # second, perturbed copy defeats the relay's call cache
    cfg_eval = BatchConfig()
    n_points_fwd = int(nag[0].num_nodes) * BATCH
    eval_batch = prepare_batch([nag.clone() for _ in range(BATCH)],
                               cfg_eval, train=False,
                               rng=np.random.default_rng(1))
    nag2 = nag.clone()
    nag2[0]['pos'] = np.asarray(nag2[0].pos) + np.float32(1e-6)
    eval_batch2 = prepare_batch([nag2.clone() for _ in range(BATCH)],
                                cfg_eval, train=False,
                                rng=np.random.default_rng(1))

    # ---- device sections ---------------------------------------------
    import jax.numpy as jnp
    from functools import partial

    train_batch = jax.device_put(train_batch)
    eval_batch = jax.device_put(eval_batch)
    eval_batch2 = jax.device_put(eval_batch2)

    def _leaf_sum(tree):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    # ---- train-step timing -------------------------------------------
    task = SemanticTask(net=_make_model(num_graphs=4), num_classes=13,
                        total_steps=REF_TOTAL_STEPS, warmup_steps=200)
    state = task.init_state(jax.random.PRNGKey(0), train_batch)

    @partial(jax.jit, static_argnames='n')
    def train_n(st, batch, key, n):
        def body(i, s):
            s2, _ = task.train_step(s, batch, jax.random.fold_in(
                key, i))
            return s2
        out = jax.lax.fori_loop(0, n, body, st)
        return _leaf_sum(out.params)  # consume all params (no DCE)

    N_SMALL, N_BIG = 4, 54
    # sacrificial: compiles + first-read stall
    float(train_n(state, train_batch, jax.random.PRNGKey(1), N_SMALL))
    float(train_n(state, train_batch, jax.random.PRNGKey(2), N_BIG))
    t0 = time.perf_counter()
    v_small = float(train_n(state, train_batch, jax.random.PRNGKey(3),
                            N_SMALL))
    d_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    v_big = float(train_n(state, train_batch, jax.random.PRNGKey(4),
                          N_BIG))
    d_big = time.perf_counter() - t0
    step_sec = (d_big - d_small) / (N_BIG - N_SMALL)
    assert np.isfinite(v_small) and np.isfinite(v_big)

    # ---- forward timing + model FLOPs --------------------------------
    model = SemanticSegmentationModel(
        net=_make_model(num_graphs=BATCH), num_classes=13)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), eval_batch)

    def _perturb(tree, c):
        # loop-carried chaining: makes iteration i+1 depend on i so a
        # fori_loop of forwards cannot be hoisted/CSE'd; the actual
        # perturbation (~1e-14) vanishes in fp32 rounding. Applied to
        # the PARAMS (small) — perturbing the padded batch would add
        # a full batch-sized elementwise pass to every iteration and
        # overstate the forward cost
        return jax.tree_util.tree_map(
            lambda a: a + (c * 1e-12).astype(a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    @partial(jax.jit, static_argnames='n')
    def fwd_n(v, batch, n):
        def body(i, c):
            out = model.apply(_perturb(v, c), batch, train=False)
            return _leaf_sum(out) * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # analytical contraction FLOPs of one forward (host-side trace;
    # XLA's cost_analysis counts padded elementwise ops and overreads
    # matmul-bound models several-fold)
    from superpoint_transformer_tpu.utils.flops import matmul_flops
    fwd_flops = float(matmul_flops(
        lambda v, b: model.apply(v, b, train=False), variables,
        eval_batch))

    float(fwd_n(variables, eval_batch, N_SMALL))  # sacrificial
    float(fwd_n(variables, eval_batch, N_BIG))
    t0 = time.perf_counter()
    f_small = float(fwd_n(variables, eval_batch2, N_SMALL))
    d_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    f_big = float(fwd_n(variables, eval_batch2, N_BIG))
    d_big = time.perf_counter() - t0
    fwd_sec = (d_big - d_small) / (N_BIG - N_SMALL)
    assert np.isfinite(f_small) and np.isfinite(f_big)

    # ---- north-star projection ----------------------------------------
    preproc_hours = (S3DIS_RAW_POINTS_M * preproc_sec_per_1m
                     / ASSUMED_CORES) / 3600.0
    # device step and host batch prep overlap (PreparedDataLoader
    # workers); per-step wall = max(device, host/workers)
    step_wall = max(step_sec, bprep_sec / ASSUMED_CORES)
    train_hours = REF_TOTAL_STEPS * step_wall / 3600.0
    e2e_hours = preproc_hours + train_hours

    mfu_pct = (fwd_flops / fwd_sec / V5E_BF16_PEAK_FLOPS * 100.0
               if np.isfinite(fwd_flops) else None)
    print(json.dumps({
        'metric': 'projected_s3dis_preprocess_plus_train_hours_v5e8',
        'value': round(e2e_hours, 4),
        'unit': 'hours',
        'vs_baseline': round(BUDGET_HOURS / e2e_hours, 2),
        'detail': {
            'platform': platform,
            'train_step_ms': round(step_sec * 1e3, 3),
            'train_steps_per_sec': round(1.0 / step_sec, 1),
            'host_batch_prep_sec': round(bprep_sec, 3),
            'preprocess_sec_per_1m_pts_1core': round(
                preproc_sec_per_1m, 1),
            'projected_preprocess_hours': round(preproc_hours, 4),
            'projected_train_hours': round(train_hours, 4),
            'assumed_cores': ASSUMED_CORES,
            'assumed_s3dis_raw_points_m': S3DIS_RAW_POINTS_M,
            'ref_total_steps': REF_TOTAL_STEPS,
            'forward_gflops_per_batch': (
                round(fwd_flops / 1e9, 2) if np.isfinite(fwd_flops)
                else None),
            'forward_ms': round(fwd_sec * 1e3, 3),
            'forward_mfu_pct_v5e_bf16': (
                round(mfu_pct, 3) if mfu_pct is not None else None),
            'inference_voxel_points_per_sec': round(
                n_points_fwd / fwd_sec, 1),
            'train_params_finite': True,
        },
    }))


if __name__ == '__main__':
    main()
