"""Driver benchmark: north-star projection + measured device numbers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

North star (BASELINE.json / BASELINE.md): full S3DIS preprocessing +
training in < 1 h on a TPU v5e-8 at mIoU parity. This benchmark
measures the three real costs and projects the end-to-end wall time:

  1. TRAIN STEP: jitted train_step wall time on a 4-cloud batch of
     radius-subgraph crops, on the real chip. Step-count accounting
     (in CROPS, the unit of optimization work): the reference S3DIS
     run is 2000 epochs x 5 training areas at dataloader
     batch_size=1 (configs/datamodule/semantic/s3dis.yaml:8,
     experiment/semantic/s3dis.yaml max_epochs: 2000) = 10,000 steps,
     each one cloud x 4 radius crops (SampleRadiusSubgraphs k=4) =
     40,000 crops total. This repo's batch is 4 clouds x 4 crops = 16
     crops, so REF_TOTAL_STEPS=4000 such steps = 64,000 crops — a
     CONSERVATIVE (1.6x) over-provision of the reference's
     optimization work.
  1b. VALIDATION: the reference validates every 10 epochs
     (configs/trainer/default.yaml check_val_every_n_epoch: 10) ->
     200 whole-tile sweeps of the val area (Area_5). Projected from
     the measured whole-room inference throughput over an assumed
     ~9M-voxel val split (Area_5 is ~78M raw points; at the 3cm voxel
     grid indoor scans retain roughly an eighth of raw points —
     the demo room's stored NAG is consistent with this).
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
# end-to-end inference benchmark (reference headline: 18M points in
# 10.1 s on one GPU, README.md:103): DALES-like synthetic tile size.
# The full 18M single-core run takes ~10 min on this 1-core VM — the
# driver bench uses a 2M tile by default (same per-point cost; the
# 18M number in STATUS.md/docs/performance.md was measured once with
# SPT_BENCH_E2E_POINTS=18000000)
E2E_POINTS = int(os.environ.get('SPT_BENCH_E2E_POINTS', 2_000_000))
REF_TOTAL_STEPS = 4000           # 64k crops >= ref's 40k (docstring 1.)
VAL_SWEEPS = 200                 # 2000 epochs / check_val_every_n_epoch
VAL_VOXEL_POINTS_M = 9.0         # assumed Area_5 voxel count (doc 1b.)
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


def _pallas_bwd_grad_parity(platform, n=4096, k=32, h=16, d=4, c=64,
                            de=32):
    """Max relative error between the Pallas single-pass backward's
    gradients and XLA autodiff of the identical expression, at the
    flagship attention shape ([N=4096, K=32] neighbors, 16 heads x 4
    qk dims, 64 value channels, 32-dim RPE features) in bf16. On a
    TPU backend dense_attention_rpe_trainable routes through
    dense_attention_rpe_bwd_pallas (the kernel under test); on CPU it
    falls back to the XLA vjp and this measures ~0."""
    import jax
    import jax.numpy as jnp
    from superpoint_transformer_tpu.ops.pallas_attention import (
        dense_attention_rpe_trainable, _rpe_xla_reference)

    keys = jax.random.split(jax.random.PRNGKey(42), 12)
    dt = jnp.bfloat16
    q = jax.random.normal(keys[0], (n, h, d), dt)
    kg = jax.random.normal(keys[1], (n, k, h * d), dt)
    vg = jax.random.normal(keys[2], (n, k, c), dt)
    ef = jax.random.normal(keys[3], (n, k, de), dt)
    wk = jax.random.normal(keys[4], (de, h * d), dt) * 0.3
    bk = jax.random.normal(keys[5], (h * d,), dt) * 0.1
    wq = jax.random.normal(keys[6], (de, h * d), dt) * 0.3
    bq = jax.random.normal(keys[7], (h * d,), dt) * 0.1
    wv = jax.random.normal(keys[8], (de, c), dt) * 0.3
    bv = jax.random.normal(keys[9], (c,), dt) * 0.1
    nbr_mask = jax.random.uniform(keys[10], (n, k)) > 0.2
    nbr_mask = nbr_mask.at[:, 0].set(True)  # no empty rows
    scale = jnp.full((n,), 1.0 / np.sqrt(d), jnp.float32)
    w_out = jax.random.normal(keys[11], (n, h, c // h), jnp.float32)

    args = (q, kg, vg, ef, wk, bk, wq, bq, wv, bv)

    def loss_pallas(*a):
        out = dense_attention_rpe_trainable(*a, nbr_mask, scale)
        return jnp.sum(out.astype(jnp.float32) * w_out)

    def loss_xla(*a):
        out = _rpe_xla_reference(*a, nbr_mask, scale)
        return jnp.sum(out.astype(jnp.float32) * w_out)

    argnums = tuple(range(10))
    gp = jax.jit(jax.grad(loss_pallas, argnums))(*args)
    gx = jax.jit(jax.grad(loss_xla, argnums))(*args)
    gp, gx = jax.device_get((gp, gx))
    worst = 0.0
    for a, b in zip(gp, gx):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(float(np.abs(b).max()), 1e-6)
        worst = max(worst, float(np.abs(a - b).max()) / denom)
    assert np.isfinite(worst), 'non-finite Pallas backward gradients'
    # observed: 7.6e-3 on v5e hardware (docs/performance.md), 3.4e-2
    # in interpret mode on CPU — 0.1 catches real breakage (wrong
    # slot masking / LSE rebuild) without tripping on bf16 noise
    assert worst < 1e-1, (
        f'Pallas backward grad parity broke: max rel err {worst:.2e}')
    return worst


def _bench_e2e_inference():
    """End-to-end whole-tile inference (reference headline: 18M raw
    points / 7.8 km2 in 10.1 s on one GPU incl. partition,
    README.md:103): DALES-density synthetic aerial tile -> xy tiles ->
    preprocess (single core HERE; per-tile fan-out across workers in
    production) -> shared-signature whole-tile forwards -> full-res
    recovery. Runs LAST in the bench: its per-tile argmax fetches are
    device reads, which permanently degrade the axon relay's dispatch
    (see TIMING METHODOLOGY)."""
    import dataclasses
    import jax
    from superpoint_transformer_tpu.utils.synthetic import (
        synthetic_aerial_cloud)
    from superpoint_transformer_tpu.inference import e2e_inference
    from superpoint_transformer_tpu.models.semantic import (
        SemanticSegmentationModel)
    from __graft_entry__ import _make_model, _make_batch

    n = E2E_POINTS
    area = n / 50.0  # DALES-like ~50 pts/m^2
    ex = float(np.sqrt(area * 1.5))
    ey = area / ex
    data, _ = synthetic_aerial_cloud(
        seed=0, n_points=n, extent=(ex, ey),
        n_buildings=max(6, int(area // 2500)))
    # the generator fills part budgets with int-floored / min-guarded
    # counts, so the realized size differs slightly from the request —
    # all throughput math below uses the REAL count
    n = int(data.num_nodes)
    model = SemanticSegmentationModel(net=_make_model(num_graphs=1),
                                      num_classes=13)
    variables = jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(0), _make_batch(), train=False)
    # reference DALES preprocessing parameters
    # (configs/datamodule/semantic/dales.yaml:63-80)
    pre = dict(voxel=0.1, knn=25, knn_r=10.0, knn_min_search=10,
               pcp_regularization=(0.1, 0.2, 0.3),
               pcp_spatial_weight=(0.1, 0.01, 0.001),
               pcp_cutoff=(10, 30, 100), graph_gap=(5.0, 30.0, 30.0))
    pred, info = e2e_inference(model, variables, data, pre_cfg=pre,
                               target_tile_points=600_000)
    assert pred.shape[0] == n
    t = info['timings_sec']
    # projection: preprocessing, per-tile transform and batch padding
    # are per-tile parallel (datasets/base.py worker fan-out)
    # -> /assumed_cores; the host->device transfer is excluded (the
    # dev relay moves ~10 MB/s where production PCIe/DMA moves tens
    # of GB/s and overlaps compute — see raw_points_per_sec_ex_transfer)
    proj = ((t['preprocess'] + t['transform'] + t['pad'])
            / ASSUMED_CORES + t['tile'] + t['pin'] + t['forward']
            + t['fetch'] + t['recover'])
    info['projected_raw_points_per_sec_cores'] = round(n / proj, 1)
    # protocol-matched comparison: the reference's 10.1 s headline is
    # inference on PREPROCESSED tiles (its pre_transform cache is
    # built offline into the processed/ dir, datasets/base.py:792 —
    # eval batches load stored NAGs, then still run their on-device
    # test transforms per batch). The equivalent here is
    # transform+pad+transfer+forward+fetch+recover, i.e. stored-NAG ->
    # full-res predictions INCLUDING the per-tile host transform work
    # (a stored-NAG serving path pays it unless those products are
    # also cached); also reported ex-transfer (the dev relay moves
    # ~10 MB/s where production PCIe moves tens of GB/s).
    dev = t['transform'] + t['pad'] + t['transfer'] + t['forward'] \
        + t['fetch'] + t['recover']
    info['from_preprocessed_raw_points_per_sec'] = round(n / dev, 1)
    info['from_preprocessed_raw_points_per_sec_ex_transfer'] = round(
        n / max(dev - t['transfer'], 1e-9), 1)
    # protocol-matched PRODUCTION projection: per-tile transform+pad
    # fan out across ASSUMED_CORES loader workers, transfer rides
    # PCIe (excluded; the relay's ~10 MB/s is dev-only), the chip and
    # the host recover remain serial — the direct analogue of the
    # reference's 10.1 s-on-preprocessed-tiles protocol on a real
    # TPU-VM host (full-size 18M run: docs/performance.md)
    proj_pm = ((t['transform'] + t['pad']) / ASSUMED_CORES
               + t['forward'] + t['fetch'] + t['recover'])
    info['from_preprocessed_projected_16core_pts_per_sec'] = round(
        n / proj_pm, 1)
    return info


def _hb(msg):
    """Child-side heartbeat: one line to stderr at every phase
    boundary. The supervisor counts stderr bytes as liveness, so a
    healthy phase that blocks on device work through the relay with
    ~0 host CPU (long compile, scanned forward, big transfer) is not
    killed as 'stalled' — only a child whose MAIN thread is wedged
    (the futex_wait lost-tunnel signature) goes silent on both
    streams AND burns no CPU."""
    sys.stderr.write(f'[bench] {msg}\n')
    sys.stderr.flush()


def _supervise():
    """Run the real bench in a child process and retry if it stalls.

    The axon relay's tunnel is occasionally lost at claim time: the
    process blocks forever in futex_wait with zero CPU before printing
    anything (observed round 4: 1 of 2 fresh launches). A fresh
    process claims the chip fine, so the driver-facing entry runs the
    bench as a supervised child: if the child produces no NEW output
    on stdout OR stderr (phase heartbeats, see _hb) for STALL_SEC and
    burned no CPU over the window, kill it and start another (max 3
    attempts). The child's stdout (the one JSON line) is streamed
    through at the end; stderr is forwarded live."""
    import subprocess

    def _cpu_sec(pid):
        try:
            with open(f'/proc/{pid}/stat', 'rb') as f:
                parts = f.read().split(b')')[-1].split()
            # utime+stime are fields 14/15 of stat = 11/12 after ')'
            return (int(parts[11]) + int(parts[12])) \
                / os.sysconf('SC_CLK_TCK')
        except OSError:
            return None

    STALL_SEC = 600.0    # no heartbeat AND no CPU for 10 min = wedged
    MIN_CPU_DELTA = 1.0  # sec of CPU over the window counts as alive
    env = dict(os.environ, SPT_BENCH_CHILD='1')
    for attempt in range(3):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        os.set_blocking(proc.stdout.fileno(), False)
        os.set_blocking(proc.stderr.fileno(), False)
        buf = b''
        stalled = False
        t_mark = time.monotonic()
        cpu_mark = _cpu_sec(proc.pid) or 0.0

        def _pump():
            """Drain both pipes; returns True if anything arrived."""
            nonlocal buf
            got = False
            chunk = proc.stdout.read()
            if chunk:
                buf += chunk
                got = True
            err = proc.stderr.read()
            if err:
                sys.stderr.buffer.write(err)
                sys.stderr.flush()
                got = True
            return got

        while True:
            rc = proc.poll()
            if _pump():
                t_mark = time.monotonic()
                cpu_mark = _cpu_sec(proc.pid) or cpu_mark
            if rc is not None:
                break
            now = time.monotonic()
            if now - t_mark > STALL_SEC:
                cpu = _cpu_sec(proc.pid)
                if cpu is not None and cpu - cpu_mark >= MIN_CPU_DELTA:
                    t_mark, cpu_mark = now, cpu  # alive: rearm window
                else:
                    stalled = True
                    proc.terminate()
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                    break
            time.sleep(2.0)
        _pump()
        if not stalled and rc == 0:
            sys.stdout.buffer.write(buf)
            sys.stdout.flush()
            return 0
        sys.stderr.write(
            f'bench supervisor: attempt {attempt + 1} '
            f'{"stalled" if stalled else f"failed rc={rc}"}; '
            'retrying with a fresh process\n')
    return 1


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
    _hb('preprocessing bench')
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
    _hb('device transfer + drain')
    import jax.numpy as jnp
    from functools import partial

    train_batch = jax.device_put(train_batch)
    eval_batch = jax.device_put(eval_batch)
    eval_batch2 = jax.device_put(eval_batch2)

    # DRAIN BARRIER: device_put returns before the relay transfer
    # drains; a transfer still in flight during a timed section
    # inflates it arbitrarily (r3's driver run measured the 20 ms
    # forward at 367 ms this way). One scalar depending on every leaf
    # forces all three transfers complete — it is also the process's
    # first device read, absorbing the relay's one-time stall exactly
    # where the methodology wants it (before any timed call).
    @jax.jit
    def _drain(*trees):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(trees):
            tot = tot + leaf.reshape(-1)[0].astype(jnp.float32)
        return tot
    float(_drain(train_batch, eval_batch, eval_batch2))

    def _leaf_sum(tree):
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                tot = tot + leaf.sum().astype(jnp.float32)
        return tot

    # ---- train-step timing -------------------------------------------
    _hb('train-step timing')
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
    _hb('forward timing + FLOPs')
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

    # ---- Pallas-backward grad parity on hardware (flagship shape) ----
    # Driver-visible artifact (VERDICT r2 item 10): gradients of the
    # fused-RPE Pallas kernel's single-pass backward
    # (ops/pallas_attention.py dense_attention_rpe_bwd_pallas) vs XLA
    # autodiff of the mathematically-identical expression, at the
    # flagship attention shape, in the flagship compute dtype (bf16).
    _hb('pallas backward grad parity')
    pallas_bwd_max_rel_err = _pallas_bwd_grad_parity(platform)

    # ---- end-to-end whole-tile inference (runs last: device reads) ---
    _hb('e2e inference')
    e2e = _bench_e2e_inference()
    _hb('projection + report')

    # ---- north-star projection ----------------------------------------
    preproc_hours = (S3DIS_RAW_POINTS_M * preproc_sec_per_1m
                     / ASSUMED_CORES) / 3600.0
    # device step and host batch prep overlap (PreparedDataLoader
    # workers); per-step wall = max(device, host/workers)
    step_wall = max(step_sec, bprep_sec / ASSUMED_CORES)
    train_hours = REF_TOTAL_STEPS * step_wall / 3600.0
    # 200 whole-tile validation sweeps at the measured inference
    # throughput (docstring 1b.)
    val_hours = (VAL_SWEEPS * VAL_VOXEL_POINTS_M * 1e6
                 / (n_points_fwd / fwd_sec)) / 3600.0
    e2e_hours = preproc_hours + train_hours + val_hours

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
            'projected_val_hours': round(val_hours, 4),
            'val_sweeps': VAL_SWEEPS,
            'pallas_bwd_max_rel_err': (
                round(pallas_bwd_max_rel_err, 6)),
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
            # end-to-end raw-cloud inference (VERDICT r2 item 4;
            # reference headline 1.78M raw pts/s incl. partition)
            'e2e_inference_raw_points_per_sec': (
                e2e['raw_points_per_sec']),
            'e2e_inference_raw_points_per_sec_ex_transfer': (
                e2e['raw_points_per_sec_ex_transfer']),
            'e2e_inference_points': e2e['n_raw_points'],
            'e2e_inference_sec': e2e['e2e_sec'],
            'e2e_inference_timings_sec': e2e['timings_sec'],
            'e2e_inference_n_voxels': e2e['n_voxels'],
            'e2e_inference_n_tiles': e2e['n_tiles'],
            'e2e_projected_raw_points_per_sec_16core': (
                e2e['projected_raw_points_per_sec_cores']),
            # protocol-matched to the reference headline (inference on
            # preprocessed tiles; see _bench_e2e_inference)
            'inference_from_preprocessed_raw_pts_per_sec': (
                e2e['from_preprocessed_raw_points_per_sec']),
            'inference_from_preprocessed_ex_transfer': (
                e2e['from_preprocessed_raw_points_per_sec_ex_transfer']),
            'inference_from_preprocessed_projected_16core': (
                e2e['from_preprocessed_projected_16core_pts_per_sec']),
            'train_params_finite': True,
        },
    }))


if __name__ == '__main__':
    if os.environ.get('SPT_BENCH_CHILD') == '1':
        main()
    else:
        sys.exit(_supervise())
