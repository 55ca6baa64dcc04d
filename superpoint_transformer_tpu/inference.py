"""Whole-cloud end-to-end inference: raw points -> tiles -> preprocess
-> SPT forward -> full-resolution predictions.

This is the reference's production inference path (SuperCluster
headline: 7.8 km2 / 18M points in 10.1 s on one GPU *including* the
partition, /root/reference/README.md:103; mechanics: whole-tile test
batches /root/reference/src/datamodules/base.py:340 + full-res
recovery src/utils/output_semantic.py:139). TPU-native layout: tiles
are preprocessed on host cores (embarrassingly parallel), padded to a
SHARED pow2-bucketed signature so every tile reuses ONE compiled
program, and the forward runs whole-tile on the chip.
"""
import dataclasses
import time

import numpy as np

__all__ = ['tile_cloud', 'infer_nag', 'infer_nags_stacked',
           'e2e_inference', 'strip_for_inference',
           'level1_node_id', 'to_nag_order', 'EVAL_BATCH_OVERRIDES']

# whole-tile evaluation: no cropping/subsampling, no augmentation
EVAL_BATCH_OVERRIDES = dict(sample_graph_r=-1, sample_segment_ratio=0,
                            rgb_autocontrast=0, rgb_drop=0)


def tile_cloud(data, tiling):
    """Split a raw cloud into (tx, ty) xy tiles (reference
    SampleXYTiling, src/transforms/sampling.py:471 — the mechanism the
    reference datasets use for huge clouds, datasets/base.py:823-828).
    Returns a list of (Data tile, raw-row indices) pairs; one pass over
    the cloud assigns tiles (not T re-scans)."""
    pos = np.asarray(data.pos)[:, :2].astype(np.float64)
    tx, ty = ((int(tiling), int(tiling)) if np.isscalar(tiling)
              else (int(tiling[0]), int(tiling[1])))
    lo, hi = pos.min(0), pos.max(0)
    span = np.maximum(hi - lo, 1e-9)
    ix = np.clip(((pos[:, 0] - lo[0]) / span[0] * tx).astype(int),
                 0, tx - 1)
    iy = np.clip(((pos[:, 1] - lo[1]) / span[1] * ty).astype(int),
                 0, ty - 1)
    tid = ix * ty + iy
    order = np.argsort(tid, kind='stable')
    bounds = np.searchsorted(tid[order], np.arange(tx * ty + 1))
    tiles = []
    for k in range(tx * ty):
        idx = order[bounds[k]:bounds[k + 1]]
        if idx.shape[0] == 0:
            continue
        tile, _ = data.select(idx)
        tiles.append((tile, idx))
    return tiles


def strip_for_inference(batch, compute_dtype=None):
    """Cut the host->device bytes of an inference batch: drop `y`
    (loss/metrics-only — the model forward never reads it), drop the
    transpose neighbor tables `nbr_in_idx`/`nbr_in_mask` (they turn
    the attention gather's BACKWARD scatter into a gather —
    nn/attention.py consults them only when train=True, so an
    inference forward never reads them), and cast the heavy float
    features (x, edge_feat, v_edge_attr) to the model's compute
    dtype. Bit-identical when the model computes in bf16: every first
    consumer casts these inputs to bf16 anyway (nn/mlp.py,
    nn/attention.py), so the rounding just happens on the host
    instead of the chip. Positions, node sizes and norms stay
    fp32."""
    import dataclasses as dc
    dt = None
    if compute_dtype in ('bf16', 'bfloat16'):
        import jax.numpy as jnp
        dt = jnp.bfloat16
    levels = []
    for lvl in batch.levels:
        # node_id is host-side metadata (batch-row -> NAG-row map);
        # callers read it from the HOST batch before stripping —
        # shipping [N] int32 per level through a ~10 MB/s dev relay
        # buys nothing on device
        kw = {'y': None, 'nbr_in_idx': None, 'nbr_in_mask': None,
              'node_id': None}
        if lvl.batch is not None and batch.num_graphs <= 127:
            # graph ids are tiny ints (-1 padding, < num_graphs);
            # int8 transfers a quarter of the bytes and jnp comparisons
            # / one-hots consume it unchanged. Guarded: ids > 127
            # would silently wrap (the same trap the scanned argmax
            # avoids by staying int32)
            kw['batch'] = np.asarray(lvl.batch).astype(np.int8)
        if dt is not None:
            for f in ('x', 'edge_feat', 'v_edge_attr'):
                v = getattr(lvl, f)
                if v is not None:
                    kw[f] = np.asarray(v).astype(dt)
        levels.append(lvl.replace(**kw))
    return dc.replace(batch, levels=tuple(levels))


def _sync_probe(batch):
    """Force a device_put to complete through the relay: fetch one
    scalar that depends on every leaf (device_put returns before the
    transfer drains; without this the remaining transfer time lands in
    whatever device call runs next)."""
    import jax
    import jax.numpy as jnp
    if 'sync' not in _JIT_CACHE:
        def probe(b):
            tot = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(b):
                tot = tot + leaf.reshape(-1)[0].astype(jnp.float32)
            return tot
        _JIT_CACHE['sync'] = jax.jit(probe)
    float(_JIT_CACHE['sync'](batch))


def level1_node_id(batch, n1):
    """Pre-sort row of each batch-order level-1 node (pad_nag sorts
    levels by parent; node_id maps batch rows back to the input NAG's
    order). Identity when the NAG was already sorted."""
    lvl1 = batch.levels[1 - batch.start_i_level]
    if lvl1.node_id is None:
        return np.arange(n1)
    return np.asarray(lvl1.node_id)[:n1]


def to_nag_order(row_batch, nid):
    """Scatter batch-order rows back to NAG order
    (out[nid[r]] = row_batch[r]); rows may be 1D or 2D."""
    out = np.empty_like(row_batch)
    out[nid] = row_batch
    return out


def infer_nag(model, variables, nag, cfg, fetch='argmax', timings=None):
    """Whole-tile forward on a preprocessed NAG: returns the level-1
    prediction (host numpy, aligned with `nag[1]` rows). `cfg` should
    carry pinned node_caps/k_caps so repeated tiles share one compiled
    program. When `timings` (a dict) is given, the host batch-padding
    seconds accumulate under 'pad' (feature build + static-capacity
    padding — per-tile parallel across loader workers in production)
    and the host->device transfer seconds under 'transfer' (through
    the dev relay the transfer is ~10 MB/s and must be reported
    separately from compute)."""
    import jax
    from .transforms import prepare_batch
    t0 = time.perf_counter()
    batch = prepare_batch([nag], cfg, train=False, device=False)
    n1 = int(nag[1].num_nodes)
    nid = level1_node_id(batch, n1)  # BEFORE strip (strip drops it)
    batch = strip_for_inference(
        batch, getattr(getattr(model, 'net', None), 'compute_dtype',
                       None))
    if timings is not None:
        timings['pad'] = (timings.get('pad', 0.0)
                          + time.perf_counter() - t0)
    t0 = time.perf_counter()
    batch = jax.device_put(batch)
    if timings is not None:
        _sync_probe(batch)
        timings['transfer'] = (timings.get('transfer', 0.0)
                               + time.perf_counter() - t0)
    logits = _jit_forward(model)(variables, batch)
    if fetch == 'device':
        # leave the [cap1] argmax ON DEVICE (batch order!); the caller
        # fetches all tiles in one device_get and maps rows back via
        # the returned node_id (each read through the degraded relay
        # costs ~seconds, so per-tile fetches dominate e2e)
        return _jit_argmax(model)(logits), n1, nid
    if fetch == 'argmax':
        # fetch only the [N1] argmax (smallest possible device read)
        pred = np.asarray(jax.device_get(
            _jit_argmax(model)(logits)))[:n1]
        return to_nag_order(pred, nid)
    return to_nag_order(
        np.asarray(jax.device_get(logits[0]))[:n1], nid)


_JIT_CACHE = {}


def _jit_forward(model):
    import jax
    key = (id(model), 'fwd')
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            lambda v, b: model.apply(v, b, train=False))
    return _JIT_CACHE[key]


def _jit_argmax(model):
    import jax
    import jax.numpy as jnp
    key = (id(model), 'argmax')
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            lambda logits: jnp.argmax(logits[0], -1).astype(jnp.int32))
    return _JIT_CACHE[key]


def _jit_scan_forward(model):
    """ONE jitted computation running the model over a stack of
    same-signature tile batches via `lax.scan`: one dispatch, one
    executable, one device read for the whole cloud. Per-tile jit
    calls pay the runtime's per-dispatch cost T times (and a shape
    drift — e.g. an unpinned K_in — pays T compiles); the scan pays
    both once. Returns ([T, cap1] int32 argmax preds, sync scalar)."""
    import jax
    import jax.numpy as jnp
    key = (id(model), 'scan_fwd')
    if key not in _JIT_CACHE:
        def run(v, stacked):
            def body(carry, b):
                logits = model.apply(v, b, train=False)
                # int32, not int8: a model with >127 classes would
                # silently wrap (infer_nag uses int32 for the same
                # value); the [T, cap1] fetch-size difference is noise
                pred = jnp.argmax(logits[0], -1).astype(jnp.int32)
                return carry, pred
            _, preds = jax.lax.scan(body, jnp.int32(0), stacked)
            sync = jnp.sum(preds.astype(jnp.int32)).astype(jnp.float32)
            return preds, sync
        _JIT_CACHE[key] = jax.jit(run)
    return _JIT_CACHE[key]


def stack_batches(batches):
    """Stack same-signature PaddedNAG batches along a new leading tile
    axis (host-side numpy; shapes must match exactly — pin node_caps /
    k_caps / k_in_caps first)."""
    import jax
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def infer_nags_stacked(model, variables, nags, cfg, timings=None,
                       warmup=False, processed=None,
                       max_tiles_per_program=8):
    """Whole-cloud forward over preprocessed tiles in ONE device
    program per chunk: host-pad each tile to the shared signature,
    stack, one device_put, one scanned forward, one device read.

    `processed` optionally carries the tiles' transform-complete
    batched NAGs (from `process_batch`) so tiles that were already
    transformed — e.g. to read their padded signature — are only
    padded here, not re-transformed.

    Clouds larger than `max_tiles_per_program` tiles run in fixed-size
    chunks (the last chunk repeats its final tile to fill) so device
    memory stays bounded and EVERY chunk reuses the one compiled
    [chunk, ...] scan program.

    Returns a list of per-tile [N1] int argmax predictions (host),
    each aligned with its input `nag[1]` row order (batch-order rows
    are mapped back through the level's node_id).
    When `timings` is a dict, accumulates 'pad', 'transfer',
    'forward', 'fetch' (and 'warmup_compile' if warmup=True) seconds.
    """
    import jax
    import jax.numpy as jnp
    from .transforms import prepare_batch
    from .data.pad import pad_nag

    t = timings if timings is not None else {}

    t0 = time.perf_counter()
    dt = getattr(getattr(model, 'net', None), 'compute_dtype', None)
    batches, nids = [], []
    for ti, nag in enumerate(nags):
        if processed is not None:
            b = pad_nag(processed[ti], num_classes=cfg.num_classes,
                        node_caps=cfg.node_caps, k_caps=cfg.k_caps,
                        k_in_caps=cfg.k_in_caps,
                        bucket_mode=cfg.bucket_mode, device=False,
                        with_transpose=False)
        else:
            b = prepare_batch([nag], cfg, train=False, device=False)
        # batch-row -> NAG-row map, read BEFORE strip (strip drops
        # node_id from the transferred pytree)
        nids.append(level1_node_id(b, int(nag[1].num_nodes)))
        batches.append(strip_for_inference(b, dt))
    T = len(batches)
    chunk = max(1, min(max_tiles_per_program, T))
    groups = []
    for c0 in range(0, T, chunk):
        g = batches[c0:c0 + chunk]
        g = g + [g[-1]] * (chunk - len(g))  # fill: one signature
        groups.append(stack_batches(g))
    del batches
    t['pad'] = t.get('pad', 0.0) + time.perf_counter() - t0

    run = _jit_scan_forward(model)
    out_chunks = []
    for gi, stacked in enumerate(groups):
        t0 = time.perf_counter()
        stacked = jax.device_put(stacked)
        _sync_probe(stacked)
        t['transfer'] = (t.get('transfer', 0.0)
                         + time.perf_counter() - t0)

        if warmup and gi == 0:
            # Compile + first execution outside the clock (disk-cached
            # across runs; steady-state serving never pays it). The
            # warmup runs the REAL variables — its predictions are the
            # ones returned for this chunk. The timed call below runs
            # a perturbed COPY of the variables purely as a timing
            # probe (bit-identical args could be served from the
            # relay's call cache), and its output is discarded, so the
            # product predictions always come from unperturbed
            # weights.
            t0 = time.perf_counter()
            preds_real, sync_w = run(variables, stacked)
            float(sync_w)
            t['warmup_compile'] = (t.get('warmup_compile', 0.0)
                                   + time.perf_counter() - t0)
            if 'perturb' not in _JIT_CACHE:
                # multiplicative so the change survives fp32 rounding
                _JIT_CACHE['perturb'] = jax.jit(
                    lambda v: jax.tree_util.tree_map(
                        lambda a: a * jnp.asarray(1.0 + 1e-6, a.dtype)
                        if jnp.issubdtype(a.dtype, jnp.floating)
                        else a, v))
            probe_vars = _JIT_CACHE['perturb'](variables)

            t0 = time.perf_counter()
            _, sync = run(probe_vars, stacked)
            float(sync)  # the one true device sync for the probe
            t['forward'] = (t.get('forward', 0.0)
                            + time.perf_counter() - t0)
            preds = preds_real
            del probe_vars
        else:
            # fresh inputs: the relay call cache cannot serve these
            t0 = time.perf_counter()
            preds, sync = run(variables, stacked)
            float(sync)  # the one true device sync per chunk
            t['forward'] = (t.get('forward', 0.0)
                            + time.perf_counter() - t0)

        t0 = time.perf_counter()
        out_chunks.append(np.asarray(jax.device_get(preds)))
        t['fetch'] = t.get('fetch', 0.0) + time.perf_counter() - t0
        del stacked

    fetched = np.concatenate(out_chunks)[:T]  # [T, cap1] int32
    return [to_nag_order(
        fetched[i, :int(nag[1].num_nodes)].astype(np.int32), nids[i])
        for i, nag in enumerate(nags)]


def e2e_inference(model, variables, data, pre_cfg=None, batch_cfg=None,
                  tiling=None, target_tile_points=1_500_000,
                  warmup=True, verbose=False):
    """Raw cloud -> full-resolution semantic predictions, end to end.

    Phases (all timed; `timings` reports each):
      tile        xy split of the raw cloud
      preprocess  per-tile pre_transform chain (voxelize..graph);
                  single-core here — per-tile fan-out across workers
                  in production (datasets/base.py num_workers)
      transform   per-tile process_batch (feature build, graph to
                  dense tables); per-tile parallel in production
      pin         shared pow2 padding signature across tiles
      forward     per tile: pad -> device -> SPT -> [N1] argmax fetch
      recover     level-1 pred -> voxel -> raw points (super_index +
                  level-0 `sub` Cluster gathers)

    XLA compile of the shared signature is excluded via one warmup
    forward (one-time, disk-cached across runs — torch eager has no
    analogue; excluding it matches steady-state production serving).

    Returns (full_res_pred [n_raw], info dict).
    """
    from .transforms import BatchConfig
    from .transforms.prepare import batch_signature, process_batch
    from .transforms.preprocess import preprocess_cloud

    pre_cfg = dict(pre_cfg or {})
    batch_cfg = batch_cfg or BatchConfig()
    n_raw = int(data.num_nodes)
    if tiling is None:
        side = max(1, int(round(np.sqrt(n_raw / target_tile_points))))
        tiling = (side, side)

    info = {'n_raw_points': n_raw, 'tiling': tuple(tiling)}
    t = {}

    t0 = time.perf_counter()
    tiles = tile_cloud(data, tiling)
    t['tile'] = time.perf_counter() - t0
    info['n_tiles'] = len(tiles)

    t0 = time.perf_counter()
    nags = [preprocess_cloud(tile, **pre_cfg) for tile, _ in tiles]
    t['preprocess'] = time.perf_counter() - t0
    info['n_voxels'] = int(sum(n[0].num_nodes for n in nags))

    # Per-tile transform (process_batch: feature build, graph-to-dense
    # conversion) — its own timing bucket because a stored-NAG serving
    # path still pays it per tile unless those products are also
    # cached; lumping it into 'pin' would hide it from the
    # protocol-matched from-preprocessed rate (it is per-tile parallel
    # across workers in production, like 'preprocess').
    t0 = time.perf_counter()
    cfg = dataclasses.replace(batch_cfg, **EVAL_BATCH_OVERRIDES)
    bigs = [process_batch([nag], cfg, train=False) for nag in nags]
    t['transform'] = time.perf_counter() - t0

    # one shared padded signature across all tiles: node capacities,
    # neighbor K, AND the transpose-table K_in (data-dependent max
    # in-degree — without the pin each tile can land on a different
    # K_in and force a fresh XLA compile per tile). The signature is
    # three bincounts per tile (batch_signature), not a throwaway
    # padding.
    t0 = time.perf_counter()
    node_caps, k_caps, k_in_caps = {}, {}, {}
    for big in bigs:
        nc, kc, kic = batch_signature(big, cfg)
        for li, v in nc.items():
            node_caps[li] = max(node_caps.get(li, 0), v)
        for li, v in kc.items():
            k_caps[li] = max(k_caps.get(li, 0), v)
        for li, v in kic.items():
            k_in_caps[li] = max(k_in_caps.get(li, 0), v)
    cfg = dataclasses.replace(cfg, node_caps=node_caps,
                              k_caps=k_caps or None,
                              k_in_caps=k_in_caps or None)
    t['pin'] = time.perf_counter() - t0

    # all tiles in ONE device program (pad+stack, one transfer, one
    # scanned forward, one [T, cap1] fetch) — per-tile dispatch through
    # a runtime pays its per-call cost T times
    preds1 = infer_nags_stacked(model, variables, nags, cfg,
                                timings=t, warmup=warmup,
                                processed=bigs)

    t0 = time.perf_counter()
    out = np.empty(n_raw, dtype=np.int32)
    for (tile, raw_idx), nag, p1 in zip(tiles, nags, preds1):
        # level-1 pred -> voxels -> the tile's raw points (reference
        # output_semantic.py:139 full_res_semantic_pred) -> raw rows
        voxel_pred = p1[np.asarray(nag[0].super_index)]
        sub = nag[0].sub
        full = np.empty(sub.num_items, dtype=np.int32)
        full[np.asarray(sub.points)] = np.repeat(
            voxel_pred, np.asarray(sub.sizes))
        out[raw_idx] = full
    t['recover'] = time.perf_counter() - t0

    timed = sum(v for k, v in t.items() if k != 'warmup_compile')
    info['timings_sec'] = {k: round(v, 3) for k, v in t.items()}
    info['e2e_sec'] = round(timed, 3)
    info['raw_points_per_sec'] = round(n_raw / timed, 1)
    # the dev relay transfers host->device at ~10 MB/s (vs tens of
    # GB/s for a production PCIe/DMA path) — report the rate with the
    # transfer excluded so the device+host pipeline is visible
    info['raw_points_per_sec_ex_transfer'] = round(
        n_raw / max(timed - t['transfer'], 1e-9), 1)
    if verbose:
        print(info, flush=True)
    return out, info
