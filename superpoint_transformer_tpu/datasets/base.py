"""BaseDataset: stage handling, hash-addressed preprocessing cache,
per-cloud processing and partial loading (re-design of reference
src/datasets/base.py:44).

Directory layout (reference-compatible):
  <root>/raw/...                      raw dataset files
  <root>/processed/<stage>/<hash>/<cloud_id>.h5   preprocessed NAGs

The `<hash>` is the md5 of the preprocessing config repr — changing
any preprocessing parameter re-processes into a fresh directory
(reference pre_transform_hash, src/datasets/base.py:631).
Preprocessing is embarrassingly parallel per cloud; on multi-host
setups each host handles `cloud_ids[host_id::num_hosts]`.
"""
import hashlib
import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from ..data.nag import NAG
from ..transforms.preprocess import preprocess_cloud

__all__ = ['BaseDataset']


def _preprocess_worker_init():
    """Keep preprocessing workers off any accelerator: the per-cloud
    pipeline is the host numpy/C++ path, and N workers must never race
    for the (single) TPU chip. One OpenMP thread per worker — the
    per-cloud fan-out is the outer parallelism (the native KNN uses
    OpenMP when running single-process)."""
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('PALLAS_AXON_POOL_IPS', None)
    os.environ.setdefault('OMP_NUM_THREADS', '1')


class BaseDataset:
    """Subclasses must define:
      - `class_names` (list, incl. trailing 'ignored')
      - `num_classes` (int, excluding the ignored class)
      - `all_cloud_ids` -> {'train': [...], 'val': [...], 'test': [...]}
      - `read_single_raw_cloud(raw_path) -> Data`
      - `id_to_relative_raw_path(cloud_id) -> str`
    Optional: `stuff_classes`, `val_mixed_in_train`,
    `test_mixed_in_val`.
    """
    class_names: List[str] = []
    num_classes: int = 0
    stuff_classes: List[int] = []
    val_mixed_in_train = False
    test_mixed_in_val = False
    # tiling of huge clouds at preprocessing (reference xy_tiling /
    # pc_tiling, src/datasets/base.py:147-167): either an (nx, ny) XY
    # grid or `pc_tiling` recursive principal-axis halvings per cloud
    xy_tiling: Optional[tuple] = None
    pc_tiling: Optional[int] = None

    def __init__(self, root, stage='train', pre_transform_config=None,
                 point_load_keys=None, segment_load_keys=None,
                 nano=False, in_memory=False, host_id=0, num_hosts=1,
                 num_workers=1, xy_tiling=None, pc_tiling=None,
                 verbose=False):
        assert stage in ('train', 'val', 'trainval', 'test')
        self.root = root
        self.stage = stage
        self.pre_transform_config = dict(pre_transform_config or {})
        self.point_load_keys = point_load_keys
        self.segment_load_keys = segment_load_keys
        self.nano = nano
        self.in_memory = in_memory
        self.host_id = host_id
        self.num_hosts = num_hosts
        # worker processes for `process()` (per-cloud fan-out on this
        # host; <=0 means one per CPU core)
        self.num_workers = (num_workers if num_workers > 0
                            else (os.cpu_count() or 1))
        # per-instance tiling overrides of the class defaults
        if xy_tiling is not None:
            self.xy_tiling = xy_tiling
        if pc_tiling is not None:
            self.pc_tiling = pc_tiling
        self.verbose = verbose
        self._cache = {}

    # ----- to be overridden -------------------------------------------
    @property
    def all_cloud_ids(self) -> Dict[str, List[str]]:
        raise NotImplementedError

    def read_single_raw_cloud(self, raw_path):
        raise NotImplementedError

    def id_to_relative_raw_path(self, cloud_id):
        return cloud_id + '.ply'

    # ----- paths --------------------------------------------------------
    @property
    def raw_dir(self):
        return osp.join(self.root, 'raw')

    @property
    def processed_dir(self):
        return osp.join(self.root, 'processed')

    @property
    def pre_transform_hash(self):
        cfg = repr(sorted(self.pre_transform_config.items()))
        return hashlib.md5(cfg.encode()).hexdigest()

    @property
    def cloud_ids(self):
        if self.stage == 'trainval':
            ids = (self.all_cloud_ids['train']
                   + self.all_cloud_ids['val'])
        elif self.stage == 'val' and self.val_mixed_in_train:
            ids = self.all_cloud_ids['val']
        else:
            ids = self.all_cloud_ids[self.stage]
        return [t for c in ids for t in self._tiles_of(c)]

    def _tiles_of(self, cloud_id):
        if self.xy_tiling is not None:
            tx, ty = self.xy_tiling if not np.isscalar(self.xy_tiling) \
                else (self.xy_tiling, self.xy_tiling)
            return [f'{cloud_id}__TILE_{i}-{j}'
                    for i in range(tx) for j in range(ty)]
        if self.pc_tiling:
            return [f'{cloud_id}__PCTILE_{t}'
                    for t in range(1 << self.pc_tiling)]
        return [cloud_id]

    @staticmethod
    def _split_tile_id(cloud_id):
        """-> (raw_cloud_id, tile_spec or None)."""
        if '__TILE_' in cloud_id:
            base, tile = cloud_id.split('__TILE_')
            i, j = tile.split('-')
            return base, ('xy', int(i), int(j))
        if '__PCTILE_' in cloud_id:
            base, t = cloud_id.split('__PCTILE_')
            return base, ('pc', int(t))
        return cloud_id, None

    def _stage_of(self, cloud_id):
        cloud_id, _ = self._split_tile_id(cloud_id)
        for s in ('train', 'val', 'test'):
            if cloud_id in self.all_cloud_ids[s]:
                if s == 'val' and self.val_mixed_in_train:
                    return 'train'
                if s == 'test' and self.test_mixed_in_val:
                    return 'val'
                return s
        return self.stage

    def processed_path(self, cloud_id):
        return osp.join(self.processed_dir, self._stage_of(cloud_id),
                        self.pre_transform_hash, f'{cloud_id}.h5')

    @property
    def processed_paths(self):
        return [self.processed_path(c) for c in self.cloud_ids]

    # ----- processing ---------------------------------------------------
    # Subclasses may set a download hint (the reference ships gdown
    # helpers per dataset, e.g. src/datasets/s3dis.py:479; production
    # TPU pods have no general egress, so the base behavior is a
    # guided error rather than a silent network attempt)
    download_instructions: str = None

    def download(self):
        """Fetch the raw dataset. The default implementation explains
        where to place the data (mirrors the reference's per-dataset
        download helpers without assuming network egress); subclasses
        with downloadable sources can override."""
        msg = self.download_instructions or (
            f'{type(self).__name__}: raw data not found under '
            f'{self.raw_dir}. Download the dataset (see the dataset '
            f"class docstring) and extract it so that "
            f"`id_to_relative_raw_path(cloud_id)` resolves.")
        raise RuntimeError(msg)

    def process(self):
        """Preprocess any missing cloud. Skips per-cloud if the .h5
        already exists (resumable, reference base.py:798). Each host
        processes its shard of the cloud list; within a host,
        `num_workers > 1` fans the per-cloud loop out over spawned
        worker processes (preprocessing is the host numpy/C++ path —
        the reference's DataLoader-workers analogue for its
        embarrassingly parallel per-cloud loop, base.py:788)."""
        todo = [c for c in self.cloud_ids
                if not osp.exists(self.processed_path(c))]
        todo = todo[self.host_id::self.num_hosts]
        if not todo:
            return
        # raw data must exist for the missing clouds; guide the user
        # to the download path otherwise (reference BaseDataset calls
        # `download()` from `_process`, src/datasets/base.py:686)
        first_raw = osp.join(
            self.raw_dir, self.id_to_relative_raw_path(
                self._split_tile_id(todo[0])[0]))
        if not osp.exists(first_raw) and not osp.exists(self.raw_dir):
            self.download()
        n_workers = min(self.num_workers, len(todo))
        if n_workers > 1:
            import multiprocessing as mp
            ctx = mp.get_context('spawn')
            with ctx.Pool(n_workers,
                          initializer=_preprocess_worker_init) as pool:
                pool.map(self._process_single_cloud, todo, chunksize=1)
        else:
            for cloud_id in todo:
                self._process_single_cloud(cloud_id)

    def _process_single_cloud(self, cloud_id):
        path = self.processed_path(cloud_id)
        if osp.exists(path):
            return
        os.makedirs(osp.dirname(path), exist_ok=True)
        raw_id, tile = self._split_tile_id(cloud_id)
        raw_path = osp.join(self.raw_dir,
                            self.id_to_relative_raw_path(raw_id))
        data = self.read_single_raw_cloud(raw_path)
        if tile is not None:
            from ..transforms.preprocess import (
                sample_xy_tiling, sample_recursive_main_xy_axis_tiling)
            if tile[0] == 'xy':
                data = sample_xy_tiling(
                    data, tiling=self.xy_tiling,
                    tile=(tile[1], tile[2]))
            else:
                data = sample_recursive_main_xy_axis_tiling(
                    data, steps=self.pc_tiling, tile=tile[1])
        if self.verbose:
            print(f'preprocessing {cloud_id}: {data.num_nodes} points')
        nag = preprocess_cloud(
            data, num_classes=self.num_classes,
            **self.pre_transform_config)
        nag.save(path, pos_dtype=np.float32, fp_dtype=np.float16)

    # ----- loading ------------------------------------------------------
    def __len__(self):
        return len(self.cloud_ids)

    def __getitem__(self, idx):
        cloud_id = self.cloud_ids[idx]
        if self.in_memory and cloud_id in self._cache:
            return self._cache[cloud_id]
        nag = NAG.load(
            self.processed_path(cloud_id),
            low=1 if self.nano else 0,
            keys_low=self.point_load_keys,
            keys=self.segment_load_keys,
            non_fp_to_long=True, rgb_to_float=True)
        if self.in_memory:
            self._cache[cloud_id] = nag
        return nag

    def get_class_weight(self, smooth='sqrt'):
        """Per-class loss weights from the train label counts
        (reference get_class_weight, src/datasets/base.py:1015)."""
        counts = np.zeros(self.num_classes, dtype=np.float64)
        for i in range(len(self)):
            nag = self[i]
            y = nag[1].y
            if y is None:
                continue
            counts += np.asarray(y)[:, :self.num_classes].sum(0)
        counts = np.maximum(counts, 1)
        if smooth == 'sqrt':
            counts = np.sqrt(counts)
        elif smooth == 'log':
            counts = np.log(counts + 1)
        w = 1.0 / counts
        return (w / w.sum() * self.num_classes).astype(np.float32)


class DataLoader:
    """Identity-collate loader yielding lists of NAGs (reference
    src/loader/dataloader.py:16 — batching is deferred to device-side
    `NAGBatch`; here to `prepare_batch`).

    `prefetch > 0` loads upcoming batches on a background thread so
    HDF5 reads overlap device compute (the role of the reference's
    DataLoader worker processes; h5py releases the GIL during reads).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 drop_last=False, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_last and idx.shape[0] < self.batch_size:
                break
            yield idx

    def __iter__(self):
        if self.prefetch <= 0:
            for idx in self._batches():
                yield [self.dataset[int(j)] for j in idx]
            return
        import queue
        import threading
        q = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def worker():
            try:
                for idx in self._batches():
                    q.put([self.dataset[int(j)] for j in idx])
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item


def _prepared_worker(dataset, batch_cfg, train, task_q, result_q):
    """Worker-process loop: load the NAGs of a batch and run the full
    host batch-prep to a numpy-leaf PaddedNAG. Runs with JAX pinned to
    CPU so workers never race for an accelerator."""
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('PALLAS_AXON_POOL_IPS', None)
    os.environ.setdefault('OMP_NUM_THREADS', '1')
    from ..transforms.prepare import prepare_batch
    while True:
        item = task_q.get()
        if item is None:
            break
        gen, bid, idx, seed = item
        nags = [dataset[int(j)] for j in idx]
        rng = np.random.default_rng(seed)
        out = prepare_batch(nags, batch_cfg, train=train, rng=rng,
                            device=False)
        result_q.put((gen, bid, out))


class PreparedDataLoader(DataLoader):
    """DataLoader that also runs `prepare_batch`, in worker PROCESSES
    when `num_workers > 0`, yielding device-ready `PaddedNAG` batches.

    This is the training-input runtime: the reference hides batch prep
    on the GPU inside `on_after_batch_transfer`; here the host-side
    augment/sample/pad pipeline dominates the step wall-clock (the
    jitted step itself is ~ms), so it fans out over processes. Padded
    batches cross the process boundary as numpy pytrees and the
    consumer issues ONE batched `jax.device_put` per batch.

    Batch capacities must be pinned (`discover_caps`) so every worker
    pads to the same compiled shapes. Workers persist across epochs.
    """

    def __init__(self, dataset, batch_cfg, batch_size=1, shuffle=False,
                 seed=0, drop_last=False, train=True, num_workers=0,
                 prefetch=4):
        super().__init__(dataset, batch_size=batch_size,
                         shuffle=shuffle, seed=seed,
                         drop_last=drop_last, prefetch=prefetch)
        self.batch_cfg = batch_cfg
        self.train = train
        self.num_workers = num_workers
        self._pool = None
        # epoch generation token: results from an abandoned iteration
        # (consumer broke out mid-epoch) are recognized and dropped
        self._generation = 0

    def _ensure_pool(self):
        if self._pool is not None:
            return
        import multiprocessing as mp
        ctx = mp.get_context('spawn')
        self._task_q = ctx.Queue()
        # bound in-flight prepared batches to cap host memory
        self._result_q = ctx.Queue(
            maxsize=max(2 * self.num_workers, 4))
        self._pool = [
            ctx.Process(
                target=_prepared_worker,
                args=(self.dataset, self.batch_cfg, self.train,
                      self._task_q, self._result_q),
                daemon=True)
            for _ in range(self.num_workers)]
        for p in self._pool:
            p.start()

    def close(self):
        if self._pool is None:
            return
        for _ in self._pool:
            self._task_q.put(None)
        for p in self._pool:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._pool = None

    def __iter__(self):
        import jax
        # per-batch seeds: batch content is reproducible and
        # INDEPENDENT of the worker count
        batches = list(self._batches())
        seeds = np.random.SeedSequence(
            self.seed + 7919 * self.epoch).generate_state(
            max(len(batches), 1))
        if self.num_workers <= 0:
            from ..transforms.prepare import prepare_batch
            for bid, idx in enumerate(batches):
                nags = [self.dataset[int(j)] for j in idx]
                rng = np.random.default_rng(int(seeds[bid]))
                yield prepare_batch(nags, self.batch_cfg,
                                    train=self.train, rng=rng)
            return
        self._ensure_pool()
        import queue as _queue
        self._generation += 1
        gen = self._generation
        for bid, idx in enumerate(batches):
            self._task_q.put((gen, bid, np.asarray(idx),
                              int(seeds[bid])))
        pending = {}
        next_bid = 0
        while next_bid < len(batches):
            while next_bid not in pending:
                try:
                    rgen, bid, out = self._result_q.get(timeout=30)
                except _queue.Empty:
                    dead = [p for p in self._pool if not p.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f'{len(dead)} PreparedDataLoader worker '
                            'process(es) died — see worker stderr')
                    continue
                if rgen != gen:
                    continue  # stale result from an abandoned epoch
                pending[bid] = out
            out = pending.pop(next_bid)
            next_bid += 1
            yield jax.device_put(out)


# ----- submission hooks --------------------------------------------------
def make_submission(dataset, cloud_id, full_res_pred, submission_dir):
    """Write held-out-set predictions in the dataset's benchmark
    format (reference BaseDataset.make_submission,
    src/datasets/base.py:1115). Dispatches on a per-dataset
    `submission_format` attribute:
      - 'labels_txt': one int label per line (KITTI-360-style)
      - 'labels_ply': binary PLY with a single 'class' property
        (DALES-style)
    """
    os.makedirs(submission_dir, exist_ok=True)
    fmt = getattr(dataset, 'submission_format', 'labels_txt')
    pred = np.asarray(full_res_pred).astype(np.int32)
    if fmt == 'labels_txt':
        # optional train-id -> benchmark-id remap (e.g. ScanNet's
        # NYU40 ids)
        idmap = getattr(dataset, 'submission_id_map', None)
        if idmap is not None:
            pred = np.asarray(idmap)[np.clip(pred, 0,
                                             len(idmap) - 1)]
        out = osp.join(submission_dir,
                       f'{osp.basename(cloud_id)}.txt')
        np.savetxt(out, pred, fmt='%d')
    elif fmt == 'kitti360_npy':
        # train ids -> KITTI-360 label ids; file named
        # {seq:0>4}_{start:0>10}_{end:0>10}.npy (reference
        # make_submission, src/datasets/kitti360.py:430-440)
        idmap = getattr(dataset, 'submission_id_map', None)
        if idmap is not None:
            pred = np.asarray(idmap)[pred]
        pred = pred.astype(np.uint8)
        seq, win = cloud_id.split('/')
        seqno = seq.split('_')[-2]
        start, end = win.split('_')
        out = osp.join(submission_dir,
                       f'{seqno:0>4}_{start:0>10}_{end:0>10}.npy')
        np.save(out, pred)
    elif fmt == 'labels_ply':
        from ..utils.ply import write_ply
        out = osp.join(submission_dir, f'{cloud_id}.ply')
        write_ply(out, {'class': pred})
    else:
        raise ValueError(f'unknown submission format {fmt}')
    return out
