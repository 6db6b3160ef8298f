"""Dataset dispatch + background-prefetching batch loader.

Equivalent of the reference's ``build_dataloader``
(connectomics/data/dataset/build.py:351-407): per-dataset dispatch by
``DATASET.DATA_TYPE``, train batch = SOLVER.SAMPLES_PER_BATCH, CVPPP val
batch 10, test batch = INFERENCE.SAMPLES_PER_BATCH.  Instead of torch
DataLoader worker processes, a thread pool decodes/augments ahead of the
step loop (image decode + cv2 augs release the GIL) and batches are handed
to jax as stacked numpy arrays.
"""

from __future__ import annotations

import inspect
import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .bbbc import BBBC
from .cvppp import CVPPP
from .synthetic import SyntheticDataset


def get_dataset(cfg, mode: str):
    dt = cfg.DATASET.DATA_TYPE
    root = cfg.DATASET.INPUT_PATH
    if dt == "CVPPP":
        size = cfg.MODEL.INPUT_SIZE[-1]
        return CVPPP(root, mode, crop_size=size)
    if dt == "BBBC":
        m = {"train": "train", "val": "validation", "test": "test"}[mode]
        # the reference hardcodes crop_size=[512,512] (dataset_BBBC.py:113)
        # and the recipe YAML carries the same value in MODEL.INPUT_SIZE;
        # deriving it from the config keeps the recipe identical while
        # letting fixtures shrink end-to-end smoke runs
        return BBBC(root, m, crop_size=tuple(cfg.MODEL.INPUT_SIZE[-2:]))
    if dt in ("synthetic", "synthetic_bbbc"):
        size = tuple(cfg.MODEL.INPUT_SIZE[-2:])
        length = 64 if mode == "train" else 8
        # the bbbc flavor approximates a nuclei field and routes the BBBC
        # eval protocol (trainer.validate): BBBC039 has ~50-150 nuclei per
        # 520x696 image (~1.4e-4..4.1e-4 /px^2) of roughly fixed absolute
        # size, so instance count scales with crop area while radii stay
        # in pixels — at the 512^2 recipe crop this lands in the many-tens
        # regime (the 300-query / MAX_INSTANCES>=128 path CVPPP never hits)
        # yet keeps 32^2 test fixtures at a sane 2-4 instances.
        if dt == "synthetic_bbbc":
            area = size[0] * size[1]
            n_inst = (max(2, int(area * 1.4e-4)), max(4, int(area * 4.1e-4)))
            r_hi = max(6.0, min(22.0, 0.2 * min(size)))
            radius = (max(3.0, min(10.0, 0.05 * min(size))), r_hi)
        else:
            n_inst, radius = (4, 12), None
        return SyntheticDataset(size=size, length=length, n_instances=n_inst,
                                seed={"train": 0, "val": 1, "test": 2}[mode],
                                radius_px=radius)
    if dt in ("cellpose", "monuseg"):
        from .instance_folder import CellposeDataset, MoNuSegDataset

        cls = CellposeDataset if dt == "cellpose" else MoNuSegDataset
        return cls(root, mode, crop_size=cfg.MODEL.INPUT_SIZE[-1])
    if dt in ("volume", "tile"):
        return build_volume_dataset(cfg, mode)
    raise ValueError(f"Unknown DATASET.DATA_TYPE: {dt}")


def build_volume_dataset(cfg, mode: str):
    """Legacy EM path: VolumeDataset, or TileDataset when
    DATASET.DO_CHUNK_TITLE=1 (reference get_dataset,
    data/dataset/build.py:248-347)."""
    import os

    from .volume_augment import build_train_augmentor
    from .volume_dataset import TileDataset, VolumeDataset, load_volume_inputs

    augmentor = build_train_augmentor(cfg) if mode == "train" else None
    sample_size = list(cfg.MODEL.INPUT_SIZE)
    if len(sample_size) == 2:
        sample_size = [1] + sample_size
    label_size = list(cfg.MODEL.OUTPUT_SIZE or [])
    if len(label_size) == 2:
        label_size = [1] + label_size
    if not label_size or tuple(label_size) == tuple(sample_size):
        label_size = None  # same-size nets: labels match the input crop
    if mode == "train":
        stride = (1, 1, 1)
        iter_num = cfg.SOLVER.ITERATION_TOTAL * cfg.SOLVER.SAMPLES_PER_BATCH
    elif mode == "val":
        stride = [max(1, s // 2) for s in sample_size]
        iter_num = -1
    else:
        stride = cfg.INFERENCE.STRIDE
        iter_num = -1
    rj = cfg.DATASET.REJECT_SAMPLING
    shared = dict(
        mode=mode, sample_volume_size=sample_size, sample_stride=stride,
        sample_label_size=label_size,
        augmentor=augmentor, target_opt=cfg.MODEL.TARGET_OPT,
        weight_opt=cfg.MODEL.WEIGHT_OPT,
        reject_size_thres=rj.SIZE_THRES, reject_diversity=rj.DIVERSITY,
        reject_p=rj.P, data_mean=cfg.DATASET.MEAN, data_std=cfg.DATASET.STD,
        do_relabel=cfg.DATASET.REDUCE_LABEL, do_2d=cfg.DATASET.DO_2D,
        erosion_rates=cfg.MODEL.LABEL_EROSION or None,
        dilation_rates=cfg.MODEL.LABEL_DILATION or None,
    )
    if cfg.DATASET.DO_CHUNK_TITLE == 1:
        root = cfg.DATASET.INPUT_PATH

        def _paths(name):
            if not name:
                return None
            names = name if isinstance(name, (list, tuple)) else [name]
            return [os.path.join(root, n) for n in names]

        return TileDataset(
            volume_json=_paths(cfg.DATASET.IMAGE_NAME),
            label_json=_paths(cfg.DATASET.LABEL_NAME) if mode == "train" else None,
            valid_mask_json=(_paths(cfg.DATASET.VALID_MASK_NAME)
                             if mode == "train" else None),
            chunk_num=cfg.DATASET.DATA_CHUNK_NUM,
            chunk_ind=cfg.DATASET.DATA_CHUNK_IND,
            chunk_ind_split=cfg.DATASET.CHUNK_IND_SPLIT,
            chunk_iter=cfg.DATASET.DATA_CHUNK_ITER,
            chunk_stride=cfg.DATASET.DATA_CHUNK_STRIDE,
            pad_size=cfg.DATASET.PAD_SIZE, **shared)
    img, lab, vm = load_volume_inputs(cfg, mode)
    return VolumeDataset(img, lab, vm, iter_num=iter_num, **shared)


def batch_size_for(cfg, mode: str, n_devices: int = 1) -> int:
    """Global batch size.  SOLVER.SAMPLES_PER_BATCH is per-device, like the
    reference's per-GPU batch (README.md:30-34: 2 img/GPU x 4 GPUs)."""
    if mode == "train":
        return cfg.SOLVER.SAMPLES_PER_BATCH * max(n_devices, 1)
    if mode == "val" and cfg.DATASET.DATA_TYPE == "CVPPP":
        return 10  # reference: data/dataset/build.py:361-362
    return cfg.INFERENCE.SAMPLES_PER_BATCH * max(n_devices, 1)


class PrefetchLoader:
    """Iterates batches forever (train) or one epoch (eval), decoding in a
    thread pool ``prefetch`` batches ahead.

    Structure (the round-1 version deadlocked by submitting batch tasks that
    themselves blocked on item tasks scheduled on the *same* executor): a
    single dedicated **producer thread** assembles batches; only leaf item
    loads run on the ThreadPoolExecutor, so the pool can never be saturated
    by tasks waiting on other pool tasks.  Finished batches flow through a
    bounded queue (the prefetch depth).

    Reproducibility: every item gets its own ``np.random.RandomState`` seeded
    by (seed, epoch, index), so augmentations are deterministic regardless of
    thread scheduling — unlike the reference's torch DataLoader workers whose
    aug streams depend on worker assignment.  Datasets opt in by accepting an
    ``rng`` keyword in ``__getitem__``.

    Eval loaders use ``drop_last=False, pad_last=True``: the final ragged
    batch is padded to full ``batch_size`` by repeating the last item and the
    batch carries ``_num_valid`` so jitted eval never sees a new batch shape
    (a ragged batch would force an XLA recompile).
    """

    _SENTINEL = object()

    def __init__(self, dataset, batch_size: int, shuffle: bool, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 2, drop_last: bool = True,
                 loop: bool = True, pad_last: bool = False,
                 max_instances: int = 0,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # multi-host data sharding (the reference's DistributedSampler,
        # data/dataset/build.py:392-395): each process takes a disjoint
        # stride of every epoch's permutation and a process-LOCAL batch
        self.process_index = int(process_index)
        self.process_count = max(int(process_count), 1)
        self.loop = loop
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.seed = seed
        # instance-truncation guard: targets_from_labels silently drops ids
        # > MODEL.MAX_INSTANCES from the loss, so count on host and warn
        self.max_instances = int(max_instances)
        self._truncation_warnings = 0
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = max(int(prefetch), 1)
        try:
            sig = inspect.signature(dataset.__getitem__)
            self._rng_aware = "rng" in sig.parameters
        except (TypeError, ValueError):
            self._rng_aware = False

    def _epoch_indices(self, epoch: int):
        n = len(self.dataset)
        rng = np.random.RandomState((self.seed + 7919 * epoch) % (2**32))
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.process_count > 1:  # disjoint per-host shard of the epoch
            idx = idx[self.process_index::self.process_count]
        n = len(idx)
        bs = self.batch_size
        stop = n - bs + 1 if self.drop_last else n
        if stop <= 0 and (self.drop_last or n == 0):
            raise ValueError(
                f"dataset yields no batches: {n} item(s) per process for "
                f"batch_size {bs} (drop_last={self.drop_last}) — the "
                f"producer would spin through empty epochs forever")
        for s in range(0, stop, bs):
            yield idx[s : s + bs]

    def _get_item(self, epoch: int, idx: int):
        if self._rng_aware:
            # epoch*len+idx is unique per (epoch, item): a fixed epoch
            # stride (e.g. 8191) collides across epochs on longer datasets,
            # replaying identical augmentation streams
            item_rng = np.random.RandomState(
                (self.seed * 1000003 + epoch * len(self.dataset) + idx)
                % (2**32))
            return self.dataset.__getitem__(idx, rng=item_rng)
        return self.dataset[idx]

    def _make_batch(self, epoch: int, indices) -> Dict[str, np.ndarray]:
        futures = [self.pool.submit(self._get_item, epoch, int(i)) for i in indices]
        items = [f.result() for f in futures]
        n_valid = len(items)
        if self.pad_last and n_valid < self.batch_size:
            items = items + [items[-1]] * (self.batch_size - n_valid)
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        batch["_num_valid"] = np.int32(n_valid)
        if self.max_instances and "label" in batch:
            # labels are consecutively relabeled per image, so max == count
            counts = batch["label"].reshape(len(items), -1).max(axis=1)
            over = counts > self.max_instances
            if over.any():
                self._truncation_warnings += 1
                if self._truncation_warnings <= 5 or \
                        self._truncation_warnings % 100 == 0:
                    logging.getLogger(__name__).warning(
                        "instance truncation: %d image(s) in this batch have "
                        "up to %d instances but MODEL.MAX_INSTANCES is %d — "
                        "instances beyond the cap are DROPPED from the loss "
                        "(occurrence %d; raise MODEL.MAX_INSTANCES)",
                        int(over.sum()), int(counts.max()),
                        self.max_instances, self._truncation_warnings)
        return batch

    def close(self) -> None:
        """Release the worker threads (idempotent)."""
        self.pool.shutdown(wait=False)

    def __del__(self):  # pragma: no cover - best-effort cleanup
        try:
            self.pool.shutdown(wait=False)
        except Exception:
            pass

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        failure: list = [None]

        def produce():
            try:
                epoch = 0
                while not stop.is_set():
                    for indices in self._epoch_indices(epoch):
                        batch = self._make_batch(epoch, indices)
                        while not stop.is_set():
                            try:
                                out.put(batch, timeout=0.2)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                    if not self.loop:
                        return
                    epoch += 1
            except BaseException as e:  # forward to the consumer: a silent
                # sentinel here would truncate an eval epoch (wrong metrics)
                # or surface as a bare StopIteration far from the cause
                failure[0] = e
            finally:
                while True:  # always deliver the sentinel, even if full
                    try:
                        out.put(self._SENTINEL, timeout=0.2)
                        return
                    except queue.Full:
                        if stop.is_set():
                            return

        thread = threading.Thread(target=produce, daemon=True, name="prefetch-producer")
        thread.start()
        try:
            while True:
                batch = out.get()
                if batch is self._SENTINEL:
                    if failure[0] is not None:
                        raise RuntimeError(
                            "PrefetchLoader producer failed") from failure[0]
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer's pending put() unblocks
            try:
                while True:
                    out.get_nowait()
            except queue.Empty:
                pass


def build_dataloader(cfg, mode: str, seed: int = 0, n_devices: int = 1) -> PrefetchLoader:
    ds = get_dataset(cfg, mode)
    train = mode == "train"
    # multi-host: n_devices is the GLOBAL device count (the trainer passes
    # mesh.devices.size); each process loads its 1/process_count share of
    # the global batch over a disjoint index shard, and shard_batch's
    # make_array_from_process_local_data assembles the global array
    import jax

    pc = jax.process_count()
    global_bs = batch_size_for(cfg, mode, n_devices)
    if pc > 1 and global_bs % pc != 0:
        # silently rounding would shrink the effective global batch (or
        # grow it via a max(1, ...) floor) and make shard_batch's
        # make_array_from_process_local_data mis-shard against the mesh
        raise ValueError(
            f"global batch size {global_bs} ({mode}) is not divisible by "
            f"process_count={pc}; adjust SOLVER/INFERENCE.SAMPLES_PER_BATCH")
    local_bs = global_bs // pc if pc > 1 else global_bs
    return PrefetchLoader(
        ds,
        batch_size=local_bs,
        shuffle=train,
        seed=seed,
        num_workers=max(2, cfg.SYSTEM.NUM_CPUS // 2),
        loop=train,
        drop_last=train,
        pad_last=not train,
        max_instances=int(getattr(cfg.MODEL, "MAX_INSTANCES", 0) or 0),
        process_index=jax.process_index(),
        process_count=pc,
    )
