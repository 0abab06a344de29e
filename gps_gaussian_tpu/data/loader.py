"""Batching host loader: samples -> typed StereoSample pytrees.

CPU-side parallelism equivalent of the reference's torch DataLoader workers
(train_stage1.py:32-36): worker processes (or threads) prefetch and collate
batches while the device computes.  Per-host sharding for multi-host
training comes from slicing the scan list by process index.  Training
batches sample WITHOUT replacement: a shuffled epoch permutation is drawn
down and reshuffled when exhausted (the reference's epoch semantics via
torch DataLoader shuffle=True).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from gps_gaussian_tpu.data.thuman import StereoHumanDataset
from gps_gaussian_tpu.utils.containers import (NovelCamera, NovelView,
                                               SourceView, StereoSample)


def collate(samples: Sequence[dict]) -> StereoSample:
    """Stack unbatched sample dicts into one StereoSample (numpy leaves)."""

    def stack_view(view: str) -> SourceView:
        d = [s[view] for s in samples]
        kw = dict(
            img=np.stack([x["img"] for x in d]),
            mask=np.stack([x["mask"] for x in d]),
            intr=np.stack([x["intr"] for x in d]),
            ref_intr=np.stack([x["ref_intr"] for x in d]),
            extr=np.stack([x["extr"] for x in d]),
            tf_x=np.stack([x["tf_x"] for x in d]),
        )
        if "flow" in d[0]:
            kw["flow"] = np.stack([x["flow"] for x in d])
            kw["valid"] = np.stack([x["valid"] for x in d])
        return SourceView(**kw)

    novel = None
    if "novel" in samples[0]:
        d = [s["novel"] for s in samples]
        camera = NovelCamera(
            view=np.stack([x["view"] for x in d]),
            proj=np.stack([x["proj"] for x in d]),
            cam_center=np.stack([x["cam_center"] for x in d]),
            tanfovx=np.stack([x["tanfovx"] for x in d]),
            tanfovy=np.stack([x["tanfovy"] for x in d]),
            height=d[0]["height"], width=d[0]["width"])
        novel = NovelView(
            camera=camera,
            img=np.stack([x["img"] for x in d]),
            intr=np.stack([x["intr"] for x in d]),
            extr=np.stack([x["extr"] for x in d]))

    return StereoSample(lmain=stack_view("lmain"),
                        rmain=stack_view("rmain"), novel=novel)


def _proc_worker(dataset, novel_ids, task_q, out_q):
    """Worker-process loop: (indices, seed) tasks -> collated batches."""
    while True:
        task = task_q.get()
        if task is None:
            return
        idxs, seed = task
        rng = np.random.default_rng(seed)
        samples = [dataset.get_sample(int(i), novel_ids, rng) for i in idxs]
        out_q.put(collate(samples))


class BatchLoader:
    """Infinite epoch-shuffled batch iterator with prefetch.

    num_procs > 0 forks that many worker processes (numpy/PIL decode off
    the GIL — required to keep large-resolution steps input-bound-free);
    num_procs = 0 falls back to `num_threads` Python threads (fine for
    small synthetic fixtures and tests).
    """

    def __init__(self, dataset: StereoHumanDataset, batch_size: int,
                 novel_ids: Optional[Sequence[int]], seed: int = 1314,
                 prefetch: int = 2, num_threads: int = 2,
                 num_procs: int = 0,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.novel_ids = novel_ids
        self.rng = np.random.default_rng(seed + process_index)
        self._rng_lock = threading.Lock()
        # per-host shard of the scan index space
        n = len(dataset)
        self.indices = list(range(process_index, n, process_count)) or [0]
        self._perm: list = []
        self._stop = threading.Event()
        self.procs: list = []
        self.threads: list = []
        if num_procs > 0:
            # spawn, not fork: the trainer initializes the JAX (TPU)
            # backend before building loaders, and forking after backend
            # init can deadlock the runtime's threads in the child
            ctx = mp.get_context("spawn")
            self._task_q = ctx.Queue(maxsize=prefetch + num_procs)
            self.q = ctx.Queue(maxsize=prefetch)
            self.procs = [
                ctx.Process(target=_proc_worker,
                            args=(dataset, novel_ids, self._task_q, self.q),
                            daemon=True)
                for _ in range(num_procs)]
            for p in self.procs:
                p.start()
            self.threads = [threading.Thread(target=self._feeder,
                                             daemon=True)]
        else:
            self.q = queue.Queue(maxsize=prefetch)
            self.threads = [threading.Thread(target=self._worker,
                                             daemon=True)
                            for _ in range(num_threads)]
        for t in self.threads:
            t.start()

    def _next_task(self):
        """Next batch of epoch-permutation indices + a sampling seed."""
        with self._rng_lock:
            while len(self._perm) < self.batch_size:
                self._perm.extend(
                    self.rng.permutation(self.indices).tolist())
            idxs = self._perm[: self.batch_size]
            del self._perm[: self.batch_size]
            seed = int(self.rng.integers(2 ** 31))
        return idxs, seed

    def _one_batch(self) -> StereoSample:
        idxs, seed = self._next_task()
        rng = np.random.default_rng(seed)
        samples = [self.dataset.get_sample(int(i), self.novel_ids, rng)
                   for i in idxs]
        return collate(samples)

    def _put_retrying(self, q, item):
        """Put with timeout-retry: the item (which consumed epoch
        permutation indices) must NEVER be discarded on queue.Full, or
        the without-replacement epoch guarantee silently breaks."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=1.0)
                return
            except queue.Full:
                continue

    def _worker(self):
        while not self._stop.is_set():
            self._put_retrying(self.q, self._one_batch())

    def _feeder(self):
        while not self._stop.is_set():
            self._put_retrying(self._task_q, self._next_task())

    def __iter__(self):
        return self

    def __next__(self) -> StereoSample:
        return self.q.get()

    def close(self):
        self._stop.set()
        for t in self.threads:
            t.join(timeout=2.0)
        for p in self.procs:
            p.terminate()
        for p in self.procs:
            p.join(timeout=2.0)


def eval_batches(dataset: StereoHumanDataset, batch_size: int,
                 novel_ids: Optional[Sequence[int]], seed: int = 1234,
                 process_index: int = 0, process_count: int = 1,
                 max_batches: Optional[int] = None
                 ) -> Iterator[StereoSample]:
    """Deterministic full sweep of the val set in fixed-size batches.

    Replaces sampling random val batches with the reference's full val
    loop (train_stage2.py:103-139): every index visited once, in order,
    per-sample rng seeded by the index so the novel-view choice (and any
    augmentation) is identical run-to-run.  A short tail is wrapped to
    keep the jitted eval step's batch shape static.

    Yields (StereoSample, weight) where weight is a (batch_size,) f32
    array: 1.0 for first-visit samples, 0.0 for wrapped-tail duplicates,
    so aggregation can mask them out of val means.  n_batches derives
    from the GLOBAL dataset length, never the per-host slice: in
    multi-host runs every process must execute the (collective-bearing)
    eval step the same number of times or the psum/pmean inside it hangs.
    """
    idxs = list(range(process_index, len(dataset), process_count)) or [0]
    # identical on all hosts: the longest per-host shard, batched up
    shard_len = max(-(-len(dataset) // process_count), 1)
    n_batches = -(-shard_len // batch_size)
    if max_batches is not None:
        n_batches = min(n_batches, max_batches)
    n_live = len(range(process_index, len(dataset), process_count))
    for b in range(n_batches):
        pos = [b * batch_size + j for j in range(batch_size)]
        chunk = [idxs[p % len(idxs)] for p in pos]
        weight = np.asarray([1.0 if p < n_live else 0.0 for p in pos],
                            np.float32)
        samples = [dataset.get_sample(int(i), novel_ids,
                                      np.random.default_rng(seed + int(i)))
                   for i in chunk]
        yield collate(samples), weight
