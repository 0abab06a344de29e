"""Batching host loader: samples -> typed StereoSample pytrees.

CPU-side parallelism equivalent of the reference's torch DataLoader workers
(train_stage1.py:32-36): a thread pool prefetches and collates batches while
the device computes.  Per-host sharding for multi-host training comes from
slicing the scan list by process index.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Sequence

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


class BatchLoader:
    """Infinite random-batch iterator with threaded prefetch."""

    def __init__(self, dataset: StereoHumanDataset, batch_size: int,
                 novel_ids: Optional[Sequence[int]], seed: int = 1314,
                 prefetch: int = 2, num_threads: int = 2,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.novel_ids = novel_ids
        self.rng = np.random.default_rng(seed + process_index)
        self._rng_lock = threading.Lock()
        # per-host shard of the scan index space
        n = len(dataset)
        self.indices = list(range(process_index, n, process_count)) or [0]
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self.threads = [threading.Thread(target=self._worker, daemon=True)
                        for _ in range(num_threads)]
        for t in self.threads:
            t.start()

    def _one_batch(self) -> StereoSample:
        with self._rng_lock:
            idxs = self.rng.choice(self.indices, size=self.batch_size)
            rng = np.random.default_rng(self.rng.integers(2 ** 31))
        samples = [self.dataset.get_sample(int(i), self.novel_ids, rng)
                   for i in idxs]
        return collate(samples)

    def _worker(self):
        while not self._stop.is_set():
            try:
                self.q.put(self._one_batch(), timeout=1.0)
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self) -> StereoSample:
        return self.q.get()

    def close(self):
        self._stop.set()
        for t in self.threads:
            t.join(timeout=2.0)
