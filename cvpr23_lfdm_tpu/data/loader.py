"""Threaded prefetching batch loader.

TPU-native replacement for torch DataLoader worker processes
(LFAE/train.py:60-63, DM train scripts :188-196): decode/augment happen in
a thread pool (cv2/numpy release the GIL for the heavy parts) while the
accelerator runs the previous step; batches are collated to stacked numpy
arrays ready for `device_put` sharding.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack array fields; gather non-arrays into lists."""
    out = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class PrefetchLoader:
    """Infinite shuffled batch iterator with background prefetch.

    Shuffles an index permutation per epoch (seeded), maps `dataset[i]`
    in `num_workers` threads, collates, and keeps up to `prefetch`
    ready batches in a bounded queue.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 6,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
    ):
        if len(dataset) == 0:
            raise ValueError("empty dataset (wrong split or data root?)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last

    def _index_stream(self):
        rng = np.random.default_rng(self.seed)
        n = len(self.dataset)
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            end = n - n % self.batch_size if self.drop_last else n
            for s in range(0, end, self.batch_size):
                yield order[s : s + self.batch_size]

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        batch_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that re-checks `stop` so an abandoned iterator
            (consumer gone, queue full) can't wedge the producer thread —
            and its worker pool — forever."""
            while not stop.is_set():
                try:
                    batch_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in self._index_stream():
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, idx))
                        if not put_or_stop(collate(samples)):
                            return
            except BaseException as e:  # surface worker failures, don't hang
                put_or_stop(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = batch_q.get()
                if isinstance(batch, BaseException):
                    raise RuntimeError("data loader worker failed") from batch
                yield batch
        finally:
            stop.set()

    def steps_per_epoch(self) -> int:
        return len(self.dataset) // self.batch_size
