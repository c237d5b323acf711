"""Grain-backed batch loader (multiprocess workers).

Production alternative to :class:`PrefetchLoader`'s thread pool: Grain
runs `dataset[i]` in WORKER PROCESSES (true parallelism — no GIL
contention with the host training loop) with shared-memory transfer of
the decoded arrays, deterministic per-epoch shuffling, and checkpointable
iterators. The map-style datasets in :mod:`datasets` (``__len__`` +
``__getitem__``) are valid Grain `RandomAccessDataSource`s as-is.

Replaces the reference's torch DataLoader worker processes
(LFAE/train.py:60-63, DM/train_video_flow_diffusion_mug.py:188-196) at
the same position in the stack; batch dict layout matches
:func:`loader.collate` so trainers accept either loader.
"""

from __future__ import annotations

import numpy as np


class GrainLoader:
    """Infinite shuffled batch iterator over a map-style dataset.

    Interface-compatible with :class:`PrefetchLoader`: yields dicts of
    stacked numpy arrays (non-array fields as lists).

    Args:
      dataset: map-style dataset (``__len__``/``__getitem__`` -> dict).
        Must be picklable when ``num_workers > 0`` (worker processes).
      num_workers: 0 = in-process (tests/debug); N>0 = N worker procs.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
    ):
        if len(dataset) == 0:
            raise ValueError("empty dataset (wrong split or data root?)")
        import grain.python as gp

        self._loader = gp.DataLoader(
            data_source=dataset,
            sampler=gp.IndexSampler(
                num_records=len(dataset),
                shuffle=shuffle,
                seed=seed,
                num_epochs=None,  # infinite, reshuffled per epoch
                shard_options=gp.NoSharding(),
            ),
            operations=[_CollateBatch(batch_size, drop_last)],
            worker_count=num_workers,
            worker_buffer_size=max(1, prefetch),
        )

    def __iter__(self):
        return iter(self._loader)


class _CollateBatch:
    """Grain operation: group `batch_size` sample dicts -> one collated
    batch (loader.collate layout, incl. string fields as lists)."""

    def __init__(self, batch_size: int, drop_last: bool):
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __call__(self, records):
        from cvpr23_lfdm_tpu.data.loader import collate

        buf = []
        last_meta = None
        for rec in records:
            buf.append(rec.data)
            last_meta = rec.metadata
            if len(buf) == self.batch_size:
                yield _Record(last_meta.remove_record_key(), collate(buf))
                buf = []
        if buf and not self.drop_last and last_meta is not None:
            yield _Record(last_meta.remove_record_key(), collate(buf))


class _Record:
    __slots__ = ("metadata", "data")

    def __init__(self, metadata, data):
        self.metadata = metadata
        self.data = data
