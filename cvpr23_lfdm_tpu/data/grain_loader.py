"""Grain-backed batch loader (multiprocess workers, checkpointable).

Production alternative to :class:`PrefetchLoader`'s thread pool: Grain
runs sample loading in WORKER PROCESSES (true parallelism — no GIL
contention with the host training loop) with shared-memory transfer of
the decoded arrays and deterministic per-epoch shuffling.

Two properties beyond the reference's torch DataLoader
(LFAE/train.py:60-63, DM/train_video_flow_diffusion_mug.py:188-196):

* **Deterministic visits.** The data source yields only the INDEX; the
  decode/augment happens inside the grain operation, which sees each
  record's global position and derives `epoch = global_index // len(ds)`.
  Samples are drawn via `dataset.sample(index, epoch)` whose stream is
  keyed by visit identity (`datasets.visit_rng`) — identical across
  runs, worker counts, and restarts.
* **Checkpointable iteration.** `iter(loader)` returns a persistent
  iterator; `loader.get_state()` / `loader.set_state(state)` round-trip
  Grain's iterator position (bytes) through any checkpoint store, so a
  resumed run continues mid-epoch on the exact next batch.
"""

from __future__ import annotations

import numpy as np


class GrainLoader:
    """Infinite shuffled batch iterator over a map-style dataset.

    Interface-compatible with :class:`PrefetchLoader`: yields dicts of
    stacked numpy arrays (non-array fields as lists).

    Args:
      dataset: map-style dataset (``__len__`` + ``sample(index, epoch)``
        or ``__getitem__``). Must be picklable when ``num_workers > 0``.
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
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """`batch_size` is the GLOBAL batch; with `shard_count` processes
        (multi-host DCN) grain shards the record stream per host and each
        loader batches its `batch_size / shard_count` slice."""
        if len(dataset) == 0:
            raise ValueError("empty dataset (wrong split or data root?)")
        if batch_size % shard_count != 0:
            raise ValueError(
                f"batch {batch_size} not divisible by {shard_count} shards"
            )
        import grain.python as gp

        shard = (
            gp.ShardOptions(shard_index, shard_count, drop_remainder=True)
            if shard_count > 1
            else gp.NoSharding()
        )
        self._loader = gp.DataLoader(
            data_source=_IndexSource(len(dataset)),
            sampler=gp.IndexSampler(
                num_records=len(dataset),
                shuffle=shuffle,
                seed=seed,
                num_epochs=None,  # infinite, reshuffled per epoch
                shard_options=shard,
            ),
            operations=[
                _SampleCollate(
                    dataset, batch_size // shard_count, drop_last, len(dataset)
                )
            ],
            worker_count=num_workers,
            worker_buffer_size=max(1, prefetch),
        )
        self._it = None

    def __iter__(self):
        """Persistent iterator: repeated `iter()` continues the same stream
        so `get_state()` always reflects the consumed position."""
        if self._it is None:
            self._it = iter(self._loader)
        return self._it

    # ------------------------------------------------------- checkpointing

    def get_state(self) -> bytes:
        """Serialized iterator position (start-of-stream if unconsumed)."""
        return iter(self).get_state()

    def set_state(self, state: bytes) -> None:
        """Seek the (persistent) iterator to a saved position."""
        iter(self).set_state(state)


class _IndexSource:
    """Trivial random-access source: the record IS the epoch-local index.
    The heavy decode happens in :class:`_SampleCollate` (still inside the
    worker process), which additionally knows the record's global
    position — the data source alone never sees the epoch."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> int:
        return int(i)

    def __repr__(self) -> str:
        # grain validates checkpoints against repr(data_source); the
        # default object-address repr would reject every restore
        return f"_IndexSource(n={self._n})"


class _SampleCollate:
    """Grain operation: load `batch_size` visits -> one collated batch
    (loader.collate layout, incl. string fields as lists)."""

    def __init__(self, dataset, batch_size: int, drop_last: bool, n: int):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.n = n

    def _load(self, rec) -> dict:
        epoch = rec.metadata.index // self.n
        sample = getattr(self.dataset, "sample", None)
        if sample is None:
            return self.dataset[rec.data]
        return sample(rec.data, int(epoch))

    def __call__(self, records):
        from cvpr23_lfdm_tpu.data.loader import collate

        buf = []
        last_meta = None
        for rec in records:
            buf.append(self._load(rec))
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
