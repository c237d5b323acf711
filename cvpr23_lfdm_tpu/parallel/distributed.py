"""Multi-host (DCN) initialization and host-local data plumbing.

The reference's parallelism ceiling is single-process thread
DataParallel (sync_batchnorm/, SURVEY.md §5) — it cannot span hosts. The
TPU-native story: `jax.distributed.initialize` connects N processes
(one per host, DCN between them, ICI within), after which the SAME
`Mesh`/`pjit` train step runs unchanged — XLA routes the data-parallel
all-reduce hierarchically (ICI within a host's chips, DCN across).

Process-count-agnostic contract used by the trainers:

* every process loads only its slice of each global batch
  (`host_shard` on the loaders / `PrefetchLoader(shard_index=...)`),
* `parallel.mesh.shard_batch` assembles the global sharded array from
  host-local data (`jax.make_array_from_process_local_data`) — a no-op
  single-process,
* checkpointing/logging runs on process 0 only (`is_primary`).

Simulated in CI by `tests/test_multihost.py`: two CPU processes over a
localhost coordinator execute the identical code path.
"""

from __future__ import annotations

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Connect this process to the cluster (no-op if single-process).

    With no arguments, defers to jax's environment auto-detection (TPU
    pod metadata / SLURM); explicit args support manual topologies and
    the localhost CPU simulation.

    Returns {"process_index", "process_count", "device_count"}.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the checkpoint/logging owner (process 0)."""
    return jax.process_index() == 0


def host_shard(global_batch_size: int) -> tuple[int, int, int]:
    """(shard_index, shard_count, local_batch_size) for this process.

    The loaders slice each GLOBAL batch contiguously by process index, so
    concatenating all hosts' slices in process order reconstructs exactly
    the single-host batch stream — resume/replay semantics are
    process-count-agnostic for a fixed global batch size.
    """
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return i, n, global_batch_size // n
