"""Mesh-based SPMD parallelism (the reference's DataParallel+SyncBN, TPU-way)."""

from cvpr23_lfdm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
