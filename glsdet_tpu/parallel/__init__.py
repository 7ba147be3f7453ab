"""Mesh/sharding helpers for pjit over ICI (and DCN multi-host).

Parallelism design (SURVEY.md §2.4): the reference's only real axis is
data parallelism (MMDataParallel / nn.DataParallel; NCCL DDP plumbed but
dormant).  TPU-native, that is a 1-D ``data`` mesh over all chips with the
batch sharded on it; gradients/metrics/BN stats reduce via XLA collectives
inserted automatically under global-view jit.  Multi-host extends the same
mesh over DCN via ``jax.distributed.initialize``.
"""

from glsdet_tpu.parallel.mesh import (
    batch_sharding,
    data_mesh,
    replicate,
    shard_batch,
)

__all__ = ["batch_sharding", "data_mesh", "replicate", "shard_batch"]
