"""Device mesh construction and standard shardings."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put every array in a batch dict with batch-axis sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization over DCN.

    The reference's ``init_dist`` / torch.distributed.launch analog
    (mmdet/apis/train.py:113-121, tools/dist_train.sh): call once per
    host before building the mesh; jax.distributed wires all hosts'
    devices into one global device list.
    """
    import os

    import jax

    # On the CPU backend cross-process collectives need an explicit
    # implementation (the virtual-DCN path used by scripts/
    # multihost_smoke.py and CI); on TPU the ICI/DCN collectives are
    # native and this config is ignored.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
        except Exception:
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def maybe_init_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """CLI/env-driven multi-host init; no-op when nothing is configured.

    Resolution order per field: explicit argument, then
    ``GLSDET_COORDINATOR`` / ``GLSDET_NUM_PROCESSES`` /
    ``GLSDET_PROCESS_ID`` env (set by scripts/dist_train.sh, the
    torch.distributed.launch analog), then SLURM step env
    (``SLURM_NTASKS`` / ``SLURM_PROCID``, scripts/slurm_train.sh —
    mirrors the reference's tools/slurm_train.sh srun launch).  Returns
    True when jax.distributed was initialized.
    """
    import os

    coordinator_address = (coordinator_address
                           or os.environ.get("GLSDET_COORDINATOR"))
    if num_processes is None:
        env = os.environ.get("GLSDET_NUM_PROCESSES",
                             os.environ.get("SLURM_NTASKS"))
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("GLSDET_PROCESS_ID",
                             os.environ.get("SLURM_PROCID"))
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        return False
    init_distributed(coordinator_address, num_processes, process_id)
    return True


def multiscale_size(step: int, sizes, interval: int = 10,
                    seed: int = 42):
    """Deterministic multi-scale schedule.

    The reference broadcasts a random size from rank 0 every ``interval``
    iters (SyncRandomSizeHook, core/hook/sync_random_size_hook.py:52 —
    an NCCL broadcast).  A step-seeded hash gives every host the same
    size with zero communication.
    """
    bucket = step // interval
    # splitmix-style integer hash, stable across hosts
    h = (bucket * 0x9E3779B97F4A7C15 + seed) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 27
    return sizes[h % len(sizes)]
