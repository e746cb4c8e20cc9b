"""Device mesh / sharding helpers — the framework's distribution layer.

The reference scales with single-node DDP over NCCL
(ref: src/training/coach.py:37-85, DistributedSampler :171-177). The
TPU-native equivalent needs no communication code at all: we build a
``jax.sharding.Mesh``, shard the batch axis with ``NamedSharding``, replicate
params, and XLA inserts the gradient all-reduces over ICI during jit
compilation. The same code path runs on 1 chip, a v5e pod slice, or a
CPU-virtual-device test mesh.

Mesh axes:
- ``data``  — batch sharding (gradient all-reduce), the E4S workhorse.
- ``model`` — reserved axis for tensor-parallel experiments (1 by default;
  the 1024^2 conv channels shard over it if ever needed — see SURVEY §2.10).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh):
    """Place a host batch pytree with axis-0 sharded over `data`.

    Single-process: a plain device_put of the full batch. Multi-process
    (pod slice / multi-host): each process holds only ITS shard of the
    global batch (the loader's DistributedSampler-equivalent slice, see
    datasets.DataLoader num_shards/shard_index), and the global array is
    assembled from the process-local data without any cross-host transfer.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), tree
    )


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the NCCL init_process_group equivalent,
    ref: src/training/coach.py:37-58). Call once per process before any
    other JAX API; no-ops on single-process/already-initialised runs.

    With no arguments JAX auto-detects the cluster from the environment
    (TPU pod metadata / SLURM / coordinator env vars).
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialised
        if "already" not in str(e).lower():
            raise
