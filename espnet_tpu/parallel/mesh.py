"""Device mesh + sharding helpers — the SPMD substrate replacing the
reference's torch DDP/NCCL layer (espnet2/train/distributed_utils.py,
SURVEY §2.10).

Design: one global `Mesh` with axes ("data", "model"). Data parallelism
shards the batch axis over "data" (gradient psum inserted by XLA under
jit, ≙ DDP allreduce); tensor parallelism shards selected weight matrices
over "model" (capability the reference lacks). Multi-host: the same mesh
spans hosts via jax.distributed; per-host data loading feeds
host-local shards through jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on the data axis, model=1."""
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf's leading (batch) dim over `axis`.

    Leaves whose batch dim is not divisible by the axis size (short last
    batches) are replicated instead — correctness first, the cost is one
    stray small batch per epoch."""
    n = mesh.shape[axis]

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % n == 0:
            spec = P(axis, *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for jit in/out specs."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    return rep, dp
