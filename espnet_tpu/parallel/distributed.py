"""Multi-host initialization (reference: espnet2/train/distributed_utils.py
DistributedOption:10, SLURM/MPI env resolution :163-254, bin/launch.py).

On TPU pods jax.distributed discovers the topology from the TPU runtime;
on CPU/GPU clusters we resolve coordinator/rank/world from explicit args
or SLURM/OpenMPI env vars, then call jax.distributed.initialize. After
init, the same Mesh-based SPMD code runs unchanged: per-host data loading
feeds host-local shards via host_local_array_to_global.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np


@dataclass
class DistributedOption:
    distributed: bool = False
    coordinator_address: Optional[str] = None  # host:port
    num_processes: Optional[int] = None
    process_id: Optional[int] = None

    def resolve(self) -> "DistributedOption":
        """Fill rank/world from SLURM / OpenMPI env (reference :196-254)."""
        env = os.environ
        if self.num_processes is None:
            for key in ("SLURM_NTASKS", "SLURM_NPROCS", "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE"):
                if key in env:
                    self.num_processes = int(env[key])
                    break
        if self.process_id is None:
            for key in ("SLURM_PROCID", "OMPI_COMM_WORLD_RANK", "RANK"):
                if key in env:
                    self.process_id = int(env[key])
                    break
        if self.coordinator_address is None:
            host = env.get("MASTER_ADDR")
            port = env.get("MASTER_PORT", "12355")
            if host is None and "SLURM_STEP_NODELIST" in env:
                host = env["SLURM_STEP_NODELIST"].split(",")[0].split("[")[0]
            if host is not None:
                self.coordinator_address = f"{host}:{port}"
        self.distributed = bool(
            self.num_processes and self.num_processes > 1
        )
        return self

    def init(self):
        """jax.distributed.initialize (≙ torch init_process_group :96-101)."""
        if not self.distributed:
            return
        jax.distributed.initialize(
            coordinator_address=self.coordinator_address,
            num_processes=self.num_processes,
            process_id=self.process_id,
        )


def init_distributed_and_mesh(config: dict):
    """Product entry point for distributed setup, called by every task's
    train() (reference analog: abs_task.py:938-992 resolve + init inside
    the task main).

    Config keys:
      distributed: bool        — force multi-process init (else env-detect)
      coordinator_address, num_processes, process_id — explicit overrides
      mesh_shape: [dp, tp]     — explicit mesh (data, model)
      tensor_parallel: N       — model-axis size (dp inferred)

    Returns the global Mesh (data × model) spanning all devices of all
    processes. Safe to call repeatedly: initialize() is skipped when the
    runtime is already up or single-process.
    """
    from espnet_tpu.parallel.mesh import make_mesh

    opt = DistributedOption(
        distributed=bool(config.get("distributed", False)),
        coordinator_address=config.get("coordinator_address"),
        num_processes=config.get("num_processes"),
        process_id=config.get("process_id"),
    ).resolve()
    if opt.distributed and jax.process_count() == 1:
        try:
            opt.init()
        except RuntimeError:  # already initialized
            pass

    shape = config.get("mesh_shape")
    tp = int(config.get("tensor_parallel", 1) or 1)
    n = jax.device_count()
    if shape is None:
        if tp > 1 and n % tp == 0:
            shape = (n // tp, tp)
        else:
            shape = (n, 1)
    return make_mesh(shape=tuple(shape), axis_names=("data", "model"))


def local_slice(batch, axis_size: Optional[int] = None, rank: Optional[int] = None):
    """Slice a (host-identical) collated batch to this process's rows
    (reference batches[rank::world_size], abs_task.py:1445 — but
    contiguous so the global device order matches the batch order).

    Rows beyond the largest multiple of world_size are dropped on every
    host identically, keeping per-host counts equal (the reference's
    equal-step-count property)."""
    world = axis_size if axis_size is not None else jax.process_count()
    r = rank if rank is not None else jax.process_index()
    if world <= 1:
        return batch

    def sl(x):
        if np.ndim(x) == 0:
            return x
        n = np.shape(x)[0]
        per = max(n // world, 1)
        lo = min(r * per, n - per)
        return x[lo : lo + per]

    return jax.tree_util.tree_map(sl, batch)


def host_local_batch_to_global(batch, mesh, axis: str = "data"):
    """Per-host local batch shards → one global sharded array
    (multi-host data feeding; replaces batches[rank::world_size])."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree_util.tree_map(put, batch)
