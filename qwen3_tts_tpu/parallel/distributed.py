"""Multi-host runtime helpers.

The reference's distributed story is accelerate/NCCL (finetune only); here
multi-host runs through `jax.distributed.initialize` + GSPMD: the (data,
model) mesh spans all processes, the model axis stays within a host's ICI
ring, and the data axis crosses hosts over DCN. Per-host utterance batches
are assembled with `make_global_batch`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime (no-op when single-process TPU metadata
    auto-discovers)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over all processes' devices. `model` should divide
    the per-host device count so TP collectives ride ICI, not DCN."""
    devices = np.asarray(jax.devices())
    n = devices.size
    per_host = jax.local_device_count()
    if model_parallel > per_host:
        raise ValueError(f"model_parallel {model_parallel} > {per_host} "
                         "local devices: TP would cross DCN")
    return Mesh(devices.reshape(n // model_parallel, model_parallel),
                ("data", "model"))


def make_global_batch(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a data-sharded global array from this process's local shard
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P("data", *([None] * (local_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_batch)
