"""Device mesh construction for DP (utterance batches) x TP (ICI model shard).

The reference declares HF TP plans (colwise q/k/v + gate/up, rowwise
o/down — reference configuration_qwen3_tts.py:172-185, 354-367) executed by
torch DTensor; here the same layout is expressed as GSPMD sharding
annotations over a (data, model) mesh and XLA inserts the collectives
(psum after o_proj/down_proj) on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """(data, model) mesh. model axis should map to ICI-adjacent devices —
    jax device order within a host satisfies this on TPU slices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (rank - 1))))
