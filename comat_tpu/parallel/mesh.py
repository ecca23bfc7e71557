"""Device mesh + sharding rules: GSPMD data parallelism.

Replaces the reference's accelerate/NCCL DDP (node8.yaml: 8 procs x 1
machine; accelerator.prepare at training_script.py:322-330). Here a
single `jax.sharding.Mesh` with a ('data', 'model') layout spans all
chips; the batch is sharded over 'data', parameters are replicated
(pure DP — the reference's only strategy, SURVEY.md §2.3) or sharded
over 'model' for tensor parallelism on larger configs. XLA inserts the
gradient all-reduce over ICI/DCN from the sharding annotations — no
explicit collectives in the training step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh, leading dim over 'data'.

    Single-host: plain device_put with the data sharding. Multi-host
    (jax.process_count() > 1): each host holds its shard of the global
    batch (the per-host slice produced by PromptDataset's
    process-strided partition), assembled into global arrays with
    `make_array_from_process_local_data` — the TPU equivalent of the
    reference's per-rank DDP dataloader shards (node8.yaml).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, s) if getattr(x, "ndim", 0) > 0
            else jax.device_put(x, replicated(mesh)),
            batch,
        )

    import numpy as np

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
