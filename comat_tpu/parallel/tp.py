"""Tensor-parallel sharding rules (the mesh 'model' axis).

The reference is data-parallel only (SURVEY.md §2.3); TP is the extra
headroom the TPU build offers for SDXL-scale UNets: attention q/k/v and
shard output features over 'model' (= heads sharding), to_out shards
its input features, so each attention is one all-reduce inserted by
GSPMD — the Megatron pattern expressed purely through
param shardings, no collectives in model code.

Usage:
    shardings = tp_param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
then jit as usual; XLA propagates the shardings through the step.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from comat_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(keys, shape, model_size: int) -> P:
    """PartitionSpec for one UNet/text param leaf."""
    ks = [str(k) for k in keys]
    path = "/".join(ks)
    leaf_name = ks[-1] if ks else ""
    # attention projections (LoRADense: .../to_q/base/kernel)
    if any(f"/{p}/base/kernel" in "/" + path for p in ("to_q", "to_k", "to_v")):
        if len(shape) == 2 and shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)      # column parallel
    if "/to_out/base/kernel" in "/" + path:
        if len(shape) == 2 and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)      # row parallel
    # GEGLU feed-forward (models/unet.py FeedForward): the fused
    # value|gate kernel is (dim, 2, 4*dim), so sharding the LAST axis
    # keeps each shard's value and gate columns paired — column
    # parallel in, row parallel out, one all-reduce per FF.
    if "/ff/proj_in/" in "/" + path + "/":
        if leaf_name == "kernel" and len(shape) == 3 \
                and shape[2] % model_size == 0:
            return P(None, None, MODEL_AXIS)
        if leaf_name == "bias" and len(shape) == 2 \
                and shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
    if "/ff/proj_out/kernel" in "/" + path:
        if len(shape) == 2 and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)      # row parallel
    return P()  # replicated


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings implementing Megatron-style TP on every
    attention/FF projection that divides evenly; everything else
    replicated. With model axis size 1 this degrades to pure DP."""
    model_size = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        if leaf is None:
            return None
        keys = tuple(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        if model_size == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, _spec_for(keys, getattr(leaf, "shape", ()), model_size)
        )

    return jax.tree_util.tree_map_with_path(
        spec, params, is_leaf=lambda x: x is None
    )


def apply_tp(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, tp_param_shardings(params, mesh))
