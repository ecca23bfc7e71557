"""8-bit AdamW: blockwise int8-quantized optimizer moments.

TPU-native equivalent of the reference's optional bitsandbytes
AdamW8bit (reference: training_script.py:216-223, arguments.py:137):
both Adam moments are stored as int8 with per-block fp32 absmax scales
(bitsandbytes' blockwise dynamic quantization, block=2048), cutting
optimizer-state HBM from 8 to ~2 bytes/param. Moments are dequantized,
updated in fp32, and requantized every step — the update math is
exactly AdamW between the quantization points.

Composed from optax primitives so learning-rate schedules and weight
decay behave identically to the fp32 path (training/train_step.py
make_optimizer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

_BLOCK = 2048


def _quantize(x: jnp.ndarray, block: int = _BLOCK):
    """fp32 array -> (int8 codes, per-block fp32 absmax scales)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe * 127.0), -127, 127)
    return q.astype(jnp.int8), scale[:, 0]


def _dequantize(q: jnp.ndarray, scale: jnp.ndarray, shape, block: int = _BLOCK):
    x = (q.astype(jnp.float32) / 127.0) * scale[:, None]
    n = 1
    for s in shape:
        n *= s
    return x.reshape(-1)[:n].reshape(shape)


class _Moment8(NamedTuple):
    q: jnp.ndarray       # int8 codes, (nblocks, block)
    scale: jnp.ndarray   # fp32 absmax, (nblocks,)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: any
    nu: any


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block: int = _BLOCK,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with int8 blockwise-quantized moments."""

    def init(params):
        def zeros(p):
            n = p.size
            nblocks = -(-n // block)
            return _Moment8(
                q=jnp.zeros((nblocks, block), jnp.int8),
                scale=jnp.zeros((nblocks,), jnp.float32),
            )

        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def step(g, m8, v8):
            g = g.astype(jnp.float32)
            m = _dequantize(m8.q, m8.scale, g.shape, block)
            v = _dequantize(v8.q, v8.scale, g.shape, block)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            out = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return out, _Moment8(*_quantize(m, block)), _Moment8(
                *_quantize(v, block)
            )

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        outs = [step(g, m, v) for g, m, v in zip(flat_u, flat_m, flat_v)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)


def adamw_8bit(
    learning_rate: Union[float, optax.Schedule],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block: int = _BLOCK,
) -> optax.GradientTransformation:
    """AdamW with 8-bit moment storage (drop-in for optax.adamw)."""
    return optax.chain(
        scale_by_adam_8bit(b1, b2, eps, block),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
