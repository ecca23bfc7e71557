"""Pallas TPU flash attention (forward, inference path).

Replaces the reference's dependency on xformers memory-efficient CUDA
attention (reference: training_script.py:135-146, requirements.txt:7)
for the sampler's no-grad denoise scan, where ~98% of attention FLOPs
live. The UNet's spatial self-attention reaches 4096 tokens at 512x512
(SURVEY.md §5.7); materializing (S, S) probabilities in HBM is the
bandwidth bottleneck XLA's unfused path would hit, so this kernel keeps
the online-softmax state in VMEM and never writes probs.

Design:
  grid = (batch*heads, Sq/block_q); K/V for one (batch, head) stay
  resident in VMEM; the kernel loops over KV chunks with fp32 running
  (max, sum, acc) online-softmax state. Head dims are zero-padded to a
  lane multiple outside the kernel (zero-padded key dims do not change
  logits; zero-padded value dims produce zero output columns that are
  sliced off). Non-multiple KV lengths (e.g. the 77-token CLIP context)
  are masked with a static valid-length.

The differentiable replay pass uses the XLA attention in
comat_tpu/ops/attention.py instead (autodiff + probs capture); a custom
VJP for this kernel is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_kv: int, kv_valid: int, scale: float
):
    q = q_ref[0]  # (bq, d)
    bq, d = q.shape
    skv = k_ref.shape[1]
    num_kv = skv // block_kv

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]  # (bkv, d)
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        logits = (
            jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (bq, bkv) f32
        if kv_valid % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            valid = (j * block_kv + col) < kv_valid
            logits = jnp.where(valid, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over (B, H, S, d) tensors. Returns (B, H, Sq, d).

    Not differentiable (no VJP registered) — use only under
    stop_gradient / inference.
    """
    B, H, Sq, d = q.shape
    Skv = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    # Pad head dim to a TPU lane multiple, KV length to a block multiple.
    d_pad = _round_up(d, 128)
    block_q = min(512, _round_up(Sq, 8))
    block_kv = min(512, _round_up(Skv, 128))
    sq_pad = _round_up(Sq, block_q)
    skv_pad = _round_up(Skv, block_kv)

    def pad(x, s_pad, target_s_axis=2):
        pads = [(0, 0)] * x.ndim
        pads[target_s_axis] = (0, s_pad - x.shape[target_s_axis])
        pads[3] = (0, d_pad - x.shape[3])
        return jnp.pad(x, pads) if any(p != (0, 0) for p in pads) else x

    qf = pad(q.reshape(B * H, Sq, d)[:, None], sq_pad)[:, 0]
    kf = pad(k.reshape(B * H, Skv, d)[:, None], skv_pad)[:, 0]
    vf = pad(v.reshape(B * H, Skv, d)[:, None], skv_pad)[:, 0]

    grid = (B * H, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            block_kv=block_kv,
            kv_valid=Skv,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_pad),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, skv_pad, d_pad),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Sq, :d].reshape(B, H, Sq, d)
