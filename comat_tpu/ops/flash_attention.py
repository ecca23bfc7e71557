"""Pallas TPU flash attention — forward and custom-VJP backward.

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

Backward (`flash_attention_vjp`): the standard flash decomposition —
forward additionally emits the per-row logsumexp; the backward
recomputes probabilities blockwise from (q, k, L) and accumulates
dq / (dk, dv) in two independent kernels (parallel over q blocks and
kv blocks respectively), never materializing the (Sq, Skv) matrix in
HBM. This is what lets the differentiable replay pass use fused
attention where the reference had to fall back to unfused torch
attention on captured layers (attn_utils/tc_attn_utils.py:104-161).
Probability *capture* still uses the XLA path (probs are the point).
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


def _flash_fwd_lse_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, block_kv: int, kv_valid: int, scale: float,
):
    """Forward that additionally writes the per-row logsumexp (bwd
    residual)."""
    q = q_ref[0]
    bq, d = q.shape
    skv = k_ref.shape[1]
    num_kv = skv // block_kv

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        logits = (
            jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if kv_valid % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(
                (j * block_kv + col) < kv_valid, logits, NEG_INF
            )
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # TPU tiling: (1, bq) blocks are illegal (sublane dim must be
    # divisible by 8) — broadcast the row stats across 8 sublanes.
    lse_ref[0] = jnp.broadcast_to(
        (m + jnp.log(l))[:, 0][None, :], lse_ref.shape[1:]
    )


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref,
    *, block_kv: int, kv_valid: int, scale: float,
):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]   # (bq, 1)
    dvec = dvec_ref[0, 0][:, None]
    bq, d = q.shape
    skv = k_ref.shape[1]
    num_kv = skv // block_kv

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        logits = (
            jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if kv_valid % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(
                (j * block_kv + col) < kv_valid, logits, NEG_INF
            )
        p = jnp.exp(logits - lse)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dvec)
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, num_kv, body, jnp.zeros((bq, d), jnp.float32)
    )
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
    *, block_q: int, kv_valid: int, scale: float,
):
    k = k_ref[0]   # (bkv, d)
    v = v_ref[0]
    bkv, d = k.shape
    sq = q_ref.shape[1]
    num_q = sq // block_q
    kv_block = pl.program_id(1)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        dvec = dvec_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        logits = (
            jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if kv_valid % bkv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(
                (kv_block * bkv + col) < kv_valid, logits, NEG_INF
            )
        p = jnp.exp(logits - lse)  # (bq, bkv)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dvec)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    dk0 = jnp.zeros((bkv, d), jnp.float32)
    dv0 = jnp.zeros((bkv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Sq, :d].reshape(B, H, Sq, d)


def _pad_bhsd(x, s_pad, d_pad):
    B, H, S, d = x.shape
    out = x.reshape(B * H, S, d)
    if s_pad != S or d_pad != d:
        out = jnp.pad(out, ((0, 0), (0, s_pad - S), (0, d_pad - d)))
    return out


def _blocks(Sq, Skv, d):
    # No blocking over d: a block dim equal to the full array dim is
    # always legal, so keep d unpadded (lane padding happens inside the
    # MXU) except for tiny dims where an 8-multiple helps Mosaic.
    d_pad = d if d % 8 == 0 else _round_up(d, 8)
    # swept on v5e at SD1.5 shapes (B8 H8 S4096 d40): bq=512/bkv=1024
    # is the plateau; larger q blocks regress, bkv=256 badly so.
    block_q = min(512, _round_up(Sq, 8))
    block_kv = min(1024, _round_up(Skv, 128))
    return d_pad, block_q, block_kv, _round_up(Sq, block_q), _round_up(
        Skv, block_kv
    )


def _fwd_lse(q, k, v):
    B, H, Sq, d = q.shape
    Skv = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    d_pad, bq, bkv, sq_pad, skv_pad = _blocks(Sq, Skv, d)
    qf = _pad_bhsd(q, sq_pad, d_pad)
    kf = _pad_bhsd(k, skv_pad, d_pad)
    vf = _pad_bhsd(v, skv_pad, d_pad)
    grid = (B * H, sq_pad // bq)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_lse_kernel, block_kv=bkv, kv_valid=Skv, scale=scale
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((B * H, 8, sq_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf)
    return out, lse, (qf, kf, vf)


@jax.custom_vjp
def flash_attention_diff(q, k, v):
    """Differentiable fused attention over (B, H, S, d)."""
    B, H, Sq, d = q.shape
    out, _, _ = _fwd_lse(q, k, v)
    return out[:, :Sq, :d].reshape(B, H, Sq, d)


def _flash_diff_fwd(q, k, v):
    B, H, Sq, d = q.shape
    out, lse, (qf, kf, vf) = _fwd_lse(q, k, v)
    res = (qf, kf, vf, out, lse, (B, H, Sq, k.shape[2], d))
    return out[:, :Sq, :d].reshape(B, H, Sq, d), res


def _flash_diff_bwd(res, g):
    qf, kf, vf, out_pad, lse, (B, H, Sq, Skv, d) = res
    scale = 1.0 / (d ** 0.5)
    d_pad, bq, bkv, sq_pad, skv_pad = _blocks(Sq, Skv, d)
    gf = _pad_bhsd(g, sq_pad, d_pad)
    # dvec = rowsum(dO * O) in fp32 (padded rows contribute zero),
    # broadcast across 8 sublanes like lse (TPU block tiling)
    dvec = jnp.sum(
        gf.astype(jnp.float32) * out_pad.astype(jnp.float32), axis=-1
    )
    dvec = jnp.broadcast_to(dvec[:, None, :], (dvec.shape[0], 8, dvec.shape[1]))

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, block_kv=bkv, kv_valid=Skv, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), qf.dtype),
        grid=(B * H, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf, gf, lse, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=bq, kv_valid=Skv, scale=scale
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, skv_pad, d_pad), kf.dtype),
            jax.ShapeDtypeStruct((B * H, skv_pad, d_pad), vf.dtype),
        ),
        grid=(B * H, skv_pad // bkv),
        in_specs=[
            pl.BlockSpec((1, sq_pad, d_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sq_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sq_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bkv, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d_pad), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qf, kf, vf, gf, lse, dvec)

    unpad = lambda x, S: x[:, :S, :d].reshape(B, H, S, d)
    return unpad(dq, Sq), unpad(dk, Skv), unpad(dv, Skv)


flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
