"""Pallas TPU flash attention — forward and custom-VJP backward.

Replaces the reference's dependency on xformers memory-efficient CUDA
attention (reference: training_script.py:135-146, requirements.txt:7)
for the sampler's no-grad denoise scan, where ~98% of attention FLOPs
live. The UNet's spatial self-attention reaches 4096 tokens at 512x512
(SURVEY.md §5.7); materializing (S, S) probabilities in HBM is the
bandwidth bottleneck XLA's unfused path would hit, so this kernel keeps
the online-softmax state in VMEM and never writes probs.

Design (v5e-swept at SD1.5 shapes, B8 H8 S4096 d40):
  grid = (batch*heads, Sq/block_q) with block_q=1024, block_kv=1024;
  K/V for one (batch, head) stay resident in VMEM; the kernel iterates
  KV chunks with fp32 running (max, acc) online-softmax state. At
  head_dim 40 the QK^T and PV matmuls occupy only 40/128 MXU lanes, so
  the kernel is VPU-softmax-bound — three measured optimizations
  recover ~35% (36.9 -> 49.6 TF/s, vs the ~61 TF/s d-padding ceiling):
    1. the softmax scale is folded into q once outside the kernel
       (removes a (bq, bkv) multiply per chunk);
    2. V carries a trailing ones column, so the softmax denominator
       rides the PV matmul on the MXU as acc's last column (removes a
       (bq, bkv) lane-reduction per chunk);
    3. the KV loop is statically unrolled (Mosaic pipelines the
       MXU/VPU phases across chunks).
  Head dims stay unpadded (lane padding happens inside the MXU);
  non-multiple KV lengths are masked with a static valid-length — but
  note small-context attention (cross-attention over 77 text tokens)
  is measured FASTER on the plain XLA path and is dispatched there by
  ops/attention.py, not here.

  d-padding experiment (round 3, tools/bench_flash_dpad.py, v5e via
  relay, same session for all three settings — useful-FLOP TF/s at
  B8 H8 S4096 d40):
      COMAT_FLASH_D_PAD   fwd TF/s   fwd+bwd TF/s
      0 (unpadded)        38.3       36.5
      64                  38.3       35.0
      128                 28.2       32.3
  Padding does NOT help: the MXU processes the d-contraction in full
  128-lane passes regardless, so zero columns buy nothing on the
  matmuls, while the padded qf/kf/vf copies add real HBM traffic
  (explicit at d=128, where fwd loses 27%). The "~61 TF/s d-padded
  ceiling" from the round-2 sweep does not reproduce under like-for-
  like conditions; unpadded stays the default and the env knob remains
  for re-running the experiment.

Backward (`flash_attention_vjp`): the standard flash decomposition —
forward additionally emits the per-row logsumexp; the backward
recomputes probabilities blockwise from (q, k, L) and accumulates
dq / (dk, dv) in two independent kernels (parallel over q blocks and
kv blocks respectively), never materializing the (Sq, Skv) matrix in
HBM. The saved q residual is pre-scaled, so backward logits need no
scale multiply either (dk absorbs it; dq keeps the chain-rule factor).
This is what lets the differentiable replay pass use fused attention
where the reference had to fall back to unfused torch attention on
captured layers (attn_utils/tc_attn_utils.py:104-161). Probability
*capture* still uses the XLA path (probs are the point).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_MAX_UNROLL = 8


def _kv_loop(num_kv: int, body, carry, unroll: bool = True):
    """Statically unroll short KV loops (measured ~15% on v5e); fall
    back to fori_loop for long ones to bound code size. The backward
    kernels must NOT unroll: their per-iteration (bq, bkv) fp32
    temporaries (logits, p, dp, ds) stay live across unrolled
    iterations and blow the 16MB scoped-VMEM stack limit."""
    if unroll and num_kv <= _MAX_UNROLL:
        for j in range(num_kv):
            carry = body(j, carry)
        return carry
    return jax.lax.fori_loop(0, num_kv, body, carry)


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, *lse_ref,
    block_kv: int, kv_valid: int,
):
    """Online-softmax forward. q is pre-scaled; v has a trailing ones
    column so the denominator accumulates as acc's last column. With
    `lse_ref` present, also writes the per-row logsumexp (bwd
    residual)."""
    q = q_ref[0]  # (bq, d)
    bq, _ = q.shape
    skv = k_ref.shape[1]
    d_aug = v_ref.shape[2]
    num_kv = skv // block_kv

    def body(j, carry):
        acc, m = carry
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]  # (bkv, d)
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]  # (bkv, d+1)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bkv) f32
        if kv_valid % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(
                (j * block_kv + col) < kv_valid, logits, NEG_INF
            )
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new

    acc0 = jnp.zeros((bq, d_aug), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    acc, m = _kv_loop(num_kv, body, (acc0, m0))
    l = acc[:, d_aug - 1 : d_aug]
    o_ref[0] = (acc[:, : d_aug - 1] / l).astype(o_ref.dtype)
    if lse_ref:
        # TPU tiling: (1, bq) blocks are illegal (sublane dim must be
        # divisible by 8) — broadcast the row stats across 8 sublanes.
        lse_ref[0][0] = jnp.broadcast_to(
            (m + jnp.log(l))[:, 0][None, :], lse_ref[0].shape[1:]
        )


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref,
    *, block_kv: int, kv_valid: int, scale: float,
):
    q = q_ref[0]        # pre-scaled
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]   # (bq, 1)
    dvec = dvec_ref[0, 0][:, None]
    bq, d = q.shape
    skv = k_ref.shape[1]
    num_kv = skv // block_kv

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
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

    acc = _kv_loop(
        num_kv, body, jnp.zeros((bq, d), jnp.float32), unroll=False
    )
    # q was pre-scaled: dq = d(loss)/d(q_orig) = (ds @ k) * scale
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
    *, block_q: int, kv_valid: int,
):
    k = k_ref[0]   # (bkv, d)
    v = v_ref[0]
    bkv, d = k.shape
    sq = q_ref.shape[1]
    num_q = sq // block_q
    kv_block = pl.program_id(1)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]   # pre-scaled
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        dvec = dvec_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
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
        # q is pre-scaled, so ds^T @ q already carries the scale
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    dk0 = jnp.zeros((bkv, d), jnp.float32)
    dv0 = jnp.zeros((bkv, d), jnp.float32)
    dk, dv = _kv_loop(num_q, body, (dk0, dv0), unroll=False)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    # COMAT_FLASH_D_PAD=<N> pads small head dims up to N (the d-padding
    # experiment — tools/bench_flash_dpad.py sweeps it; see the module
    # docstring for the measured verdict). Exact numerics either way:
    # zero q/k columns leave logits unchanged, zero v columns are
    # sliced off, and the bwd unpads dq/dk/dv.
    d_pad = d if d % 8 == 0 else _round_up(d, 8)
    dmin = int(os.environ.get("COMAT_FLASH_D_PAD", "0"))
    if dmin and d_pad < dmin:
        d_pad = dmin
    # swept on v5e at SD1.5 shapes (B8 H8 S4096 d40): bq=1024/bkv=1024
    # is the plateau (with the unrolled kernel); bkv=256 regresses badly.
    block_q = min(1024, _round_up(Sq, 8))
    block_kv = min(1024, _round_up(Skv, 128))
    return d_pad, block_q, block_kv, _round_up(Sq, block_q), _round_up(
        Skv, block_kv
    )


def _fwd(q, k, v, want_lse: bool, interpret: bool = False):
    """Shared forward: pre-scale q, append the ones column to v, run the
    kernel. Returns (out_padded, lse or None, (qf, kf, vf_aug))."""
    B, H, Sq, d = q.shape
    Skv = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    d_pad, bq, bkv, sq_pad, skv_pad = _blocks(Sq, Skv, d)
    qf = _pad_bhsd(q * jnp.asarray(scale, q.dtype), sq_pad, d_pad)
    kf = _pad_bhsd(k, skv_pad, d_pad)
    vf = _pad_bhsd(v, skv_pad, d_pad)
    ones = jnp.ones((B * H, skv_pad, 1), vf.dtype)
    vf_aug = jnp.concatenate([vf, ones], axis=-1)
    d_aug = d_pad + 1

    grid = (B * H, sq_pad // bq)
    out_shapes = [jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((B * H, 8, sq_pad), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 8, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
        )
    # Fat heads (the VAE's single-head d=512 bottleneck attention) need
    # scoped-VMEM headroom beyond the 16MB default: when XLA keeps the
    # kernel output in VMEM for a consumer fusion, the unrolled-loop
    # temporaries push the stack past the limit (seen at B4 S4096 d512
    # inside the full train step; the standalone kernel fits). Leave
    # the swept UNet shapes (d<=160) on the default limit.
    cparams = (
        pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
        if d_pad > 160
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        )
    )
    res = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, block_kv=bkv, kv_valid=Skv
        ),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_pad, d_aug), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        compiler_params=cparams,
        interpret=interpret,
    )(qf, kf, vf_aug)
    if want_lse:
        out, lse = res
    else:
        (out,), lse = res, None
    return out, lse, (qf, kf, vf_aug)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over (B, H, S, d) tensors. Returns (B, H, Sq, d).

    Not differentiable (no VJP registered) — use only under
    stop_gradient / inference. `flash_attention_diff` is the
    custom-VJP variant.
    """
    B, H, Sq, d = q.shape
    out, _, _ = _fwd(q, k, v, want_lse=False, interpret=interpret)
    return out[:, :Sq, :d].reshape(B, H, Sq, d)


@jax.custom_vjp
def flash_attention_diff(q, k, v):
    """Differentiable fused attention over (B, H, S, d)."""
    B, H, Sq, d = q.shape
    out, _, _ = _fwd(q, k, v, want_lse=False)
    return out[:, :Sq, :d].reshape(B, H, Sq, d)


def _flash_diff_fwd(q, k, v):
    B, H, Sq, d = q.shape
    out, lse, (qf, kf, vf_aug) = _fwd(q, k, v, want_lse=True)
    res = (qf, kf, vf_aug, out, lse, (B, H, Sq, k.shape[2], d))
    return out[:, :Sq, :d].reshape(B, H, Sq, d), res


def _flash_diff_bwd(res, g):
    qf, kf, vf_aug, out_pad, lse, (B, H, Sq, Skv, d) = res
    vf = vf_aug[:, :, :-1]
    scale = 1.0 / (d ** 0.5)
    d_pad, bq, bkv, sq_pad, skv_pad = _blocks(Sq, Skv, d)
    # backward q blocks are smaller than the forward's: the bwd
    # kernels hold four (bq, bkv) fp32 temporaries live plus (bq/bkv,
    # d) accumulators, and larger blocks exceed the 16MB scoped-VMEM
    # stack limit (shrink further for fat heads like the VAE's d=512)
    if d_pad <= 128:
        bq = min(512, bq)
    else:
        bq = min(256, bq)
        bkv = min(512, bkv)  # fwd skv_pad stays (it is a bkv multiple)
    gf = _pad_bhsd(g, sq_pad, d_pad)
    # dvec = rowsum(dO * O) in fp32 (padded rows contribute zero),
    # broadcast across 8 sublanes like lse (TPU block tiling)
    dvec = jnp.sum(
        gf.astype(jnp.float32) * out_pad.astype(jnp.float32), axis=-1
    )
    dvec = jnp.broadcast_to(
        dvec[:, None, :], (dvec.shape[0], 8, dvec.shape[1])
    )

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
            # fat-head (d=512 VAE) accumulators need more scoped VMEM
            # than the 16MB default
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qf, kf, vf, gf, lse, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=bq, kv_valid=Skv
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
            # fat-head (d=512 VAE) accumulators need more scoped VMEM
            # than the 16MB default
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qf, kf, vf, gf, lse, dvec)

    unpad = lambda x, S: x[:, :S, :d].reshape(B, H, S, d)
    return unpad(dq, Sq), unpad(dk, Skv), unpad(dv, Skv)


flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
