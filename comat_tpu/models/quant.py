"""Opt-in W8A8 int8 numerics for the no-grad pass-1 UNet forwards.

The v5e MXU runs int8 x int8 -> int32 at twice its bf16 rate, and the 50
CFG sampling forwards of the CoMat step (reference:
TrainableSDPipeline.py:132-152 under `torch.no_grad` semantics — the
grad-free sampling majority of the step) are pure inference: no
optimizer state, no VJP, numerics the reference itself already relaxes
to fp16. `--pass1_int8` relaxes them one step further to dynamic W8A8:

- weights: symmetric per-output-channel int8, quantized ONCE per step
  when the LoRA fold builds the pass-1 tree (models/lora.py
  fuse_lora_tree -> quantize_unet_tree), so the quantization cost is
  outside the 50-step scan;
- activations: symmetric dynamic absmax, per-token for matmuls and
  per-sample for convs (a conv output pixel mixes several input pixels,
  so a finer per-pixel scale would be incorrect across the receptive
  field);
- accumulation in int32 on the MXU, dequantize + bias in fp32.

The module classes below are drop-in subclasses of their flax parents:
they branch on `kernel.dtype == int8` at apply time, so the SAME model
code serves the trainable bf16 path (bit-identical to flax — proven in
tests/test_quant.py) and the quantized pass-1 tree. Init never creates
int8 params; `quantize_unet_tree` rewrites a fused param tree, adding a
`kernel_scale` leaf beside each int8 kernel.

The flash-attention q@k / p@v contractions and the small/sensitive
layers (time embeddings, conv_in on 4-channel latents, the final
conv_out, GroupNorm/LayerNorm affines) stay bf16/fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-12


def _quant_dynamic(x: jnp.ndarray, reduce_axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric dynamic activation quantization: returns (x_q int8,
    scale f32 with reduced axes kept)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True), _EPS
    ) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dequant_bias(y_i32, s_x, w_scale, bias, out_dtype):
    y = y_i32.astype(jnp.float32) * s_x * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QDense(nn.Dense):
    """nn.Dense that runs W8A8 when its kernel arrives int8 (see module
    docstring). Non-int8 trees take the stock flax path unchanged."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.get_variable("params", "kernel")
        if k is None or k.dtype != jnp.int8:
            return super().__call__(x)
        w_scale = self.get_variable("params", "kernel_scale")  # (features,)
        bias = self.get_variable("params", "bias") if self.use_bias else None
        xq, sx = _quant_dynamic(x, reduce_axes=x.ndim - 1)
        y = jax.lax.dot_general(
            xq, k, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _dequant_bias(y, sx, w_scale, bias, self.dtype)


class QDenseGeneral(nn.DenseGeneral):
    """nn.DenseGeneral (single last-axis contraction, multi-axis
    features — the GEGLU value|gate projection) with the int8 branch."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.get_variable("params", "kernel")
        if k is None or k.dtype != jnp.int8:
            return super().__call__(x)
        assert self.axis == -1 and self.batch_dims == (), (
            "int8 QDenseGeneral supports the last-axis contraction form"
        )
        w_scale = self.get_variable("params", "kernel_scale")  # features
        bias = self.get_variable("params", "bias") if self.use_bias else None
        xq, sx = _quant_dynamic(x, reduce_axes=x.ndim - 1)
        y = jax.lax.dot_general(
            xq, k, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # y: (..., *features); sx broadcasts from (..., 1) over the
        # n_feature_axes tail
        n_feat = k.ndim - 1
        sx = sx.reshape(sx.shape[:-1] + (1,) * n_feat)
        return _dequant_bias(y, sx, w_scale, bias, self.dtype)


class QConv(nn.Conv):
    """nn.Conv (NHWC/HWIO) with the int8 branch: per-sample activation
    scale, per-output-channel weight scale, int32 accumulation."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.get_variable("params", "kernel")
        if k is None or k.dtype != jnp.int8:
            return super().__call__(x)
        w_scale = self.get_variable("params", "kernel_scale")  # (O,)
        bias = self.get_variable("params", "bias") if self.use_bias else None
        # per-sample scale: one scalar per batch element (correct under
        # the cross-pixel mixing of the conv stencil)
        xq, sx = _quant_dynamic(x, reduce_axes=(1, 2, 3))
        strides = self.strides or (1,) * (x.ndim - 2)
        if isinstance(strides, int):
            strides = (strides,) * (x.ndim - 2)
        padding: Union[str, Sequence[Tuple[int, int]]] = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding)] * (x.ndim - 2)
        elif isinstance(padding, Sequence) and padding and isinstance(
            padding[0], int
        ):
            padding = [(p, p) for p in padding]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xq, k, window_strides=tuple(strides), padding=padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        return _dequant_bias(y, sx, w_scale, bias, self.dtype)


# Param-tree module names never quantized: negligible FLOPs and/or
# numerically load-bearing ends of the network.
_SKIP_SUBSTRINGS = (
    "time_embedding", "add_embedding", "time_emb_proj",
)
_SKIP_EXACT_MODULES = ("conv_in", "conv_out")


def _quantizable(path: Tuple[str, ...], leaf) -> bool:
    if path[-1] != "kernel" or leaf.ndim < 2:
        return False
    if any(s in p for s in _SKIP_SUBSTRINGS for p in path):
        return False
    # last module name on the path (the dict holding this kernel)
    mod = path[-2] if len(path) >= 2 else ""
    if mod in _SKIP_EXACT_MODULES:
        return False
    return True


def _weight_quant(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8. Output channels = the last
    axis for Dense (in,out) / Conv (H,W,I,O) kernels, the last TWO for
    the GEGLU DenseGeneral (in, 2, 4d)."""
    reduce_axes = (0,) if k.ndim == 3 else tuple(range(k.ndim - 1))
    kf = k.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(kf), axis=reduce_axes, keepdims=False), _EPS
    ) / 127.0
    q = jnp.clip(
        jnp.round(kf / jnp.expand_dims(s, reduce_axes)), -127, 127
    ).astype(jnp.int8)
    return q, s


def quantize_unet_tree(tree: Any, _path: Tuple[str, ...] = ()) -> Any:
    """Rewrite a fused (LoRA-free) UNet param tree for W8A8 pass-1:
    every quantizable `kernel` becomes int8 with a sibling
    `kernel_scale` (f32, per-output-channel). Other leaves unchanged.

    Runs under jit (inside the train step, once per step, outside the
    sampling scan)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for name, v in tree.items():
        p = _path + (name,)
        if isinstance(v, dict):
            out[name] = quantize_unet_tree(v, p)
        elif name == "kernel" and _quantizable(p, v):
            q, s = _weight_quant(v)
            out["kernel"] = q
            out["kernel_scale"] = s
        else:
            out[name] = v
    return out
