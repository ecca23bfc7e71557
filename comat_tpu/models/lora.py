"""LoRA-augmented projection layers and parameter-tree utilities.

The reference injects diffusers `LoRAAttnProcessor`s into every UNet
attention q/k/v/out projection (reference: training_utils/pipeline.py:
87-115) and upcasts LoRA weights to fp32 while the base model runs fp16
(pipeline.py:135-138). Here LoRA is structural: `LoRADense` owns both
the frozen base kernel and the `lora_a`/`lora_b` factors in one param
tree; trainability is decided by path filtering (`lora_label_tree`),
which is how optax masks the optimizer instead of mutating
`requires_grad`.

Math (matching diffusers LoRALinearLayer): y = x W + (x A) B, with
A ~ N(0, 1/rank), B = 0 at init, scale 1. LoRA *master weights* are
float32 (the reference upcasts them: pipeline.py:135-138), but the
matmuls run in the module compute dtype — exactly what the reference
executes, since torch autocast re-casts the fp32 LoRA weights to fp16
at F.linear. At rank 128 the LoRA matmuls are comparable FLOPs to the
base projection, so running them fp32 would halve attention-projection
MXU throughput.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoRADense(nn.Module):
    """Dense layer with an optional fp32 LoRA branch.

    `lora_rank == 0` makes it a plain Dense (no lora params created), so
    frozen towers (discriminator base, text encoders by default) share
    the same module code.
    """

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from comat_tpu.models.quant import QDense

        # QDense == nn.Dense for float kernels; the int8 branch only
        # activates on a quantize_unet_tree'd pass-1 tree (lora_rank=0
        # inference twin — LoRA is already folded there).
        y = QDense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="base",
        )(x)
        if self.lora_rank > 0:
            in_features = x.shape[-1]
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / self.lora_rank),
                (in_features, self.lora_rank),
                jnp.float32,
            )
            lora_b = self.param(
                "lora_b",
                nn.initializers.zeros_init(),
                (self.lora_rank, self.features),
                jnp.float32,
            )
            dt = self.dtype
            delta = (x.astype(dt) @ lora_a.astype(dt)) @ lora_b.astype(dt)
            y = y + delta.astype(y.dtype)
        return y


def is_lora_path(path) -> bool:
    """True if a param-tree path (tuple of str keys) is a LoRA factor."""
    return any(str(k).startswith("lora_") for k in path)


def lora_label_tree(params) -> Any:
    """Label each leaf "lora" or "frozen" (for optax.multi_transform /
    masked updates)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}
    for path, _ in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        labels[keys] = "lora" if is_lora_path(keys) else "frozen"

    def label(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        return labels[keys]

    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(params) -> Any:
    """Boolean pytree: True for LoRA leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_lora_path(
            tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        ),
        params,
    )


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def merge_params(trainable, frozen):
    """Recombine a (trainable, frozen) partition (None placeholders in
    each where the other holds the leaf) into one param tree."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, trainable, frozen,
        is_leaf=lambda x: x is None,
    )


def split_lora_params(params) -> Dict[str, Any]:
    """Partition into {"lora": subtree-with-None, "frozen": ...} for
    checkpointing LoRA separately (reference checkpoints save only LoRA:
    training_script.py:391-426)."""
    mask = trainable_mask(params)
    lora = jax.tree_util.tree_map(
        lambda m, p: p if m else None, mask, params,
        is_leaf=lambda x: x is None,
    )
    frozen = jax.tree_util.tree_map(
        lambda m, p: None if m else p, mask, params,
        is_leaf=lambda x: x is None,
    )
    return {"lora": lora, "frozen": frozen}


def fuse_lora_tree(tree):
    """Fold every LoRA branch into its base kernel: W_eff = W + A @ B.

    Returns a tree with the `lora_a`/`lora_b` leaves removed and the
    `base` kernels updated, structurally matching a `lora_rank=0`
    instantiation of the same module (plain Dense under the same
    `base` name). Used for pass-1 inference and validation sampling
    (models/pipeline.py): at rank 128 the per-token LoRA matmuls cost
    ~40-80% of the base projection FLOPs in every one of the 50 denoise
    forwards, while fusing costs one (in, r) @ (r, out) matmul per layer
    per step. Matches diffusers' fuse_lora() semantics (scale 1).
    Numerics: W + A@B is accumulated in fp32 master weights; results
    differ from the per-token branch only by rounding.
    """
    if not isinstance(tree, dict):
        return tree
    if "lora_a" in tree and "lora_b" in tree and "base" in tree:
        base = dict(tree["base"])
        delta = tree["lora_a"].astype(jnp.float32) @ tree["lora_b"].astype(
            jnp.float32
        )
        base["kernel"] = (
            base["kernel"].astype(jnp.float32) + delta
        ).astype(tree["base"]["kernel"].dtype)
        return {"base": base}
    return {k: fuse_lora_tree(v) for k, v in tree.items()}
