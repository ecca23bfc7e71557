"""UNet2DCondition in Flax — SD1.5 and SDXL geometries, TPU-first.

Functional re-design of the diffusers UNet2DConditionModel the reference
trains through (reference: TrainableSDPipeline.py:144-150 calls
`self.unet(latent, t, encoder_hidden_states=...)`). Differences from the
torch original, by design:

- NHWC layout throughout (TPU conv-native), static shapes, bf16 compute
  with fp32 LoRA (reference dtype policy: training_utils/pipeline.py:
  60-70,135-138).
- Attention-probability capture is a pure-functional mode: pass
  `capture=True` and a static `capture_layers` allowlist, get a dict of
  fp32 probability tensors back as an auxiliary output. This replaces
  the reference's global AttentionStore + monkey-patched Attention
  forward (attn_utils/tc_attn_utils.py:96-196), whose
  `requires_grad`-gated capture has no meaning in a functional setting.
  Capture keys are `{place}_{res}` ("mid_8", "up_16", ...) matching the
  reference's layer naming (training_script.py:312-315).
- LoRA lives structurally inside every attention q/k/v/out projection
  (models/lora.py), rank set by `UNetConfig`-independent `lora_rank`.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comat_tpu.config import UNetConfig
from comat_tpu.models.lora import LoRADense
from comat_tpu.models.quant import QConv, QDense, QDenseGeneral
from comat_tpu.ops.attention import multi_head_attention


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers `get_timestep_embedding` semantics
    with the SD config (flip_sin_to_cos=True, freq_shift=0). fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear MLP over the sinusoidal embedding."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = nn.GroupNorm(
            num_groups=self.norm_groups, epsilon=1e-5, dtype=self.dtype,
            name="norm1",
        )(x)
        h = nn.silu(h)
        h = QConv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv1",
        )(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(
            num_groups=self.norm_groups, epsilon=1e-5, dtype=self.dtype,
            name="norm2",
        )(h)
        h = nn.silu(h)
        h = QConv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv2",
        )(h)
        if in_channels != self.out_channels:
            x = QConv(
                self.out_channels, (1, 1), dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class Attention(nn.Module):
    """Self- or cross-attention with LoRA q/k/v/out and optional probs
    capture."""

    num_heads: int
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        capture: bool = False,
        fast: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        inner_dim = x.shape[-1]
        ctx = x if context is None else context
        q = LoRADense(
            inner_dim, use_bias=False, lora_rank=self.lora_rank,
            dtype=self.dtype, name="to_q",
        )(x)
        k = LoRADense(
            inner_dim, use_bias=False, lora_rank=self.lora_rank,
            dtype=self.dtype, name="to_k",
        )(ctx)
        v = LoRADense(
            inner_dim, use_bias=False, lora_rank=self.lora_rank,
            dtype=self.dtype, name="to_v",
        )(ctx)
        # `fast` dispatches to the Pallas flash kernel (fwd + custom-VJP
        # bwd — fine on differentiable passes too); capture needs
        # materialized probs, which only the XLA path emits.
        out, probs = multi_head_attention(
            q, k, v, self.num_heads, capture_probs=capture,
            use_pallas=None if (fast and not capture) else False,
        )
        out = LoRADense(
            inner_dim, use_bias=True, lora_rank=self.lora_rank,
            dtype=self.dtype, name="to_out",
        )(out)
        return out, probs


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers BasicTransformerBlock default).

    The fused value|gate projection is a DenseGeneral with features
    (2, 4*dim) — kernel (dim, 2, 4*dim), same matmul as the flat
    (dim, 8*dim) layout with columns ordered [values, gates]. Keeping
    value/gate on a leading size-2 axis lets tensor parallelism shard
    the LAST axis so each model-shard holds matching value and gate
    columns (parallel/tp.py) — the split below then needs no
    resharding, and proj_out row-parallel closes with one all-reduce.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = QDenseGeneral(
            (2, dim * 4), dtype=self.dtype, name="proj_in"
        )(x)
        h, gate = h[..., 0, :], h[..., 1, :]
        # exact (erf) GELU to match torch F.gelu
        h = h * nn.gelu(gate, approximate=False)
        return QDense(dim, dtype=self.dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    num_heads: int
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, capture: bool = False,
        fast: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        h, _ = Attention(
            self.num_heads, self.lora_rank, self.dtype, name="attn1"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x),
          fast=fast)
        x = x + h
        h, probs = Attention(
            self.num_heads, self.lora_rank, self.dtype, name="attn2"
        )(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            context=context,
            capture=capture,
            fast=fast,
        )
        x = x + h
        h = FeedForward(self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )
        return x + h, probs


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> N blocks -> proj_out +
    residual. Cross-attention probs of each block are captured when
    requested (cross only — the grounding loss consumes cross maps,
    reference: attn_utils/tc_attn_utils.py:198-217)."""

    num_heads: int
    num_layers: int
    norm_groups: int = 32
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, capture: bool = False,
        fast: bool = False,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(
            num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype,
            name="norm",
        )(x)
        h = QDense(C, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        captured = []
        for i in range(self.num_layers):
            h, probs = TransformerBlock(
                self.num_heads, self.lora_rank, self.dtype,
                name=f"blocks_{i}",
            )(h, context, capture=capture, fast=fast)
            if capture and probs is not None:
                captured.append(probs)
        h = QDense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual, captured


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return QConv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return QConv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class UNet2DCondition(nn.Module):
    """The denoiser. Returns (eps_pred, captured_probs_dict)."""

    cfg: UNetConfig
    lora_rank: int = 0

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,              # (B, H, W, 4) latents, NHWC
        timesteps: jnp.ndarray,           # () or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, L, cross_dim)
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,
        capture: bool = False,
        capture_layers: Tuple[str, ...] = (),
        fast: bool = False,
        remat: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, List[jnp.ndarray]]]:
        cfg = self.cfg
        dt = cfg.dtype
        B = sample.shape[0]
        # --gradient_checkpointing: block-level remat — residuals are
        # stored only at resnet/transformer boundaries and each block's
        # backward recomputes its interior. This is what lets the SDXL
        # recipe's differentiable-replay VJP fit a 16GB chip (full
        # residuals for one bs-12 SDXL segment need >20GB; reference:
        # unet.enable_gradient_checkpointing(),
        # training_utils/pipeline.py:73-77).
        #
        # `remat` may also be an int R: SELECTIVE remat — only blocks
        # whose working spatial resolution is >= R recompute. The
        # high-res blocks own almost all of the residual footprint
        # (their activations are 4x/16x the next level's) but a small
        # share of the FLOPs, so remat'ing only them buys most of the
        # memory at a fraction of full remat's recompute cost. This is
        # what fits the SD1.5 full recipe in a 16GB v5e without paying
        # whole-UNet recompute (the bs-4 512px step's segment backward
        # exceeds 15.75GB HBM by ~0.3GB un-remat'd — BENCH r4 OOM log).
        def _remat_at(r: int) -> bool:
            if remat is True:
                return True
            if not remat:          # False / None / 0
                return False
            return r >= int(remat)

        def _blocks(r: int):
            if _remat_at(r):
                return (
                    nn.remat(ResnetBlock),
                    nn.remat(Transformer2D, static_argnums=(3, 4)),
                )
            return ResnetBlock, Transformer2D
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        # --- time / added embeddings (fp32 sinusoid, dtype MLP) ---
        time_embed_dim = cfg.block_out_channels[0] * 4
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(time_embed_dim, dt, name="time_embedding")(
            temb.astype(dt)
        )
        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs added_cond"
            time_ids = added_cond["time_ids"]  # (B, 6)
            t_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(B, -1)
            add_emb = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), t_emb], axis=-1
            )
            temb = temb + TimestepEmbedding(
                time_embed_dim, dt, name="add_embedding"
            )(add_emb.astype(dt))

        ctx = encoder_hidden_states.astype(dt)
        sample = sample.astype(dt)
        captured: Dict[str, List[jnp.ndarray]] = {}

        def want(place: str, res: int) -> bool:
            return capture and (
                not capture_layers or f"{place}_{res}" in capture_layers
            )

        def record(place: str, res: int, caps: List[jnp.ndarray]):
            if caps:
                captured.setdefault(f"{place}_{res}", []).extend(caps)

        # --- down ---
        sample = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
            name="conv_in",
        )(sample)
        res_stack = [sample]
        n_blocks = len(cfg.block_out_channels)
        for i, (btype, ch) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            Res, Tx = _blocks(sample.shape[1])
            for j in range(cfg.layers_per_block):
                sample = Res(
                    ch, cfg.norm_num_groups, dt,
                    name=f"down_{i}_resnet_{j}",
                )(sample, temb)
                if btype == "cross":
                    res = sample.shape[1]
                    sample, caps = Tx(
                        cfg.num_attention_heads[i],
                        cfg.transformer_layers_per_block[i],
                        cfg.norm_num_groups,
                        self.lora_rank,
                        dt,
                        name=f"down_{i}_attn_{j}",
                    )(sample, ctx, want("down", res), fast)
                    record("down", res, caps)
                res_stack.append(sample)
            if i < n_blocks - 1:
                sample = Downsample(ch, dt, name=f"down_{i}_downsample")(sample)
                res_stack.append(sample)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        Res, Tx = _blocks(sample.shape[1])
        sample = Res(
            mid_ch, cfg.norm_num_groups, dt, name="mid_resnet_0"
        )(sample, temb)
        res = sample.shape[1]
        sample, caps = Tx(
            cfg.num_attention_heads[-1],
            max(cfg.transformer_layers_per_block[-1], 1),
            cfg.norm_num_groups,
            self.lora_rank,
            dt,
            name="mid_attn",
        )(sample, ctx, want("mid", res), fast)
        record("mid", res, caps)
        sample = Res(
            mid_ch, cfg.norm_num_groups, dt, name="mid_resnet_1"
        )(sample, temb)

        # --- up ---
        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_heads = tuple(reversed(cfg.num_attention_heads))
        rev_tx = tuple(reversed(cfg.transformer_layers_per_block))
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev_ch[i]
            Res, Tx = _blocks(sample.shape[1])
            for j in range(cfg.layers_per_block + 1):
                res_h = res_stack.pop()
                sample = Res(
                    ch, cfg.norm_num_groups, dt, name=f"up_{i}_resnet_{j}"
                )(jnp.concatenate([sample, res_h], axis=-1), temb)
                if btype == "cross":
                    res = sample.shape[1]
                    sample, caps = Tx(
                        rev_heads[i],
                        rev_tx[i],
                        cfg.norm_num_groups,
                        self.lora_rank,
                        dt,
                        name=f"up_{i}_attn_{j}",
                    )(sample, ctx, want("up", res), fast)
                    record("up", res, caps)
            if i < n_blocks - 1:
                sample = Upsample(ch, dt, name=f"up_{i}_upsample")(sample)

        sample = nn.GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=dt,
            name="conv_norm_out",
        )(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
            name="conv_out",
        )(sample)
        return sample, captured
