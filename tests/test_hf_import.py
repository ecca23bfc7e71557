"""HF import mapping tests: coverage, uniqueness, shape-consistency on
tiny geometries, plus value-level conversion on hand-built tensors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.config import CLIPTextConfig, UNetConfig, VAEConfig
from comat_tpu.models.clip_text import CLIPTextEncoder
from comat_tpu.models.hf_import import (
    _clip_hf_name,
    _unet_hf_name,
    _vae_hf_name,
    _path_keys,
    convert_tree,
)
from comat_tpu.models.unet import UNet2DCondition
from comat_tpu.models.vae import AutoencoderKL

K = jax.random.PRNGKey(0)


def _check_mapping(tree, mapper, allow_missing=()):
    names = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        keys = _path_keys(path)
        if keys[0] == "params":
            keys = keys[1:]
        if any(k.startswith("lora_") for k in keys):
            continue
        res = mapper(keys)
        assert res is not None or any(
            a in "/".join(keys) for a in allow_missing
        ), f"unmapped: {'/'.join(keys)}"
        if res is None:
            continue
        name, f = res
        # fused qkv legitimately feeds three leaves (BLIP vision)
        assert name not in names or "qkv" in name, f"duplicate target {name}"
        names[name] = keys
        # shape consistency: find an HF-layout array X with
        # f(X).shape == leaf.shape
        cands = [leaf.shape]
        if len(leaf.shape) == 1:
            cands += [(leaf.shape[0] * 3,)]  # fused qkv bias (BLIP)
        if len(leaf.shape) == 2:
            cands += [leaf.shape[::-1],
                      (leaf.shape[1], leaf.shape[0], 1, 1),
                      (leaf.shape[1] * 3, leaf.shape[0]),  # fused qkv
                      (1, 1, leaf.shape[1])]  # cls_token from (D,)...
        if len(leaf.shape) == 3:
            cands += [
                (leaf.shape[-1],),  # class_embedding (D,)
                # fused GEGLU value|gate: HF flat (8d, dim)
                (leaf.shape[1] * leaf.shape[2], leaf.shape[0]),
            ]
        if len(leaf.shape) == 4:
            cands += [tuple(np.array(leaf.shape)[[3, 2, 0, 1]])]
        ok = False
        for c in cands:
            try:
                if f(np.zeros(c, np.float32)).shape == leaf.shape:
                    ok = True
                    break
            except Exception:
                continue
        assert ok, f"no HF layout found for {'/'.join(keys)} -> {name}"
    return names


@pytest.mark.slow
def test_unet_mapping_complete():
    model = UNet2DCondition(UNetConfig.tiny(), lora_rank=2)
    params = model.init(
        K, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )
    names = _check_mapping(params, _unet_hf_name)
    assert "conv_in.weight" in names
    assert any("transformer_blocks.0.attn2.to_k.weight" in n for n in names)


def test_unet_sdxl_mapping_complete():
    cfg = UNetConfig.tiny_xl()
    model = UNet2DCondition(cfg, lora_rank=0)
    added = {"text_embeds": jnp.zeros((1, 64)), "time_ids": jnp.zeros((1, 6))}
    params = model.init(
        K, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)), added,
    )
    names = _check_mapping(params, _unet_hf_name)
    assert "add_embedding.linear_1.weight" in names


def test_clip_mapping_complete():
    cfg = CLIPTextConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "projection_dim": 16})
    model = CLIPTextEncoder(cfg)
    params = model.init(K, jnp.zeros((1, 8), jnp.int32))
    names = _check_mapping(params, _clip_hf_name)
    assert "text_model.embeddings.token_embedding.weight" in names
    assert "text_projection.weight" in names


def test_vae_mapping_complete():
    model = AutoencoderKL(VAEConfig.tiny())
    params = model.init(K, jnp.zeros((1, 32, 32, 3)))
    names = _check_mapping(params, _vae_hf_name)
    assert "decoder.conv_in.weight" in names
    assert "quant_conv.weight" in names


def test_convert_values_roundtrip():
    """Hand-built HF tensors -> converted leaves match expected layout
    transforms."""
    model = UNet2DCondition(UNetConfig.tiny(), lora_rank=0)
    params = model.init(
        K, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )
    rng = np.random.RandomState(0)
    conv_in_hf = rng.randn(32, 4, 3, 3).astype(np.float32)  # OIHW
    t1_hf = rng.randn(128, 32).astype(np.float32)           # (O, I)
    tensors = {
        "conv_in.weight": conv_in_hf,
        "time_embedding.linear_1.weight": t1_hf,
    }
    out, missing = convert_tree(params, tensors, _unet_hf_name)
    got_conv = np.asarray(out["params"]["conv_in"]["kernel"])
    np.testing.assert_allclose(
        got_conv, np.transpose(conv_in_hf, (2, 3, 1, 0))
    )
    got_t1 = np.asarray(
        out["params"]["time_embedding"]["linear_1"]["kernel"]
    )
    np.testing.assert_allclose(got_t1, t1_hf.T)
    # everything else reported missing, nothing crashed
    assert len(missing) > 0


def test_load_unet_params_from_file(tmp_path):
    """--sdxl_unet_path loader: a single-file safetensors UNet swaps in
    over the tree (reference training_utils/pipeline.py:28)."""
    from safetensors.numpy import save_file

    from comat_tpu.models.hf_import import load_unet_params

    model = UNet2DCondition(UNetConfig.tiny(), lora_rank=0)
    params = model.init(
        K, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 32)),
    )
    rng = np.random.RandomState(1)
    conv_in_hf = rng.randn(32, 4, 3, 3).astype(np.float32)
    f = tmp_path / "diffusion_pytorch_model.safetensors"
    save_file({"conv_in.weight": conv_in_hf}, str(f))

    out, missing = load_unet_params(str(f), params)
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv_in"]["kernel"]),
        np.transpose(conv_in_hf, (2, 3, 1, 0)),
    )
    # directory form loads the same file
    out2, _ = load_unet_params(str(tmp_path), params)
    np.testing.assert_allclose(
        np.asarray(out2["params"]["conv_in"]["kernel"]),
        np.transpose(conv_in_hf, (2, 3, 1, 0)),
    )


def test_blip_mapping_complete():
    from comat_tpu.config import BLIPConfig
    from comat_tpu.models.blip import BLIPCaptioner
    from comat_tpu.models.hf_import import _blip_hf_name

    cfg = BLIPConfig.tiny()
    model = BLIPCaptioner(cfg)
    S = 6
    params = model.init(
        K, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, S), jnp.int32), jnp.ones((1, S), jnp.int32),
        jnp.zeros((1, S), jnp.int32),
    )
    names = _check_mapping(params, _blip_hf_name)
    assert "vision_model.embeddings.patch_embedding.weight" in names
    assert "text_decoder.cls.predictions.decoder.weight" in names
    assert any("crossattention.self.query" in n for n in names)
