"""Model-stack tests on tiny CPU-runnable geometries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.config import BLIPConfig, CLIPTextConfig, UNetConfig, VAEConfig
from comat_tpu.models.blip import BLIPCaptioner
from comat_tpu.models.clip_text import CLIPTextEncoder
from comat_tpu.models.lora import trainable_mask
from comat_tpu.models.unet import UNet2DCondition
from comat_tpu.models.vae import AutoencoderKL

K = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def unet_setup():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg, lora_rank=4)
    x = jax.random.normal(K, (2, 16, 16, 4))
    ctx = jax.random.normal(K, (2, 77, 32))
    t = jnp.array([10, 500])
    params = model.init(K, x, t, ctx)
    return model, params, x, ctx, t


def test_unet_shapes_and_capture(unet_setup):
    model, params, x, ctx, t = unet_setup
    eps, caps = model.apply(params, x, t, ctx)
    assert eps.shape == (2, 16, 16, 4)
    assert caps == {}
    eps2, caps2 = model.apply(
        params, x, t, ctx, capture=True, capture_layers=("mid_2", "up_8")
    )
    # capture must not perturb the output
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), atol=1e-6)
    # mid has 1 transformer layer; up block at res 8 has 3 (layers+1)
    assert [v.shape for v in caps2["mid_2"]] == [(2, 2, 4, 77)]
    assert [v.shape for v in caps2["up_8"]] == [(2, 2, 64, 77)] * 3
    # probs rows sum to 1
    p = np.asarray(caps2["up_8"][0])
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_unet_grad_flows_to_lora(unet_setup):
    model, params, x, ctx, t = unet_setup

    def loss(p):
        e, _ = model.apply(p, x, t, ctx)
        return (e.astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss))(params)
    mask = jax.tree.leaves(trainable_mask(g))
    leaves = jax.tree.leaves(g)
    lora_norm = sum(
        float(jnp.abs(l).sum()) for l, m in zip(leaves, mask) if m
    )
    assert np.isfinite(lora_norm)
    # lora_b is zero-init, so lora_a grads vanish but lora_b grads do not.
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    b_norm = sum(
        float(jnp.abs(v).sum())
        for path, v in flat
        if any("lora_b" == getattr(p, "key", None) for p in path)
    )
    assert b_norm > 0.0


def test_unet_sdxl_topology():
    cfg = UNetConfig.tiny_xl()
    model = UNet2DCondition(cfg, lora_rank=0)
    x = jax.random.normal(K, (1, 16, 16, 4))
    ctx = jax.random.normal(K, (1, 77, 32))
    t = jnp.array([3])
    added = {"text_embeds": jnp.ones((1, 64)), "time_ids": jnp.ones((1, 6))}
    params = model.init(K, x, t, ctx, added)
    eps, caps = model.apply(params, x, t, ctx, added, capture=True)
    assert eps.shape == (1, 16, 16, 4)
    # SDXL-topology: no attention in first down block / last up block
    assert "down_16" not in caps and "up_16" not in caps
    assert "up_8" in caps and "mid_4" in caps


def test_clip_text_encoder():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextEncoder(cfg)
    ids = jnp.array([[1, 5, 9, 2, 0, 0, 0, 0]], dtype=jnp.int32)
    eos = jnp.array([3], dtype=jnp.int32)
    params = model.init(K, ids, eos)
    hidden, pooled = model.apply(params, ids, eos)
    assert hidden.shape == (1, 8, 32) and pooled.shape == (1, 32)
    # penultimate output differs from final
    h2, _ = model.apply(params, ids, eos, output_hidden_state_skip=1)
    assert float(jnp.abs(hidden - h2).max()) > 1e-6
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 5].set(7)
    h3, _ = model.apply(params, ids2, eos)
    np.testing.assert_allclose(
        np.asarray(hidden[:, :5]), np.asarray(h3[:, :5]), atol=1e-6
    )


def test_clip_projection():
    cfg = CLIPTextConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "projection_dim": 16})
    model = CLIPTextEncoder(cfg)
    ids = jnp.zeros((2, 8), dtype=jnp.int32)
    params = model.init(K, ids)
    _, pooled = model.apply(params, ids)
    assert pooled.shape == (2, 16)


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    img = jax.random.normal(K, (1, 32, 32, 3))
    params = model.init(K, img)
    mean, logvar = model.apply(params, img, method=AutoencoderKL.encode)
    assert mean.shape == (1, 4, 4, 4)
    dec = model.apply(params, mean, method=AutoencoderKL.decode)
    assert dec.shape == (1, 32, 32, 3)
    # decode is differentiable w.r.t. latents
    g = jax.grad(
        lambda z: model.apply(params, z, method=AutoencoderKL.decode).sum()
    )(mean)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_blip_caption_loss_golden():
    """Check label-smoothing CE against a hand-rolled numpy golden
    (torch CrossEntropyLoss(label_smoothing=eps, ignore_index=-100)
    semantics, as HF BlipTextLMHeadModel uses; the published reward
    checkpoint runs eps=0.0, here 0.1 to exercise the smoothing
    term)."""
    import dataclasses

    cfg = dataclasses.replace(BLIPConfig.tiny(), label_smoothing=0.1)
    model = BLIPCaptioner(cfg)
    B, S = 2, 6
    img = jax.random.normal(K, (B, cfg.image_size, cfg.image_size, 3))
    ids = jax.random.randint(K, (B, S), 0, cfg.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    labels = ids.at[:, :2].set(-100)
    params = model.init(K, img, ids, mask, labels)
    loss = model.apply(params, img, ids, mask, labels)
    assert loss.shape == () and np.isfinite(float(loss))

    # golden from the same logits
    vision = model.bind(params)
    image_embeds = vision.vision(img)
    logits = np.asarray(
        vision.decode_logits(ids, mask, image_embeds), dtype=np.float64
    )
    lg, lb = logits[:, :-1], np.asarray(labels)[:, 1:]
    logp = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
    eps = 0.1
    tot, n = 0.0, 0
    for b in range(B):
        for s in range(S - 1):
            if lb[b, s] == -100:
                continue
            tot += (1 - eps) * (-logp[b, s, lb[b, s]]) + eps * (-logp[b, s].mean())
            n += 1
    np.testing.assert_allclose(float(loss), tot / n, rtol=1e-5)

    # reward gradient must reach the image
    gimg = jax.grad(
        lambda im: model.apply(params, im, ids, mask, labels)
    )(img)
    assert float(jnp.abs(gimg).sum()) > 0


def test_conv3x3_module_matches_nn_conv():
    """models/conv.Conv3x3 is a drop-in for nn.Conv(f, (3,3), padding=1):
    identical param tree (kernel/bias names+shapes) and identical math on
    the XLA path (the Pallas path is gated off on CPU; its numerical
    parity is checked on-device by tools/bench_conv3x3.py)."""
    import flax.linen as nn
    from comat_tpu.models.conv import Conv3x3

    x = jax.random.normal(K, (2, 8, 8, 12))
    ref = nn.Conv(7, (3, 3), padding=1, name="c")
    mod = Conv3x3(7, name="c")
    ref_params = ref.init(K, x)
    got_shapes = jax.tree_util.tree_map(
        lambda a: a.shape, mod.init(K, x)
    )
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_params)
    assert got_shapes == ref_shapes
    np.testing.assert_allclose(
        np.asarray(mod.apply(ref_params, x)),
        np.asarray(ref.apply(ref_params, x)),
        rtol=1e-5, atol=1e-5,
    )
