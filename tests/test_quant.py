"""W8A8 pass-1 quantization (models/quant.py, --pass1_int8).

The Q* modules must be bit-identical to their flax parents on float
trees (the trainable path must not change), and the int8 branch must
stay numerically close on the tiny UNet + run the full pass1_int8
forward/presample/generate surfaces end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from comat_tpu.models.quant import (
    QConv, QDense, QDenseGeneral, quantize_unet_tree,
)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)



def test_qmodules_bitwise_equal_flax_on_float_trees():
    k = jax.random.PRNGKey(0)
    x = _rand((2, 5, 16), k, jnp.bfloat16)

    for mine, ref, kwargs in [
        (QDense, nn.Dense, dict(features=8, dtype=jnp.bfloat16)),
        (QDense, nn.Dense,
         dict(features=8, use_bias=False, dtype=jnp.bfloat16)),
        (QDenseGeneral, nn.DenseGeneral,
         dict(features=(2, 12), dtype=jnp.bfloat16)),
    ]:
        p = ref(**kwargs).init(k, x)
        y_ref = ref(**kwargs).apply(p, x)
        y_q = mine(**kwargs).apply(p, x)
        assert y_q.dtype == y_ref.dtype
        assert jnp.array_equal(y_q, y_ref)

    xc = _rand((2, 8, 8, 6), k, jnp.bfloat16)
    for kwargs in [
        dict(features=4, kernel_size=(3, 3), padding=1, dtype=jnp.bfloat16),
        dict(features=4, kernel_size=(3, 3), strides=(2, 2), padding=1,
             dtype=jnp.bfloat16),
        dict(features=4, kernel_size=(1, 1), dtype=jnp.bfloat16),
    ]:
        p = nn.Conv(**kwargs).init(k, xc)
        y_ref = nn.Conv(**kwargs).apply(p, xc)
        y_q = QConv(**kwargs).apply(p, xc)
        assert jnp.array_equal(y_q, y_ref)



def test_int8_branch_close_and_structurally_sound():
    k = jax.random.PRNGKey(1)
    x = _rand((4, 64), k)
    dense = QDense(features=32, dtype=jnp.float32)
    p = dense.init(k, x)
    y_ref = dense.apply(p, x)

    pq = {"params": quantize_unet_tree(p["params"])}
    kq = pq["params"]["kernel"]
    assert kq.dtype == jnp.int8
    assert pq["params"]["kernel_scale"].shape == (32,)
    y_q = dense.apply(pq, x)
    rel = float(
        jnp.max(jnp.abs(y_q - y_ref)) / jnp.max(jnp.abs(y_ref))
    )
    assert rel < 0.03, rel

    # conv: per-sample activation scale, per-O weight scale
    xc = _rand((2, 8, 8, 16), k)
    conv = QConv(features=8, kernel_size=(3, 3), padding=1)
    pc = conv.init(k, xc)
    yc_ref = conv.apply(pc, xc)
    pcq = {"params": quantize_unet_tree(pc["params"])}
    assert pcq["params"]["kernel"].dtype == jnp.int8
    assert pcq["params"]["kernel_scale"].shape == (8,)
    yc_q = conv.apply(pcq, xc)
    rel = float(jnp.max(jnp.abs(yc_q - yc_ref)) / jnp.max(jnp.abs(yc_ref)))
    assert rel < 0.05, rel

    # GEGLU DenseGeneral: feature axes (2, F) keep a (2, F) scale
    dg = QDenseGeneral(features=(2, 24))
    pg = dg.init(k, x)
    pgq = {"params": quantize_unet_tree(pg["params"])}
    assert pgq["params"]["kernel"].dtype == jnp.int8
    assert pgq["params"]["kernel_scale"].shape == (2, 24)
    yg_ref = dg.apply(pg, x)
    yg_q = dg.apply(pgq, x)
    rel = float(jnp.max(jnp.abs(yg_q - yg_ref)) / jnp.max(jnp.abs(yg_ref)))
    assert rel < 0.03, rel



def test_quantize_unet_tree_skips_sensitive_layers():
    from comat_tpu.config import UNetConfig
    from comat_tpu.models.unet import UNet2DCondition

    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg, lora_rank=0)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    p = unet.init(k, x, jnp.zeros((), jnp.int32), ctx)
    q = quantize_unet_tree(p["params"])

    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    n_int8 = n_scale = 0
    for path, leaf in flat:
        keys = tuple(str(getattr(s, "key", s)) for s in path)
        if leaf.dtype == jnp.int8:
            n_int8 += 1
            assert not any(
                b in k_ for b in
                ("time_embedding", "time_emb_proj", "conv_in", "conv_out")
                for k_ in keys
            ), keys
        if keys[-1] == "kernel_scale":
            n_scale += 1
        # skipped layers keep their float kernels
        if "time_embedding" in keys[0] or keys[0] in ("conv_in", "conv_out"):
            assert leaf.dtype != jnp.int8, keys
    assert n_int8 == n_scale > 0


def _tiny_pipe():
    from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config

    pcfg = make_pipeline_config(
        "sd_1_5", lora_rank=4, resolution=64, tiny=True
    )
    return DiffusionPipeline(pcfg)



def test_unet_int8_output_close_to_bf16():
    pipe = _tiny_pipe()
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    fused = pipe.fused_params(params)
    fused_q = pipe.fused_params(params, int8=True)

    s = pipe.cfg.latent_size
    lat = jax.random.normal(k, (2, s, s, 4))
    ctx = jax.random.normal(
        jax.random.fold_in(k, 1),
        (2, pipe.cfg.text.max_length, pipe.cfg.unet.cross_attention_dim),
    )
    t = jnp.full((2,), 500, jnp.int32)
    eps_ref, _ = pipe.unet_apply(fused, lat, t, ctx, fused=True)
    eps_q, _ = pipe.unet_apply(fused_q, lat, t, ctx, fused=True)
    assert jnp.all(jnp.isfinite(eps_q))
    a = np.asarray(eps_ref, np.float32).ravel()
    b = np.asarray(eps_q, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos


@pytest.mark.slow
def test_forward_pass1_int8_end_to_end():
    from comat_tpu.models.lora import merge_params
    from comat_tpu.training.train_step import (
        TrainConfig, init_train_state, make_optimizer,
    )
    from comat_tpu.text.tokenizer import HashTokenizer

    pipe = _tiny_pipe()
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    tcfg = TrainConfig(total_step=6, K=2, resolution=64, pass1_int8=True)
    state, frozen = init_train_state(params, tcfg, make_optimizer(tcfg))

    tok = HashTokenizer(1000)
    enc = tok(["a red car", "a blue bird"], max_length=pipe.cfg.text.max_length)
    null = tok(["", ""], max_length=pipe.cfg.text.max_length)

    def loss(trainable):
        p = merge_params(trainable, frozen)
        img, _ = pipe.forward(
            p, jax.random.PRNGKey(1),
            jnp.asarray(enc["input_ids"]), jnp.asarray(null["input_ids"]),
            jnp.asarray([0, 1]),
            num_inference_steps=6, K=2,
            eos_positions=jnp.asarray(enc["eos_positions"]),
            trainable=trainable, frozen=frozen,
            pass1_int8=True,
        )
        return img.mean()

    val, grads = jax.jit(jax.value_and_grad(loss))(state.trainable)
    assert jnp.isfinite(val)
    gnorm = sum(
        float(jnp.sum(g.astype(jnp.float32) ** 2))
        for g in jax.tree_util.tree_leaves(grads) if g is not None
    )
    assert np.isfinite(gnorm) and gnorm > 0

    # generate() int8 surface
    img = pipe.generate(
        merge_params(state.trainable, frozen), jax.random.PRNGKey(2),
        jnp.asarray(enc["input_ids"]), jnp.asarray(null["input_ids"]),
        num_inference_steps=4, int8=True,
    )
    assert jnp.all(jnp.isfinite(img))
