"""8-bit AdamW: quantization round-trip, trajectory vs fp32 AdamW,
state-size reduction (reference: bitsandbytes AdamW8bit option,
training_script.py:216-223)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from comat_tpu.training.optim8bit import (
    _dequantize,
    _quantize,
    adamw_8bit,
)


def test_quantize_roundtrip():
    x = np.random.RandomState(0).randn(3, 700).astype(np.float32)
    q, scale = _quantize(jnp.asarray(x), block=512)
    assert q.dtype == jnp.int8
    y = np.asarray(_dequantize(q, scale, x.shape, block=512))
    # blockwise absmax int8: error bounded by absmax/254 per block
    err = np.abs(y - x)
    bound = np.abs(x).max() / 127.0
    assert err.max() <= bound + 1e-6
    # zeros stay exactly zero
    q0, s0 = _quantize(jnp.zeros((10,)), block=512)
    assert np.asarray(_dequantize(q0, s0, (10,))).sum() == 0


def test_adamw_8bit_tracks_fp32():
    """On a quadratic, 8-bit AdamW follows fp32 AdamW closely."""

    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params8 = {"w": jnp.zeros((64,)), "b": jnp.zeros((8, 8))}
    params32 = jax.tree_util.tree_map(jnp.copy, params8)
    opt8 = adamw_8bit(1e-1, weight_decay=1e-2, block=64)
    opt32 = optax.adamw(1e-1, weight_decay=1e-2)
    s8, s32 = opt8.init(params8), opt32.init(params32)

    def make_step(opt):
        @jax.jit
        def step(params, s):
            g = jax.grad(loss)(params)
            u, s = opt.update(g, s, params)
            return optax.apply_updates(params, u), s

        return step

    step8, step32 = make_step(opt8), make_step(opt32)
    for _ in range(20):
        params8, s8 = step8(params8, s8)
        params32, s32 = step32(params32, s32)
    for k in params8:
        np.testing.assert_allclose(
            np.asarray(params8[k]), np.asarray(params32[k]),
            atol=5e-2,
        )
    # both converge toward the optimum
    assert abs(float(params8["w"][0]) - 3.0) < 1.5


def test_8bit_state_is_int8():
    params = {"w": jnp.zeros((4096,))}
    opt = adamw_8bit(1e-3)
    state = opt.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    int8_bytes = sum(x.size for x in leaves if x.dtype == jnp.int8)
    f32_bytes = sum(
        4 * x.size for x in leaves if x.dtype == jnp.float32
    )
    # moments dominate and are int8; fp32 scales are ~1/2048 of that
    assert int8_bytes >= 2 * 4096
    assert f32_bytes < int8_bytes


def test_train_config_8bit_wiring():
    from comat_tpu.training.train_step import TrainConfig, make_optimizer

    cfg = TrainConfig(use_8bit_adam=True)
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros((256,))}
    state = opt.init(params)
    assert any(
        x.dtype == jnp.int8 for x in jax.tree_util.tree_leaves(state)
    )
