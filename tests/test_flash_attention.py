"""Pallas flash-attention kernels vs XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import comat_tpu.ops.flash_attention as fa
from comat_tpu.ops.attention import _attention_xla

K = jax.random.PRNGKey(0)

SHAPES = [
    (2, 4, 128, 128, 40),   # SD1.5 self-attn head dim
    (1, 8, 256, 77, 64),    # cross-attn onto 77 CLIP tokens
    (1, 2, 64, 64, 160),    # low-res self-attn head dim
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    B, H, Sq, Skv, d = shape
    q, k, v = [
        jax.random.normal(jax.random.fold_in(K, j), (B, H, S, d))
        for j, S in enumerate([Sq, Skv, Skv])
    ]
    got = fa.flash_attention(q, k, v, interpret=True)
    want, _ = _attention_xla(q, k, v, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("shape", SHAPES[:2])
@pytest.mark.slow
def test_vjp_matches_xla(shape):
    B, H, Sq, Skv, d = shape
    q, k, v = [
        jax.random.normal(jax.random.fold_in(K, j), (B, H, S, d))
        for j, S in enumerate([Sq, Skv, Skv])
    ]
    with pltpu.force_tpu_interpret_mode():
        f_ours = lambda q, k, v: (fa.flash_attention_diff(q, k, v) ** 2).sum()
        f_ref = lambda q, k, v: (_attention_xla(q, k, v, False)[0] ** 2).sum()
        v1, g1 = jax.value_and_grad(f_ours, argnums=(0, 1, 2))(q, k, v)
        v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )
