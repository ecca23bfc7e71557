"""Grounding-loss parity vs an independent numpy implementation of the
reference math (attn_utils/tc_loss_utils.py:66-173), plus linguistics
and the segmenter bridge."""

import jax
import jax.numpy as jnp
import numpy as np

from comat_tpu.losses.grounding import grounding_losses_for_layer
from comat_tpu.segmentation.interface import (
    CenterPriorSegmenter,
    SegmenterHolder,
)
from comat_tpu.text.linguistics import (
    extract_attribute_groups,
    pad_groups,
)
from comat_tpu.text.tokenizer import HashTokenizer


def _golden_reference_loss(attn_maps, masks, word_tokens):
    """Direct transcription of the reference formulas in numpy.

    attn_maps: list of (heads, res, res, 77); masks: list of (res, res)
    binarized at this res; word_tokens: list of token-idx lists.
    """
    token_loss = 0.0
    for a in attn_maps:
        heads, H, W, _ = a.shape
        for w, toks in enumerate(word_tokens):
            obj = 0.0
            for t in toks:
                ca = a[:, :, :, t]  # (heads, H, W)
                act = (ca * masks[w]).reshape(heads, -1).sum(-1) / ca.reshape(
                    heads, -1
                ).sum(-1)
                obj += (1.0 - act.mean()) ** 2
            token_loss += obj / len(toks)
    token_loss /= len(word_tokens)

    avg = np.stack([a.mean(0) for a in attn_maps]).mean(0)  # (H, W, 77)
    pixel_loss = 0.0
    for w, toks in enumerate(word_tokens):
        m = np.clip(sum(avg[..., t] for t in toks), 0, 1)
        bce = -(
            masks[w] * np.log(np.maximum(m, 1e-44))
            + (1 - masks[w]) * np.log(np.maximum(1 - m, 1e-44))
        )
        pixel_loss += bce.mean()
    pixel_loss /= len(word_tokens)
    return token_loss, pixel_loss


def test_grounding_losses_match_reference_math():
    rng = np.random.RandomState(0)
    heads, res, L = 2, 8, 77
    HW = res * res
    n_inst = 3
    word_tokens = [[3, 4], [7]]
    W_max, T_max = 4, 3

    raw = rng.rand(n_inst, heads, HW, L).astype(np.float32)
    attn = raw / raw.sum(-1, keepdims=True)
    masks_full = np.zeros((2, res, res), np.float32)
    masks_full[0, :4, :4] = 1.0
    masks_full[1, 4:, 2:6] = 1.0

    # padded device inputs (batch of 1)
    token_idx = np.zeros((1, W_max, T_max), np.int32)
    token_valid = np.zeros((1, W_max, T_max), bool)
    word_valid = np.zeros((1, W_max), bool)
    for w, toks in enumerate(word_tokens):
        token_idx[0, w, : len(toks)] = toks
        token_valid[0, w, : len(toks)] = True
        word_valid[0, w] = True
    masks = np.zeros((1, W_max, res, res), np.float32)
    masks[0, :2] = masks_full

    tl, pl = grounding_losses_for_layer(
        [jnp.asarray(a[None]) for a in attn],  # L x (1, heads, HW, 77)
        jnp.asarray(masks),
        jnp.asarray(token_idx),
        jnp.asarray(token_valid),
        jnp.asarray(word_valid),
    )
    want_tl, want_pl = _golden_reference_loss(
        [a.reshape(heads, res, res, L) for a in attn],
        list(masks_full),
        word_tokens,
    )
    np.testing.assert_allclose(float(tl[0]), want_tl, rtol=1e-4)
    np.testing.assert_allclose(float(pl[0]), want_pl, rtol=1e-4)


def test_grounding_gradients_finite_with_padding():
    """Regression: padded (invalid) words drive word_map to exactly 0,
    whose clamped-BCE-log backward used to emit inf*0 = NaN that the
    einsum transpose spread across the whole attention gradient."""
    rng = np.random.RandomState(1)
    B, heads, HW, C = 2, 4, 64, 77
    W_max, T_max = 8, 8
    logits = rng.randn(B, heads, HW, C).astype(np.float32)
    a0 = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    masks = (rng.rand(B, W_max, 16, 16) > 0.5).astype(np.float32)
    token_idx = np.zeros((B, W_max, T_max), np.int32)
    token_valid = np.zeros((B, W_max, T_max), bool)
    word_valid = np.zeros((B, W_max), bool)
    for b in range(B):
        for w in range(3):  # words 3.. stay padded (the NaN trigger)
            token_idx[b, w, :2] = [2 * w + 1, 2 * w + 2]
            token_valid[b, w, :2] = True
            word_valid[b, w] = True

    def loss(a):
        tl, pl = grounding_losses_for_layer(
            [a], jnp.asarray(masks), jnp.asarray(token_idx),
            jnp.asarray(token_valid), jnp.asarray(word_valid),
        )
        return tl.sum() + pl.sum()

    val, grad = jax.value_and_grad(loss)(a0)
    assert np.isfinite(float(val))
    assert bool(jnp.isfinite(grad).all())

    # an all-padded (empty-parse) batch must also be grad-clean
    none_valid = np.zeros_like(word_valid)
    no_tok = np.zeros_like(token_valid)

    def loss_empty(a):
        tl, pl = grounding_losses_for_layer(
            [a], jnp.asarray(masks), jnp.asarray(token_idx),
            jnp.asarray(no_tok), jnp.asarray(none_valid),
        )
        return tl.sum() + pl.sum()

    val2, grad2 = jax.value_and_grad(loss_empty)(a0)
    assert float(val2) == 0.0
    assert bool(jnp.isfinite(grad2).all())


def test_extract_attribute_groups_heuristic():
    tok = HashTokenizer(1000)
    groups = extract_attribute_groups("a red car and a blue bird", tok)
    assert [(g.attribute_words, g.noun) for g in groups] == [
        (["red"], "car"), (["blue"], "bird"),
    ]
    # token indices: positions 1.. follow the word order
    # a(1) red(2) car(3) and(4) a(5) blue(6) bird(7)
    assert groups[0].token_indices == [2, 3]
    assert groups[1].token_indices == [6, 7]

    # duplicate nouns are dropped (reference gsam_interface.py:234-243)
    g2 = extract_attribute_groups("a red car and a blue car", tok)
    assert g2 == []
    # blacklisted nouns are dropped
    g3 = extract_attribute_groups("a cloudy sky", tok)
    assert g3 == []


def test_pad_groups_shapes():
    tok = HashTokenizer(1000)
    groups = [
        extract_attribute_groups("a red car and a blue bird", tok),
        extract_attribute_groups("two happy dogs", tok),
    ]
    padded = pad_groups(groups, max_words=4, max_tokens=3)
    assert padded["token_idx"].shape == (2, 4, 3)
    assert padded["word_valid"][0].sum() == 2
    assert padded["nouns"][0] == ["car", "bird"]


def test_segmenter_holder_pure_callback():
    holder = SegmenterHolder(CenterPriorSegmenter(), max_words=4)
    holder.set_batch([["car", "bird"], ["dog"]])
    img = jnp.ones((2, 32, 32, 3)) * 0.5

    @jax.jit
    def f(im):
        return holder.device_masks(im)

    masks = f(img)
    assert masks.shape == (2, 4, 32, 32)
    m = np.asarray(masks)
    assert m[0, 0].sum() > 0 and m[0, 1].sum() > 0
    assert m[0, 2].sum() == 0  # only 2 nouns in sample 0
    assert m[1, 0].sum() > 0 and m[1, 1].sum() == 0
