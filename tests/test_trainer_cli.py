"""Trainer-level behavior: fidelity smoke gates (fail-loud fallbacks),
resume dataloader fast-forward, and pre-train evaluation (reference
training_script.py:497-509,544-548)."""

import os

import pytest

from comat_tpu.training.arguments import parse_args
from comat_tpu.training.trainer import Trainer


def _argv(tmp_path, *extra):
    prompts = tmp_path / "prompts.txt"
    if not prompts.exists():
        prompts.write_text(
            "\n".join(f"a photo of object {i}" for i in range(32)) + "\n"
        )
    return [
        "--training_prompts", str(prompts),
        "--output_dir", str(tmp_path / "out"),
        *extra,
    ]


def test_gate_caption_weights_missing(tmp_path):
    """Non-tiny run with no resolvable BLIP snapshot must refuse to
    start (random-weight reward = invalid objective). The gate fires
    before any heavy param init, so this test is fast."""
    args = parse_args(_argv(tmp_path))
    with pytest.raises(RuntimeError, match="caption-model weights"):
        Trainer(args)


def test_gate_gan_without_gt(tmp_path):
    blip_dir = tmp_path / "blip"
    blip_dir.mkdir()
    args = parse_args(_argv(
        tmp_path, "--caption_model_path", str(blip_dir), "--gan_loss",
    ))
    with pytest.raises(RuntimeError, match="gan_gt_path"):
        Trainer(args)


def test_gate_hash_tokenizer_fallback(tmp_path):
    blip_dir = tmp_path / "blip"
    blip_dir.mkdir()
    args = parse_args(_argv(
        tmp_path, "--caption_model_path", str(blip_dir),
    ))
    with pytest.raises(RuntimeError, match="tokenizer"):
        Trainer(args)


def test_allow_smoke_downgrades_to_warning(tmp_path):
    """--allow_smoke turns the gate into a logged warning."""
    class Stub:
        pass

    stub = Stub()
    stub.args = parse_args(_argv(tmp_path, "--allow_smoke"))

    import logging

    stub.logger = logging.getLogger("test_smoke")
    Trainer._smoke_gate(stub, "testing")  # must not raise

    stub.args = parse_args(_argv(tmp_path))
    with pytest.raises(RuntimeError, match="allow_smoke"):
        Trainer._smoke_gate(stub, "testing")


@pytest.mark.slow
def test_resume_fast_forward_and_pretrain_eval(tmp_path, monkeypatch):
    """Fresh run: an eval/checkpoint fires BEFORE step 1 (checkpoint-0
    exists). Resume: the data stream continues at the recorded step —
    the first post-resume batch equals what batch index 2 of epoch 0
    would have been, not a replay of batch 0."""
    import comat_tpu.training.trainer as trainer_mod

    seen = []
    real_assemble = trainer_mod.assemble_batch

    def recording_assemble(prompts, *a, **kw):
        seen.append(tuple(prompts))
        return real_assemble(prompts, *a, **kw)

    monkeypatch.setattr(trainer_mod, "assemble_batch", recording_assemble)

    base = _argv(
        tmp_path, "--tiny_models", "--train_batch_size", "1",
        "--seed", "0", "--total_step", "4", "--K", "2",
        "--resolution", "64", "--max_train_steps", "2",
        "--validation_steps", "0",
    )
    t1 = Trainer(parse_args(base))
    t1.train()
    out = tmp_path / "out"
    assert (out / "checkpoint-0").exists(), "no pre-train eval/checkpoint"
    assert (out / "checkpoint-2").exists()
    fresh_batches = list(seen)
    assert len(fresh_batches) == 2

    seen.clear()
    t2 = Trainer(parse_args(
        base[:-4] + [  # strip --max_train_steps 2 --validation_steps 0
            "--max_train_steps", "3", "--validation_steps", "0",
            "--resume_from_checkpoint", "latest",
        ]
    ))
    assert t2.global_step == 2
    t2.train()
    assert len(seen) >= 1
    # deterministic shuffle (same seed) -> both runs share the epoch
    # order; the resumed run must continue at step 2's batch, not
    # replay step 0's
    assert seen[0] != fresh_batches[0]
    spe = len(t1.dataset)
    expected = list(t1.dataset.epoch(2 // spe))[2 % spe]
    assert list(seen[0]) == expected
