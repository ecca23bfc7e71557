"""CLI flag-surface parity with the reference
(training_utils/arguments.py — the public API contract)."""

import os

from comat_tpu.training.arguments import parse_args


def _parse(extra):
    return parse_args(["--training_prompts", "x.txt"] + extra)


def test_validation_prompts_nargs_plus():
    """--validation_prompts takes prompt STRINGS (nargs='+'), like the
    reference (arguments.py:44-49)."""
    a = _parse(["--validation_prompts", "a red car", "a blue bird"])
    assert a.validation_prompts == ["a red car", "a blue bird"]
    assert a.validation_prompts_file is None


def test_validation_prompts_file_flag(tmp_path):
    f = tmp_path / "val.txt"
    f.write_text("p1\np2\n")
    a = _parse(["--validation_prompts", "a", "--validation_prompts_file",
                str(f)])
    assert a.validation_prompts_file == str(f)


def test_cuda_flags_accepted_as_noops():
    a = _parse(["--enable_xformers_memory_efficient_attention",
                "--enable_torch2_product", "--allow_tf32",
                "--mixed_precision", "fp16"])
    assert a.enable_xformers_memory_efficient_attention


def test_reference_flag_surface_superset():
    """Every flag the reference defines parses here (names extracted
    from /root/reference/training_utils/arguments.py in SURVEY §5.6)."""
    ref_flags = [
        "pretrain_model", "pretrain_model_name", "revision",
        "sdxl_unet_path", "prediction_type", "caption_model",
        "reward_weights", "seg_model", "K", "total_step", "scheduler",
        "cfg_scale", "cfg_rescale", "bp_on_trained",
        "attrcon_train_steps", "mask_token_loss_weight",
        "mask_pixel_loss_weight", "norm_grad", "batch_repeat",
        "gan_loss", "gan_model_arch", "gan_loss_weight",
        "condition_discriminator", "gan_unet_lastlayer_cls",
        "learning_rate_D", "adam_beta1_D", "adam_beta2_D",
        "max_grad_norm_D", "full_finetuning", "lora_rank", "tune_vae",
        "tune_text_encoder", "train_text_encoder_lora",
        "textenc_lora_lr", "learning_rate", "scale_lr", "lr_scheduler",
        "lr_warmup_steps", "adam_beta1", "adam_beta2",
        "adam_weight_decay", "adam_epsilon", "max_grad_norm",
        "use_8bit_adam", "allow_tf32", "mixed_precision",
        "gradient_checkpointing", "gradient_accumulation_steps",
        "optimizer_class", "training_prompts", "image_folder",
        "resolution", "train_batch_size", "dataloader_num_workers",
        "center_crop", "max_train_samples", "output_dir", "cache_dir",
        "logging_dir", "seed", "max_train_steps", "num_train_epochs",
        "validation_steps", "num_validation_images",
        "validation_prompts_file", "checkpoints_total_limit",
        "resume_from_checkpoint", "report_to", "tracker_project_name",
        "local_rank", "enable_xformers_memory_efficient_attention",
        "enable_torch2_product",
    ]
    a = _parse([])
    for f in ref_flags:
        assert hasattr(a, f), f"missing reference flag --{f}"


def test_cache_dir_snapshot_resolution(tmp_path):
    from comat_tpu.training.trainer import Trainer

    hub = tmp_path / "models--runwayml--stable-diffusion-v1-5" / "snapshots"
    rev = hub / "abc123"
    os.makedirs(rev)
    got = Trainer._resolve_snapshot(
        "runwayml/stable-diffusion-v1-5", str(tmp_path)
    )
    assert got == str(rev)
    # local dirs pass through untouched
    assert Trainer._resolve_snapshot(str(tmp_path), str(tmp_path)) == str(
        tmp_path
    )
    # unresolvable ids pass through (downstream warns + random init)
    assert Trainer._resolve_snapshot("no/such-model", str(tmp_path)) == (
        "no/such-model"
    )


def test_lr_schedule_with_derived_max_steps(tmp_path):
    """--lr_scheduler cosine with no --max_train_steps (default None):
    the horizon must be derived from --num_train_epochs BEFORE the
    schedule is built (regression: optax got decay_steps=None)."""
    f = tmp_path / "p.txt"
    f.write_text("\n".join(f"prompt {i}" for i in range(8)))
    a = parse_args([
        "--training_prompts", str(f), "--lr_scheduler", "cosine",
        "--num_train_epochs", "3", "--train_batch_size", "2",
    ])
    assert a.max_train_steps is None
    from comat_tpu.training.trainer import _lr_schedule, load_prompts

    # the derivation the trainer runs pre-schedule
    n = len(load_prompts(a.training_prompts, a.max_train_samples))
    a.max_train_steps = a.num_train_epochs * max(
        1, n // max(1, a.train_batch_size)
    )
    assert a.max_train_steps == 12
    sched = _lr_schedule(a)
    assert float(sched(a.max_train_steps)) >= 0.0  # builds and evaluates


def test_textenc_lr_follows_schedule():
    """The text-encoder group follows the LR schedule scaled off its
    own base LR (torch LambdaLR multiplies every group's base_lr)."""
    import jax.numpy as jnp
    import numpy as np

    from comat_tpu.training.train_step import TrainConfig, make_optimizer

    tcfg = TrainConfig(learning_rate=1e-2, textenc_lr=1e-4,
                       adam_weight_decay=0.0, max_grad_norm=1e9)
    # warmup schedule: lr == 0 at step 0
    sched = lambda step: jnp.minimum(step / 10.0, 1.0) * tcfg.learning_rate
    opt = make_optimizer(tcfg, sched)
    params = {"unet": jnp.ones((4,)), "text": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"unet": jnp.ones((4,)), "text": jnp.ones((4,))}
    updates, _ = opt.update(grads, state, params)
    # at step 0 the schedule is 0 -> BOTH groups produce zero updates
    assert float(jnp.abs(updates["unet"]).max()) == 0.0
    assert float(jnp.abs(updates["text"]).max()) == 0.0


def test_prediction_type_validated():
    import pytest

    from comat_tpu.models.pipeline import make_pipeline_config

    with pytest.raises(ValueError, match="prediction_type"):
        make_pipeline_config("sd_1_5", tiny=True,
                             prediction_type="v-prediction")


def test_resolve_snapshot_prefers_refs_main(tmp_path):
    from comat_tpu.training.trainer import Trainer

    root = tmp_path / "models--org--model"
    os.makedirs(root / "snapshots" / "aaaa")
    os.makedirs(root / "snapshots" / "zzzz")
    os.makedirs(root / "refs")
    (root / "refs" / "main").write_text("aaaa\n")
    got = Trainer._resolve_snapshot("org/model", str(tmp_path))
    assert got == str(root / "snapshots" / "aaaa")


def test_conv3x3_non_multiple_height_falls_back():
    """conv3x3_same with H not a multiple of 8 must not hit the Pallas
    resident loop (which would leave trailing rows unwritten) — it
    falls back to the XLA conv and stays correct + differentiable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comat_tpu.ops.conv3x3 import conv3x3_same, xla_conv3x3

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 20, 20, 8))
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 8, 8)) * 0.1
    np.testing.assert_allclose(
        np.asarray(conv3x3_same(x, w)), np.asarray(xla_conv3x3(x, w)),
        rtol=1e-5, atol=1e-5,
    )
    g = jax.grad(lambda x: (conv3x3_same(x, w) ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
