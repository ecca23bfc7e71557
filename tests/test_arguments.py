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
