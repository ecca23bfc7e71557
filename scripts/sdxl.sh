#!/bin/bash
# SDXL CoMat recipe — the reference run (scripts/sdxl.sh: accelerate
# over 8 GPUs), mapped to the TPU launcher: one process per host,
# batch size per-chip. Uses the 512-finetuned UNet
# (--pretrain_model_name sdxl_attrcon_unet + --sdxl_unet_path) and an
# SD1.5-architecture discriminator (--gan_model_arch gansd_1_5), like
# the reference. NOTE: bs 6/GPU targets 80GB A100s; 16GB v5e chips fit
# bs 4 with --gradient_checkpointing (see README).
python training_script.py \
  --pretrain_model_name sdxl_attrcon_unet \
  --pretrain_model "${PRETRAIN_MODEL:-stabilityai/stable-diffusion-xl-base-1.0}" \
  --sdxl_unet_path "${SDXL_UNET_PATH:-}" \
  --training_prompts "${TRAINING_PROMPTS:-merged_data/abc5k_hrs10k_t2icompall_20k.txt}" \
  --output_dir "${OUTPUT_DIR:-output/sdxl_comat}" \
  --resolution 512 \
  --train_batch_size "${BATCH_SIZE:-6}" \
  --gradient_accumulation_steps 1 \
  --max_train_steps 2000 \
  --learning_rate 2e-5 --max_grad_norm 0.1 \
  --lr_scheduler constant --lr_warmup_steps 0 \
  --caption_model Blip \
  --gradient_checkpointing \
  --seed 42 \
  --K 5 --total_step 50 --scheduler DDPM --cfg_scale 7.5 \
  --lora_rank 128 \
  --gan_loss --gan_loss_weight 5e-1 \
  --learning_rate_D 5e-5 --adam_beta1_D 0 --max_grad_norm_D 1 \
  --gan_model_arch gansd_1_5 \
  --gan_gt_path "${GAN_GT_PATH:-}" \
  --seg_model gsam \
  --attrcon_train_steps 2 \
  --mask_token_loss_weight 1e-3 --mask_pixel_loss_weight 5e-5 \
  --validation_prompts "A man walking on street" \
  --validation_steps 200 --num_validation_images 0 \
  "$@"
