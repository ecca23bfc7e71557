#!/bin/bash
# SDXL CoMat recipe (reference scripts/sdxl.sh): bs 6/chip, lr 2e-5,
# GAN w=0.5 with lr_D 5e-5, 512-finetuned UNet.
python training_script.py \
  --pretrain_model_name sdxl_attrcon \
  --pretrain_model "${PRETRAIN_MODEL:-stabilityai/stable-diffusion-xl-base-1.0}" \
  --sdxl_unet_path "${SDXL_UNET_PATH:-}" \
  --training_prompts merged_data/abc5k_hrs10k_t2icompall_20k.txt \
  --output_dir "${OUTPUT_DIR:-output/sdxl_comat}" \
  --train_batch_size 6 \
  --gradient_accumulation_steps 1 \
  --max_train_steps 2000 \
  --learning_rate 2e-5 \
  --max_grad_norm 0.1 \
  --K 5 --total_step 50 --cfg_scale 7.5 \
  --lora_rank 128 \
  --gradient_checkpointing \
  --gan_loss --gan_loss_weight 0.5 \
  --learning_rate_D 5e-5 --adam_beta1_D 0.0 \
  --gan_gt_path "${GAN_GT_PATH:-}" \
  --attrcon_train_steps 2 \
  --mask_token_loss_weight 1e-3 --mask_pixel_loss_weight 5e-5 \
  --resolution 512 \
  --validation_steps 100 \
  --seed 0 \
  "$@"
