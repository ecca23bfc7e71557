#!/bin/bash
# SD1.5 CoMat recipe — the reference training run (scripts/sd15.sh:
# accelerate launch over 8 GPUs, node8.yaml), mapped to the TPU
# launcher: one process per host, mesh = all chips (batch size is
# per-chip, like the reference's per-GPU bs). fp16 -> native bf16.
python training_script.py \
  --pretrain_model_name sd_1_5_attrcon \
  --pretrain_model "${PRETRAIN_MODEL:-runwayml/stable-diffusion-v1-5}" \
  --training_prompts "${TRAINING_PROMPTS:-collected_data/abc5k.txt}" \
  --output_dir "${OUTPUT_DIR:-output/sd15_comat}" \
  --resolution 512 \
  --train_batch_size 4 \
  --gradient_accumulation_steps 1 \
  --max_train_steps 2000 \
  --learning_rate 5e-5 --max_grad_norm 0.1 \
  --lr_scheduler constant --lr_warmup_steps 0 \
  --caption_model Blip \
  --gradient_checkpointing \
  --seed 42 \
  --K 5 --total_step 50 --scheduler DDPM --cfg_scale 7.5 \
  --lora_rank 128 \
  --gan_loss --gan_loss_weight 1 \
  --learning_rate_D 2e-5 --adam_beta1_D 0 --max_grad_norm_D 1 \
  --gan_model_arch gansd_1_5 \
  --gan_gt_path "${GAN_GT_PATH:-}" \
  --seg_model gsam \
  --attrcon_train_steps 2 \
  --mask_token_loss_weight 1e-3 --mask_pixel_loss_weight 5e-5 \
  --validation_prompts "A man walking on street" \
  --validation_steps 200 \
  "$@"
