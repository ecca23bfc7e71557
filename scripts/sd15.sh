#!/bin/bash
# SD1.5 CoMat recipe — the reference training run (scripts/sd15.sh),
# mapped to the TPU launcher: one process per host, mesh = all chips.
python training_script.py \
  --pretrain_model_name sd_1_5_attrcon \
  --pretrain_model "${PRETRAIN_MODEL:-runwayml/stable-diffusion-v1-5}" \
  --training_prompts collected_data/abc5k.txt \
  --output_dir "${OUTPUT_DIR:-output/sd15_comat}" \
  --train_batch_size 4 \
  --gradient_accumulation_steps 1 \
  --max_train_steps 2000 \
  --learning_rate 5e-5 \
  --max_grad_norm 0.1 \
  --K 5 --total_step 50 --cfg_scale 7.5 \
  --lora_rank 128 \
  --gradient_checkpointing \
  --gan_loss --gan_loss_weight 1.0 \
  --learning_rate_D 2e-5 --adam_beta1_D 0.0 \
  --gan_gt_path "${GAN_GT_PATH:-}" \
  --attrcon_train_steps 2 \
  --mask_token_loss_weight 1e-3 --mask_pixel_loss_weight 5e-5 \
  --resolution 512 \
  --validation_steps 100 \
  --seed 0 \
  "$@"
