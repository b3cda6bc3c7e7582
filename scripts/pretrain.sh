#!/bin/bash
# Pretrain stage (reference scripts/pretrain.sh): 40 epochs, aug-heavy mix.
# One process per host; the jax mesh covers all local chips (no torchrun).
python train.py \
    --stage pretrain --cfg_file configs/multi.yaml \
    --data_dir data --pretrained_model_name_or_path data/models/Vicuna-7B \
    --precision bf16 \
    --batch_size 1 --gradient_accumulation_step 8 --num_steps_per_epoch 2000 \
    --lr 3e-5 --seed 0 --num_epochs 40 \
    --enable_og --enable_summarize --enable_fgr2r \
    --max_saved_checkpoints 1 --output_dir output/pretrain
