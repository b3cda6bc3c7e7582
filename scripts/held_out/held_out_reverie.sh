#!/bin/bash
# Held-out training: all tasks except REVERIE
# (reference scripts/held_out/held_out_reverie.sh).
python train.py \
    --stage multi --cfg_file configs/held_out/held_out_reverie.yaml \
    --data_dir data --pretrained_model_name_or_path data/models/Vicuna-7B \
    --precision bf16 \
    --batch_size 1 --gradient_accumulation_step 8 --num_steps_per_epoch 2000 \
    --lr 3e-5 --seed 0 --num_epochs 30 \
    --enable_og --enable_summarize --enable_fgr2r \
    --max_saved_checkpoints 1 --output_dir output/held_out_reverie
