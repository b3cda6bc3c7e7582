#!/bin/bash
# From-scratch ablation (reference scripts/ablation/from_scratch.sh):
# random init instead of Vicuna weights.
python train.py \
    --stage multi --cfg_file configs/multi.yaml \
    --data_dir data --pretrained_model_name_or_path data/models/Vicuna-7B \
    --precision bf16 --from_scratch \
    --batch_size 1 --gradient_accumulation_step 8 --num_steps_per_epoch 2000 \
    --lr 3e-5 --seed 0 --num_epochs 30 \
    --enable_og --enable_summarize --enable_fgr2r \
    --max_saved_checkpoints 1 --output_dir output/from_scratch
