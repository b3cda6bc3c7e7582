#!/bin/bash
# Multi-task training resumed from the pretrain stage
# (reference scripts/multi_w_pretrain.sh).
python train.py \
    --stage multi --cfg_file configs/multi.yaml \
    --data_dir data --pretrained_model_name_or_path data/models/Vicuna-7B \
    --precision bf16 \
    --resume_from_checkpoint output/pretrain/pretrain_39 \
    --batch_size 1 --gradient_accumulation_step 8 --num_steps_per_epoch 2000 \
    --lr 3e-5 --seed 0 --num_epochs 20 \
    --teacher_forcing_coef 1 --enable_og --enable_summarize --enable_fgr2r \
    --test_datasets CVDN SOON R2R REVERIE ScanQA \
    --max_saved_checkpoints 1 --output_dir output/multi_w_pretrain
