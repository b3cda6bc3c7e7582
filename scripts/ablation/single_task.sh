#!/bin/bash
# Single-task ablation (reference scripts/ablation/single_task.sh).
# Usage: bash scripts/ablation/single_task.sh {cvdn|reverie|soon|scanqa|fgr2r}
task=${1:-cvdn}
python train.py \
    --stage multi --cfg_file configs/ablation/${task}.yaml \
    --data_dir data --pretrained_model_name_or_path data/models/Vicuna-7B \
    --precision bf16 \
    --batch_size 1 --gradient_accumulation_step 8 --num_steps_per_epoch 2000 \
    --lr 3e-5 --seed 0 --num_epochs 30 \
    --enable_og --enable_summarize \
    --max_saved_checkpoints 1 --output_dir output/ablation_${task}
