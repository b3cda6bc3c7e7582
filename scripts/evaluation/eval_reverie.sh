#!/bin/bash
# Sampling eval T=0.01 (reference scripts/evaluation/eval_reverie.sh).
python train.py \
    --stage multi --mode test --data_dir data --cfg_file configs/multi.yaml \
    --pretrained_model_name_or_path data/models/Vicuna-7B --precision bf16 \
    --resume_from_checkpoint $model_path \
    --test_datasets REVERIE \
    --batch_size 4 --output_dir build/eval --validation_split test \
    --save_pred_results \
    --do_sample --temperature 0.01 --enable_og
# One 16 GB v5e chip at 7B: add  --quantize_llm --act_int8  (int8
# weights + W8A8 MXU matmuls; accuracy contract in tests/test_quant.py)
