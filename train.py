"""CLI entry point: multi-task training / evaluation.

Usage mirrors the reference (train.py:296, scripts/multi_wo_pretrain.sh):
    python train.py --stage multi --cfg_file configs/multi.yaml \
        --data_dir data --pretrained_model_name_or_path <vicuna-7b> \
        --precision bf16 --batch_size 1 --gradient_accumulation_step 8 ...
No torchrun: distribution comes from the jax mesh (multi-host runs
launch one process per host and jax discovers the topology).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from navillm_tpu.training.train_loop import run_training
from navillm_tpu.utils.config import read_args
from navillm_tpu.utils.logging_utils import create_logger, log_config


def main(argv=None):
    args, cfg = read_args(argv)
    logger = create_logger(log_file=str(Path(args.output_dir) / "train.log"),
                           rank=args.rank)
    logger.info("args: %s" % args)
    log_config(cfg, logger)
    results = run_training(args, cfg, logger)
    logger.info("Best Results: %s" % (results,))
    return results


if __name__ == "__main__":
    main()
