"""Precompile the standard jit shapes for a training/eval config.

First execution of each (function, shape) pays XLA/Mosaic compilation —
minutes at 7B scale. Run this once per machine/config before launching
training; with the persistent compile cache (utils/jax_cache.py) the
executables are reused by every later process.

  python scripts/warmup.py --cfg_file configs/multi.yaml --data_dir data \
      --pretrained_model_name_or_path data/models/Vicuna-7B \
      --batch_size 8 --buckets 256 384 512
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", default=None)
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--pretrained_model_name_or_path", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[256, 384, 512])
    ap.add_argument("--debug", action="store_true",
                    help="tiny model (smoke test of the warmup itself)")
    args_ns = ap.parse_args()

    import jax
    import numpy as np
    from navillm_tpu.models import nav_model as NM
    from navillm_tpu.models.tokenization import NavTokenizer
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.testing import synthetic_nav_batch
    from navillm_tpu.utils.config import TrainArgs, load_yaml_config

    targs = TrainArgs(data_dir=args_ns.data_dir,
                      pretrained_model_name_or_path=(
                          args_ns.pretrained_model_name_or_path))
    if args_ns.cfg_file:
        targs.sync_from_config(load_yaml_config(args_ns.cfg_file))

    if args_ns.debug or not args_ns.pretrained_model_name_or_path:
        tok = NavTokenizer()
        cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
        params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    else:
        from navillm_tpu.training.train_loop import build_runner
        runner = build_runner(targs, None)
    dims = runner.dims
    b = args_ns.batch_size

    for bucket in args_ns.buckets:
        bucket = min(bucket, runner.tok.max_length)
        batch = synthetic_nav_batch(runner.cfg, b=b, g=dims.max_gmap_nodes,
                                    v=dims.max_views + 1,
                                    c=dims.max_cands, hh=dims.max_hist,
                                    tlen=bucket)
        targets = np.full((b,), 2, np.int64)
        t0 = time.perf_counter()
        runner.zero_grads()
        runner.navigation(batch, targets=targets, coef=1.0, train=True)
        runner.take_grads()
        print(f"warm nav_train  b={b} tlen={bucket}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        runner.navigation(batch)
        print(f"warm nav_infer  b={b} tlen={bucket}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    print("warmup complete")


if __name__ == "__main__":
    main()
