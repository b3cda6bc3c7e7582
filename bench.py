"""Benchmark harness: prints ONE JSON line for the round driver.

Round-1 scope: navigation-step training throughput (forward + backward +
AdamW update of the full NavModel) on one chip — the per-step LLM
fwd/bwd is the dominant cost of the reference's rollout hot loop
(SURVEY.md §3.2: one Vicuna-7B fwd + bwd per rollout step). Later
rounds switch to full episodes/sec once the rollout engine lands.

Baseline derivation (no throughput number exists in the reference —
BASELINE.md): multi-stage trains 2000 iters/epoch at batch 8 episodes
(1/GPU x 8 GPU; ga=8 only affects optimizer cadence) in ~40 min of an
epoch's ~70 min train+eval window (assets/model_without_pretrain.log
timestamps), with ~10 rollout steps per episode on average =>
~2000*8*10 / 2400 s ~= 67 nav model-steps/sec on 8xA100 ~= 8.4 per
A100. vs_baseline compares per-chip against that estimate.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

REF_STEPS_PER_SEC_PER_CHIP = 8.4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--debug", action="store_true",
                    help="tiny model, CPU-safe")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--seq", type=int, default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from navillm_tpu.models import llama as L
    from navillm_tpu.models import nav_model as NM
    from navillm_tpu.models.pano_encoder import PanoConfig
    from navillm_tpu.testing import synthetic_nav_batch
    from navillm_tpu.training.optim import make_optimizer

    if args.debug:
        cfg = NM.NavModelConfig.tiny(vocab_size=384)
        batch_size = args.batch or 2
        seq = args.seq or 64
        iters = min(args.iters, 5)
    else:
        # ~1.3B-proxy for the 7B flagship: per-chip step cost scales ~
        # linearly in params; v5e-1 cannot hold 7B train state (opt
        # states alone are 56 GB fp32) — the 8-chip recipe shards it.
        llm = L.LlamaConfig(vocab_size=32128, hidden_size=2048,
                            intermediate_size=5504, num_layers=16,
                            num_heads=16, num_kv_heads=16,
                            max_seq_len=1024, dtype=jnp.bfloat16)
        cfg = NM.NavModelConfig(
            llm=llm, pano=PanoConfig(output_size=llm.hidden_size,
                                     dtype=jnp.bfloat16))
        batch_size = args.batch or 8
        seq = args.seq or 320
        iters = args.iters

    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(lr=1e-5, grad_clip_norm=40.0)
    opt_state = tx.init(params)
    batch_np = synthetic_nav_batch(cfg, b=batch_size, g=16, v=12, c=10,
                                   hh=8, tlen=seq)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    targets = jnp.asarray(np.full((batch_size,), 2, np.int32))

    @jax.jit
    def train_step(params, opt_state, batch, targets):
        def loss_fn(p):
            out = NM.forward_navigation(p, cfg, batch)
            return NM.navigation_loss(out["fuse_logits"], targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    # warmup/compile
    params, opt_state, loss = train_step(params, opt_state, batch, targets)
    loss.block_until_ready()

    # sync every iteration: async dispatch through the axon relay makes
    # tail-only block_until_ready unreliable for timing
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = train_step(params, opt_state, batch, targets)
        float(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = iters * batch_size / dt
    print(json.dumps({
        "metric": "nav_train_steps/sec (batched episodes, 1 chip)",
        "value": round(steps_per_sec, 3),
        "unit": "model-steps/sec",
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
