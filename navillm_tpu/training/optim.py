"""Optimizer: AdamW + constant-with-warmup LR + global-norm clip(40).

Mirrors the reference recipe (tools/optims.py:35-62: AdamW(lr) over
trainable params, HF get_constant_schedule_with_warmup; clip at
train.py:86-88) as an optax chain. Gradient accumulation is handled by
optax.MultiSteps when accumulation > 1 (the reference accumulates by
stepping every N batches, train.py:86-89).
"""
from __future__ import annotations

import optax


def constant_with_warmup(lr: float, num_warmup_steps: int):
    if num_warmup_steps <= 0:
        return lr

    def sched(step):
        import jax.numpy as jnp
        frac = (step + 1.0) / max(1, num_warmup_steps)
        return lr * jnp.minimum(frac, 1.0)

    return sched


def make_optimizer(lr: float = 1e-5, num_warmup_steps: int = 0,
                   grad_clip_norm: float = 40.0, weight_decay: float = 0.0,
                   accumulation: int = 1) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(constant_with_warmup(lr, num_warmup_steps),
                    b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )
    if accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation)
    return tx
