"""Mask utilities (jnp).

Fixed-shape, fully-vectorized equivalents of the reference's mask helpers
(reference: models/ops.py:21-41). All functions are jit-safe: static
shapes in, static shapes out.
"""
from __future__ import annotations

import jax.numpy as jnp

# Large negative instead of -inf: keeps softmax NaN-free for fully-masked
# rows (which the reference avoids only by construction).
NEG_INF = -1e30


def gen_seq_masks(seq_lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool validity mask."""
    pos = jnp.arange(max_len)[None, :]
    return pos < seq_lens[:, None]


def make_attention_bias(kv_mask: jnp.ndarray, causal: bool,
                        q_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive attention bias [B, 1, q_len, kv_len] from a [B, kv_len]
    validity mask, optionally combined with a causal triangle.

    With left padding, causality is positional: query i may attend to
    key j iff j <= i + (kv_len - q_len).
    """
    b, kv_len = kv_mask.shape
    bias = jnp.where(kv_mask[:, None, None, :], 0.0, NEG_INF).astype(dtype)
    if causal:
        offset = kv_len - q_len
        qi = jnp.arange(q_len)[:, None]
        kj = jnp.arange(kv_len)[None, :]
        tri = jnp.where(kj <= qi + offset, 0.0, NEG_INF).astype(dtype)
        bias = bias + tri[None, None, :, :]
    return bias
