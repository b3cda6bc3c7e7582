"""Multi-head attention: Pallas flash-attention kernel + XLA fallback.

The hot path of the LLM (SURVEY.md §3.2: one Vicuna-7B forward per
rollout step at ~a few hundred tokens) runs as a fused online-softmax
flash kernel on TPU so the [T, S] score matrix never hits HBM. A plain
jnp einsum path covers CPU tests, decode steps (T == 1, bandwidth-bound,
XLA fuses it fine), and shapes too small to tile.

API is functional and GQA-aware:
    multi_head_attention(q, k, v, kv_mask=..., causal=..., impl=...)
    q: [B, T, NH, D]; k, v: [B, S, NKV, D]; kv_mask: [B, S] bool.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masking import NEG_INF

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, NKV, D] -> [B, S, NKV*n_rep, D] (grouped-query broadcast)."""
    if n_rep == 1:
        return x
    b, s, nkv, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, nkv, n_rep, d)) \
        .reshape(b, s, nkv * n_rep, d)


def _attention_xla(q, k, v, kv_mask, causal, scale):
    """Reference implementation: einsum + masked softmax (fp32 accum).

    kv_mask may be [B, S] (per-key validity) or [B, T, S] (per-query —
    used for KV-cache prefill where causality inside the written window
    must be expressed explicitly)."""
    b, t, nh, d = q.shape
    s = k.shape[1]
    scores = jnp.einsum("btnd,bsnd->bnts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        if kv_mask.ndim == 2:
            kv_mask = kv_mask[:, None, :]
        scores = jnp.where(kv_mask[:, None, :, :], scores, NEG_INF)
    if causal:
        offset = s - t
        qi = jnp.arange(t)[:, None]
        kj = jnp.arange(s)[None, :]
        scores = jnp.where((kj <= qi + offset)[None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnts,bsnd->btnd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                  scale: float, causal: bool, block_k: int, kv_len: int):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    Block shapes carry a leading singleton (batch*head) axis:
    q_ref: [1, BQ, D]; k_ref/v_ref: [1, S, D]; mask_ref: [1, 1, S] int32;
    o_ref: [1, BQ, D].
    """
    q_blk_idx = pl.program_id(1)
    _, block_q, d = q_ref.shape
    q = q_ref[0].astype(jnp.float32) * scale

    m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s_blk = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] > 0
        s_blk = jnp.where(valid[None, :], s_blk, NEG_INF)
        if causal:
            qi = q_blk_idx * block_q + \
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            kj = kb * block_k + \
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s_blk = jnp.where(kj <= qi, s_blk, NEG_INF)

        m_cur = jnp.max(s_blk, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard: rows where everything so far is masked keep m=-inf
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s_blk - m_safe)
        p = jnp.where(jnp.isfinite(s_blk), p, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if causal:
        # only k blocks that can contain unmasked entries for this q block
        last = (q_blk_idx + 1) * block_q  # exclusive upper bound on k index
        num_needed = jnp.minimum(num_k_blocks, pl.cdiv(last, block_k))
    else:
        num_needed = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, num_needed, body, (m, l, acc))

    l_safe = jnp.where(l > 0, l, 1.0)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


def _flash_attention(q, k, v, kv_mask, causal, scale,
                     block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                     interpret=False):
    """q: [B, T, NH, D]; k, v: [B, S, NH, D] (already GQA-expanded)."""
    b, t, nh, d = q.shape
    s = k.shape[1]
    if causal and t != s:
        raise ValueError("flash path requires q_len == kv_len when causal "
                         "(decode steps use the XLA path)")
    block_q = min(block_q, t)
    block_k = min(block_k, s)
    # pad T/S to multiples of the block size
    t_pad = -t % block_q
    s_pad = -s % block_k
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), dtype=bool)
    if t_pad or s_pad:
        q = jnp.pad(q, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, s_pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, s_pad)))
    tp, sp = t + t_pad, s + s_pad

    # layout: fold batch and head into the grid's first axis
    qf = q.transpose(0, 2, 1, 3).reshape(b * nh, tp, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * nh, sp, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * nh, sp, d)
    # [B*NH, 1, S]: TPU block shapes need the last two dims tile-aligned
    # or full-size; a singleton row keeps the mask block (1, 1, S) legal.
    maskf = jnp.repeat(kv_mask.astype(jnp.int32), nh, axis=0)[:, None, :]

    grid = (b * nh, tp // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, causal=causal,
                               block_k=block_k, kv_len=sp)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, tp, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    out = out.reshape(b, nh, tp, d).transpose(0, 2, 1, 3)
    return out[:, :t]


def _flash_differentiable(q, k, v, kv_mask, causal, scale, interpret):
    """Flash forward + recompute backward through the XLA path.

    The Pallas kernel has no autodiff rule; at this framework's sequence
    lengths (<=1k tokens, SURVEY.md §5 long-context note) the [T, S]
    score matrix is tiny (<100 MB transient), so the standard
    flash-attention trick — recompute attention in the backward — is
    implemented by differentiating the XLA reference path. Forward stays
    fused (no HBM score matrix on the fwd pass).
    """

    @jax.custom_vjp
    def f(q, k, v, kv_mask):
        return _flash_attention(q, k, v, kv_mask, causal, scale,
                                interpret=interpret)

    def fwd(q, k, v, kv_mask):
        return f(q, k, v, kv_mask), (q, k, v, kv_mask)

    def bwd(res, g):
        q, k, v, kv_mask = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _attention_xla(q_, k_, v_, kv_mask, causal,
                                              scale), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None

    f.defvjp(fwd, bwd)
    return f(q, k, v, kv_mask)


def multi_head_attention(q, k, v, *, kv_mask=None, causal=True,
                         scale=None, impl="auto", interpret=False):
    """Dispatch between the Pallas flash kernel and the XLA path.

    q: [B, T, NH, D]; k, v: [B, S, NKV, D]; kv_mask: [B, S] bool or None.
    Returns [B, T, NH, D] in q.dtype.
    """
    nh, nkv = q.shape[2], k.shape[2]
    if nh != nkv:
        rep = nh // nkv
        k = _repeat_kv(k, rep)
        v = _repeat_kv(v, rep)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    t, s, d = q.shape[1], k.shape[1], q.shape[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "flash" if (on_tpu and t >= 8 and s >= 128 and d % 128 == 0) \
            else "xla"
    if impl == "flash":
        if kv_mask is None:
            kv_mask = jnp.ones((q.shape[0], s), bool)
        return _flash_differentiable(q, k, v, kv_mask, causal, scale,
                                     interpret)
    return _attention_xla(q, k, v, kv_mask, causal, scale)
