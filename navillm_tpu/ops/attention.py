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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                  scale: float, causal: bool, block_k: int, kv_len: int):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    Block shapes carry a leading singleton (batch*head) axis:
    q_ref: [1, BQ, D]; k_ref/v_ref: [1, S, D]; mask_ref: [1, 1, S] int32;
    o_ref: [1, BQ, D]; lse_ref: [1, BQ, 1] (logsumexp rows, saved for
    the fused backward; trailing singleton keeps the write in sublane
    layout — a [BQ,1]->[1,BQ] lane transpose here sends Mosaic down a
    pathologically slow compile path).
    """
    q_blk_idx = pl.program_id(1)
    _, block_q, d = q_ref.shape
    q = q_ref[0]                       # native dtype: MXU runs bf16 fast

    m = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s_blk = jnp.dot(q, k_blk.T,
                        preferred_element_type=jnp.float32) * scale

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
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
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
    lse = jnp.where((l > 0) & jnp.isfinite(m), m + jnp.log(l_safe), NEG_INF)
    lse_ref[0] = lse


def _flash_attention(q, k, v, kv_mask, causal, scale,
                     block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                     interpret=False, return_lse=False):
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
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * nh, tp, d), q.dtype),
            jax.ShapeDtypeStruct((b * nh, tp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    out = out.reshape(b, nh, tp, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out[:, :t], lse      # lse stays in [B*NH, Tpad, 1] layout
    return out[:, :t]


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, mask_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, scale: float,
                          causal: bool, block_q: int, q_len: int):
    """One (batch*head, k-block) program: accumulate dK, dV over q blocks.

    q_ref/do_ref: [1, T, D]; k_ref/v_ref: [1, BK, D]; mask_ref: [1,1,S]
    slice is the k block [1,1,BK]; lse_ref/delta_ref: [1, T, 1]
    (sublane layout, see _flash_kernel); dk_ref/dv_ref: [1, BK, D].
    """
    k_blk_idx = pl.program_id(1)
    _, block_k, d = k_ref.shape
    kb = k_ref[0]
    vb = v_ref[0]
    kvalid = mask_ref[0, 0, :] > 0                    # [BK]

    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    num_q_blocks = pl.cdiv(q_len, block_q)

    def body(qb, carry):
        dk, dv = carry
        qs = q_ref[0, pl.ds(qb * block_q, block_q), :]
        dos = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]   # [BQ, 1]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        s = jnp.dot(qs, kb.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(kvalid[None, :], s, NEG_INF)
        if causal:
            qi = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kj = k_blk_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kj <= qi, s, NEG_INF)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dv = dv + jnp.dot(p.astype(dos.dtype).T, dos,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(dos, vb.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(qs.dtype)
        dk = dk + jnp.dot(ds.T, qs, preferred_element_type=jnp.float32)
        return dk, dv

    if causal:
        # q blocks starting before this k block see nothing
        first = (k_blk_idx * block_k) // block_q
    else:
        first = 0
    dk, dv = jax.lax.fori_loop(first, num_q_blocks, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, mask_ref, lse_ref,
                         delta_ref, dq_ref, *, scale: float, causal: bool,
                         block_k: int, kv_len: int):
    """One (batch*head, q-block) program: accumulate dQ over k blocks."""
    q_blk_idx = pl.program_id(1)
    _, block_q, d = q_ref.shape
    qs = q_ref[0]
    dos = do_ref[0]
    lse = lse_ref[0]                                   # [BQ, 1]
    delta = delta_ref[0]
    dq = jnp.zeros((block_q, d), jnp.float32)
    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(kbi, dq):
        kb = k_ref[0, pl.ds(kbi * block_k, block_k), :]
        vb = v_ref[0, pl.ds(kbi * block_k, block_k), :]
        kvalid = mask_ref[0, 0, pl.ds(kbi * block_k, block_k)] > 0
        s = jnp.dot(qs, kb.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(kvalid[None, :], s, NEG_INF)
        if causal:
            qi = q_blk_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            kj = kbi * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(kj <= qi, s, NEG_INF)
        p = jnp.where(lse > NEG_INF / 2, jnp.exp(s - lse), 0.0)
        dp = jnp.dot(dos, vb.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(kb.dtype)
        return dq + jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    if causal:
        last = (q_blk_idx + 1) * block_q
        num_needed = jnp.minimum(num_k_blocks, pl.cdiv(last, block_k))
    else:
        num_needed = num_k_blocks
    dq = jax.lax.fori_loop(0, num_needed, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_backward(q, k, v, kv_mask, o, lse, do, causal, scale,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    interpret=False):
    """Fused flash-attention backward: (dq, dk, dv).

    q/k/v/o/do: [B, T, NH, D] (self-attention: S == T); lse: the
    [B*NH, 1, Tpad] statistics saved by the forward kernel.
    """
    b, t, nh, d = q.shape
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    t_pad = -t % max(block_q, block_k)
    if kv_mask is None:
        kv_mask = jnp.ones((b, t), bool)
    if t_pad:
        pad4 = ((0, 0), (0, t_pad), (0, 0), (0, 0))
        q, k, v, o, do = (jnp.pad(x, pad4) for x in (q, k, v, o, do))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, t_pad)))
    tp = t + t_pad

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * nh, tp, d)

    qf, kf, vf, of, dof = map(fold, (q, k, v, o, do))
    maskf = jnp.repeat(kv_mask.astype(jnp.int32), nh, axis=0)[:, None, :]
    delta = jnp.sum(of.astype(jnp.float32) * dof.astype(jnp.float32),
                    axis=-1)[:, :, None]               # [B*NH, Tp, 1]
    assert lse.shape == (b * nh, tp, 1), (lse.shape, (b * nh, tp, 1))

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                                   causal=causal, block_q=block_q, q_len=tp)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * nh, tp // block_k),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda i, j: (i, 0, 0)),       # q
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # k blk
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),  # v blk
            pl.BlockSpec((1, tp, d), lambda i, j: (i, 0, 0)),       # do
            pl.BlockSpec((1, 1, block_k), lambda i, j: (i, 0, j)),  # mask
            pl.BlockSpec((1, tp, 1), lambda i, j: (i, 0, 0)),       # lse
            pl.BlockSpec((1, tp, 1), lambda i, j: (i, 0, 0)),       # delta
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * nh, tp, d), k.dtype),
            jax.ShapeDtypeStruct((b * nh, tp, d), v.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, maskf, lse, delta)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, scale=scale,
                                  causal=causal, block_k=block_k, kv_len=tp)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * nh, tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),  # q blk
            pl.BlockSpec((1, tp, d), lambda i, j: (i, 0, 0)),       # k
            pl.BlockSpec((1, tp, d), lambda i, j: (i, 0, 0)),       # v
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),  # do blk
            pl.BlockSpec((1, 1, tp), lambda i, j: (i, 0, 0)),       # mask
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),  # lse
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, tp, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, maskf, lse, delta)

    def unfold(x):
        return x.reshape(b, nh, tp, d).transpose(0, 2, 1, 3)[:, :t]

    return unfold(dq), unfold(dk), unfold(dv)


def _flash_differentiable(q, k, v, kv_mask, causal, scale, interpret):
    """Flash forward + fused Pallas flash backward (custom VJP).

    Forward saves only the [B*NH, T] logsumexp rows; the backward
    recomputes attention probabilities block-wise inside two Pallas
    kernels (dkv over k blocks, dq over q blocks) — the standard
    flash-attention backward, no [T, S] matrix ever in HBM.
    """

    @jax.custom_vjp
    def f(q, k, v, kv_mask):
        out, _ = _flash_attention(q, k, v, kv_mask, causal, scale,
                                  interpret=interpret, return_lse=True)
        return out

    def fwd(q, k, v, kv_mask):
        out, lse = _flash_attention(q, k, v, kv_mask, causal, scale,
                                    interpret=interpret, return_lse=True)
        return out, (q, k, v, kv_mask, out, lse)

    def bwd(res, g):
        q, k, v, kv_mask, out, lse = res
        dq, dk, dv = _flash_backward(q, k, v, kv_mask, out, lse, g, causal,
                                     scale, interpret=interpret)
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
        # flash wins on HBM (no [T,S] probs tensor) but measured runtime
        # only beats XLA's fused attention beyond ~512 tokens on v5e,
        # and each Mosaic kernel compile costs minutes through the
        # remote-compile tunnel — so auto picks flash only where it pays
        on_tpu = jax.default_backend() == "tpu"
        impl = "flash" if (on_tpu and t >= 8 and s >= 768 and d % 128 == 0) \
            else "xla"
    if impl == "flash":
        if kv_mask is None:
            kv_mask = jnp.ones((q.shape[0], s), bool)
        return _flash_differentiable(q, k, v, kv_mask, causal, scale,
                                     interpret)
    return _attention_xla(q, k, v, kv_mask, causal, scale)
