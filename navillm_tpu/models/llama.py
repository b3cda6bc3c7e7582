"""TPU-native Llama (Vicuna backbone) as pure functional JAX.

Replaces the reference's HF `LlamaForCausalLM` + `ModifiedLM` mixin
(reference: models/modified_lm.py:89-146): visual soft-token injection is
a vectorized scatter into input embeddings, special-token logits are
statically masked, loss is shifted CE with -100 ignore labels.

TPU-first design decisions:
  - parameters are a pytree of stacked per-layer arrays; the forward is a
    `lax.scan` over layers (single compile of one block, optional remat);
  - attention runs the Pallas flash kernel on TPU (ops/attention.py);
  - decode is prefill + per-token KV-cache steps with static shapes;
  - bf16 params / fp32 logits & softmax statistics;
  - `partition_specs()` returns a pytree of PartitionSpec for
    (data, model) meshes: attention heads and MLP hidden sharded on the
    `model` axis, everything replicated on `data` (batch is sharded via
    input sharding).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.attention import multi_head_attention
from ..ops.masking import NEG_INF


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_seq_len: int = 2048
    dtype: Any = jnp.bfloat16
    remat: bool = True
    attn_impl: str = "auto"   # auto | flash | xla

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def vicuna_7b(cls, vocab_size: int = 32000, **kw) -> "LlamaConfig":
        return cls(vocab_size=vocab_size, **kw)

    @classmethod
    def tiny(cls, vocab_size: int = 512, **kw) -> "LlamaConfig":
        """2-layer debug model (the fixture the reference sketched but
        abandoned in vln_bert.py:30-75)."""
        kw.setdefault("hidden_size", 128)
        kw.setdefault("intermediate_size", 256)
        kw.setdefault("num_layers", 2)
        kw.setdefault("num_heads", 4)
        kw.setdefault("num_kv_heads", 4)
        kw.setdefault("max_seq_len", 512)
        kw.setdefault("dtype", jnp.float32)
        kw.setdefault("remat", False)
        return cls(vocab_size=vocab_size, **kw)


def init_params(rng: jax.Array, cfg: LlamaConfig) -> Dict[str, Any]:
    """Random-normal init (weights are normally loaded from a converted
    Vicuna checkpoint; this init backs tests and from-scratch runs)."""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    keys = jax.random.split(rng, 9)

    def dense(key, shape, scale=None):
        scale = scale if scale is not None else shape[-2] ** -0.5
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(cfg.dtype)

    return {
        "embed": dense(keys[0], (v, h), scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((L, h), cfg.dtype),
            "wq": dense(keys[1], (L, h, nh * d)),
            "wk": dense(keys[2], (L, h, nkv * d)),
            "wv": dense(keys[3], (L, h, nkv * d)),
            "wo": dense(keys[4], (L, nh * d, h)),
            "mlp_norm": jnp.ones((L, h), cfg.dtype),
            "w_gate": dense(keys[5], (L, h, i)),
            "w_up": dense(keys[6], (L, h, i)),
            "w_down": dense(keys[7], (L, i, h)),
        },
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": dense(keys[8], (h, v)),
    }


def partition_specs(cfg: LlamaConfig) -> Dict[str, Any]:
    """PartitionSpecs over a ('data', 'model') mesh (megatron-style TP)."""
    return {
        "embed": P("model", None),
        "layers": {
            "attn_norm": P(None, None),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "mlp_norm": P(None, None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "model"),
    }


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray):
    """positions: [B, T] -> (cos, sin) [B, T, D/2] fp32."""
    d2 = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d2, dtype=jnp.float32) / d2))
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, N, D]; cos/sin: [B, T, D/2]. HF half-rotation convention."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _layer(cfg: LlamaConfig, x, lp, cos, sin, kv_mask, cache_kv, cache_index,
           attn_impl):
    """One transformer block. cache_kv: None or (k, v) [B, S, NKV, D]."""
    b, t, h = x.shape
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    attn_in = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    q = (attn_in @ lp["wq"]).reshape(b, t, nh, d)
    k = (attn_in @ lp["wk"]).reshape(b, t, nkv, d)
    v = (attn_in @ lp["wv"]).reshape(b, t, nkv, d)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        k, v = ck, cv
        new_cache = (ck, cv)
        # causality over the cache window is baked into the 3D kv_mask
        causal = False
    else:
        causal = True

    attn = multi_head_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                                impl=attn_impl)
    x = x + attn.reshape(b, t, nh * d) @ lp["wo"]

    mlp_in = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    gate = jax.nn.silu(mlp_in @ lp["w_gate"])
    x = x + (gate * (mlp_in @ lp["w_up"])) @ lp["w_down"]
    return x, new_cache


def forward_hidden(params, cfg: LlamaConfig, inputs_embeds, attention_mask,
                   positions=None, cache=None, cache_index=None):
    """Run the transformer stack; returns (hidden [B, T, H], new_cache).

    attention_mask: [B, S] validity over keys. Without cache S == T and
    positions default to cumsum(mask)-1 (correct under left padding).
    With cache, S == cache capacity: attention_mask marks *written,
    non-pad* slots, queries write at cache_index..cache_index+T, and a
    causal window mask is derived internally; positions are required.
    """
    b, t, _ = inputs_embeds.shape
    if positions is None:
        if cache is not None:
            raise ValueError("positions are required in cache mode")
        positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
        positions = jnp.maximum(positions, 0)
    cos, sin = rope_tables(cfg, positions)

    x = inputs_embeds.astype(cfg.dtype)
    layers = params["layers"]

    if cache is None:
        def body(x, lp):
            y, _ = _layer(cfg, x, lp, cos, sin, attention_mask, None, None,
                          cfg.attn_impl)
            return y, None
        if cfg.remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, layers)
        new_cache = None
    else:
        s = cache["k"].shape[2]
        kj = jnp.arange(s)[None, :]
        qi = jnp.arange(t)[:, None]
        window = kj <= (cache_index + qi)            # [T, S] causal window
        mask3 = attention_mask[:, None, :] & window[None]

        def body(x, layer_in):
            lp, ck, cv = layer_in
            y, new_kv = _layer(cfg, x, lp, cos, sin, mask3,
                               (ck, cv), cache_index, "xla")
            return y, new_kv
        x, new_kv = jax.lax.scan(body, x, (layers, cache["k"], cache["v"]))
        new_cache = {"k": new_kv[0], "v": new_kv[1]}

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, new_cache


def init_cache(cfg: LlamaConfig, batch_size: int, max_len: int):
    shape = (cfg.num_layers, batch_size, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def embed_with_injection(params, input_ids, special_positions=None,
                         special_embeds=None):
    """inputs_embeds = embed[ids] (+= visual embeds at special positions).

    The reference adds flattened visual embeds at `<cand>/<hist>/<obj>`
    token positions (modified_lm.py:100-110). Fixed-shape equivalent:
    `special_positions [B, K]` (token index of each injected embed, -1 for
    unused slots) and `special_embeds [B, K, H]` scattered with add.
    """
    x = params["embed"][input_ids]
    if special_positions is not None:
        b, k = special_positions.shape
        valid = special_positions >= 0
        pos = jnp.maximum(special_positions, 0)
        upd = jnp.where(valid[..., None], special_embeds.astype(x.dtype), 0)
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, k))
        x = x.at[bidx, pos].add(upd)
    return x


def logits_from_hidden(params, cfg: LlamaConfig, hidden,
                       special_token_mask=None):
    """LM logits in fp32 with special-token columns masked to -inf
    (reference modified_lm.py:122-124)."""
    logits = (hidden @ params["lm_head"]).astype(jnp.float32)
    if special_token_mask is not None:
        logits = jnp.where(special_token_mask[None, None, :], NEG_INF, logits)
    return logits


def causal_lm_loss(logits, labels, ignore_id: int = -100):
    """Shifted mean CE over labels != ignore_id (modified_lm.py:127-137)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_id
    safe = jnp.maximum(shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count
