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
    # W8A8: dynamically quantize activations per token to int8 so the
    # matmuls against int8 weights run int8xint8->int32 on the MXU
    # (~1.5x measured over bf16 on v5e; see docs/PERFORMANCE.md).
    # Requires quantized weights; eval-only, opt-in (per-token dynamic
    # activation quantization is lossier than weight-only int8).
    act_int8: bool = False

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


def weight_spec(cfg: LlamaConfig) -> Dict[str, Any]:
    """Shapes + init scales of every DENSE weight (None scale =
    default fan-in). Shared by init_params and the incremental
    quantized init (models/quant.py), so there is one source of truth
    for the parameter tree."""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, d, L = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                     cfg.num_layers)
    return {
        "embed": ((v, h), 0.02),
        "layers": {
            "wq": ((L, h, nh * d), None),
            "wk": ((L, h, nkv * d), None),
            "wv": ((L, h, nkv * d), None),
            "wo": ((L, nh * d, h), None),
            "w_gate": ((L, h, i), None),
            "w_up": ((L, h, i), None),
            "w_down": ((L, i, h), None),
        },
        "lm_head": ((h, v), None),
    }


def init_dense(rng: jax.Array, cfg: LlamaConfig, shape, scale=None):
    scale = scale if scale is not None else shape[-2] ** -0.5
    # sample directly in the target dtype: an fp32 intermediate for a
    # 7B [L, h, i] stack is a ~6 GB transient that OOMs a 16 GB chip
    # during init (values are fp32-sampled internally, then rounded)
    return jax.random.normal(rng, shape, cfg.dtype) * jnp.asarray(
        scale, cfg.dtype)


def init_params(rng: jax.Array, cfg: LlamaConfig) -> Dict[str, Any]:
    """Random-normal init (weights are normally loaded from a converted
    Vicuna checkpoint; this init backs tests and from-scratch runs)."""
    h, L = cfg.hidden_size, cfg.num_layers
    spec = weight_spec(cfg)
    keys = jax.random.split(rng, 9)   # same key->weight map as always

    layers = {k: init_dense(keys[j + 1], cfg, *spec["layers"][k])
              for j, k in enumerate(
                  ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"))}
    layers["attn_norm"] = jnp.ones((L, h), cfg.dtype)
    layers["mlp_norm"] = jnp.ones((L, h), cfg.dtype)
    return {
        "embed": init_dense(keys[0], cfg, *spec["embed"]),
        "layers": layers,
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": init_dense(keys[8], cfg, *spec["lm_head"]),
    }


def partition_specs(cfg: LlamaConfig, quantized: bool = False,
                    bits: int = 8) -> Dict[str, Any]:
    """PartitionSpecs over a ('data', 'model') mesh (megatron-style TP).

    With quantized=True the specs mirror the int8 structure from
    models/quant.py: the int8 tensor keeps the dense weight's spec and
    the per-output-channel scale shards on the same output axis (a
    scale row is [..., 1, o], so its last axis follows the weight's).
    bits=4: the layer matmuls carry {"q4p", "s"} with group scales
    [L, h/G, o]; the packed tensor keeps the dense spec (its last axis
    is o/2 — nibble pairs stay intact under TP only when o/2 itself
    divides by the model degree, i.e. the per-shard output-channel
    count is even; parallel/mesh.py:shard_params asserts this for
    every q4p leaf rather than relying on real dims being multiples
    of 128) and the
    scales REPLICATE — they are ~1/256 of the weight bytes, and
    replication sidesteps group-axis divisibility against arbitrary
    TP degrees."""
    specs = {
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
    if not quantized:
        return specs

    def qspec(spec: P):
        # scale shape is weight shape with the reduction axis -> 1
        # (embed: row scale [V, 1]); sharding the length-1 axis is
        # meaningless so its spec entry becomes None
        s = list(spec)
        s[-2] = None
        return {"q": spec, "s": P(*s)}

    def qspec4(spec: P):
        return {"q4p": spec, "s": P(*([None] * len(spec)))}

    lq = qspec4 if bits == 4 else qspec
    quant_keys = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}
    out = {
        "embed": {"q": specs["embed"], "s": P("model", None)},
        "layers": {k: (lq(v) if k in quant_keys else v)
                   for k, v in specs["layers"].items()},
        "final_norm": specs["final_norm"],
        # embed/lm_head are int8 at every bits setting (models/quant.py)
        "lm_head": qspec(specs["lm_head"]),
    }
    return out


def _act_q(x: jnp.ndarray):
    """Dynamic per-token (per output row) int8 activation quantization:
    -> (xq int8, sx fp32 [..., 1]) with x ~= xq * sx. Under TP the
    amax over the (possibly model-sharded) feature axis is a logical
    reduction — GSPMD inserts the tiny all-reduce max."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _mm(x: jnp.ndarray, w, a8: bool = False) -> jnp.ndarray:
    """Matmul against a dense weight OR an int8 weight-only quantized
    one (``{"q": int8 [..., h, o], "s": scale [..., 1, o]}``, per
    output channel — models/quant.py). Dequantization folds into the
    matmul: ``(x @ q) * s`` — XLA fuses the int8->bf16 convert into the
    MXU operand load, so no dequantized weight copy is materialized
    and the HBM read per weight is 1 byte/param instead of 2.

    a8=True (cfg.act_int8) additionally quantizes the activations per
    token so the product runs int8xint8->int32 natively on the MXU at
    ~1.5x the bf16 rate (v5e runs int8 at 2x bf16 peak; the remainder
    is the quantize/rescale VPU work). Output error is bounded by the
    per-token scale: a 1/127 relative activation grid on top of the
    1/127 weight grid.

    int4 weights (``{"q4p": uint8 [h, o/2], "s": [h/G, o]}``, nibble-
    packed group-wise — models/quant.py) use a BLOCKWISE matmul because
    group scales cannot post-multiply: y = sum_g (x_g @ q_g) * s_g. The
    operand stays packed in HBM at 0.5 byte/param (uint8 nibble pairs,
    not native XLA s4 — s4 jit arguments break the axon TPU relay's
    device_put); the VPU unpack + per-group partials [..., ng, o] are
    fused transients."""
    if isinstance(w, dict):
        if "q4p" in w:
            return _mm4(x, w, a8)
        if a8:
            xq, sx = _act_q(x)
            y = jnp.matmul(xq, w["q"], preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx
                    * w["s"].astype(jnp.float32)).astype(x.dtype)
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def _unpack_q4(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of models/quant.py:pack_int4: uint8 [..., h, o/2] ->
    int8 [..., h, o] (low nibble = even output channel, two's-
    complement sign-extend). Pure VPU bit ops; XLA fuses the unpack
    into the consuming matmul's operand read so the int8 view is a
    transient, and HBM residency stays 0.5 byte/param."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = ((p >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    q = jnp.stack([lo, hi], axis=-1)
    return q.reshape(*p.shape[:-1], p.shape[-1] * 2)


def _mm4(x: jnp.ndarray, w, a8: bool) -> jnp.ndarray:
    """Group-scaled int4 matmul. On TPU at kernel-eligible shapes this
    is the fused Pallas dequant-matmul (ops/matmul_q4.py: packed
    nibbles stay packed in HBM at 0.5 byte/param, unpack happens in
    VMEM tiles feeding the MXU — the XLA form below materializes the
    unpacked weight and measured ~4.7x slower end-to-end in
    BENCH_r04.json). Fallback: per-group partial dots, then an
    s-weighted contraction over groups."""
    from ..ops.matmul_q4 import matmul_q4, q4_kernel_eligible
    if q4_kernel_eligible(x, w["q4p"], w["s"]):
        sw = w["s"].astype(jnp.float32)
        if a8:
            xq, sx = _act_q(x)
            y = matmul_q4(xq, w["q4p"], sw)
            return (y * sx).astype(x.dtype)
        return matmul_q4(x, w["q4p"], sw, out_dtype=x.dtype)
    q4, s = _unpack_q4(w["q4p"]), w["s"]
    ng, o = s.shape[-2], s.shape[-1]
    g = q4.shape[-2] // ng
    if a8:
        xq, sx = _act_q(x)
        xg = xq.reshape(*xq.shape[:-1], ng, g)
        part = jnp.einsum("...nk,nko->...no", xg,
                          q4.reshape(ng, g, o).astype(jnp.int8),
                          preferred_element_type=jnp.int32)
        y = jnp.einsum("...no,no->...o", part.astype(jnp.float32),
                       s.astype(jnp.float32))
        return (y * sx).astype(x.dtype)
    xg = x.reshape(*x.shape[:-1], ng, g)
    part = jnp.einsum("...nk,nko->...no", xg,
                      q4.reshape(ng, g, o).astype(x.dtype),
                      preferred_element_type=jnp.float32)
    return jnp.einsum("...no,no->...o", part,
                      s.astype(jnp.float32)).astype(x.dtype)


def kv_quantize(x: jnp.ndarray):
    """Symmetric int8 quantization of K/V over head_dim (last axis):
    one fp32 scale per (…, token, head). head_dim=128 keeps the
    reduction lane-aligned on the VPU. Returns (int8 values, scales
    [..., 1] fp32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def kv_dequantize(q: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    # multiply in the scale dtype (fp32) and round ONCE to the compute
    # dtype — casting s to bf16 first would double the dequant error
    # the fp32 scale storage exists to avoid
    return (q.astype(s.dtype) * s).astype(dtype)


def kv_is_quantized(kv) -> bool:
    return isinstance(kv, dict) and "ks" in kv


def quantize_kv_stack(kv):
    """Quantize a stacked K/V cache {"k","v"} [L, B, T, NKV, D] to
    {"k","ks","v","vs"} (int8 values + fp32 per-token-per-head scales).
    Halves the HBM residency of the read-only prompt/prefix caches —
    the capacity lever for decode batch and streaming slot counts on a
    16 GB chip."""
    k, ks = kv_quantize(kv["k"])
    v, vs = kv_quantize(kv["v"])
    return {"k": k, "ks": ks, "v": v, "vs": vs}


def embed_rows(embed, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup for a dense or int8 row-quantized table
    (``{"q": int8 [V, H], "s": [V, 1]}``, per row)."""
    if isinstance(embed, dict):
        return embed["q"][ids].astype(embed["s"].dtype) * embed["s"][ids]
    return embed[ids]


def lm_head_dim(params) -> int:
    w = params["lm_head"]
    return (w["q"] if isinstance(w, dict) else w).shape[-1]


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


def _qkv(cfg: LlamaConfig, x, lp, cos, sin):
    b, t, _ = x.shape
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    attn_in = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    a8 = cfg.act_int8
    q = _mm(attn_in, lp["wq"], a8).reshape(b, t, nh, d)
    k = _mm(attn_in, lp["wk"], a8).reshape(b, t, nkv, d)
    v = _mm(attn_in, lp["wv"], a8).reshape(b, t, nkv, d)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _post_attn(cfg: LlamaConfig, x, lp, attn):
    b, t, _ = x.shape
    a8 = cfg.act_int8
    x = x + _mm(attn.reshape(b, t, cfg.num_heads * cfg.head_dim),
                lp["wo"], a8)
    mlp_in = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    gate = jax.nn.silu(_mm(mlp_in, lp["w_gate"], a8))
    return x + _mm(gate * _mm(mlp_in, lp["w_up"], a8), lp["w_down"], a8)


def _layer(cfg: LlamaConfig, x, lp, cos, sin, kv_mask, attn_impl):
    """One transformer block (full self-attention over x). Returns
    (y, (k, v)) — the post-rope K/V, for callers that cache them."""
    q, k, v = _qkv(cfg, x, lp, cos, sin)
    attn = multi_head_attention(q, k, v, kv_mask=kv_mask, causal=True,
                                impl=attn_impl)
    return _post_attn(cfg, x, lp, attn), (k, v)


def forward_hidden(params, cfg: LlamaConfig, inputs_embeds, attention_mask,
                   positions=None, return_kv: bool = False):
    """Run the transformer stack; returns (hidden [B, T, H], kv).

    attention_mask: [B, T] validity over keys; positions default to
    cumsum(mask)-1 (correct under left padding). With return_kv=True the
    per-layer post-rope K/V come back stacked [L, B, T, NKV, D] (the
    read-only prompt cache for decode_step); otherwise kv is None.
    """
    b, t, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
        positions = jnp.maximum(positions, 0)
    cos, sin = rope_tables(cfg, positions)

    x = inputs_embeds.astype(cfg.dtype)

    def body(x, lp):
        y, kv = _layer(cfg, x, lp, cos, sin, attention_mask, cfg.attn_impl)
        return y, (kv if return_kv else None)
    if cfg.remat and not return_kv:
        body = jax.checkpoint(body)
    x, kv = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, ({"k": kv[0], "v": kv[1]} if return_kv else None)


def init_decode_cache(cfg: LlamaConfig, batch_size: int, max_new: int):
    """Decode-region KV cache [L, B, max_new, NKV, D] — only the newly
    generated tokens live here. The prompt's K/V stay in the read-only
    stack returned by forward_hidden(return_kv=True), which the token
    loop does NOT carry: carrying a full prompt+decode cache (7B bf16 at
    bs4/cap~320 is ~1.3 GB) double-buffers across the scan and OOM'd a
    16 GB chip, while this carried region is ~50 tokens (~0.2 GB)."""
    shape = (cfg.num_layers, batch_size, max_new, cfg.num_kv_heads,
             cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype),
            "v": jnp.zeros(shape, cfg.dtype)}


def decode_step(params, cfg: LlamaConfig, inputs_embeds, prompt_kv,
                prompt_mask, dec_cache, step_index, positions):
    """One-token decode step against (read-only prompt KV) + (carried
    decode-region KV). inputs_embeds [B, 1, H]; prompt_kv {"k","v"}
    [L, B, T, NKV, D] — or the int8 form {"k","ks","v","vs"} from
    quantize_kv_stack (dequantized per layer at read; the tiny carried
    decode region stays bf16); prompt_mask [B, T]; dec_cache {"k","v"}
    [L, B, N, NKV, D] written at step_index. positions [B, 1].
    Returns (hidden [B, 1, H], new dec_cache)."""
    b = inputs_embeds.shape[0]
    n_dec = dec_cache["k"].shape[2]
    quant = kv_is_quantized(prompt_kv)
    cos, sin = rope_tables(cfg, positions)
    dec_mask = (jnp.arange(n_dec)[None, :] <= step_index)   # incl. current
    kv_mask = jnp.concatenate(
        [prompt_mask, jnp.broadcast_to(dec_mask, (b, n_dec))], axis=1)

    x = inputs_embeds.astype(cfg.dtype)

    def body(x, layer_in):
        if quant:
            lp, pk, pks, pv, pvs, dk, dv = layer_in
        else:
            lp, pk, pv, dk, dv = layer_in
        q, k, v = _qkv(cfg, x, lp, cos, sin)
        dk = jax.lax.dynamic_update_slice(
            dk, k.astype(dk.dtype), (0, step_index, 0, 0))
        dv = jax.lax.dynamic_update_slice(
            dv, v.astype(dv.dtype), (0, step_index, 0, 0))
        if quant:
            pk = kv_dequantize(pk, pks, k.dtype)
            pv = kv_dequantize(pv, pvs, v.dtype)
        keys = jnp.concatenate([pk, dk], axis=1)
        vals = jnp.concatenate([pv, dv], axis=1)
        attn = multi_head_attention(q, keys, vals, kv_mask=kv_mask,
                                    causal=False, impl="xla")
        return _post_attn(cfg, x, lp, attn), (dk, dv)

    xs = ((params["layers"], prompt_kv["k"], prompt_kv["ks"],
           prompt_kv["v"], prompt_kv["vs"], dec_cache["k"], dec_cache["v"])
          if quant else
          (params["layers"], prompt_kv["k"], prompt_kv["v"],
           dec_cache["k"], dec_cache["v"]))
    x, new_kv = jax.lax.scan(body, x, xs)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, {"k": new_kv[0], "v": new_kv[1]}


def chunk_forward_cached(params, cfg: LlamaConfig, inputs_embeds, prefix_kv,
                         prefix_mask, suffix_mask, positions,
                         write_offsets=None, write_mask=None):
    """Forward an S-token suffix window against a per-row ragged prefix
    KV cache (vLLM-style prefix caching for the rollout loop: the
    instruction+history part of the navigation prompt is append-only
    per episode, so each step only processes the new history tokens and
    the candidates section instead of the whole prompt).

    inputs_embeds [B, S, H]; prefix_kv {"k","v"} [L, B, P, NKV, D]
    (post-rope, rows right-aligned at positions 0..len-1);
    prefix_mask [B, P] validity; suffix_mask [B, S] validity
    (right-padded); positions [B, S] absolute rope positions
    (prefix_len[b] + j for valid j). Attention: each suffix token sees
    the row's valid prefix plus suffix tokens <= itself.

    write_offsets [B] (optional): additionally scatter the window's
    post-rope K/V into the cache at slots write_offsets[b] + j for
    valid j (the per-step history append). The written slots are NOT in
    prefix_mask yet, so there is no double counting this call; the
    caller extends prefix_mask afterwards. Returns (hidden [B, S, H],
    updated prefix_kv) — prefix_kv passes through unchanged when
    write_offsets is None.

    write_mask [B, S] (optional, default suffix_mask): which window
    tokens scatter K/V into the cache. The merged eval window
    ([history-append | candidates-suffix] in ONE pass — the suffix
    attends to the append tokens intra-window instead of re-reading
    them from the cache) appends only its first-A columns: the suffix
    K/V must NOT persist, since the next step's append claims those
    slots. Must be a prefix (per row) of suffix_mask's valid columns
    so widx stays dense at write_offsets[b] + j.

    The cache may be int8-quantized ({"k","ks","v","vs"}; scales
    [L, B, P, NKV, 1] fp32): reads dequantize per layer inside the
    scan, appends quantize the window's K/V before the scatter. Halves
    the cache's HBM residency (the streaming-eval slot-count ceiling
    at 7B on 16 GB).
    """
    b, s, _ = inputs_embeds.shape
    p = prefix_kv["k"].shape[2]
    quant = kv_is_quantized(prefix_kv)
    cos, sin = rope_tables(cfg, positions)
    pm = jnp.broadcast_to(prefix_mask[:, None, :], (b, s, p))
    qi = jnp.arange(s)[None, :, None]
    kj = jnp.arange(s)[None, None, :]
    sm = (kj <= qi) & suffix_mask[:, None, :]
    kv_mask = jnp.concatenate([pm, jnp.broadcast_to(sm, (b, s, s))], axis=-1)

    x = inputs_embeds.astype(cfg.dtype)
    if write_offsets is not None:
        # widx is strictly increasing per row, so in-bounds indices are
        # DISTINCT (no scatter-order hazard); out-of-bounds entries are
        # dropped via mode="drop" rather than clamped — clamping would
        # collide padding entries onto slot p-1 and nondeterministically
        # overwrite a real write when an append exactly fills the cache
        widx = write_offsets[:, None] + jnp.arange(s)[None, :]    # [B, S]
        wok = (suffix_mask if write_mask is None else write_mask) \
            & (widx < p)
        bgrid = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))

        def scatter(buf, new):
            old = buf.at[bgrid, widx].get(mode="clip")
            return buf.at[bgrid, widx].set(
                jnp.where(wok[..., None, None], new.astype(buf.dtype), old),
                mode="drop")

    def body(x, layer_in):
        if quant:
            lp, pk, pks, pv, pvs = layer_in
        else:
            lp, pk, pv = layer_in
        q, k, v = _qkv(cfg, x, lp, cos, sin)
        if write_offsets is not None:
            if quant:
                kq, ks_ = kv_quantize(k)
                vq, vs_ = kv_quantize(v)
                pk, pks = scatter(pk, kq), scatter(pks, ks_)
                pv, pvs = scatter(pv, vq), scatter(pvs, vs_)
                # step-to-step consistency under kv8 (advisor r4): the
                # columns just written to the cache must be SEEN by this
                # window exactly as later steps will read them — the
                # int8 round trip — or the appending step and subsequent
                # steps attend to slightly different K/V for the same
                # tokens (the split two-pass form was self-consistent)
                rt = wok[..., None, None]
                k = jnp.where(rt, kv_dequantize(kq, ks_, k.dtype), k)
                v = jnp.where(rt, kv_dequantize(vq, vs_, v.dtype), v)
            else:
                pk, pv = scatter(pk, k), scatter(pv, v)
        pkd = kv_dequantize(pk, pks, k.dtype) if quant else pk.astype(k.dtype)
        pvd = kv_dequantize(pv, pvs, v.dtype) if quant else pv.astype(v.dtype)
        keys = jnp.concatenate([pkd, k], axis=1)
        vals = jnp.concatenate([pvd, v], axis=1)
        attn = multi_head_attention(q, keys, vals, kv_mask=kv_mask,
                                    causal=False, impl="xla")
        return _post_attn(cfg, x, lp, attn), \
            ((pk, pks, pv, pvs) if quant else (pk, pv))

    xs = ((params["layers"], prefix_kv["k"], prefix_kv["ks"],
           prefix_kv["v"], prefix_kv["vs"]) if quant else
          (params["layers"], prefix_kv["k"], prefix_kv["v"]))
    x, new_kv = jax.lax.scan(body, x, xs)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if quant:
        return x, {"k": new_kv[0], "ks": new_kv[1],
                   "v": new_kv[2], "vs": new_kv[3]}
    return x, {"k": new_kv[0], "v": new_kv[1]}


def embed_with_injection(params, input_ids, special_positions=None,
                         special_embeds=None):
    """inputs_embeds = embed[ids] (+= visual embeds at special positions).

    The reference adds flattened visual embeds at `<cand>/<hist>/<obj>`
    token positions (modified_lm.py:100-110). Fixed-shape equivalent:
    `special_positions [B, K]` (token index of each injected embed, -1 for
    unused slots) and `special_embeds [B, K, H]` scattered with add.
    """
    x = embed_rows(params["embed"], input_ids)
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
    logits = _mm(hidden, params["lm_head"], cfg.act_int8).astype(jnp.float32)
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
