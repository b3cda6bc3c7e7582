"""Weight-only int8 / int4 quantization for the Llama backbone (eval path).

The reference runs Vicuna-7B in bf16/fp16 (models/modified_lm.py:38-53,
nav_model.py:46-47); 7B bf16 weights are ~13.5 GB of a v5e chip's 16 GB
HBM, which starves eval of KV-cache/slot memory (the prefix cache had to
auto-off at 7B). Per-output-channel symmetric int8 storage halves the
weight footprint to ~6.8 GB with bf16 accumulation:

    w [..., h, o]  ->  q int8 [..., h, o],  s = amax_h(|w|)/127 [..., 1, o]
    x @ w  ≈  (x @ q) * s          (exact per-channel dequant identity)

The embedding table quantizes PER ROW (each token's vector has its own
scale) so lookup is `q[ids] * s[ids]`. Norm weights stay in bf16 (tiny).

This is an EVAL-ONLY transform: int8 leaves are not differentiable, so
training entry points must keep the bf16 tree. Accuracy is covered by
tests/test_quant.py (logit parity within tolerance vs bf16 + greedy
trajectory agreement on the synthetic world).

Scale dtype: scales are STORED in the weight's original dtype (bf16 for
7B) and the int8 grid is computed against that rounded scale, so the
dequant `(x @ q) * s` uses exactly the scale the quantizer used — no
quantize/dequantize scale mismatch.

int4 (bits=4): the seven transformer-layer matmuls additionally support
GROUP-WISE symmetric int4 (`{"q4p": uint8 [.., h, o/2], "s":
[.., h/G, o]}`, G=128 rows of the reduction axis per scale — per-
channel int4 alone is too lossy). Values are NIBBLE-PACKED two-per-
byte along the OUTPUT axis (adjacent output channels o=2c, 2c+1 share
a byte: low nibble = even channel, two's-complement) rather than
stored as native XLA s4 — s4 arrays cannot be passed as jit arguments
through the axon TPU relay (device_put recursion), while uint8 moves
everywhere. 7B layer weights drop ~5.9 GB (int8) -> ~3.0 GB, freeing
HBM for KV/slots on the HBM-bound eval paths. The embedding table and
lm_head STAY int8 (logit fidelity; they are ~260 MB combined at 7B —
not worth the accuracy risk). The matmul unpacks with VPU bit ops and
runs blockwise so no dequantized HBM-resident copy materializes:
`y[o] = sum_g (x_g @ q_g)[o] * s[g, o]` (models/llama.py:_mm). Eval
only, like int8; accuracy contract in tests/test_quant4.py.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# int4 group size along the reduction axis. 128 divides every real
# reduction dim (4096, 11008, 2048, 5504); for tiny test dims the
# effective group is gcd(h, 128) so grouping always tiles exactly.
GROUP4 = 128


def _group4(h: int) -> int:
    import math
    return math.gcd(h, GROUP4)


def _quant_one(w2d: jnp.ndarray, axis: int):
    """Symmetric per-channel int8 along `axis` (the reduction axis)."""
    amax = jnp.max(jnp.abs(w2d.astype(jnp.float32)), axis=axis,
                   keepdims=True)
    s = (jnp.maximum(amax, 1e-8) / 127.0).astype(w2d.dtype)
    q = jnp.clip(jnp.round(w2d.astype(jnp.float32) / s.astype(jnp.float32)),
                 -127, 127).astype(jnp.int8)
    return q, s


def _quant_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[h, o] or layer-stacked [L, h, o] -> {"q", "s"} (scale [..., 1, o]).

    Stacked weights quantize one layer at a time under lax.map so the
    fp32 transient is one layer (~180 MB at 7B), not the full stack
    (~5.8 GB — would OOM a 16 GB chip during conversion)."""
    if w.ndim == 3:
        q, s = jax.lax.map(lambda wl: _quant_one(wl, axis=0), w)
        return {"q": q, "s": s}
    q, s = _quant_one(w, axis=-2)
    return {"q": q, "s": s}


def _quant_embed(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[V, H] per-ROW int8 (scale [V, 1]) for table lookups."""
    q, s = _quant_one(w, axis=-1)
    return {"q": q, "s": s}


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Nibble-pack int values in [-7, 7] pairwise along the LAST axis
    (must be even): out[..., c] = (q[..., 2c] & 0xF) | (q[..., 2c+1]
    & 0xF) << 4 — low nibble = even channel, two's-complement. The
    inverse lives in models/llama.py:_unpack_q4 (cross-tested in
    tests/test_quant4.py)."""
    assert q.shape[-1] % 2 == 0, q.shape
    q8 = q.astype(jnp.int8)
    lo = (q8[..., 0::2] & 0xF).astype(jnp.uint8)
    hi = (q8[..., 1::2] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_int4_host(p) -> "jnp.ndarray":
    """numpy inverse of pack_int4 (tests / offline inspection)."""
    import numpy as np
    lo = (p & 0xF).astype(np.int8)
    hi = ((p >> 4) & 0xF).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo)
    hi = np.where(hi >= 8, hi - 16, hi)
    return np.stack([lo, hi], axis=-1).reshape(*p.shape[:-1],
                                               p.shape[-1] * 2)


def _quant_one4(w2d: jnp.ndarray):
    """Symmetric group-wise int4 of [h, o]: scales [h/G, o], values on
    the ±7 grid computed against the STORED (dtype-rounded) scale,
    nibble-packed along o."""
    h, o = w2d.shape
    g = _group4(h)
    w32 = w2d.astype(jnp.float32).reshape(h // g, g, o)
    amax = jnp.max(jnp.abs(w32), axis=1)                     # [ng, o]
    s = (jnp.maximum(amax, 1e-8) / 7.0).astype(w2d.dtype)
    q = jnp.clip(jnp.round(w32 / s[:, None, :].astype(jnp.float32)),
                 -7, 7)
    return pack_int4(q.reshape(h, o)), s


def _quant_weight4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[h, o] or layer-stacked [L, h, o] -> {"q4p", "s"} (group scales
    [..., h/G, o]); stacked weights quantize layer-at-a-time like the
    int8 path to bound the fp32 transient."""
    if w.ndim == 3:
        q, s = jax.lax.map(_quant_one4, w)
        return {"q4p": q, "s": s}
    q, s = _quant_one4(w)
    return {"q4p": q, "s": s}


def _quantize_llama_impl(params: Dict[str, Any],
                         bits: int = 8) -> Dict[str, Any]:
    qw = _quant_weight4 if bits == 4 else _quant_weight
    layers = dict(params["layers"])
    for k in _QUANT_KEYS:
        layers[k] = qw(layers[k])
    return {
        "embed": _quant_embed(params["embed"]),
        "layers": layers,
        "final_norm": params["final_norm"],
        # lm_head stays int8 even at bits=4 (logit fidelity)
        "lm_head": _quant_weight(params["lm_head"]),
    }


# donate the bf16 tree: the converted-out weights free as soon as each
# layer is quantized, so peak HBM stays ~weights + one fp32 layer.
# NOTE: peak is still (full bf16 tree + growing int8 tree) if XLA keeps
# every donated input live to the end — at 7B that is ~20 GB and OOMs a
# 16 GB chip. For trees that do not comfortably fit twice, use
# init_params_quantized (random init) or quantize tensors one at a time
# during checkpoint conversion.
quantize_llama_params = jax.jit(_quantize_llama_impl, donate_argnums=0,
                                static_argnums=1)

_quant_weight_jit = jax.jit(_quant_weight, donate_argnums=0)
_quant_weight4_jit = jax.jit(_quant_weight4, donate_argnums=0)
_quant_embed_jit = jax.jit(_quant_embed, donate_argnums=0)


def init_params_quantized(rng: jax.Array, cfg,
                          bits: int = 8) -> Dict[str, Any]:
    """Random-init an ALREADY-quantized Llama tree, one weight at a
    time: each bf16 weight is sampled, quantized by a donated jit, and
    dropped before the next is created. Peak HBM ≈ int8 tree (~6.8 GB
    at 7B) + the largest single bf16 stack (~2.9 GB) — vs ~20 GB for
    init_params + quantize_llama_params. This is what lets the 7B
    int8 benches run on a 16 GB chip at all."""
    from . import llama as L

    h, Ln = cfg.hidden_size, cfg.num_layers
    spec = L.weight_spec(cfg)
    keys = jax.random.split(rng, 9)   # identical key->weight map to
    # init_params, so the quantized tree is the quantization OF the
    # dense init_params(rng) tree (grid-level identical)
    layer_keys = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

    def make(key, entry, quantizer):
        w = L.init_dense(key, cfg, *entry)
        q = quantizer(w)
        del w
        return q

    layer_q = _quant_weight4_jit if bits == 4 else _quant_weight_jit
    layers = {k: make(keys[j + 1], spec["layers"][k], layer_q)
              for j, k in enumerate(layer_keys)}
    layers["attn_norm"] = jnp.ones((Ln, h), cfg.dtype)
    layers["mlp_norm"] = jnp.ones((Ln, h), cfg.dtype)
    return {
        "embed": make(keys[0], spec["embed"], _quant_embed_jit),
        "layers": layers,
        "final_norm": jnp.ones((h,), cfg.dtype),
        "lm_head": make(keys[8], spec["lm_head"], _quant_weight_jit),
    }


def quantize_host_llama(params: Dict[str, Any],
                        bits: int = 8) -> Dict[str, Any]:
    """Quantize a HOST (numpy) Llama tree in place — the post-
    checkpoint-conversion path: load_vicuna_streaming returns numpy
    bf16 leaves (models/convert.py:136), quantizing them on host means
    only the ~6.8 GB int8 tree is ever uploaded to the chip. Consumes
    the input dict destructively (each bf16 array is dropped as soon
    as its int8 replacement exists) so host peak stays ~ tree + one
    weight."""
    import numpy as np

    def q2d(w2d, axis):
        w32 = np.asarray(w2d, np.float32)
        amax = np.max(np.abs(w32), axis=axis, keepdims=True)
        s = (np.maximum(amax, 1e-8) / 127.0).astype(w2d.dtype)
        q = np.clip(np.round(w32 / s.astype(np.float32)),
                    -127, 127).astype(np.int8)
        return q, s

    def qw(w, axis):
        if w.ndim == 3:   # layer-stacked: bound the fp32 copy to 1 layer
            q = np.empty(w.shape, np.int8)
            s = np.empty((w.shape[0], 1, w.shape[2]), w.dtype)
            for l in range(w.shape[0]):
                q[l], s[l] = q2d(w[l], axis=0)
            return {"q": q, "s": s}
        q, s = q2d(w, axis=axis)
        return {"q": q, "s": s}

    def pack4(q):   # same nibble contract as pack_int4 (low = even ch)
        q8 = q.astype(np.int8)
        lo = (q8[..., 0::2] & 0xF).astype(np.uint8)
        hi = (q8[..., 1::2] & 0xF).astype(np.uint8)
        return lo | (hi << 4)

    def q2d4(w2d):
        h, o = w2d.shape
        g = _group4(h)
        w32 = np.asarray(w2d, np.float32).reshape(h // g, g, o)
        amax = np.max(np.abs(w32), axis=1)
        s = (np.maximum(amax, 1e-8) / 7.0).astype(w2d.dtype)
        q = np.clip(np.round(w32 / s[:, None, :].astype(np.float32)),
                    -7, 7)
        return pack4(q.reshape(h, o)), s

    def qw4(w):
        if w.ndim == 3:   # layer-stacked: bound the fp32 copy to 1 layer
            g = _group4(w.shape[1])
            q = np.empty((w.shape[0], w.shape[1], w.shape[2] // 2),
                         np.uint8)
            s = np.empty((w.shape[0], w.shape[1] // g, w.shape[2]),
                         w.dtype)
            for l in range(w.shape[0]):
                q[l], s[l] = q2d4(w[l])
            return {"q4p": q, "s": s}
        q, s = q2d4(w)
        return {"q4p": q, "s": s}

    layers = params["layers"]
    for k in _QUANT_KEYS:
        w = layers.pop(k)
        layers[k] = qw4(w) if bits == 4 else qw(w, axis=-2)
        del w
    for k, axis in (("embed", -1), ("lm_head", -2)):
        w = params.pop(k)
        params[k] = qw(w, axis=axis)   # int8 at every bits setting
        del w
    return params


def quantize_nav_params(params: Dict[str, Any],
                        bits: int = 8) -> Dict[str, Any]:
    """Quantize only the LLM subtree of a NavModel param tree; the
    panorama encoder / heads (<1% of params) stay in bf16."""
    out = dict(params)
    out["llm"] = quantize_llama_params(params["llm"], bits)
    return out


def is_quantized(params: Dict[str, Any]) -> bool:
    tree = params.get("llm", params)
    return isinstance(tree.get("lm_head"), dict)


def weight_bits(params: Dict[str, Any]) -> int:
    """16 (dense), 8, or 4 — inferred from the layer-matmul storage."""
    tree = params.get("llm", params)
    if not is_quantized(tree):
        return 16
    return 4 if "q4p" in tree["layers"]["wq"] else 8
