"""HF Llama checkpoint -> JAX param tree conversion.

Loads a HF `LlamaForCausalLM` state dict (torch, CPU) and restacks it
into this framework's pytree layout (models/llama.py:init_params):
per-layer weights stacked on a leading layer axis, linear weights
transposed to [in, out]. Handles the reference's vocabulary extension:
the embedding table is resized to the tokenizer's (MXU-aligned) vocab,
new rows initialized to the mean of existing rows (HF
resize_token_embeddings semantics, used by modified_lm.py:75).

Reference flow being replaced: ModifiedLlamaForCausalLM.from_pretrained
+ init_tokenizer (models/modified_lm.py:56-75, nav_model.py:40-49).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .llama import LlamaConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (float32 staging)."""
    return np.asarray(x.detach().to("cpu").float().numpy())


def config_from_hf(hf_config, vocab_size: Optional[int] = None,
                   **overrides) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=vocab_size or hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_norm_eps=hf_config.rms_norm_eps,
        max_seq_len=getattr(hf_config, "max_position_embeddings", 2048),
        **overrides,
    )


def _resize_rows(table: np.ndarray, new_rows: int) -> np.ndarray:
    """Grow a [V, H] table: new rows = mean of existing (HF semantics)."""
    v, h = table.shape
    if new_rows <= v:
        return table[:new_rows]
    mean = table.mean(axis=0, keepdims=True)
    return np.concatenate([table, np.repeat(mean, new_rows - v, axis=0)], 0)


def convert_hf_llama(hf_model, cfg: LlamaConfig) -> Dict[str, Any]:
    """HF LlamaForCausalLM (torch) -> params pytree matching `cfg`.

    cfg.vocab_size may exceed the HF vocab (special tokens + MXU
    alignment); extra embedding/lm_head rows get mean-init.
    """
    import jax.numpy as jnp

    sd = hf_model.state_dict()
    L = cfg.num_layers
    dt = cfg.dtype

    def stack(fmt, transpose=True):
        ws = []
        for l in range(L):
            w = _t(sd[fmt.format(l)])
            ws.append(w.T if transpose else w)
        return jnp.asarray(np.stack(ws), dt)

    embed = _resize_rows(_t(sd["model.embed_tokens.weight"]), cfg.vocab_size)
    if "lm_head.weight" in sd:
        lm_head = _resize_rows(_t(sd["lm_head.weight"]), cfg.vocab_size).T
    else:   # tied embeddings
        lm_head = embed.T

    return {
        "embed": jnp.asarray(embed, dt),
        "layers": {
            "attn_norm": stack("model.layers.{}.input_layernorm.weight",
                               transpose=False),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack(
                "model.layers.{}.post_attention_layernorm.weight",
                transpose=False),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(_t(sd["model.norm.weight"]), dt),
        "lm_head": jnp.asarray(lm_head, dt),
    }


def load_vicuna(pretrained_model_name_or_path: str, vocab_size: int,
                dtype=None, quantize: bool = False,
                quant_bits: int = 8) -> tuple:
    """Load a local Vicuna/Llama checkpoint -> (LlamaConfig, params).

    Prefers the streaming safetensors path (no torch model
    instantiation, peak host RAM ~ one shard — required for 7B on
    small hosts); falls back to from_pretrained for .bin checkpoints.

    quantize=True additionally converts the tree to int8 weight-only
    storage ON HOST (models/quant.py:quantize_host_llama) so only the
    ~6.8 GB int8 tree is uploaded — the eval deployment path for 7B on
    16 GB chips. quant_bits=4 stores the layer matmuls as group-wise
    int4 instead (~3.3 GB total with the int8 embed/lm_head).
    """
    import os
    import jax.numpy as jnp
    p = pretrained_model_name_or_path
    if os.path.isdir(p) and any(f.endswith(".safetensors")
                                for f in os.listdir(p)):
        cfg, params = load_vicuna_streaming(p, vocab_size, dtype=dtype)
    else:
        import torch
        from transformers import LlamaForCausalLM
        hf = LlamaForCausalLM.from_pretrained(p, torch_dtype=torch.float32)
        cfg = config_from_hf(hf.config, vocab_size=vocab_size,
                             dtype=dtype or jnp.bfloat16)
        params = convert_hf_llama(hf, cfg)
    if quantize:
        from .quant import quantize_host_llama
        params = quantize_host_llama(params, bits=quant_bits)
    return cfg, params


# tensor-name -> (stack key, transpose) for per-layer weights
_LAYER_MAP = {
    "input_layernorm.weight": ("attn_norm", False),
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "post_attention_layernorm.weight": ("mlp_norm", False),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
}


def load_vicuna_streaming(path: str, vocab_size: int, dtype=None) -> tuple:
    """Convert a local (sharded) safetensors Llama checkpoint WITHOUT
    instantiating the torch model: tensors stream out of each shard and
    land directly in the pre-allocated stacked host arrays, so peak
    host RAM is ~ one tensor above the output tree (vs the
    from_pretrained path staging the entire model in torch fp32 first —
    ~26 GB for Vicuna-7B). Exercised at true 7B scale by
    tests/test_convert.py.

    Returns (LlamaConfig, params) with numpy (ml_dtypes-backed bf16)
    leaves — pass through jax.device_put / jnp.asarray to place.
    """
    import os
    import jax.numpy as jnp
    from safetensors import safe_open
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(path)
    cfg = config_from_hf(hf_cfg, vocab_size=vocab_size,
                         dtype=dtype or jnp.bfloat16)
    np_dt = jnp.dtype(cfg.dtype)   # ml_dtypes-backed numpy dtype
    L, h, i = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    layers = {
        "attn_norm": np.zeros((L, h), np_dt),
        "wq": np.zeros((L, h, nh * d), np_dt),
        "wk": np.zeros((L, h, nkv * d), np_dt),
        "wv": np.zeros((L, h, nkv * d), np_dt),
        "wo": np.zeros((L, nh * d, h), np_dt),
        "mlp_norm": np.zeros((L, h), np_dt),
        "w_gate": np.zeros((L, h, i), np_dt),
        "w_up": np.zeros((L, h, i), np_dt),
        "w_down": np.zeros((L, i, h), np_dt),
    }
    params: Dict[str, Any] = {"layers": layers}
    tied_embed = True

    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    seen = set()
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for name in f.keys():
                seen.add(name)
                w = f.get_tensor(name)
                if name == "model.embed_tokens.weight":
                    params["embed"] = _resize_rows(
                        w.astype(np.float32), cfg.vocab_size).astype(np_dt)
                elif name == "lm_head.weight":
                    tied_embed = False
                    params["lm_head"] = np.ascontiguousarray(_resize_rows(
                        w.astype(np.float32), cfg.vocab_size).T).astype(np_dt)
                elif name == "model.norm.weight":
                    params["final_norm"] = w.astype(np_dt)
                elif name.startswith("model.layers."):
                    rest = name[len("model.layers."):]
                    lidx, _, key = rest.partition(".")
                    ent = _LAYER_MAP.get(key)
                    if ent is None:
                        continue       # rotary inv_freq buffers etc.
                    stack, transpose = ent
                    layers[stack][int(lidx)] = w.T if transpose else w
    # completeness: a missing shard would otherwise silently leave
    # all-zero layers (exactly the failure mode of a partial download
    # of the multi-file layout this path targets)
    expected = {"model.embed_tokens.weight", "model.norm.weight"} | {
        f"model.layers.{l}.{k}" for l in range(L) for k in _LAYER_MAP}
    missing = expected - seen
    if missing:
        raise ValueError(
            f"checkpoint at {path} is incomplete: {len(missing)} tensors "
            f"missing (e.g. {sorted(missing)[:3]}) — partial download?")
    if tied_embed:
        params["lm_head"] = np.ascontiguousarray(params["embed"].T)
    return cfg, params
