"""Panorama/view encoder: TPU-native ImageEmbeddings equivalent.

Re-implements the reference's pano pipeline (models/image_embedding.py:
11-121) functionally in JAX with fixed shapes:
  img linear+LN  ⊕  loc linear+LN  ⊕  nav-type embedding  → LN → dropout
  → N pre-norm transformer encoder layers (DETR-style, reference
  detr_transformer.py:133-190, built with normalize_before=True and a
  final LN per models/ops.py:6-18)  → mapper linear → masked output.

Object fusion (fuse_obj) keeps fixed [B, V+O, H] shapes with validity
masks instead of the reference's ragged repacking — attention has no
positional encoding here, so masked concatenation is equivalent.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.masking import gen_seq_masks


@dataclasses.dataclass(frozen=True)
class PanoConfig:
    # feature dims (configs/multi.yaml:4-16)
    image_feat_size: int = 1024
    obj_feat_size: int = 768
    angle_feat_size: int = 4
    # encoder dims: bert-large carrier config (nav_model.py:17-29)
    hidden_size: int = 1024
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_pano_layers: int = 2
    hidden_dropout_prob: float = 0.1
    output_size: int = 4096          # LLM hidden size
    use_obj: bool = False
    fuse_obj: bool = False
    dtype: Any = jnp.float32

    @property
    def loc_size(self) -> int:
        return self.angle_feat_size + 3

    @classmethod
    def tiny(cls, output_size: int = 128, **kw) -> "PanoConfig":
        kw.setdefault("image_feat_size", 32)
        kw.setdefault("obj_feat_size", 16)
        kw.setdefault("hidden_size", 64)
        kw.setdefault("num_attention_heads", 4)
        kw.setdefault("intermediate_size", 128)
        return cls(output_size=output_size, **kw)


def layer_norm(x, scale, bias, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _linear_init(key, d_in, d_out, dtype):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * (d_in ** -0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def _ln_init(d, dtype):
    return {"s": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def init_pano_params(rng: jax.Array, cfg: PanoConfig) -> Dict[str, Any]:
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_pano_layers
    keys = iter(jax.random.split(rng, 24))
    p = {
        "img_linear": _linear_init(next(keys), cfg.image_feat_size, h, cfg.dtype),
        "img_ln": _ln_init(h, cfg.dtype),
        "loc_linear": _linear_init(next(keys), cfg.loc_size, h, cfg.dtype),
        "loc_ln": _ln_init(h, cfg.dtype),
        "nav_type_emb": (jax.random.normal(next(keys), (3, h), jnp.float32)
                         * 0.02).astype(cfg.dtype),
        "ln": _ln_init(h, cfg.dtype),
        "mapper": _linear_init(next(keys), h, cfg.output_size, cfg.dtype),
    }
    if L > 0:
        def stack(maker):
            outs = [maker(k) for k in jax.random.split(next(keys), L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        p["encoder"] = {
            "ln1": jax.tree.map(lambda x: jnp.stack([x] * L), _ln_init(h, cfg.dtype)),
            "qkv": stack(lambda k: _linear_init(k, h, 3 * h, cfg.dtype)),
            "out": stack(lambda k: _linear_init(k, h, h, cfg.dtype)),
            "ln2": jax.tree.map(lambda x: jnp.stack([x] * L), _ln_init(h, cfg.dtype)),
            "ffn1": stack(lambda k: _linear_init(k, h, i, cfg.dtype)),
            "ffn2": stack(lambda k: _linear_init(k, i, h, cfg.dtype)),
        }
        p["encoder_norm"] = _ln_init(h, cfg.dtype)
    if cfg.use_obj:
        p["obj_projector"] = _linear_init(next(keys), cfg.obj_feat_size,
                                          cfg.output_size, cfg.dtype)
        p["obj_projector_ln"] = _ln_init(cfg.output_size, cfg.dtype)
        if cfg.fuse_obj:
            p["obj_linear"] = _linear_init(next(keys), cfg.obj_feat_size, h, cfg.dtype)
            p["obj_linear_ln"] = _ln_init(h, cfg.dtype)
    return p


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0)


def _encoder_stack(params, cfg: PanoConfig, x, mask, rng, deterministic):
    """Pre-norm DETR encoder over [B, T, H] with validity mask [B, T]."""
    nh = cfg.num_attention_heads
    d = cfg.hidden_size // nh

    def block(x, lp):
        b, t, h = x.shape
        y = layer_norm(x, lp["ln1"]["s"], lp["ln1"]["b"])
        qkv = y @ lp["qkv"]["w"] + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, d)
        k = k.reshape(b, t, nh, d)
        v = v.reshape(b, t, nh, d)
        attn = multi_head_attention(q, k, v, kv_mask=mask, causal=False,
                                    impl="xla")
        x = x + attn.reshape(b, t, h) @ lp["out"]["w"] + lp["out"]["b"]
        y = layer_norm(x, lp["ln2"]["s"], lp["ln2"]["b"])
        y = jax.nn.gelu(y @ lp["ffn1"]["w"] + lp["ffn1"]["b"], approximate=False)
        x = x + (y @ lp["ffn2"]["w"] + lp["ffn2"]["b"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["encoder"])
    en = params["encoder_norm"]
    return layer_norm(x, en["s"], en["b"])


def forward_panorama(params, cfg: PanoConfig, view_img_fts, view_lens,
                     loc_fts=None, nav_types=None, obj_img_fts=None,
                     obj_lens=None, obj_loc_fts=None, rng=None,
                     deterministic=True) -> Dict[str, jnp.ndarray]:
    """view_img_fts: [B, V, Di]; view_lens: [B]; loc_fts: [B, V, 7];
    nav_types: [B, V] int (0 non-nav, 1 navigable, 2 object).
    Returns pano_embeds [B, V, output_size], pano_masks [B, V] (+ object
    outputs when obj_img_fts given)."""
    b, v, _ = view_img_fts.shape
    x = layer_norm(view_img_fts.astype(cfg.dtype) @ params["img_linear"]["w"]
                   + params["img_linear"]["b"],
                   params["img_ln"]["s"], params["img_ln"]["b"])
    if loc_fts is None:
        loc_fts = jnp.zeros((b, v, cfg.loc_size), cfg.dtype)
    x = x + layer_norm(loc_fts.astype(cfg.dtype) @ params["loc_linear"]["w"]
                       + params["loc_linear"]["b"],
                       params["loc_ln"]["s"], params["loc_ln"]["b"])
    if nav_types is None:
        nav_types = jnp.ones((b, v), jnp.int32)
    x = x + params["nav_type_emb"][nav_types]
    x = layer_norm(x, params["ln"]["s"], params["ln"]["b"])
    if rng is not None:
        rng, drng = jax.random.split(rng)
        x = _dropout(x, cfg.hidden_dropout_prob, drng, deterministic)

    pano_masks = gen_seq_masks(view_lens, v)
    ret: Dict[str, jnp.ndarray] = {}

    if "encoder" in params:
        if cfg.fuse_obj and obj_img_fts is not None:
            o = obj_img_fts.shape[1]
            obj_nav = jnp.full((b, o), 2, jnp.int32)
            oe = (obj_img_fts.astype(cfg.dtype) @ params["obj_linear"]["w"]
                  + params["obj_linear"]["b"])
            oe = layer_norm(oe, params["obj_linear_ln"]["s"],
                            params["obj_linear_ln"]["b"])
            oe = oe + layer_norm(
                obj_loc_fts.astype(cfg.dtype) @ params["loc_linear"]["w"]
                + params["loc_linear"]["b"],
                params["loc_ln"]["s"], params["loc_ln"]["b"])
            oe = oe + params["nav_type_emb"][obj_nav]
            obj_masks = gen_seq_masks(obj_lens, o)
            fused = jnp.concatenate([x, oe], axis=1)
            fmask = jnp.concatenate([pano_masks, obj_masks], axis=1)
            fused = _encoder_stack(params, cfg, fused, fmask, rng, deterministic)
            x = fused[:, :v]
        else:
            x = _encoder_stack(params, cfg, x, pano_masks, rng, deterministic)

    x = x @ params["mapper"]["w"] + params["mapper"]["b"]
    x = jnp.where(pano_masks[..., None], x, 0)
    ret["pano_embeds"] = x
    ret["pano_masks"] = pano_masks

    if obj_img_fts is not None and obj_img_fts.shape[1] > 0 and cfg.use_obj:
        oemb = (obj_img_fts.astype(cfg.dtype) @ params["obj_projector"]["w"]
                + params["obj_projector"]["b"])
        oemb = layer_norm(oemb, params["obj_projector_ln"]["s"],
                          params["obj_projector_ln"]["b"])
        ret["obj_embeds"] = oemb
        ret["obj_masks"] = gen_seq_masks(obj_lens, obj_img_fts.shape[1])
        ret["obj_loc_fts"] = obj_loc_fts
    return ret
