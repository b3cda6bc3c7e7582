"""NavModel: multimodal wrapper — LLM + panorama encoder + heads.

TPU-native re-design of the reference NavModel (models/nav_model.py:33-451).
Every per-sample Python loop in the reference (global/local fusion,
backtrack dedup, candidate permutation, logit scatter,
nav_model.py:146-242) becomes a fixed-shape gather/scatter under jit.
The host agent precomputes integer alignment arrays (see NavBatch) so
the device code is pure vectorized tensor work.

Mode dispatch mirrors the reference forward():
  panorama / navigation / summarization|embodied_qa (generation loss) /
  3dqa / object_grounding.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import llama as L
from .pano_encoder import PanoConfig, forward_panorama, init_pano_params, layer_norm
from ..ops.masking import NEG_INF

NUM_CAND_SLOTS = 100      # out_head width (nav_model.py:87-89)
MAX_ACTION_STEPS = 100    # gmap step-embedding table (nav_model.py:22)


@dataclasses.dataclass(frozen=True)
class NavModelConfig:
    llm: L.LlamaConfig
    pano: PanoConfig
    angle_feat_size: int = 4
    type_vocab_size: int = 3

    @property
    def hidden_size(self) -> int:
        return self.llm.hidden_size

    @classmethod
    def tiny(cls, vocab_size: int = 512, use_obj: bool = True) -> "NavModelConfig":
        llm = L.LlamaConfig.tiny(vocab_size=vocab_size)
        return cls(llm=llm,
                   pano=PanoConfig.tiny(output_size=llm.hidden_size,
                                        use_obj=use_obj))


def init_nav_params(rng: jax.Array, cfg: NavModelConfig,
                    quantize_llm: bool = False,
                    quant_bits: int = 8) -> Dict[str, Any]:
    """quantize_llm=True builds the LLM subtree int8-quantized
    incrementally (models/quant.py:init_params_quantized) — same RNG
    stream, but the dense bf16 tree never exists in full (a 7B dense
    init + post-hoc quantize peaks ~20 GB and OOMs a 16 GB chip).
    quant_bits=4 stores the layer matmuls group-wise int4 instead."""
    h = cfg.hidden_size
    dt = cfg.llm.dtype
    k = iter(jax.random.split(rng, 10))

    def mlp_ln(key, d_in, d_out):
        w = (jax.random.normal(key, (d_in, d_out), jnp.float32)
             * (d_in ** -0.5)).astype(dt)
        return {"w": w, "b": jnp.zeros((d_out,), dt),
                "ln_s": jnp.ones((d_out,), dt), "ln_b": jnp.zeros((d_out,), dt)}

    if quantize_llm:
        from .quant import init_params_quantized
        _init_llm = functools.partial(init_params_quantized, cfg=cfg.llm,
                                      bits=quant_bits)
    else:
        _init_llm = functools.partial(L.init_params, cfg=cfg.llm)
    params = {
        "llm": _init_llm(next(k)),
        "pano": init_pano_params(next(k), cfg.pano),
        "token_type_emb": (jax.random.normal(next(k), (cfg.type_vocab_size, h),
                                             jnp.float32) * 0.02).astype(dt),
        # global-map embeddings (nav_model.py:60-67)
        "gmap_pos": mlp_ln(next(k), cfg.angle_feat_size + 3, h),
        "gmap_step_emb": (jax.random.normal(next(k), (MAX_ACTION_STEPS, h),
                                            jnp.float32) * 0.02).astype(dt),
        # local viewpoint embeddings (nav_model.py:69-72)
        "vp_pos": mlp_ln(next(k), cfg.angle_feat_size * 2 + 6, h),
        # object position embeddings (nav_model.py:74-77)
        "obj_pos": mlp_ln(next(k), cfg.angle_feat_size + 3, h),
        # candidate-slot classification head (nav_model.py:87-89)
        "out_head": {"w": (jax.random.normal(next(k), (h, NUM_CAND_SLOTS),
                                             jnp.float32) * (h ** -0.5)).astype(dt),
                     "b": jnp.zeros((NUM_CAND_SLOTS,), dt)},
    }
    return params


def _pos_mlp(p, x):
    y = x.astype(p["w"].dtype) @ p["w"] + p["b"]
    return layer_norm(y, p["ln_s"], p["ln_b"])


def _inject(llm_params, input_ids, positions, embeds):
    """Build input embeddings with additive visual injection.

    positions: [B, K] token indices (-1 = unused); embeds: [B, K, H].
    Equivalent to `inputs_embeds[locations] += vis` (modified_lm.py:100-110).
    """
    return L.embed_with_injection(llm_params, input_ids, positions, embeds)


def fuse_gmap_local(params, cfg: NavModelConfig, batch: Dict[str, jnp.ndarray]):
    """Vectorized global/local fusion (reference nav_model.py:146-196).

    Required batch arrays:
      gmap_img_embeds [B,G,H], gmap_step_ids [B,G], gmap_pos_fts [B,G,A+3],
      gmap_masks [B,G] bool, gmap_visited_masks [B,G] bool,
      vp_img_embeds [B,V,H], vp_pos_fts [B,V,2A+6], pano_masks [B,V] bool,
      local_match_slot [B,V] int32 — gmap slot of local candidate j's vpid
        if that vpid is an unvisited gmap node, else -1 (host-computed).
    Returns fuse_embeds [B,G,H], cand_masks [B,G].
    """
    gmap = batch["gmap_img_embeds"] \
        + params["gmap_step_emb"][batch["gmap_step_ids"]] \
        + _pos_mlp(params["gmap_pos"], batch["gmap_pos_fts"])
    visited = batch["gmap_visited_masks"]
    gmask = batch["gmap_masks"]
    zero_out = visited | ~gmask
    gmap = jnp.where(zero_out[..., None], 0.0, gmap)

    vp = batch["vp_img_embeds"] + _pos_mlp(params["vp_pos"], batch["vp_pos_fts"])
    vp = jnp.where(batch["pano_masks"][..., None], vp, 0.0)

    # scatter local candidate embeds onto their gmap slots
    b, g, h = gmap.shape
    slot = batch["local_match_slot"]            # [B, V]
    valid = slot >= 0
    slot_safe = jnp.maximum(slot, 0)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], slot.shape)
    fuse = gmap.at[bidx, slot_safe].add(
        jnp.where(valid[..., None], vp, 0.0).astype(gmap.dtype))
    matched = jnp.zeros((b, g), bool).at[bidx, slot_safe].max(valid)

    # token type 1 for unvisited non-stop nodes with no local view
    # (nav_model.py:181-189); stop is slot 0
    slot_ids = jnp.arange(g)[None, :]
    ttype = ((slot_ids > 0) & gmask & ~visited & ~matched).astype(jnp.int32)
    fuse = fuse + params["token_type_emb"][ttype]
    fuse = jnp.where(zero_out[..., None], 0.0, fuse)

    cand_masks = gmask & ~visited
    return fuse, cand_masks


def forward_navigation(params, cfg: NavModelConfig, batch: Dict[str, jnp.ndarray]):
    """Device-side navigation step (reference forward_navigation,
    nav_model.py:129-248).

    Beyond fuse_gmap_local inputs, batch needs:
      input_ids [B,L], attention_mask [B,L] bool,
      cand_positions [B,C] — token index of the k-th `<cand>` token (-1 pad),
      cand_order [B,C]     — gmap slot injected at that token (host-permuted,
                             replacing torch.randperm at nav_model.py:214-224),
      hist_positions [B,Hh], hist_embeds [B,Hh,H],
      cls_pos [B]          — token index of `<cls_1>`.
    Returns dict(fuse_embeds [B,G,H] (stop-grad), fuse_logits [B,G]).
    """
    fuse, cand_masks = fuse_gmap_local(params, cfg, batch)
    b, g, h = fuse.shape

    order = batch["cand_order"]                  # [B, C] gmap slots
    ovalid = order >= 0
    order_safe = jnp.maximum(order, 0)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], order.shape)
    cand_embeds = jnp.where(ovalid[..., None], fuse[bidx, order_safe], 0.0)

    positions = jnp.concatenate([batch["cand_positions"],
                                 batch["hist_positions"]], axis=1)
    embeds = jnp.concatenate([cand_embeds, batch["hist_embeds"]], axis=1)
    inputs_embeds = _inject(params["llm"], batch["input_ids"], positions, embeds)

    hidden, _ = L.forward_hidden(params["llm"], cfg.llm, inputs_embeds,
                                 batch["attention_mask"])
    cls_hidden = hidden[jnp.arange(b), batch["cls_pos"]]          # [B, H]
    preds = (cls_hidden @ params["out_head"]["w"]
             + params["out_head"]["b"]).astype(jnp.float32)       # [B, 100]

    # scatter back: slot 0 <- preds[:, 0]; cand_order[b, k] <- preds[b, k+1]
    logits = jnp.full((b, g), NEG_INF, jnp.float32)
    logits = logits.at[:, 0].set(preds[:, 0])
    upd = jnp.where(ovalid, preds[:, 1:1 + order.shape[1]], NEG_INF)
    logits = logits.at[bidx, order_safe].max(upd)
    logits = jnp.where(cand_masks, logits, NEG_INF)

    return {"fuse_embeds": jax.lax.stop_gradient(fuse),
            "fuse_logits": logits}


def prep_generation_embeds(params, cfg: NavModelConfig, vp_img_embeds,
                           vp_masks):
    """Shared pre-LLM path of summarization/3dqa (nav_model.py:270-283,
    364-374): zero pos features + type-0 embedding."""
    b, v, h = vp_img_embeds.shape
    zeros = jnp.zeros((b, v, cfg.angle_feat_size * 2 + 6), vp_img_embeds.dtype)
    x = vp_img_embeds + _pos_mlp(params["vp_pos"], zeros)
    x = x + params["token_type_emb"][jnp.zeros((b, v), jnp.int32)]
    return jnp.where(vp_masks[..., None], x, 0.0)


def forward_generation_loss(params, cfg: NavModelConfig, batch):
    """Teacher-forced LM loss for summarization / embodied_qa / 3dqa
    (nav_model.py:296-318, 376-387).

    batch: input_ids [B,L], attention_mask [B,L], labels [B,L] (-100
    ignored), cand_positions [B,C], hist_positions [B,Hh],
    hist_embeds [B,Hh,H], special_token_mask [vocab] bool, and either
      cand_embeds [B,C,H]  (pre-fused), or
      vp_img_embeds [B,V,H] + vp_masks [B,V]  (raw panorama embeds —
      zero-pos/type-0 fusion happens here on device; valid embeds must
      be a contiguous prefix, which panorama ordering guarantees:
      candidates first, then non-cand views).
    """
    c = batch["cand_positions"].shape[1]
    if "cand_embeds" in batch:
        cand_embeds = batch["cand_embeds"]
    else:
        emb = prep_generation_embeds(params, cfg, batch["vp_img_embeds"],
                                     batch["vp_masks"])
        cand_embeds = emb[:, :c]
    positions = jnp.concatenate([batch["cand_positions"],
                                 batch["hist_positions"]], axis=1)
    embeds = jnp.concatenate([cand_embeds, batch["hist_embeds"]], axis=1)
    inputs_embeds = _inject(params["llm"], batch["input_ids"], positions, embeds)
    hidden, _ = L.forward_hidden(params["llm"], cfg.llm, inputs_embeds,
                                 batch["attention_mask"])
    logits = L.logits_from_hidden(params["llm"], cfg.llm, hidden,
                                  batch.get("special_token_mask"))
    loss = L.causal_lm_loss(logits, batch["labels"])
    return {"loss": loss, "logits": logits}


def forward_object_grounding(params, cfg: NavModelConfig, batch):
    """Object-grounding logits (nav_model.py:407-451).

    batch: obj_embeds [B,O,H], obj_loc_fts [B,O,A+3], obj_masks [B,O],
    input_ids, attention_mask, cand_positions [B,C] (token index of the
    k-th object `<cand>` token), hist_positions/hist_embeds, cls_pos [B].
    Object k (0-based) maps to prompt option k+1; option 0 = "not exist".
    Returns obj_logits [B, 100] with invalid options at NEG_INF.
    """
    obj = batch["obj_embeds"] + _pos_mlp(params["obj_pos"], batch["obj_loc_fts"])
    obj = jnp.where(batch["obj_masks"][..., None], obj, 0.0)
    b, o, h = obj.shape

    positions = jnp.concatenate([batch["cand_positions"],
                                 batch["hist_positions"]], axis=1)
    embeds = jnp.concatenate([obj, batch["hist_embeds"]], axis=1)
    inputs_embeds = _inject(params["llm"], batch["input_ids"], positions, embeds)
    hidden, _ = L.forward_hidden(params["llm"], cfg.llm, inputs_embeds,
                                 batch["attention_mask"])
    cls_hidden = hidden[jnp.arange(b), batch["cls_pos"]]
    preds = (cls_hidden @ params["out_head"]["w"]
             + params["out_head"]["b"]).astype(jnp.float32)

    cand_nums = batch["obj_masks"].sum(axis=1) + 1   # + "not exist"
    slot = jnp.arange(NUM_CAND_SLOTS)[None, :]
    return {"obj_logits": jnp.where(slot < cand_nums[:, None], preds, NEG_INF)}


def navigation_loss(fuse_logits, targets, ignore_id: int = -100,
                    reduction: str = "sum"):
    """CE over gmap slots with ignore labels. Default reduction is SUM
    over the batch to match the reference's criterion
    (nn.CrossEntropyLoss(ignore_index, reduction='sum'), train.py:231)
    whose output is then scaled by train_ml / batch_size / grad_accum
    (mp3d_agent.py:750-757)."""
    valid = targets != ignore_id
    safe = jnp.maximum(targets, 0)
    logp = jax.nn.log_softmax(fuse_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    if reduction == "mean":
        return total / jnp.maximum(jnp.sum(valid), 1)
    return total
