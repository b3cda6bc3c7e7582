"""Device-resident rollout memory: embeddings never leave HBM.

The host-path rollout downloads panorama embeddings every step to feed
the GraphMap and re-uploads them inside the navigation batch
(pano [B,V,H] down + gmap [B,G,H] + vp [B,V,H] + hist [B,Hh,H] up per
step ~ tens of MB). On TPU hosts this wastes PCIe/relay bandwidth; the
SURVEY.md §7.1 mapping calls for graph memory to live on device.

This module keeps three device buffers per episode batch:
  mem_sum [B, M, H], mem_cnt [B, M]  — mean-pooled node embeddings
      keyed by the episode graph's STABLE node index (insertion order,
      sim/graph.py EpisodeGraph._idx), capacity M;
  hist_buf [B, Hh, H]                — history (chosen fuse embeds).

Per step the host uploads only integer bookkeeping (current-node id,
candidate ids, gmap slot->node-id order, positions/masks/token arrays)
and downloads only the [B, G] logits. Jitted ops:
  memory_update: scatter the masked-average pano embed (rewrite) at the
      current node + add candidate view embeds at unvisited nodes
      (reference update_node_embed semantics, graph_utils.py:119-133);
  nav step (infer/train): gather gmap embeds from memory, build
      [stop]+pano local embeds, run forward_navigation, append the
      chosen fuse embed to hist_buf — all in one compiled call.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import nav_model as NM


def init_memory(batch: int, capacity: int, hist: int, hidden: int, dtype):
    return {
        "mem_sum": jnp.zeros((batch, capacity, hidden), dtype),
        "mem_cnt": jnp.zeros((batch, capacity), jnp.int32),
        "hist_buf": jnp.zeros((batch, hist, hidden), dtype),
        "hist_cnt": jnp.zeros((batch,), jnp.int32),
    }


def memory_update(state, pano_embeds, pano_masks, cur_ids, cand_ids):
    """cur_ids [B] (node id of current vp, -1 = skip/ended);
    cand_ids [B, V] (node id for view j if it should accumulate, -1 = no).
    """
    mem_sum, mem_cnt = state["mem_sum"], state["mem_cnt"]
    b, m, h = mem_sum.shape
    bidx = jnp.arange(b)

    denom = jnp.maximum(pano_masks.sum(1, keepdims=True), 1)
    avg = (pano_embeds * pano_masks[..., None]).sum(1) / denom      # [B, H]
    cur_valid = cur_ids >= 0
    cur_safe = jnp.maximum(cur_ids, 0)
    # rewrite semantics: sum <- avg, cnt <- 1 (only where valid)
    new_sum = mem_sum.at[bidx, cur_safe].set(
        jnp.where(cur_valid[:, None], avg.astype(mem_sum.dtype),
                  mem_sum[bidx, cur_safe]))
    new_cnt = mem_cnt.at[bidx, cur_safe].set(
        jnp.where(cur_valid, 1, mem_cnt[bidx, cur_safe]))

    cvalid = cand_ids >= 0
    csafe = jnp.maximum(cand_ids, 0)
    bgrid = jnp.broadcast_to(bidx[:, None], cand_ids.shape)
    upd = jnp.where(cvalid[..., None], pano_embeds.astype(mem_sum.dtype), 0)
    new_sum = new_sum.at[bgrid, csafe].add(upd)
    new_cnt = new_cnt.at[bgrid, csafe].add(cvalid.astype(jnp.int32))
    return {**state, "mem_sum": new_sum, "mem_cnt": new_cnt}


def assemble_from_memory(state, slot_ids, pano_embeds):
    """slot_ids [B, G] (stable node id per gmap slot, -1 empty) ->
    gmap_img_embeds [B, G, H]; pano_embeds [B, V, H] ->
    vp_img_embeds [B, V+1, H] with a zero stop row."""
    mem_sum, mem_cnt = state["mem_sum"], state["mem_cnt"]
    b, g = slot_ids.shape
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], slot_ids.shape)
    safe = jnp.maximum(slot_ids, 0)
    cnt = jnp.maximum(mem_cnt[bidx, safe], 1)[..., None]
    gmap = jnp.where((slot_ids >= 0)[..., None],
                     mem_sum[bidx, safe] / cnt, 0.0).astype(jnp.float32)
    stop = jnp.zeros((b, 1, pano_embeds.shape[-1]), pano_embeds.dtype)
    vp = jnp.concatenate([stop, pano_embeds], axis=1)
    return gmap, vp


def hist_append(state, fuse_embeds, a_t):
    """Append fuse_embeds[b, a_t[b]] at position hist_cnt[b] (skip where
    a_t < 0). hist capacity covers max action length by construction."""
    hist_buf, hist_cnt = state["hist_buf"], state["hist_cnt"]
    b, hh, h = hist_buf.shape
    bidx = jnp.arange(b)
    valid = a_t >= 0
    slot = jnp.minimum(hist_cnt, hh - 1)
    chosen = fuse_embeds[bidx, jnp.maximum(a_t, 0)]
    new_buf = hist_buf.at[bidx, slot].set(
        jnp.where(valid[:, None], chosen.astype(hist_buf.dtype),
                  hist_buf[bidx, slot]))
    new_cnt = hist_cnt + valid.astype(jnp.int32)
    return {**state, "hist_buf": new_buf, "hist_cnt": new_cnt}


def reset_slots(state, reset_mask):
    """Zero the memory of refilled slots (reset_mask [B] bool)."""
    z = reset_mask
    return {
        "mem_sum": jnp.where(z[:, None, None], 0, state["mem_sum"]),
        "mem_cnt": jnp.where(z[:, None], 0, state["mem_cnt"]),
        "hist_buf": jnp.where(z[:, None, None], 0, state["hist_buf"]),
        "hist_cnt": jnp.where(z, 0, state["hist_cnt"]),
    }


def eval_step(params, cfg, pano_apply, state, pano_in, batch, reset_mask,
              cur_ids, cand_ids, active_mask, a_t_override, rng,
              do_sample: bool, temperature):
    """ONE fused evaluation step: reset refilled slots -> panorama ->
    memory update -> navigation forward -> action select -> history
    append. A single executable per rollout step (the per-call relay
    overhead of the split pano/mem/nav/hist chain dominated eval
    wall-clock on tunneled chips), downloading only a_t.

    pano_apply(params, rng, pano_in, deterministic) -> dict with
    pano_embeds/pano_masks (the runner's closure, dropout off here).
    a_t_override [B] int32: force the action for rows >= 0 (the EQA
    oracle pass follows teacher actions through the same machinery,
    reference mp3d_agent.py:576-584); -1 keeps the policy action.
    Returns (new_state, a_t [B] int32, logits [B, G] fp32).
    """
    state = reset_slots(state, reset_mask)
    po = pano_apply(params, rng, pano_in, True)
    pano_embeds, pano_masks = po["pano_embeds"], po["pano_masks"]
    state = memory_update(state, pano_embeds, pano_masks, cur_ids, cand_ids)
    logits, fuse = nav_step_from_memory(params, cfg, state, batch,
                                        pano_embeds)
    if do_sample:
        a_t = jax.random.categorical(
            rng, logits / jnp.maximum(temperature, 1e-6), axis=-1)
    else:
        a_t = jnp.argmax(logits, axis=-1)
    a_t = a_t.astype(jnp.int32)
    a_t = jnp.where(a_t_override >= 0, a_t_override, a_t)
    state = hist_append(state, fuse, jnp.where(active_mask, a_t, -1))
    return state, a_t, logits


def init_prefix_cache(llm_cfg, batch: int, max_prefix: int,
                      kv_int8: bool = False):
    """Per-slot ragged prompt-prefix KV cache (vLLM-style prefix caching
    for the rollout: instruction+history tokens are append-only per
    episode, so each step forwards only the new history tokens and the
    candidates section). kv_int8 stores values int8 with per-token-
    per-head fp32 scales (models/llama.py:kv_quantize) — half the HBM
    residency, which is the slot-count ceiling at 7B on 16 GB."""
    L_, nkv, d = llm_cfg.num_layers, llm_cfg.num_kv_heads, llm_cfg.head_dim
    shape = (L_, batch, max_prefix, nkv, d)
    out = {"plen": jnp.zeros((batch,), jnp.int32)}
    if kv_int8:
        sshape = (L_, batch, max_prefix, nkv, 1)
        out.update({"pkv_k": jnp.zeros(shape, jnp.int8),
                    "pkv_ks": jnp.zeros(sshape, jnp.float32),
                    "pkv_v": jnp.zeros(shape, jnp.int8),
                    "pkv_vs": jnp.zeros(sshape, jnp.float32)})
    else:
        out.update({"pkv_k": jnp.zeros(shape, llm_cfg.dtype),
                    "pkv_v": jnp.zeros(shape, llm_cfg.dtype)})
    return out


def _cache_kv_view(cache):
    """The {"k"[,"ks"],"v"[,"vs"]} view llama.py's cached kernels take."""
    if "pkv_ks" in cache:
        return {"k": cache["pkv_k"], "ks": cache["pkv_ks"],
                "v": cache["pkv_v"], "vs": cache["pkv_vs"]}
    return {"k": cache["pkv_k"], "v": cache["pkv_v"]}


def _cache_from_kv(kv, plen):
    out = {"pkv_k": kv["k"], "pkv_v": kv["v"], "plen": plen}
    if "ks" in kv:
        out["pkv_ks"], out["pkv_vs"] = kv["ks"], kv["vs"]
    return out


def prefill_prefix(params, llm_cfg, cache, ids, mask, rows, valid):
    """Prefill refilled rows' instruction prefixes into the cache.

    ids [Bp, P] right-padded; mask [Bp, P]; rows [Bp] target cache
    rows, ALL DISTINCT (the host points padding entries at distinct
    rows it is not prefilling; valid[i]=False makes entry i rewrite
    that row's OLD content — a no-op without scatter-order hazards).
    The t=0 prefix (instruction + history header) contains no special
    tokens, so no injection is needed."""
    from ..models import llama as L

    emb = L.embed_with_injection(params["llm"], ids)
    emb = jnp.where(mask[..., None], emb, 0)
    _, kv = L.forward_hidden(params["llm"], llm_cfg, emb, mask,
                             return_kv=True)
    # the prefill runs at its own (bucketed) width pw <= Pmax; write
    # only the [:, rows, :pw] sub-region (tokens beyond plen stay
    # invisible behind prefix_mask regardless of stale content)
    p = cache["pkv_k"].shape[2]
    pieces = {"pkv_k": kv["k"][:, :, :p], "pkv_v": kv["v"][:, :, :p]}
    if "pkv_ks" in cache:   # int8 cache: quantize the fresh prefixes
        pieces["pkv_k"], pieces["pkv_ks"] = L.kv_quantize(pieces["pkv_k"])
        pieces["pkv_v"], pieces["pkv_vs"] = L.kv_quantize(pieces["pkv_v"])
    vmask = valid[None, :, None, None, None]
    out = {}
    for name, new in pieces.items():
        new = new.astype(cache[name].dtype)
        pw = new.shape[2]
        out[name] = cache[name].at[:, rows, :pw].set(
            jnp.where(vmask, new, cache[name][:, rows, :pw]))
    out["plen"] = cache["plen"].at[rows].set(
        jnp.where(valid, mask.sum(1).astype(jnp.int32),
                  cache["plen"][rows]))
    return out


def eval_step_cached(params, cfg, pano_apply, state, cache, pano_in, batch,
                     reset_mask, cur_ids, cand_ids, active_mask,
                     a_t_override, rng, do_sample: bool, temperature):
    """Prefix-cached variant of eval_step: instead of forwarding the
    whole prompt, (a) append this step's new history tokens to the
    per-row prefix cache (with the chosen-action fuse embed injected at
    the <hist> token from hist_buf), then (b) forward only the
    candidates-section suffix against the cache. Identical math to the
    full forward (causal attention over an append-only prefix;
    tests/test_llama.py chunk parity + streaming A/B).

    batch additions vs eval_step: app_ids/app_mask [B, A] (new history
    window; empty on a row's first step), app_hist_pos [B] (window
    index of its <hist> token, -1 none), suf_ids/suf_mask [B, S],
    suffix-relative cand_positions [B, C] and cls_pos [B].
    Returns (state', cache', a_t, logits)."""
    from ..models import llama as L
    from ..models import nav_model as NM_

    state = reset_slots(state, reset_mask)
    b = reset_mask.shape[0]
    # refilled rows' plen/K-V are owned by prefill_prefix, which the
    # host dispatches BEFORE this step for every refilled row — no
    # zeroing here (it would clobber the fresh prefill)
    plen = cache["plen"]

    po = pano_apply(params, rng, pano_in, True)
    pano_embeds, pano_masks = po["pano_embeds"], po["pano_masks"]
    state = memory_update(state, pano_embeds, pano_masks, cur_ids, cand_ids)

    # fusion (same as nav_step_from_memory / forward_navigation)
    gmap, vp = assemble_from_memory(state, batch["slot_ids"], pano_embeds)
    full = dict(batch)
    full["gmap_img_embeds"] = gmap
    full["vp_img_embeds"] = vp
    fuse, cand_masks = NM_.fuse_gmap_local(params, cfg, full)
    g = fuse.shape[1]

    order = batch["cand_order"]
    ovalid = order >= 0
    order_safe = jnp.maximum(order, 0)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], order.shape)
    cand_embeds = jnp.where(ovalid[..., None], fuse[bidx, order_safe], 0.0)

    pkv = _cache_kv_view(cache)
    pmax = pkv["k"].shape[2]
    prefix_mask = jnp.arange(pmax)[None, :] < plen[:, None]

    # MERGED window: [history-append | candidates-suffix] in ONE cached
    # pass (r4: the per-step cost was dominated by reading/dequantizing
    # the full [L,B,P,NKV,D] prefix cache, and the split form read it
    # TWICE per step plus paid a second 32-layer scan). The suffix
    # attends to the append tokens intra-window (same post-rope K/V the
    # split form re-read from the cache — identical math, pinned by the
    # chunk-parity and streaming A/B tests); only the first-A columns
    # scatter K/V into the cache via write_mask.
    # (a) history append columns: inject hist_buf[b, hist_cnt-1] at the
    # window's <hist> token, K/V written at the per-row prefix end
    app_mask = batch["app_mask"]
    hist_idx = jnp.maximum(state["hist_cnt"] - 1, 0)
    hist_val = state["hist_buf"][jnp.arange(b), hist_idx]           # [B, H]
    app_emb = L.embed_with_injection(
        params["llm"], batch["app_ids"], batch["app_hist_pos"][:, None],
        hist_val[:, None, :])
    app_emb = jnp.where(app_mask[..., None], app_emb, 0)
    a_w = app_mask.shape[1]
    app_len = app_mask.sum(1).astype(jnp.int32)
    app_pos = plen[:, None] + jnp.arange(a_w)[None, :]
    # (b) candidates suffix columns: inject fused cand embeds, no writes
    suf_mask = batch["suf_mask"]
    suf_emb = L.embed_with_injection(
        params["llm"], batch["suf_ids"], batch["cand_positions"],
        cand_embeds)
    suf_emb = jnp.where(suf_mask[..., None], suf_emb, 0)
    s_w = suf_mask.shape[1]
    suf_pos = (plen + app_len)[:, None] + jnp.arange(s_w)[None, :]
    win_emb = jnp.concatenate([app_emb, suf_emb], axis=1)
    win_mask = jnp.concatenate([app_mask, suf_mask], axis=1)
    win_pos = jnp.concatenate([app_pos, suf_pos], axis=1)
    wmask = jnp.concatenate(
        [app_mask, jnp.zeros_like(suf_mask)], axis=1)
    hidden, pkv = L.chunk_forward_cached(
        params["llm"], cfg.llm, win_emb, pkv, prefix_mask, win_mask,
        win_pos, write_offsets=plen, write_mask=wmask)
    plen = plen + app_len

    cls_hidden = hidden[jnp.arange(b), a_w + batch["cls_pos"]]
    preds = (cls_hidden @ params["out_head"]["w"]
             + params["out_head"]["b"]).astype(jnp.float32)
    from ..ops.masking import NEG_INF
    logits = jnp.full((b, g), NEG_INF, jnp.float32)
    logits = logits.at[:, 0].set(preds[:, 0])
    upd = jnp.where(ovalid, preds[:, 1:1 + order.shape[1]], NEG_INF)
    logits = logits.at[bidx, order_safe].max(upd)
    logits = jnp.where(cand_masks, logits, NEG_INF)

    if do_sample:
        a_t = jax.random.categorical(
            rng, logits / jnp.maximum(temperature, 1e-6), axis=-1)
    else:
        a_t = jnp.argmax(logits, axis=-1)
    a_t = a_t.astype(jnp.int32)
    a_t = jnp.where(a_t_override >= 0, a_t_override, a_t)
    fuse_sg = jax.lax.stop_gradient(fuse)
    state = hist_append(state, fuse_sg, jnp.where(active_mask, a_t, -1))

    return state, _cache_from_kv(pkv, plen), a_t, logits


def nav_step_from_memory(params, cfg, state, batch, pano_embeds):
    """Assemble gmap/vp/hist embeddings from device memory and run
    forward_navigation. Pure function of (state, batch, pano_embeds) —
    mutates nothing. Returns (fuse_logits [B, G], fuse_embeds).

    batch carries everything EXCEPT gmap_img_embeds / vp_img_embeds /
    hist_embeds, plus slot_ids [B, G] (memory id per gmap slot, -1
    empty). Action selection and the history append happen in the
    caller (eval_step fuses them into the same executable; the legacy
    split path uses a follow-up hist_append call)."""
    gmap, vp = assemble_from_memory(state, batch["slot_ids"], pano_embeds)
    full = dict(batch)
    full["gmap_img_embeds"] = gmap
    full["vp_img_embeds"] = vp
    full["hist_embeds"] = state["hist_buf"]
    out = NM.forward_navigation(params, cfg, full)
    return out["fuse_logits"], out["fuse_embeds"]
