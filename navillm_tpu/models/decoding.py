"""Autoregressive generation: prefill + KV-cache decode under one jit.

Replaces HF `generate` + `prepare_inputs_for_generation` (reference
modified_lm.py:149-198, nav_model.py:320-341,388-399). Visual embeds are
injected only at prefill (as in the reference: cand/hist passed only on
the first step), then `lax.scan` drives fixed-length decode steps with a
static-shape KV cache. Greedy and low-temperature sampling are supported
(scripts use greedy everywhere except SOON/REVERIE T=0.01), plus the
dense-trie constraint for EQA (models/trie.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import llama as L
from .trie import DenseTrie
from ..ops.masking import NEG_INF


def generate(params, cfg: L.LlamaConfig, input_ids, attention_mask, *,
             inject_positions=None, inject_embeds=None,
             special_token_mask=None, eos_id: int, pad_id: int,
             max_new_tokens: int, do_sample: bool = False,
             temperature: float = 1.0, rng: Optional[jax.Array] = None,
             trie: Optional[DenseTrie] = None) -> jnp.ndarray:
    """Returns generated token ids [B, max_new_tokens] (pad after eos).

    input_ids/attention_mask: [B, L] left-padded prompt.
    inject_positions/embeds: soft-token injection at prefill.
    """
    b, prompt_len = input_ids.shape
    capacity = prompt_len + max_new_tokens
    vocab = params["lm_head"].shape[-1]

    # ---- prefill ----
    inputs_embeds = L.embed_with_injection(params, input_ids,
                                           inject_positions, inject_embeds)
    positions = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
    cache = L.init_cache(cfg, b, capacity)
    key_mask = jnp.concatenate(
        [attention_mask, jnp.zeros((b, max_new_tokens), bool)], axis=1)
    hidden, cache = L.forward_hidden(params, cfg, inputs_embeds, key_mask,
                                     positions=positions, cache=cache,
                                     cache_index=0)
    prompt_lens = attention_mask.sum(axis=-1).astype(jnp.int32)   # [B]

    def pick_token(logits, trie_state, step_rng):
        logits = logits.astype(jnp.float32)
        if special_token_mask is not None:
            logits = jnp.where(special_token_mask[None, :], NEG_INF, logits)
        if trie is not None:
            allowed = trie.logits_mask(trie_state, vocab)
            logits = jnp.where(allowed, logits, NEG_INF)
        if do_sample:
            tok = jax.random.categorical(step_rng, logits / max(temperature, 1e-6))
        else:
            tok = jnp.argmax(logits, axis=-1)
        return tok.astype(jnp.int32)

    last_logits = (hidden[:, -1] @ params["lm_head"]).astype(jnp.float32)
    trie_state0 = jnp.zeros((b,), jnp.int32)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, krng = jax.random.split(rng)
    tok0 = pick_token(last_logits, trie_state0, krng)
    done0 = tok0 == eos_id
    out0 = jnp.where(done0, eos_id, tok0)

    def step(carry, step_rng):
        tok, trie_state, done, cache, i = carry
        # i: 0-based index of the token being *fed*; writes at prompt_len+i
        emb = params["embed"][tok][:, None, :]
        pos = (prompt_lens + 1 + i)[:, None] - 1            # next position
        written = jnp.arange(max_new_tokens)[None, :] <= i
        kmask = jnp.concatenate([attention_mask, written &
                                 jnp.ones((b, max_new_tokens), bool)], axis=1)
        hidden, new_cache = L.forward_hidden(
            params, cfg, emb, kmask, positions=pos, cache=cache,
            cache_index=prompt_len + i)
        logits = (hidden[:, -1] @ params["lm_head"]).astype(jnp.float32)
        new_trie_state = trie.advance(trie_state, tok) if trie is not None \
            else trie_state
        nxt = pick_token(logits, new_trie_state, step_rng)
        new_done = done | (nxt == eos_id)
        out = jnp.where(done, pad_id, nxt)
        return (nxt, new_trie_state, new_done, new_cache, i + 1), out

    if max_new_tokens > 1:
        step_rngs = jax.random.split(rng, max_new_tokens - 1)
        (_, _, _, _, _), rest = jax.lax.scan(
            step, (tok0, trie_state0, done0, cache, jnp.int32(0)), step_rngs)
        rest = rest.swapaxes(0, 1)                          # [B, T-1]
        return jnp.concatenate([out0[:, None], rest], axis=1)
    return out0[:, None]


def decode_to_text(tokenizer, generated_ids) -> list:
    """Host-side: strip pads, decode to strings (skip special tokens)."""
    out = []
    import numpy as np
    arr = np.asarray(generated_ids)
    for row in arr:
        ids = []
        for t in row:
            if int(t) == tokenizer.eos_id:
                break
            if int(t) != tokenizer.pad_id:
                ids.append(int(t))
        out.append(tokenizer.decode(ids))
    return out
