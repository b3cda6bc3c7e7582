"""Autoregressive generation: prefill + KV-cache decode under one jit.

Replaces HF `generate` + `prepare_inputs_for_generation` (reference
modified_lm.py:149-198, nav_model.py:320-341,388-399). Visual embeds are
injected only at prefill (as in the reference: cand/hist passed only on
the first step), then `lax.scan` drives fixed-length decode steps with a
static-shape KV cache. Greedy and low-temperature sampling are supported
(scripts use greedy everywhere except SOON/REVERIE T=0.01), plus the
dense-trie constraint for EQA (models/trie.py).

Memory/perf structure: the WHOLE decode (prefill + scan) compiles as one
executable per (batch, prompt-bucket, max_new_tokens) so (a) XLA aliases
the KV cache in place instead of double-buffering it across the eager
prefill->scan boundary (a 7B bf16 cache at b=4/cap~320 is ~1.3 GB — the
eager layout OOM'd a 16 GB chip), and (b) prompt lengths are bucketed
(left-pad to a multiple of `prompt_bucket`) so repeated calls with
ragged prompts reuse the executable instead of re-tracing.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import llama as L
from .trie import DenseTrie
from ..ops.masking import NEG_INF

# (cfg, b, prompt_len, max_new, do_sample, has_inject, has_mask, trie id)
#   -> compiled decode executable
_JIT_CACHE: Dict[Any, Any] = {}   # insertion-ordered => LRU via re-insert
_JIT_CACHE_MAX = 32

# eager-loop dispatch chunking: steps unrolled per device call. 7
# divides the 49 post-prefill steps of the 50-token serving config
# exactly; larger unrolls trade compile time for fewer dispatches.
DECODE_UNROLL = 7


def _build_decode_fn(cfg: L.LlamaConfig, max_new_tokens: int, eos_id: int,
                     pad_id: int, do_sample: bool,
                     special_token_mask, trie: Optional[DenseTrie],
                     loop: str = "scan", kv_int8: bool = False):
    """Decode program: jitted prefill + either a scanned token loop
    ("scan", one executable, best when the model fits comfortably) or an
    eager Python token loop of per-token jits ("eager", required at 7B
    scale — see step_one)."""

    def pick_token(logits, trie_state, step_rng, temperature, vocab):
        logits = logits.astype(jnp.float32)
        if special_token_mask is not None:
            logits = jnp.where(special_token_mask[None, :], NEG_INF, logits)
        if trie is not None:
            allowed = trie.logits_mask(trie_state, vocab)
            logits = jnp.where(allowed, logits, NEG_INF)
        if do_sample:
            tok = jax.random.categorical(
                step_rng, logits / jnp.maximum(temperature, 1e-6))
        else:
            tok = jnp.argmax(logits, axis=-1)
        return tok.astype(jnp.int32)

    # TWO executables, not one: the prompt K/V stack (~1.1 GB at 7B/bs4)
    # would be double-buffered by the token scan's carry if produced and
    # consumed in the same program (the AOT backend's while-loop buffer
    # assignment is conservative); as a plain INPUT to the second
    # program it occupies a single allocation. Peak per program:
    #   prefill: params + prompt_kv(out) + activations
    #   scan:    params + prompt_kv(in) + 2x decode-region (~0.2 GB)

    @jax.jit
    def prefill(params, input_ids, attention_mask, inject_positions,
                inject_embeds, rng, temperature):
        vocab = L.lm_head_dim(params)
        b = input_ids.shape[0]
        inputs_embeds = L.embed_with_injection(params, input_ids,
                                               inject_positions,
                                               inject_embeds)
        hidden, prompt_kv = L.forward_hidden(params, cfg, inputs_embeds,
                                             attention_mask, return_kv=True)
        if kv_int8:
            # halve the read-only prompt stack's residency: it is the
            # decode-batch capacity ceiling at 7B (b=32 bf16 ~ 4.3 GB)
            prompt_kv = L.quantize_kv_stack(prompt_kv)
        last_logits = L._mm(hidden[:, -1], params["lm_head"], cfg.act_int8).astype(jnp.float32)
        trie_state0 = jnp.zeros((b,), jnp.int32)
        rng_, krng = jax.random.split(rng)
        tok0 = pick_token(last_logits, trie_state0, krng, temperature, vocab)
        done0 = tok0 == eos_id
        out0 = jnp.where(done0, eos_id, tok0)
        return out0, tok0, done0, trie_state0, prompt_kv, rng_

    @jax.jit
    def scan_tokens(params, prompt_kv, attention_mask, tok0, done0,
                    trie_state0, rng, temperature):
        b = attention_mask.shape[0]
        vocab = L.lm_head_dim(params)
        prompt_lens = attention_mask.sum(axis=-1).astype(jnp.int32)   # [B]
        dec_cache = L.init_decode_cache(cfg, b, max_new_tokens)

        def step(carry, step_rng):
            tok, trie_state, done, dec_cache, i = carry
            # i: 0-based index of the token being fed; writes dec slot i
            emb = L.embed_rows(params["embed"], tok)[:, None, :]
            pos = (prompt_lens + i)[:, None]                # fed position
            hidden, dec_cache = L.decode_step(
                params, cfg, emb, prompt_kv, attention_mask, dec_cache,
                i, pos)
            logits = L._mm(hidden[:, -1], params["lm_head"], cfg.act_int8).astype(jnp.float32)
            new_trie_state = trie.advance(trie_state, tok) \
                if trie is not None else trie_state
            nxt = pick_token(logits, new_trie_state, step_rng, temperature,
                             vocab)
            new_done = done | (nxt == eos_id)
            out = jnp.where(done, pad_id, nxt)
            return (nxt, new_trie_state, new_done, dec_cache, i + 1), out

        step_rngs = jax.random.split(rng, max_new_tokens - 1)
        (_, _, _, _, _), rest = jax.lax.scan(
            step, (tok0, trie_state0, done0, dec_cache, jnp.int32(0)),
            step_rngs)
        return rest.swapaxes(0, 1)                          # [B, T-1]

    def _one_step(params, prompt_kv, attention_mask, prompt_lens, tok, done,
                  trie_state, dec_cache, i, step_rng, temperature):
        """One decode-step body. Its layer scan is TOP-LEVEL in the
        executable (nesting it inside a token scan makes XLA hoist ~1 GB
        layout copies of wq/wk/wv out of the outer while — 3 GB of HLO
        temps that OOM 7B decode on a 16 GB chip; a Python UNROLL keeps
        each scan top-level, so step_chunk below is safe)."""
        vocab = L.lm_head_dim(params)
        emb = L.embed_rows(params["embed"], tok)[:, None, :]
        pos = (prompt_lens + i)[:, None]                    # fed position
        hidden, dec_cache = L.decode_step(params, cfg, emb, prompt_kv,
                                          attention_mask, dec_cache, i, pos)
        logits = L._mm(hidden[:, -1], params["lm_head"], cfg.act_int8).astype(jnp.float32)
        new_trie_state = trie.advance(trie_state, tok) if trie is not None \
            else trie_state
        nxt = pick_token(logits, new_trie_state, step_rng, temperature,
                         vocab)
        new_done = done | (nxt == eos_id)
        out = jnp.where(done, pad_id, nxt)
        return out, nxt, new_done, new_trie_state, dec_cache

    @functools.partial(jax.jit, donate_argnames=("dec_cache",))
    def step_one(params, prompt_kv, attention_mask, prompt_lens, tok, done,
                 trie_state, dec_cache, i, step_rng, temperature):
        """One eager-loop decode step (remainder chunks). The Python
        token loop dispatches asynchronously (no per-step sync), and
        dec_cache is donated so the region updates in place."""
        return _one_step(params, prompt_kv, attention_mask, prompt_lens,
                         tok, done, trie_state, dec_cache, i, step_rng,
                         temperature)

    @functools.partial(jax.jit, donate_argnames=("dec_cache",),
                       static_argnames=("n",))
    def step_chunk(params, prompt_kv, attention_mask, prompt_lens, tok,
                   done, trie_state, dec_cache, i0, step_rngs, temperature,
                   n):
        """n decode steps UNROLLED into one executable. Even with fully
        async per-step dispatch, each eager step_one call pays the
        relay/runtime per-dispatch floor (tens of ms on tunneled chips
        — larger than the 7B int8 step itself); one dispatch per n
        steps divides that floor by n. The unroll is a Python loop, so
        every layer scan stays top-level (see _one_step)."""
        outs = []
        for j in range(n):
            out, tok, done, trie_state, dec_cache = _one_step(
                params, prompt_kv, attention_mask, prompt_lens, tok, done,
                trie_state, dec_cache, i0 + j, step_rngs[j], temperature)
            outs.append(out)
        return jnp.stack(outs, axis=1), tok, done, trie_state, dec_cache

    def decode(params, input_ids, attention_mask, inject_positions,
               inject_embeds, rng, temperature):
        out0, tok0, done0, trie_state0, prompt_kv, rng_ = prefill(
            params, input_ids, attention_mask, inject_positions,
            inject_embeds, rng, temperature)
        if max_new_tokens <= 1:
            return out0[:, None]
        if loop == "scan":
            rest = scan_tokens(params, prompt_kv, attention_mask, tok0,
                               done0, trie_state0, rng_, temperature)
            return jnp.concatenate([out0[:, None], rest], axis=1)
        b = input_ids.shape[0]
        prompt_lens = attention_mask.sum(axis=-1).astype(jnp.int32)
        dec_cache = L.init_decode_cache(cfg, b, max_new_tokens)
        n_steps = max_new_tokens - 1
        rngs = jax.random.split(rng_, n_steps)
        outs = [out0[:, None]]
        tok, done, trie_state = tok0, done0, trie_state0
        # uniform chunks + a per-step remainder: one chunk width means
        # ONE step_chunk executable regardless of max_new_tokens
        unroll = min(DECODE_UNROLL, n_steps)
        i = 0
        while i + unroll <= n_steps:
            chunk_out, tok, done, trie_state, dec_cache = step_chunk(
                params, prompt_kv, attention_mask, prompt_lens, tok, done,
                trie_state, dec_cache, jnp.int32(i),
                rngs[i: i + unroll], temperature, n=unroll)
            outs.append(chunk_out)
            i += unroll
        while i < n_steps:
            out, tok, done, trie_state, dec_cache = step_one(
                params, prompt_kv, attention_mask, prompt_lens, tok, done,
                trie_state, dec_cache, jnp.int32(i), rngs[i], temperature)
            outs.append(out[:, None])
            i += 1
        return jnp.concatenate(outs, axis=1)

    return decode


def generate(params, cfg: L.LlamaConfig, input_ids, attention_mask, *,
             inject_positions=None, inject_embeds=None,
             special_token_mask=None, eos_id: int, pad_id: int,
             max_new_tokens: int, do_sample: bool = False,
             temperature: float = 1.0, rng: Optional[jax.Array] = None,
             trie: Optional[DenseTrie] = None,
             prompt_bucket: int = 64, loop: str = "auto",
             kv_int8: bool = False) -> jnp.ndarray:
    """Returns generated token ids [B, max_new_tokens] (pad after eos).

    input_ids/attention_mask: [B, L] left-padded prompt. Prompts are
    left-padded further to a multiple of `prompt_bucket` so executables
    are reused across ragged lengths.
    """
    import numpy as np

    input_ids = np.asarray(input_ids)
    attention_mask = np.asarray(attention_mask)
    b, prompt_len = input_ids.shape
    bl = -(-prompt_len // prompt_bucket) * prompt_bucket
    if bl != prompt_len:
        extra = bl - prompt_len
        input_ids = np.pad(input_ids, ((0, 0), (extra, 0)),
                           constant_values=pad_id)
        attention_mask = np.pad(attention_mask, ((0, 0), (extra, 0)))
        if inject_positions is not None:
            ip = np.asarray(inject_positions)
            inject_positions = np.where(ip >= 0, ip + extra, -1)
    has_inject = inject_positions is not None

    if loop == "auto":
        # big stacks take the eager token loop (the scanned loop's hoisted
        # weight-layout copies cost ~3 GB of HLO temps at 7B)
        n_params = cfg.num_layers * cfg.hidden_size * (
            4 * cfg.hidden_size + 3 * cfg.intermediate_size)
        loop = "eager" if n_params > 3e9 else "scan"

    if special_token_mask is not None:
        stm = np.asarray(special_token_mask)
        stm_key = (stm.shape[0], stm.tobytes())
    else:
        stm_key = None
    key = (cfg, b, bl, max_new_tokens, bool(do_sample), has_inject,
           stm_key, eos_id, pad_id,
           trie.fingerprint if trie is not None else None, loop,
           bool(kv_int8))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _build_decode_fn(cfg, max_new_tokens, eos_id, pad_id,
                              bool(do_sample), special_token_mask, trie,
                              loop=loop, kv_int8=kv_int8)
        # bounded LRU: an eval epoch's tries are content-keyed so they
        # re-hit, but unbounded growth (each entry pins compiled
        # prefill/step executables) is still capped
        if len(_JIT_CACHE) >= _JIT_CACHE_MAX:
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
        _JIT_CACHE[key] = fn
    else:
        _JIT_CACHE[key] = _JIT_CACHE.pop(key)   # refresh LRU order

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if not has_inject:
        # fixed zero-size placeholders keep the jit signature stable
        inject_positions = np.full((b, 1), -1, np.int32)
        inject_embeds = np.zeros((b, 1, cfg.hidden_size), np.float32)
    return fn(params, jnp.asarray(input_ids),
              jnp.asarray(attention_mask, bool),
              jnp.asarray(inject_positions), jnp.asarray(inject_embeds),
              rng, jnp.float32(temperature))


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
