"""Closed-vocabulary trie as a dense device-side automaton.

The reference constrains EQA decoding with a Python trie walked per step
on the host (tools/trie.py, modified_lm.py:10-30). Here the trie is
flattened once into dense int32 tables so the per-step constraint is a
device gather inside the jitted decode loop — no host sync:

  children_tokens [N, C]: token ids of node n's children (-1 padded)
  children_next   [N, C]: child node index for each slot
  is_leaf         [N]   : no children -> only eos is allowed

Semantics match the reference: at a leaf, the allowed set is {eos} and
the state stays put (tools/trie.py:27-33).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


class DenseTrie:
    def __init__(self, sequences: Sequence[Sequence[int]], eos_id: int):
        self.eos_id = eos_id
        children: List[dict] = [{}]
        for seq in sequences:
            cur = 0
            for tok in seq:
                tok = int(tok)
                nxt = children[cur].get(tok)
                if nxt is None:
                    nxt = len(children)
                    children.append({})
                    children[cur][tok] = nxt
                cur = nxt
        n = len(children)
        width = max(1, max((len(c) for c in children), default=1))
        tok_tab = np.full((n, width), -1, dtype=np.int32)
        nxt_tab = np.zeros((n, width), dtype=np.int32)
        for i, c in enumerate(children):
            for j, (tok, nn) in enumerate(sorted(c.items())):
                tok_tab[i, j] = tok
                nxt_tab[i, j] = nn
        self.children_tokens = jnp.asarray(tok_tab)
        self.children_next = jnp.asarray(nxt_tab)
        self.is_leaf = jnp.asarray(tok_tab[:, 0] < 0)
        self.num_nodes = n
        self.width = width
        # content fingerprint: two tries built from the same vocab (e.g.
        # rebuilt every eval epoch) are interchangeable — used as a
        # stable jit-cache key instead of object identity
        import hashlib
        h = hashlib.sha1()
        h.update(tok_tab.tobytes())
        h.update(nxt_tab.tobytes())
        h.update(str(eos_id).encode())
        self.fingerprint = h.hexdigest()

    def advance(self, state: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
        """state [B], token [B] -> new state [B] (leaf states stay)."""
        toks = self.children_tokens[state]          # [B, C]
        nxts = self.children_next[state]
        hit = toks == token[:, None]
        idx = jnp.argmax(hit, axis=1)
        nxt = jnp.take_along_axis(nxts, idx[:, None], axis=1)[:, 0]
        found = jnp.any(hit, axis=1)
        return jnp.where(self.is_leaf[state] | ~found, state, nxt)

    def logits_mask(self, state: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
        """state [B] -> [B, vocab] bool allowed mask (eos at leaves)."""
        b = state.shape[0]
        toks = self.children_tokens[state]          # [B, C]
        mask = jnp.zeros((b, vocab_size), bool)
        valid = toks >= 0
        safe = jnp.maximum(toks, 0)
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], toks.shape)
        mask = mask.at[bidx, safe].max(valid)
        leaf = self.is_leaf[state]
        mask = jnp.where(leaf[:, None],
                         jnp.zeros((b, vocab_size), bool).at[:, self.eos_id].set(True),
                         mask)
        return mask
