"""Tokenizer adapter: HF Llama tokenizer or a hermetic byte fallback.

Mirrors the reference's tokenizer contract (models/modified_lm.py:56-87):
  - special tokens `<cand> <hist> <obj> <cls_1> <cls_2>` (+ `<PAD>`),
  - left padding and left truncation at max_length=1024,
  - pair encoding [prompt, answer] with token_type_ids 0/1 used for
    label masking (nav_model.py:305-316).

TPU addition: batches pad to a *bucketed* static length (multiple of
`pad_to_multiple`) so jit recompiles per bucket, not per batch, and the
embedding table is sized up to a multiple of 128 for MXU-aligned matmuls
(ids >= true vocab are masked in the logits).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

SPECIAL_TOKENS = ["<cand>", "<hist>", "<obj>", "<cls_1>", "<cls_2>"]


@dataclasses.dataclass
class TokenBatch:
    input_ids: np.ndarray       # [B, L] int32, left-padded
    attention_mask: np.ndarray  # [B, L] bool
    token_type_ids: np.ndarray  # [B, L] int32 (1 on answer tokens)

    @property
    def shape(self):
        return self.input_ids.shape


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ByteTokenizer:
    """Deterministic byte-level tokenizer for hermetic tests.

    Layout: 0=<unk> 1=<s> 2=</s> 3..258=bytes 259..263=schema specials
    264=<PAD>. Parses special-token strings (and </s>) inside text.
    """

    def __init__(self):
        self.unk_id, self.bos_id, self.eos_id = 0, 1, 2
        self._byte0 = 3
        self._special = {}
        nxt = self._byte0 + 256
        for tok in SPECIAL_TOKENS:
            self._special[tok] = nxt
            nxt += 1
        self.pad_id = nxt
        self._special["<PAD>"] = self.pad_id
        self._special["</s>"] = self.eos_id
        self._special["<s>"] = self.bos_id
        self.true_vocab_size = nxt + 1
        self.bos_token, self.eos_token, self.pad_token = "<s>", "</s>", "<PAD>"
        self._id_to_special = {v: k for k, v in self._special.items()}
        self._marker_re = None

    def encode(self, text: str) -> List[int]:
        """Vectorized: regex-split on special-token markers, bulk-map the
        byte segments via numpy (the per-char Python loop dominated the
        streaming-eval host budget at ~600-char prompts x 32 slots)."""
        import re
        if self._marker_re is None:
            markers = sorted(self._special, key=len, reverse=True)
            self._marker_re = re.compile(
                "(" + "|".join(re.escape(m) for m in markers) + ")")
        import numpy as _np
        ids: List[int] = []
        for part in self._marker_re.split(text):
            if not part:
                continue
            sp = self._special.get(part)
            if sp is not None:
                ids.append(sp)
            else:
                ids.extend((_np.frombuffer(part.encode("utf-8"),
                                           dtype=_np.uint8)
                            .astype(_np.int64) + self._byte0).tolist())
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens=True) -> str:
        out = bytearray()
        for t in ids:
            t = int(t)
            if self._byte0 <= t < self._byte0 + 256:
                out.append(t - self._byte0)
            elif not skip_special_tokens and t in self._id_to_special:
                out.extend(self._id_to_special[t].encode())
        return out.decode("utf-8", errors="replace")

    def special_token_id(self, tok: str) -> int:
        return self._special[tok]


class BPETokenizer:
    """Hermetic byte-level BPE trained over synthetic English prompt
    corpora (scripts/data_tools/train_bpe.py) — the subword stand-in
    for Vicuna's LlamaTokenizer (reference models/modified_lm.py:56-87)
    in an environment with no tokenizer asset. ~1.3-1.5 tokens/word on
    schema prompts vs ~5-6 for the byte fallback, which makes prompt
    lengths (and everything downstream: KV-cache sizes, prefix-cache
    share, per-step FLOPs) realistic.

    Id layout comes from the trained file: control tokens
    <unk>=0 <s>=1 </s>=2 <PAD>=3 then the 5 schema specials, then the
    byte alphabet + merges. Special markers are parsed inline in text
    (never split) — same contract as ByteTokenizer.
    """

    DEFAULT_PATH = None   # resolved lazily next to this module

    def __init__(self, json_path: Optional[str] = None):
        from tokenizers import Tokenizer
        import os
        if json_path is None:
            json_path = os.path.join(os.path.dirname(__file__),
                                     "bpe_nav.json")
        self.tok = Tokenizer.from_file(str(json_path))
        tid = self.tok.token_to_id
        self.unk_id, self.bos_id = tid("<unk>"), tid("<s>")
        self.eos_id, self.pad_id = tid("</s>"), tid("<PAD>")
        self._special = {t: tid(t) for t in SPECIAL_TOKENS}
        self._special.update({"<s>": self.bos_id, "</s>": self.eos_id,
                              "<PAD>": self.pad_id})
        self.true_vocab_size = self.tok.get_vocab_size()
        self.bos_token, self.eos_token, self.pad_token = "<s>", "</s>", "<PAD>"

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids, skip_special_tokens=True) -> str:
        return self.tok.decode([int(t) for t in ids],
                               skip_special_tokens=skip_special_tokens)

    def special_token_id(self, tok: str) -> int:
        return self._special[tok]


class HFTokenizer:
    """Wraps a HF (Llama/OPT) tokenizer with the schema special tokens."""

    def __init__(self, pretrained_model_name_or_path: str):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(
            pretrained_model_name_or_path, padding_side="left",
            truncation_side="left", use_fast=True)
        self.tok.add_special_tokens({"additional_special_tokens": SPECIAL_TOKENS})
        if self.tok.pad_token is None:
            self.tok.add_special_tokens({"pad_token": "<PAD>"})
        self.bos_id = self.tok.bos_token_id
        self.eos_id = self.tok.eos_token_id
        self.pad_id = self.tok.pad_token_id
        self.unk_id = self.tok.unk_token_id if self.tok.unk_token_id is not None \
            else self.pad_id
        self.true_vocab_size = len(self.tok)
        self.bos_token = self.tok.bos_token
        self.eos_token = self.tok.eos_token
        self.pad_token = self.tok.pad_token

    def encode(self, text: str) -> List[int]:
        return self.tok(text, add_special_tokens=False)["input_ids"]

    def decode(self, ids, skip_special_tokens=True) -> str:
        return self.tok.decode(ids, skip_special_tokens=skip_special_tokens,
                               clean_up_tokenization_spaces=False)

    def special_token_id(self, tok: str) -> int:
        return self.tok.convert_tokens_to_ids(tok)


class NavTokenizer:
    """Schema-aware tokenizer with bucketed left padding."""

    def __init__(self, backend: Union[ByteTokenizer, HFTokenizer, None] = None,
                 max_length: int = 1024, pad_to_multiple: int = 64):
        self.backend = backend or ByteTokenizer()
        self.max_length = max_length
        self.pad_to_multiple = pad_to_multiple

        b = self.backend
        self.bos_id, self.eos_id = b.bos_id, b.eos_id
        self.pad_id, self.unk_id = b.pad_id, b.unk_id
        self.bos_token, self.eos_token = b.bos_token, b.eos_token
        self.cand_id = b.special_token_id("<cand>")
        self.hist_id = b.special_token_id("<hist>")
        self.obj_id = b.special_token_id("<obj>")
        self.cls_ids = [b.special_token_id("<cls_1>"), b.special_token_id("<cls_2>")]
        self.special_token_ids = [self.cand_id, self.hist_id, self.obj_id] + self.cls_ids
        self.true_vocab_size = b.true_vocab_size
        # embedding table size: MXU-aligned
        self.vocab_size = _round_up(self.true_vocab_size, 128)
        # per-instance encode LRU: navigation prompts repeat heavily
        # (same instruction re-tokenized every rollout step; eval
        # passes and training epochs revisit identical prompts), and
        # BPE encoding is host-side pure-Python work on the rollout
        # hot path. Keyed by (text, add_bos); values are immutable
        # tuples so cache hits cannot be corrupted by callers.
        # 8192 entries x ~4 KB bounds residency at ~32 MB; very long
        # texts (DAgger training prompts with sampled growing history)
        # are near-unique keys that would only evict useful entries,
        # so they bypass the cache (_ENCODE_CACHE_MAX_CHARS).
        import functools
        self._encode_cached = functools.lru_cache(maxsize=8192)(
            self._encode_uncached)

    @classmethod
    def from_pretrained(cls, path: str, **kw) -> "NavTokenizer":
        return cls(HFTokenizer(path), **kw)

    @classmethod
    def bpe(cls, json_path: Optional[str] = None, **kw) -> "NavTokenizer":
        """The vendored hermetic subword tokenizer — the tested default
        for benches/e2e paths (VERDICT r2 #2: prompt-length-dependent
        behavior must be measured on subword, not byte, prompts)."""
        return cls(BPETokenizer(json_path), **kw)

    def _encode_uncached(self, text: str, add_bos: bool) -> tuple:
        ids = self.backend.encode(text)
        return tuple([self.bos_id] + ids) if add_bos else tuple(ids)

    _ENCODE_CACHE_MAX_CHARS = 4096

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        if len(text) > self._ENCODE_CACHE_MAX_CHARS:
            return list(self._encode_uncached(text, add_bos))
        return list(self._encode_cached(text, add_bos))

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        ids = [int(t) for t in ids if int(t) != self.pad_id]
        return self.backend.decode(ids, skip_special_tokens=skip_special_tokens)

    def special_logit_mask(self) -> np.ndarray:
        """[vocab_size] bool: True for columns to force to -inf (schema
        specials + alignment-padding rows)."""
        mask = np.zeros(self.vocab_size, dtype=bool)
        mask[self.special_token_ids] = True
        mask[self.true_vocab_size:] = True
        return mask

    def _bucket_len(self, longest: int) -> int:
        return min(self.max_length, _round_up(max(longest, 1), self.pad_to_multiple))

    def __call__(self, texts: Sequence[Union[str, Tuple[str, str], List[str]]],
                 pad_to: Optional[int] = None) -> TokenBatch:
        """Tokenize strings or [prompt, answer] pairs.

        Left-truncates to max_length, left-pads to a shared bucketed
        length. token_type_ids are 1 on answer tokens (0 elsewhere).
        """
        seqs: List[List[int]] = []
        types: List[List[int]] = []
        for t in texts:
            if isinstance(t, (tuple, list)):
                prompt, answer = t
                p_ids = self.encode(prompt, add_bos=True)
                a_ids = self.encode(answer, add_bos=False)
                seqs.append(p_ids + a_ids)
                types.append([0] * len(p_ids) + [1] * len(a_ids))
            else:
                p_ids = self.encode(t, add_bos=True)
                seqs.append(p_ids)
                types.append([0] * len(p_ids))
        seqs = [s[-self.max_length:] for s in seqs]
        types = [ty[-self.max_length:] for ty in types]
        longest = max(len(s) for s in seqs)
        length = pad_to if pad_to is not None else self._bucket_len(longest)

        bsz = len(seqs)
        input_ids = np.full((bsz, length), self.pad_id, dtype=np.int32)
        attn = np.zeros((bsz, length), dtype=bool)
        tty = np.zeros((bsz, length), dtype=np.int32)
        for i, (s, ty) in enumerate(zip(seqs, types)):
            input_ids[i, length - len(s):] = s
            attn[i, length - len(s):] = True
            tty[i, length - len(s):] = ty
        return TokenBatch(input_ids, attn, tty)
