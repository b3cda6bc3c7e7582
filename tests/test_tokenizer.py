import numpy as np

from navillm_tpu.models.tokenization import ByteTokenizer, NavTokenizer


def test_roundtrip():
    tok = NavTokenizer()
    s = "Navigate to the kitchen."
    ids = tok.encode(s, add_bos=False)
    assert tok.decode(ids) == s


def test_special_tokens_parsed():
    tok = NavTokenizer()
    ids = tok.encode("(0) stop (1) <cand> (2) <cand>", add_bos=False)
    assert ids.count(tok.cand_id) == 2
    ids2 = tok.encode("<hist> then <obj> and <cls_1>", add_bos=False)
    assert tok.hist_id in ids2 and tok.obj_id in ids2 and tok.cls_ids[0] in ids2


def test_left_padding_and_types():
    tok = NavTokenizer(pad_to_multiple=8)
    batch = tok([("short prompt", "ans</s>"), "just a prompt string"])
    ids, mask, tty = batch.input_ids, batch.attention_mask, batch.token_type_ids
    assert ids.shape == mask.shape == tty.shape
    assert ids.shape[1] % 8 == 0
    # left-padded: invalid prefix, valid suffix
    for row_m in mask:
        k = int(row_m.sum())
        assert not row_m[: len(row_m) - k].any() and row_m[len(row_m) - k:].all()
    # answer tokens (incl. eos) are type 1 and only in the pair row
    assert (tty[0] == 1).sum() > 0
    assert (tty[1] == 1).sum() == 0
    # eos parsed from "</s>" text
    assert ids[0][-1] == tok.eos_id


def test_truncation_left():
    tok = NavTokenizer(max_length=16, pad_to_multiple=8)
    long = "x" * 100
    b = tok([long])
    assert b.input_ids.shape[1] == 16
    assert b.attention_mask.all()


def test_logit_mask_covers_alignment_rows():
    tok = NavTokenizer()
    m = tok.special_logit_mask()
    assert m.shape == (tok.vocab_size,)
    assert m[tok.cand_id] and m[tok.cls_ids[1]]
    assert m[tok.true_vocab_size:].all()
    assert not m[tok.eos_id]


# ---------------- hermetic subword BPE backend ----------------

def test_bpe_tokenizer_basics():
    """The vendored BPE (models/bpe_nav.json) honors the reference
    tokenizer contract (modified_lm.py:56-87): schema specials parsed
    inline and never split, left pad/trunc, subword granularity."""
    from navillm_tpu.models.tokenization import NavTokenizer
    tok = NavTokenizer.bpe()
    text = "Walk past the sofa. (0) stop (1) <cand> (2) <cand> <cls_1>"
    ids = tok.encode(text)
    arr = np.array(ids)
    assert (arr == tok.cand_id).sum() == 2
    assert (arr == tok.cls_ids[0]).sum() == 1
    # subword: far fewer tokens than characters
    assert len(ids) < len(text) * 0.6
    # roundtrip preserves the English text
    dec = tok.decode(ids, skip_special_tokens=True)
    assert "Walk past the sofa" in dec


def test_bpe_vs_byte_prompt_compression():
    """BPE prompts must be substantially shorter than byte prompts —
    the whole point of the subword default (VERDICT r2 #2)."""
    from navillm_tpu.agents import prompts as P
    from navillm_tpu.models.tokenization import NavTokenizer
    prompt = P.navigation_prompt(
        "r2r", "Turn left at the kitchen and walk to the bedroom door.",
        6, 5, "<cls_1>")
    n_byte = len(NavTokenizer().encode(prompt))
    n_bpe = len(NavTokenizer.bpe().encode(prompt))
    assert n_bpe * 3 < n_byte, (n_bpe, n_byte)


def test_bpe_batch_contract():
    """Left padding, bucketing, and pair token_type_ids on the BPE
    backend (same NavTokenizer semantics as the byte backend)."""
    from navillm_tpu.models.tokenization import NavTokenizer
    tok = NavTokenizer.bpe(pad_to_multiple=16)
    batch = tok(["short one", ("a question here", " an answer")])
    assert batch.input_ids.shape[1] % 16 == 0
    # left padded
    assert batch.input_ids[0, 0] == tok.pad_id
    assert not batch.attention_mask[0, 0]
    assert batch.attention_mask[0, -1]
    # answer tokens marked 1
    assert batch.token_type_ids[1].max() == 1
    assert batch.token_type_ids[0].max() == 0
    # vocab MXU-aligned
    assert tok.vocab_size % 128 == 0


def test_encode_lru_cache_hits_and_matches():
    """Repeated encodes hit the per-instance LRU and return equal,
    independently-mutable lists."""
    from navillm_tpu.models.tokenization import NavTokenizer
    tok = NavTokenizer.bpe(max_length=256, pad_to_multiple=64)
    a = tok.encode("walk past the sofa and stop <cand> here")
    b = tok.encode("walk past the sofa and stop <cand> here")
    assert a == b and a is not b
    info = tok._encode_cached.cache_info()
    assert info.hits >= 1
    b.append(999)   # mutating a returned list must not poison the cache
    assert tok.encode("walk past the sofa and stop <cand> here") == a
    # add_bos variants are distinct entries
    assert tok.encode("x", add_bos=False) == \
        tok.encode("x", add_bos=True)[1:]


def test_encode_lru_bypasses_very_long_texts():
    """Near-unique multi-KB DAgger training prompts must not fill the
    LRU with dead entries: texts over the char threshold bypass the
    cache entirely (same ids, no cache mutation)."""
    from navillm_tpu.models.tokenization import NavTokenizer
    tok = NavTokenizer.bpe(max_length=4096, pad_to_multiple=64)
    long_text = "turn left at the lamp and continue " * 200
    assert len(long_text) > tok._ENCODE_CACHE_MAX_CHARS
    before = tok._encode_cached.cache_info()
    ids1 = tok.encode(long_text)
    ids2 = tok.encode(long_text)
    after = tok._encode_cached.cache_info()
    assert ids1 == ids2
    assert after.currsize == before.currsize  # never entered the cache
    # short texts still cache
    tok.encode("go forward")
    assert tok._encode_cached.cache_info().currsize == before.currsize + 1
