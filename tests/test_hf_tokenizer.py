"""HFTokenizer adapter contract (models/tokenization.py:HFTokenizer).

The real-Vicuna drop-in path loads a HF tokenizer via
`NavTokenizer.from_pretrained` and must honor the reference's tokenizer
contract (reference models/modified_lm.py:56-87): schema special tokens
added as atomic ids, left padding, left truncation at max_length, pair
encoding with answer-token type ids. No Vicuna asset exists in this
environment, so a tiny HF-format tokenizer (tokenizers-lib BPE +
tokenizer_config.json) is built hermetically in a fixture and loaded
through the exact same transformers.AutoTokenizer code path.
"""
import json

import numpy as np
import pytest

from navillm_tpu.models.tokenization import (SPECIAL_TOKENS, NavTokenizer)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Build a tiny HF-format fast tokenizer directory offline."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = tmp_path_factory.mktemp("tiny_hf_tok")
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    corpus = [
        "walk forward and turn left at the stairs",
        "go to the kitchen past the red chair",
        "stop near the table by the window",
        "which direction should we go to reach the goal",
        "navigation instruction history candidate object",
    ] * 4
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(corpus, trainer)
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "model_max_length": 4096, "clean_up_tokenization_spaces": False}))
    return d


@pytest.fixture(scope="module")
def nav_tok(hf_dir):
    return NavTokenizer.from_pretrained(str(hf_dir), max_length=64,
                                        pad_to_multiple=16)


def test_schema_specials_are_atomic_ids(nav_tok):
    """Each schema special encodes to exactly one id, distinct from all
    others, and survives inline in running text."""
    ids = {t: nav_tok.backend.special_token_id(t) for t in SPECIAL_TOKENS}
    assert len(set(ids.values())) == len(SPECIAL_TOKENS)
    assert all(i >= 0 and i != nav_tok.unk_id for i in ids.values())
    enc = nav_tok.encode("go to <cand> then <cand> with <hist> memory",
                         add_bos=False)
    assert enc.count(ids["<cand>"]) == 2
    assert enc.count(ids["<hist>"]) == 1
    assert nav_tok.cand_id == ids["<cand>"]
    assert nav_tok.hist_id == ids["<hist>"]
    assert nav_tok.cls_ids == [ids["<cls_1>"], ids["<cls_2>"]]


def test_left_padding_and_bucketing(nav_tok):
    batch = nav_tok(["go", "walk forward and turn left at the stairs"])
    L = batch.input_ids.shape[1]
    assert L % 16 == 0
    # left padded: pads at the FRONT, content right-aligned
    short = batch.input_ids[0]
    n_pad = int((short == nav_tok.pad_id).sum())
    assert n_pad > 0
    assert np.all(short[:n_pad] == nav_tok.pad_id)
    assert np.all(batch.attention_mask[0, :n_pad] == False)  # noqa: E712
    assert np.all(batch.attention_mask[0, n_pad:])
    assert short[n_pad] == nav_tok.bos_id


def test_left_truncation_keeps_tail(nav_tok):
    """Over-length prompts drop the OLDEST tokens (the reference's
    truncation_side='left'), preserving the schema tail."""
    long_text = "walk forward " * 80 + "<cls_1>"
    batch = nav_tok([long_text])
    assert batch.input_ids.shape[1] == nav_tok.max_length
    row = batch.input_ids[0]
    assert np.all(batch.attention_mask[0])          # fully packed
    assert row[-1] == nav_tok.cls_ids[0]            # tail survived


def test_pair_encoding_type_ids(nav_tok):
    batch = nav_tok([("what color is the chair ?", "red and blue")])
    row_ty = batch.token_type_ids[0]
    row_ids = batch.input_ids[0]
    valid = batch.attention_mask[0]
    # answer tokens (type 1) form a suffix of the valid region
    ones = np.nonzero(row_ty == 1)[0]
    assert len(ones) > 0
    assert ones[-1] == len(row_ids) - 1
    assert np.all(np.diff(ones) == 1)
    assert np.all(row_ty[valid][: -len(ones)] == 0)


def test_prompt_assembly_positions(hf_dir):
    """A real navigation schema prompt through tokenize_with_positions:
    the k-th <cand>/<hist> occurrence maps to the k-th position slot."""
    import jax
    from navillm_tpu.agents.prompts import navigation_prompt
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.models import nav_model as NM

    tok = NavTokenizer.from_pretrained(str(hf_dir), max_length=512,
                                       pad_to_multiple=64)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    p = navigation_prompt("R2R", instruction="go to the kitchen",
                          hist_num=3, cand_num=4, cls_token="<cls_1>")
    batch, cand_pos, hist_pos, cls_pos = runner.tokenize_with_positions([p])
    ids = batch.input_ids[0]
    # candidate 0 is the literal "stop" entry; candidates 1..cand_num-1
    # carry <cand> tokens (agents/prompts._candidate_block)
    assert (cand_pos[0] >= 0).sum() == 3
    assert (hist_pos[0] >= 0).sum() == 3
    for k in np.asarray(cand_pos[0][cand_pos[0] >= 0]):
        assert ids[k] == tok.cand_id
    for k in np.asarray(hist_pos[0][hist_pos[0] >= 0]):
        assert ids[k] == tok.hist_id
    assert ids[cls_pos[0]] == tok.cls_ids[0]


def test_special_logit_mask_and_vocab_alignment(nav_tok):
    mask = nav_tok.special_logit_mask()
    assert mask.shape == (nav_tok.vocab_size,)
    assert nav_tok.vocab_size % 128 == 0
    assert nav_tok.vocab_size >= nav_tok.true_vocab_size
    assert all(mask[i] for i in nav_tok.special_token_ids)
    assert np.all(mask[nav_tok.true_vocab_size:])
    # plain text ids stay unmasked
    for t in nav_tok.encode("walk forward", add_bos=False):
        assert not mask[t]


def test_decode_roundtrip_skips_pad(nav_tok):
    text = "go to the kitchen"
    batch = nav_tok([text, "a much longer instruction to force padding"])
    out = nav_tok.decode(batch.input_ids[0])
    assert "PAD" not in out
    assert "kitchen" in out
