"""Logit parity: our JAX Llama vs HF torch LlamaForCausalLM.

The fidelity check SURVEY.md §7.2 step 3 / §7.4 hard-part 5 calls for:
convert a small random HF Llama and require near-identical logits on
fixed inputs, including left-padded batches (position handling) and the
soft-token injection path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from navillm_tpu.models import llama as L
from navillm_tpu.models.convert import config_from_hf, convert_hf_llama


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM
    hf_cfg = HFConfig(vocab_size=200, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=3, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      rms_norm_eps=1e-6, rope_theta=10000.0)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    cfg = L.LlamaConfig(**{**cfg.__dict__, "remat": False})
    params = convert_hf_llama(hf, cfg)
    return hf, cfg, params


def _jax_logits(params, cfg, ids, mask, positions=None):
    x = L.embed_with_injection(params, jnp.asarray(ids))
    h, _ = L.forward_hidden(params, cfg, x, jnp.asarray(mask),
                            positions=positions)
    return np.asarray(L.logits_from_hidden(params, cfg, h))


def test_logits_match_unpadded(hf_and_jax):
    hf, cfg, params = hf_and_jax
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 200, (2, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got = _jax_logits(params, cfg, ids, np.ones((2, 12), bool))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_logits_match_left_padded(hf_and_jax):
    """With explicit position_ids, left padding must agree too."""
    hf, cfg, params = hf_and_jax
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 200, (1, 10))
    pad = 4
    ids_p = np.concatenate([np.zeros((1, pad), np.int64), ids], 1)
    mask = np.concatenate([np.zeros((1, pad), bool), np.ones((1, 10), bool)], 1)
    pos = np.maximum(np.cumsum(mask, 1) - 1, 0)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids_p),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 position_ids=torch.tensor(pos)).logits.numpy()
    got = _jax_logits(params, cfg, ids_p, mask)
    np.testing.assert_allclose(got[:, pad:], ref[:, pad:], rtol=2e-4,
                               atol=2e-4)


def test_injection_matches_embedding_addition(hf_and_jax):
    """Soft-token injection == adding to inputs_embeds in HF
    (modified_lm.py:100-110 semantics)."""
    hf, cfg, params = hf_and_jax
    rng = np.random.RandomState(2)
    ids = rng.randint(0, 200, (1, 8))
    vis = rng.randn(1, 2, cfg.hidden_size).astype(np.float32)
    positions = np.array([[2, 5]])

    with torch.no_grad():
        emb = hf.get_input_embeddings()(torch.tensor(ids))
        emb[0, 2] += torch.tensor(vis[0, 0])
        emb[0, 5] += torch.tensor(vis[0, 1])
        ref = hf(inputs_embeds=emb).logits.numpy()

    x = L.embed_with_injection(params, jnp.asarray(ids),
                               jnp.asarray(positions), jnp.asarray(vis))
    h, _ = L.forward_hidden(params, cfg, x, jnp.ones((1, 8), bool))
    got = np.asarray(L.logits_from_hidden(params, cfg, h))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_vocab_resize_mean_init(hf_and_jax):
    hf, _, _ = hf_and_jax
    cfg2 = config_from_hf(hf.config, vocab_size=256, dtype=jnp.float32)
    params2 = convert_hf_llama(hf, cfg2)
    emb = np.asarray(params2["embed"])
    assert emb.shape == (256, 64)
    np.testing.assert_allclose(emb[200:], np.repeat(
        emb[:200].mean(0, keepdims=True), 56, 0), rtol=1e-5)
