import jax
import jax.numpy as jnp
import numpy as np

from navillm_tpu.models import llama as L
from navillm_tpu.models.decoding import generate

CFG = L.LlamaConfig.tiny(vocab_size=128)


def _params():
    return L.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes():
    p = _params()
    b, t = 2, 16
    ids = jnp.arange(b * t).reshape(b, t) % CFG.vocab_size
    mask = jnp.ones((b, t), bool)
    x = L.embed_with_injection(p, ids)
    h, _ = L.forward_hidden(p, CFG, x, mask)
    assert h.shape == (b, t, CFG.hidden_size)
    logits = L.logits_from_hidden(p, CFG, h)
    assert logits.shape == (b, t, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_left_padding_invariance():
    """Logits at real token positions must not depend on left-pad amount."""
    p = _params()
    t = 12
    ids = (jnp.arange(t) % CFG.vocab_size)[None, :]
    mask = jnp.ones((1, t), bool)
    h_ref, _ = L.forward_hidden(p, CFG, L.embed_with_injection(p, ids), mask)

    pad = 5
    ids_p = jnp.concatenate([jnp.zeros((1, pad), ids.dtype), ids], axis=1)
    mask_p = jnp.concatenate([jnp.zeros((1, pad), bool), mask], axis=1)
    h_pad, _ = L.forward_hidden(p, CFG, L.embed_with_injection(p, ids_p), mask_p)
    np.testing.assert_allclose(np.asarray(h_pad[:, pad:]), np.asarray(h_ref),
                               rtol=2e-3, atol=2e-3)


def test_injection_scatter():
    p = _params()
    ids = jnp.zeros((2, 6), jnp.int32)
    pos = jnp.array([[1, 3], [-1, 2]])
    emb = jnp.ones((2, 2, CFG.hidden_size))
    x = L.embed_with_injection(p, ids, pos, emb)
    base = p["embed"][0]
    np.testing.assert_allclose(np.asarray(x[0, 1]), np.asarray(base + 1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x[0, 0]), np.asarray(base), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x[1, 2]), np.asarray(base + 1), rtol=1e-5)
    # -1 slot must not touch position 0
    np.testing.assert_allclose(np.asarray(x[1, 0]), np.asarray(base), rtol=1e-5)


def test_loss_ignore_labels():
    p = _params()
    b, t = 1, 8
    ids = jnp.arange(t)[None, :] % CFG.vocab_size
    mask = jnp.ones((b, t), bool)
    h, _ = L.forward_hidden(p, CFG, L.embed_with_injection(p, ids), mask)
    logits = L.logits_from_hidden(p, CFG, h)
    labels_all_ignored = jnp.full((b, t), -100)
    assert float(L.causal_lm_loss(logits, labels_all_ignored)) == 0.0
    labels = ids.at[:, :4].set(-100)
    loss = float(L.causal_lm_loss(logits, labels))
    assert loss > 0


def test_cached_decode_matches_full_forward():
    """Greedy decode with KV cache == argmax over repeated full forwards."""
    p = _params()
    b, t, n_new = 2, 10, 5
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, 100, size=(b, t)), jnp.int32)
    # left-pad one row to also exercise padded prefill
    mask = jnp.ones((b, t), bool).at[1, :3].set(False)
    ids = ids.at[1, :3].set(0)

    got = generate(p, CFG, ids, mask, eos_id=2, pad_id=0,
                   max_new_tokens=n_new)

    # reference: full forward each step
    cur_ids, cur_mask = ids, mask
    want = []
    for _ in range(n_new):
        h, _ = L.forward_hidden(p, CFG, L.embed_with_injection(p, cur_ids), cur_mask)
        logits = (h[:, -1] @ p["lm_head"]).astype(jnp.float32)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        want.append(np.asarray(nxt))
        cur_ids = jnp.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = jnp.concatenate([cur_mask, jnp.ones((b, 1), bool)], axis=1)
    want = np.stack(want, axis=1)

    got_np = np.asarray(got)
    for bi in range(b):
        for k in range(n_new):
            if want[bi, k] == 2:
                break
            assert got_np[bi, k] == want[bi, k], (bi, k, got_np[bi], want[bi])


import pytest


@pytest.mark.parametrize("n_new", [6, 10])
def test_eager_decode_loop_matches_scan_loop(n_new):
    """The 7B-scale eager token loop (unrolled step chunks + per-token
    remainder, donated decode cache) produces the same tokens as the
    single-executable scan loop. n_new=6 runs one full chunk; n_new=10
    runs a chunk plus a 2-step remainder."""
    p = _params()
    b, t = 2, 12
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(3, 100, size=(b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool).at[0, :4].set(False)
    ids = ids.at[0, :4].set(0)

    got_scan = np.asarray(generate(p, CFG, ids, mask, eos_id=2, pad_id=0,
                                   max_new_tokens=n_new, loop="scan"))
    got_eager = np.asarray(generate(p, CFG, ids, mask, eos_id=2, pad_id=0,
                                    max_new_tokens=n_new, loop="eager"))
    np.testing.assert_array_equal(got_scan, got_eager)


def test_chunk_forward_cached_matches_full_forward():
    """Prefix-cache path == full forward: per-row ragged prefixes, a
    written history-append window, then a candidates suffix window —
    the three phases of the prefix-cached rollout step."""
    cfg = L.LlamaConfig.tiny(vocab_size=128)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B, P = 3, 24
    pre_lens = np.array([10, 24, 5])
    app_lens = np.array([3, 0, 2])          # ragged append window
    suf_lens = np.array([7, 4, 6])          # ragged suffix window
    A, S = 4, 8
    ids = {k: rng.randint(3, 127, (B, n)).astype(np.int32)
           for k, n in (("pre", P), ("app", A), ("suf", S))}

    def window_mask(lens, width):
        return np.arange(width)[None, :] < lens[:, None]

    # ---- reference: one full forward per row (right-padded) ----
    full_hidden = []
    for b in range(B):
        row = np.concatenate([ids["pre"][b, :pre_lens[b]],
                              ids["app"][b, :app_lens[b]],
                              ids["suf"][b, :suf_lens[b]]])[None]
        emb = L.embed_with_injection(params, row)
        h, _ = L.forward_hidden(params, cfg, emb,
                                jnp.ones(row.shape, bool))
        full_hidden.append(np.asarray(h[0]))

    # ---- cached path ----
    # phase 1: prefill the ragged prefixes (batched, right-padded)
    pm = window_mask(pre_lens, P)
    emb = L.embed_with_injection(params, ids["pre"])
    _, kv = L.forward_hidden(params, cfg, emb * pm[:, :, None],
                             jnp.asarray(pm), return_kv=True)
    # grow the cache region so append slots exist
    pad = 6
    cache = {k: jnp.concatenate(
        [v, jnp.zeros((*v.shape[:2], pad, *v.shape[3:]), v.dtype)], axis=2)
        for k, v in kv.items()}
    prefix_mask = np.concatenate([pm, np.zeros((B, pad), bool)], 1)

    # phase 2: append window (written into the cache)
    am = window_mask(app_lens, A)
    pos = pre_lens[:, None] + np.arange(A)[None, :]
    emb = L.embed_with_injection(params, ids["app"])
    h_app, cache = L.chunk_forward_cached(
        params, cfg, emb * am[:, :, None], cache, jnp.asarray(prefix_mask),
        jnp.asarray(am), jnp.asarray(pos), write_offsets=jnp.asarray(pre_lens))
    ext = (np.arange(P + pad)[None, :] < (pre_lens + app_lens)[:, None])
    prefix_mask = ext

    # phase 3: suffix window (read-only)
    sm = window_mask(suf_lens, S)
    pos = (pre_lens + app_lens)[:, None] + np.arange(S)[None, :]
    emb = L.embed_with_injection(params, ids["suf"])
    h_suf, _ = L.chunk_forward_cached(
        params, cfg, emb * sm[:, :, None], cache, jnp.asarray(prefix_mask),
        jnp.asarray(sm), jnp.asarray(pos))

    for b in range(B):
        ref = full_hidden[b]
        if app_lens[b]:
            np.testing.assert_allclose(
                np.asarray(h_app[b, :app_lens[b]]),
                ref[pre_lens[b]: pre_lens[b] + app_lens[b]],
                rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(h_suf[b, :suf_lens[b]]),
            ref[pre_lens[b] + app_lens[b]:],
            rtol=2e-4, atol=2e-4)
