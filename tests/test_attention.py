import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.ops.attention import (_attention_xla, _flash_attention,
                                       multi_head_attention)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_xla(causal):
    rng = np.random.RandomState(0)
    b, t, nh, d = 2, 256, 2, 128
    q = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    mask = jnp.asarray(rng.rand(b, t) > 0.3)
    mask = mask.at[:, -1].set(True)  # ensure at least one valid key
    scale = d ** -0.5

    ref = np.asarray(_attention_xla(q, k, v, mask, causal, scale))
    out = np.asarray(_flash_attention(q, k, v, mask, causal, scale,
                                      interpret=True))
    # rows whose every key is masked are don't-care (the two paths pick
    # different conventions there: zeros vs degenerate uniform average)
    m = np.asarray(mask)
    valid_keys = np.broadcast_to(m[:, None, :], (b, t, t)).copy()
    if causal:
        valid_keys &= np.tril(np.ones((t, t), bool))[None]
    row_ok = valid_keys.any(-1)                       # [B, T]
    sel = np.broadcast_to(row_ok[:, :, None, None], out.shape)
    np.testing.assert_allclose(out[sel], ref[sel], rtol=2e-4, atol=2e-4)


def test_flash_nonaligned_length():
    rng = np.random.RandomState(1)
    b, t, nh, d = 1, 200, 1, 128
    q = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    mask = jnp.ones((b, t), bool)
    scale = d ** -0.5
    ref = _attention_xla(q, k, v, mask, True, scale)
    out = _flash_attention(q, k, v, mask, True, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gqa_expansion():
    rng = np.random.RandomState(2)
    b, t, nh, nkv, d = 2, 16, 4, 2, 8
    q = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nkv, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nkv, d), jnp.float32)
    out = multi_head_attention(q, k, v, causal=True, impl="xla")
    assert out.shape == (b, t, nh, d)
    # heads 0,1 share kv head 0
    k2 = jnp.repeat(k, 2, axis=2)
    v2 = jnp.repeat(v, 2, axis=2)
    ref = multi_head_attention(q, k2, v2, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_query_mask_3d():
    rng = np.random.RandomState(3)
    b, t, nh, d = 1, 8, 1, 8
    q = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    # explicit causal 3D mask == built-in causal
    tri = jnp.tril(jnp.ones((t, t), bool))[None]
    out3 = multi_head_attention(q, k, v, kv_mask=tri, causal=False, impl="xla")
    ref = multi_head_attention(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref), rtol=1e-5)


def test_flash_backward_matches_xla():
    """Fused Pallas backward == autodiff through the XLA path."""
    from navillm_tpu.ops.attention import _flash_differentiable
    rng = np.random.RandomState(7)
    b, t, nh, d = 2, 256, 2, 128
    q = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)
    mask = jnp.asarray(rng.rand(b, t) > 0.2).at[:, :2].set(True)
    scale = d ** -0.5
    g = jnp.asarray(rng.randn(b, t, nh, d), jnp.float32)

    for causal in (False, True):
        def f_flash(q, k, v):
            return _flash_differentiable(q, k, v, mask, causal, scale,
                                         interpret=True)

        def f_xla(q, k, v):
            return _attention_xla(q, k, v, mask, causal, scale)

        _, vjp_flash = jax.vjp(f_flash, q, k, v)
        _, vjp_xla = jax.vjp(f_xla, q, k, v)
        got = vjp_flash(g)
        want = vjp_xla(g)
        # fully-masked rows are don't-care: zero the same rows in both
        m = np.asarray(mask)
        valid_keys = np.broadcast_to(m[:, None, :], (b, t, t)).copy()
        if causal:
            valid_keys &= np.tril(np.ones((t, t), bool))[None]
        row_ok = valid_keys.any(-1)[:, :, None, None]
        for name, a, bb in zip("qkv", got, want):
            aa, bw = np.asarray(a), np.asarray(bb)
            if name == "q":
                aa = np.where(row_ok, aa, 0)
                bw = np.where(row_ok, bw, 0)
            np.testing.assert_allclose(aa, bw, rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name} causal={causal}")
