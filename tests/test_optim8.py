"""8-bit Adam moments (training/optim.py:scale_by_adam_q8).

Contract: blockwise int8/uint8 moment codes with fp32 update math must
(a) roundtrip within the linear-code error bound, (b) keep small leaves
exact, (c) track exact AdamW closely enough that a synthetic regression
reaches the same loss basin, and (d) keep the param-shaped state leaves
so ZeRO-1 sharding (parallel/mesh.py:zero1_shard_opt_state) applies
unchanged. The reference trains with torch.optim.AdamW
(/root/reference/tools/optims.py:35-62); 8-bit moments are a TPU-side
memory lever, not a behavior change, so closeness—not equality—is the
bar.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from navillm_tpu.training.optim import (
    _MIN_QUANT_SIZE, dequantize_signed, dequantize_sqrt, make_optimizer,
    quantize_signed, quantize_sqrt, scale_by_adam_q8)


def test_signed_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
    q, s = quantize_signed(x, 256)
    assert q.dtype == jnp.int8 and s.shape == (8, 2)
    back = dequantize_signed(q, s, 256)
    # linear symmetric code: |err| <= scale/2 = absmax/254 per group
    bound = np.repeat(np.asarray(s), 256, axis=-1) / 2 + 1e-7
    assert np.all(np.abs(np.asarray(back - x)) <= bound)


def test_sqrt_roundtrip_relative_error():
    rng = np.random.default_rng(1)
    # 6-decade dynamic range inside each group — the case that breaks
    # direct linear v-quantization
    v = jnp.asarray((10.0 ** rng.uniform(-8, -2, (4, 256)))
                    .astype(np.float32))
    q, s = quantize_sqrt(v, 256)
    assert q.dtype == jnp.uint8
    back = dequantize_sqrt(q, s, 256)
    r, rb = np.sqrt(np.asarray(v)), np.sqrt(np.asarray(back))
    bound = np.repeat(np.asarray(s), 256, axis=-1) / 2 + 1e-9
    assert np.all(np.abs(rb - r) <= bound)
    assert np.all(np.asarray(back) >= 0)


def test_zero_group_scale_is_safe():
    x = jnp.zeros((1, 256), jnp.float32)
    q, s = quantize_signed(x, 256)
    assert np.all(np.asarray(s) == 1.0)
    assert np.all(np.asarray(dequantize_signed(q, s, 256)) == 0)
    qv, sv = quantize_sqrt(x, 256)
    assert np.all(np.asarray(dequantize_sqrt(qv, sv, 256)) == 0)


def _params():
    rng = np.random.default_rng(2)
    return {
        "w": jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32)
                         * 0.1),              # quantized (16384 elems)
        "b": jnp.asarray(rng.standard_normal((64,)).astype(np.float32)
                         * 0.1),              # small -> exact fp32 path
        "odd": jnp.asarray(rng.standard_normal((33, 130)).astype(np.float32)
                           * 0.1),            # 130 % 256 != 0 fallback
    }


def test_state_layout_and_small_leaf_exactness():
    params = _params()
    tx = scale_by_adam_q8()
    state = tx.init(params)
    assert state.qm["w"].dtype == jnp.int8
    assert state.qv["w"].dtype == jnp.uint8
    assert state.qm["w"].shape == params["w"].shape     # ZeRO-1 contract
    assert state.ms["w"].shape == (64, 1)
    assert state.qm["b"].dtype == jnp.float32           # small leaf exact
    assert params["odd"].size < _MIN_QUANT_SIZE or \
        state.ms["odd"].shape == (33, 1)                # whole-axis group

    g = jax.tree.map(jnp.ones_like, params)
    upd, state = tx.update(g, state, params)
    # small leaf must follow exact scale_by_adam to fp32 precision
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    rstate = ref.init(params)
    rupd, _ = ref.update(g, rstate, params)
    np.testing.assert_allclose(np.asarray(upd["b"]), np.asarray(rupd["b"]),
                               rtol=1e-6)


def test_regression_tracks_exact_adamw():
    """Noisy linear regression, 80 steps: the 8-bit trajectory must land
    in the same loss basin as exact AdamW (within 10% final loss)."""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    w_true = jnp.asarray(rng.standard_normal((64, 80)).astype(np.float32))
    Y = X @ w_true

    def loss_fn(p):
        return jnp.mean((X @ p["w"] - Y) ** 2)

    def run(tx):
        p = {"w": jnp.zeros((64, 80), jnp.float32)}   # 5120 elems: coded
        st = tx.init(p)
        step = jax.jit(lambda p, st: _step(p, st))

        def _step(p, st):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, st2 = tx.update(g, st, p)
            return optax.apply_updates(p, u), st2, l

        for _ in range(80):
            p, st, l = step(p, st)
        return float(loss_fn(p))

    exact = run(make_optimizer(lr=3e-2, grad_clip_norm=1e9))
    q8 = run(make_optimizer(lr=3e-2, grad_clip_norm=1e9, moments_8bit=True))
    assert q8 <= max(exact * 1.10, exact + 1e-4), (exact, q8)
    # and it must actually have optimized (init loss is ~65 here)
    assert q8 < 3.0


def test_bf16_params_and_checkpoint_roundtrip(tmp_path):
    """bf16 params (the real training dtype) + npz save/load of the
    coded state reproduces the next update bit-exactly."""
    rng = np.random.default_rng(4)
    params = {"w": jnp.asarray(
        rng.standard_normal((32, 256)).astype(np.float32)).astype(
            jnp.bfloat16)}
    tx = make_optimizer(lr=1e-3, moments_8bit=True)
    st = tx.init(params)
    g = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    u1, st = tx.update(g, st, params)
    assert u1["w"].dtype == jnp.bfloat16

    from navillm_tpu.training.checkpoints import (load_checkpoint,
                                                  save_checkpoint)
    path = tmp_path / "ckpt"
    save_checkpoint(path, params, st, epoch=0)
    p2, st2, _ = load_checkpoint(path, params, tx.init(params), None)
    u2a, _ = tx.update(g, st, params)
    u2b, _ = tx.update(g, st2, p2)
    np.testing.assert_array_equal(np.asarray(u2a["w"], dtype=np.float32),
                                  np.asarray(u2b["w"], dtype=np.float32))


def test_zero1_shards_coded_moments():
    """The coded moment leaves keep the param shape, so ZeRO-1 places a
    'data' shard on them and the sharded opt_step matches the unsharded
    one."""
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    from navillm_tpu.parallel.mesh import zero1_shard_opt_state
    import types
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()).reshape(n, 1), ("data", "model"))
    plan = types.SimpleNamespace(mesh=mesh, dp_size=n)

    params = {"w": jnp.asarray(
        np.random.default_rng(5).standard_normal((n * 16, 512))
        .astype(np.float32))}
    tx = scale_by_adam_q8()
    st = tx.init(params)
    g = jax.tree.map(lambda p: p * 0.01, params)
    u_ref, _ = tx.update(g, st, params)

    st_sh = zero1_shard_opt_state(st, plan, min_size=1024)
    spec = st_sh.qm["w"].sharding.spec
    assert "data" in tuple(spec), spec
    u_sh, _ = jax.jit(tx.update)(g, st_sh, params)
    np.testing.assert_allclose(np.asarray(u_sh["w"]), np.asarray(u_ref["w"]),
                               rtol=2e-5, atol=2e-6)
