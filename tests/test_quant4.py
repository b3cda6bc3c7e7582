"""Group-wise int4 weight quantization (`bits=4`, models/quant.py).

int4 is a capacity lever on top of int8: the seven layer matmuls store
0.5 byte/param (uint8 nibble pairs packed along the output axis —
native XLA s4 jit arguments break the axon relay) with one scale per
GROUP4=128 reduction rows, halving LLM weight HBM again (~6.8 -> ~3.3 GB
at 7B) for the HBM-bound eval paths. It is intrinsically lossier than
per-channel int8 — on gaussian random weights the per-matmul noise is
~amax_g/(7*sqrt(12)) ≈ 11% of the signal norm (vs ~0.7% for int8) — so
the parity bounds here are correspondingly looser; int8 remains the
accuracy-headline path and int4 is opt-in (`bench.py --w4`). The
reference has no quantized path at all (models/modified_lm.py:38-53).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.models import llama as L
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models import quant as Q


def test_weight4_group_structure_and_dequant():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 96).astype(np.float32))
    qw = Q._quant_weight4(w)
    assert qw["q4p"].dtype == jnp.uint8
    assert qw["q4p"].shape == (256, 48)      # nibble pairs along o
    assert qw["s"].shape == (2, 96)          # 256 / GROUP4
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    ref = x @ w
    got = L._mm(x, qw)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    # int4 grid noise on gaussian data: ~amax/(7*sqrt(12)) ≈ 11% of
    # the signal norm; bound with margin but tight enough to catch a
    # broken scale or group layout (those land at ~100%)
    assert rel < 0.2, rel
    # group scales beat one per-channel int4 scale on the same data
    q_flat, s_flat = Q._quant_one4(jnp.asarray(
        np.asarray(w)))  # same grouped path
    assert s_flat.shape == (2, 96)


def test_weight4_grouping_is_exact_when_groups_are_uniform():
    """If every group of a column shares one amax, group quantization
    equals per-channel quantization — the scale layout is exercised
    without quantization noise in the comparison."""
    rng = np.random.RandomState(1)
    base = rng.randn(128, 8).astype(np.float32)
    w = jnp.asarray(np.concatenate([base, base], axis=0))   # two equal groups
    qw = Q._quant_weight4(w)
    s = np.asarray(qw["s"])
    np.testing.assert_allclose(s[0], s[1])
    q = Q.unpack_int4_host(np.asarray(qw["q4p"])).astype(np.int32)
    np.testing.assert_array_equal(q[:128], q[128:])


def test_stacked_weight4_matches_per_layer():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(3, 128, 48).astype(np.float32))
    qs = Q._quant_weight4(w)
    for l in range(3):
        ql = Q._quant_weight4(w[l])
        # lax.map vs direct fusion reorders the amax reduction ->
        # last-ulp scale wobble, which can flip round() at a bin edge
        d = np.abs(Q.unpack_int4_host(np.asarray(qs["q4p"][l]))
                   .astype(np.int32)
                   - Q.unpack_int4_host(np.asarray(ql["q4p"]))
                   .astype(np.int32))
        assert d.max() <= 1 and (d == 0).mean() > 0.99
        np.testing.assert_allclose(np.asarray(qs["s"][l]),
                                   np.asarray(ql["s"]), rtol=1e-5)


def test_pack_unpack_roundtrip_and_nibble_order():
    """pack_int4 (device) <-> _unpack_q4 (device) <-> unpack_int4_host
    must agree on the nibble contract: low nibble = even output
    channel, two's-complement."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randint(-7, 8, (5, 16, 10)).astype(np.int8))
    packed = Q.pack_int4(q)
    assert packed.dtype == jnp.uint8 and packed.shape == (5, 16, 5)
    np.testing.assert_array_equal(np.asarray(L._unpack_q4(packed)),
                                  np.asarray(q))
    np.testing.assert_array_equal(Q.unpack_int4_host(np.asarray(packed)),
                                  np.asarray(q))
    # explicit contract: byte 0 of a pair = channels (0, 1)
    one = Q.pack_int4(jnp.asarray([[3, -5]], dtype=jnp.int8))
    assert int(np.asarray(one)[0, 0]) == (3 | ((-5) & 0xF) << 4)


def test_mm4_a8_close_to_weight_only():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(256, 96).astype(np.float32))
    qw = Q._quant_weight4(w)
    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    ref = L._mm(x, qw)                     # int4 weight-only
    got = L._mm(x, qw, a8=True)            # int4 x int8 activations
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    # the activation grid adds ~1/127 on top; the two paths must agree
    # far inside the int4 noise floor
    assert rel < 0.05, rel


@pytest.fixture(scope="module")
def tiny_model():
    cfg = L.LlamaConfig.tiny(vocab_size=384)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_full_model_logit_parity_int4(tiny_model):
    cfg, params = tiny_model
    q4 = Q._quantize_llama_impl(params, bits=4)
    assert Q.is_quantized({"llm": q4})
    assert Q.weight_bits({"llm": q4}) == 4
    assert Q.weight_bits({"llm": Q._quantize_llama_impl(params)}) == 8
    assert Q.weight_bits({"llm": params}) == 16
    # embed / lm_head stay int8
    assert "q" in q4["lm_head"] and "q" in q4["embed"]
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(3, 380, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), bool)

    def logits(p):
        emb = L.embed_with_injection(p, ids)
        hidden, _ = L.forward_hidden(p, cfg, emb, mask)
        return L.logits_from_hidden(p, cfg, hidden)

    lf = logits(params)
    lq = logits(q4)
    # random-init logits are nearly flat, the most hostile case for
    # int4's ~11%/matmul noise; require the distributions to stay
    # correlated rather than int8-tight
    pf = jax.nn.log_softmax(lf, -1)
    pq = jax.nn.log_softmax(lq, -1)
    assert float(jnp.mean(jnp.abs(pf - pq))) < 0.5
    c = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert c > 0.9, c


def test_generate_on_int4_tree(tiny_model):
    cfg, params = tiny_model
    from navillm_tpu.models.decoding import generate
    q4 = Q._quantize_llama_impl(params, bits=4)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(3, 380, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), bool)
    out = generate(q4, cfg, ids, mask, eos_id=-1, pad_id=0,
                   max_new_tokens=8)
    assert out.shape == (2, 8)
    assert bool(jnp.all((out >= 0) & (out < cfg.vocab_size)))


def test_partition_specs_int4_structure(tiny_model):
    cfg, params = tiny_model
    q4 = Q._quantize_llama_impl(params, bits=4)
    specs = L.partition_specs(cfg, quantized=True, bits=4)
    pt = jax.tree_util.tree_structure(jax.tree.map(lambda _: 0, q4))
    st = jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, specs,
                     is_leaf=lambda x: isinstance(
                         x, jax.sharding.PartitionSpec)))
    assert pt == st
    # group scales replicate; int4 values keep the dense TP spec
    assert specs["layers"]["wq"]["s"] == jax.sharding.PartitionSpec(
        None, None, None)
    assert specs["layers"]["wq"]["q4p"] == L.partition_specs(
        cfg)["layers"]["wq"]


def test_init_params_quantized4_matches_post_hoc(tiny_model):
    cfg, _ = tiny_model
    q_inc = Q.init_params_quantized(jax.random.PRNGKey(0), cfg, bits=4)
    q_ref = Q._quantize_llama_impl(
        L.init_params(jax.random.PRNGKey(0), cfg), bits=4)

    def cmp(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.name == "uint8":   # nibble-packed int4: compare values
            a, b = Q.unpack_int4_host(a), Q.unpack_int4_host(b)
        if a.dtype.name == "int8":
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, d.max()
            assert (d == 0).mean() > 0.95
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=0)

    jax.tree.map(cmp, q_inc, q_ref)


def test_quantize_host_llama4_matches_device(tiny_model):
    import ml_dtypes
    cfg, params = tiny_model
    host = jax.tree.map(
        lambda a: np.asarray(a).astype(ml_dtypes.bfloat16), params)
    q_host = Q.quantize_host_llama(host, bits=4)
    q_dev = Q._quantize_llama_impl(
        jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                           jnp.bfloat16), params),
        bits=4)

    def cmp(a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype.name == "uint8":   # nibble-packed int4
            a, b = Q.unpack_int4_host(a), Q.unpack_int4_host(b)
        if a.dtype.name == "int8":
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, d.max()
            assert (d == 0).mean() > 0.95
        else:
            np.testing.assert_allclose(a.astype(np.float32),
                                       b.astype(np.float32),
                                       rtol=1e-2, atol=0)

    jax.tree.map(cmp, q_host, q_dev)


def test_trajectory_agreement_int4_synthetic_world(train_args,
                                                   task_config,
                                                   data_dir):
    """Greedy streaming eval with int4 weights on the synthetic world:
    trajectories must mostly agree with the fp32 policy. The threshold
    is looser than int8's 90% — int4's noise floor is ~15x higher and a
    random-init tiny model has no logit margins to absorb it; a broken
    kernel lands near 0% agreement, not near the threshold."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.models.tokenization import NavTokenizer
    from navillm_tpu.sim import WorldModel
    from navillm_tpu.utils.config import ConfigDict

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5}}})

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 2
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False,
                      source="R2R", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run_eval(p):
        runner = NavModelRunner(cfg, p, tok, dims=RolloutDims.tiny())
        agent = load_agent("r2r", args, world, runner)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p_["instr_id"]: p_["trajectory"] for p_ in preds}

    preds_f = run_eval(params)
    preds_q = run_eval(Q.quantize_nav_params(params, bits=4))
    assert preds_f.keys() == preds_q.keys()
    same = sum(preds_f[k] == preds_q[k] for k in preds_f)
    assert same >= 0.6 * len(preds_f), (same, len(preds_f))
