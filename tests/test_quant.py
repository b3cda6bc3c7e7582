"""int8 weight-only quantization: parity vs the bf16/fp32 path.

The reference has no quantized path (it runs Vicuna-7B in bf16/fp16,
models/modified_lm.py:38-53); quantization is a TPU-side HBM lever for
7B eval on 16 GB chips (docs/PERFORMANCE.md). These tests pin:
  - the dequant identity `(x @ q) * s ≈ x @ w` at the weight level,
  - full-model logit parity within tolerance,
  - decode/generate running end-to-end on a quantized tree,
  - greedy trajectory agreement on the synthetic world,
  - TP partition specs mirroring the quantized structure.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.models import llama as L
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models import quant as Q


def test_weight_dequant_identity():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 96).astype(np.float32))
    qw = Q._quant_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["s"].shape == (1, 96)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    ref = x @ w
    got = L._mm(x, qw)
    # per-element relative error is meaningless where the dot cancels
    # to ~0; the right metric is the normalized residual norm, bounded
    # by ~ sqrt(h) * E|x| * scale/2 / ||ref|| (<1% on gaussian data)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_stacked_weight_quant_matches_per_layer():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 32, 48).astype(np.float32))
    qs = Q._quant_weight(w)
    for l in range(3):
        ql = Q._quant_weight(w[l])
        np.testing.assert_array_equal(np.asarray(qs["q"][l]),
                                      np.asarray(ql["q"]))
        np.testing.assert_allclose(np.asarray(qs["s"][l]),
                                   np.asarray(ql["s"]))


def test_embed_row_quant_lookup():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(50, 16).astype(np.float32))
    qe = Q._quant_embed(w)
    assert qe["s"].shape == (50, 1)
    ids = jnp.asarray([[0, 7, 49], [3, 3, 1]])
    ref = w[ids]
    got = L.embed_rows(qe, ids)
    assert float(jnp.max(jnp.abs(got - ref))) < 0.05 * float(
        jnp.max(jnp.abs(ref)))


@pytest.fixture(scope="module")
def tiny_model():
    cfg = L.LlamaConfig.tiny(vocab_size=384)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_full_model_logit_parity(tiny_model):
    cfg, params = tiny_model
    qparams = Q._quantize_llama_impl(params)
    assert Q.is_quantized({"llm": qparams})
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(3, 380, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), bool)

    def logits(p):
        emb = L.embed_with_injection(p, ids)
        hidden, _ = L.forward_hidden(p, cfg, emb, mask)
        return L.logits_from_hidden(p, cfg, hidden)

    lf = logits(params)
    lq = logits(qparams)
    # a random-init model's logits are nearly flat, so top-1 is an
    # unusually hostile metric here (trained models are sharper);
    # require strong-majority agreement plus tight log-prob parity
    assert float(jnp.mean(jnp.argmax(lf, -1) == jnp.argmax(lq, -1))) > 0.8
    pf = jax.nn.log_softmax(lf, -1)
    pq = jax.nn.log_softmax(lq, -1)
    assert float(jnp.mean(jnp.abs(pf - pq))) < 0.05


def test_generate_on_quantized_tree(tiny_model):
    cfg, params = tiny_model
    from navillm_tpu.models.decoding import generate
    qparams = Q._quantize_llama_impl(params)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(3, 380, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), bool)
    out_f = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                     max_new_tokens=8)
    out_q = generate(qparams, cfg, ids, mask, eos_id=-1, pad_id=0,
                     max_new_tokens=8)
    assert out_q.shape == out_f.shape
    # greedy streams agree until the first divergence propagates;
    # require agreement on a majority of emitted tokens
    agree = float(jnp.mean(out_f == out_q))
    assert agree > 0.5, agree


def test_decode_step_quantized(tiny_model):
    """Eager decode path (used at 7B) runs on a quantized tree and
    matches the quantized full-forward logits."""
    cfg, params = tiny_model
    qparams = Q._quantize_llama_impl(params)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(3, 380, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), bool)
    emb = L.embed_with_injection(qparams, ids)
    hidden, pkv = L.forward_hidden(qparams, cfg, emb, mask, return_kv=True)
    # feed one token through decode_step; compare vs re-running full fwd
    tok = jnp.asarray([[5], [7]], jnp.int32)
    demb = L.embed_rows(qparams["embed"], tok[:, 0])[:, None, :]
    cache = L.init_decode_cache(cfg, 2, 4)
    pos = jnp.full((2, 1), 12, jnp.int32)
    h1, cache = L.decode_step(qparams, cfg, demb, pkv, mask, cache,
                              jnp.int32(0), pos)
    full_ids = jnp.concatenate([ids, tok], axis=1)
    femb = L.embed_with_injection(qparams, full_ids)
    h_full, _ = L.forward_hidden(qparams, cfg, femb,
                                 jnp.ones((2, 13), bool))
    np.testing.assert_allclose(np.asarray(h1[:, 0]),
                               np.asarray(h_full[:, -1]), atol=2e-2)


def test_quantized_partition_specs_structure(tiny_model):
    cfg, params = tiny_model
    qparams = Q._quantize_llama_impl(params)
    specs = L.partition_specs(cfg, quantized=True)
    # the spec tree must mirror the quantized param tree exactly
    pt = jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, qparams))
    st = jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, specs,
                     is_leaf=lambda x: isinstance(
                         x, jax.sharding.PartitionSpec)))
    assert pt == st


def test_nav_quantize_subtree_only():
    cfg = NM.NavModelConfig.tiny(vocab_size=384)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    qp = Q.quantize_nav_params(params)
    assert Q.is_quantized(qp)
    assert qp["pano"] is params["pano"]
    assert qp["out_head"] is params["out_head"]


def test_trajectory_agreement_synthetic_world(train_args, task_config,
                                              data_dir):
    """Greedy eval rollouts on the synthetic grid world: quantized vs
    fp32 policies must produce (near-)identical trajectories — int8
    per-channel error only flips an argmax when two candidates are
    within quantization noise of each other."""
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
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run_eval(p):
        runner = NavModelRunner(cfg, p, tok, dims=RolloutDims.tiny())
        agent = load_agent("r2r", args, world, runner)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p_["instr_id"]: p_["trajectory"] for p_ in preds}

    preds_f = run_eval(params)
    preds_q = run_eval(Q.quantize_nav_params(params))
    assert preds_f.keys() == preds_q.keys()
    same = sum(preds_f[k] == preds_q[k] for k in preds_f)
    assert same >= 0.9 * len(preds_f), (same, len(preds_f))


def test_init_params_quantized_matches_post_hoc(tiny_model):
    """Incremental quantized init == quantize(init_params) on the same
    RNG stream — the 7B memory-safe path is the same math as the
    small-model path. Different XLA fusions may flip round() at bin
    boundaries, so q is allowed to differ by <=1 grid step on a tiny
    fraction of entries; scales must match exactly."""
    cfg, params = tiny_model
    q_inc = Q.init_params_quantized(jax.random.PRNGKey(0), cfg)
    q_ref = Q._quantize_llama_impl(L.init_params(jax.random.PRNGKey(0),
                                                 cfg))

    def cmp(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, d.max()
            assert (d == 0).mean() > 0.95
        else:
            # reduction order differs between fusions -> last-ulp
            # amax/scale wobble
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=0)

    jax.tree.map(cmp, q_inc, q_ref)


def test_act_int8_mm_close_to_weight_only():
    """W8A8 (`_mm(..., a8=True)`): int8xint8->int32 with per-token
    activation scales stays within the combined-grid error bound of
    the weight-only product."""
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(64, 96).astype(np.float32))
    qw = Q._quant_weight(w)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    ref = x @ w
    got = L._mm(x, qw, a8=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # dense weights ignore the flag (no activation grid applied)
    np.testing.assert_array_equal(np.asarray(L._mm(x, w, a8=True)),
                                  np.asarray(x @ w))


def test_act_int8_full_model_logit_parity(tiny_model):
    """Full forward with cfg.act_int8=True: logits stay close to the
    bf16 reference and the top-1 token largely agrees — the accuracy
    contract of the --act_int8 eval flag."""
    import dataclasses
    cfg, params = tiny_model
    qparams = Q._quantize_llama_impl(params)
    cfg8 = dataclasses.replace(cfg, act_int8=True)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(3, 380, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), bool)

    def logits(p, c):
        emb = L.embed_with_injection(p, ids)
        hidden, _ = L.forward_hidden(p, c, emb, mask)
        return L.logits_from_hidden(p, c, hidden)

    ref = logits(params, cfg)
    got = logits(qparams, cfg8)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, rel
    agree = float((got.argmax(-1) == ref.argmax(-1)).mean())
    assert agree > 0.7, agree


def test_act_int8_requires_quantized_weights(train_args):
    """--act_int8 without --quantize_llm must be rejected: there are
    no int8 weights for the int8xint8 product."""
    from navillm_tpu.training import train_loop as TL
    args = train_args
    args.act_int8 = True
    args.quantize_llm = False
    args.mode = "test"
    with pytest.raises(ValueError, match="act_int8"):
        TL.build_runner(args, cfg=None)


def test_quantize_host_llama_matches_device(tiny_model):
    """Host (numpy, checkpoint-conversion) quantization ==
    device (jit) quantization — the quantize-during-load path used by
    models/convert.py:load_vicuna(quantize=True) for real 7B
    checkpoints produces the same int8 grid as the post-hoc path, so
    all parity/trajectory tests above transfer to it. Same <=1-grid-
    step / exact-scale tolerance as the incremental-init test (round()
    at bin boundaries can flip between XLA fusions and numpy)."""
    import ml_dtypes
    cfg, params = tiny_model
    # host copy in bf16-numpy, exactly what load_vicuna_streaming
    # hands over (models/convert.py:136)
    host = jax.tree.map(
        lambda a: np.asarray(a).astype(ml_dtypes.bfloat16), params)
    q_host = Q.quantize_host_llama(host)
    q_dev = Q._quantize_llama_impl(
        jax.tree.map(lambda a: jnp.asarray(np.asarray(a),
                                           jnp.bfloat16), params))

    def cmp(a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype == np.int8:
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, d.max()
            assert (d == 0).mean() > 0.95
        else:
            np.testing.assert_allclose(a.astype(np.float32),
                                       b.astype(np.float32),
                                       rtol=1e-2, atol=0)

    jax.tree.map(cmp, q_host, q_dev)
    # destructive contract: the bf16 weights were dropped from `host`
    assert isinstance(host["lm_head"], dict)


def test_quantize_llm_rejected_for_training(train_args):
    """--quantize_llm is eval-only; build_runner must refuse it in
    train mode (int8 leaves are not differentiable)."""
    from navillm_tpu.training import train_loop as TL
    args = train_args
    args.quantize_llm = True
    args.mode = "train"
    with pytest.raises(ValueError, match="eval-only"):
        TL.build_runner(args, cfg=None)


def test_init_nav_params_quantize_llm_flag():
    cfg = NM.NavModelConfig.tiny(vocab_size=384)
    qp = NM.init_nav_params(jax.random.PRNGKey(5), cfg, quantize_llm=True)
    dp = NM.init_nav_params(jax.random.PRNGKey(5), cfg)
    assert Q.is_quantized(qp)
    # non-LLM subtrees share the same RNG stream -> identical
    np.testing.assert_array_equal(np.asarray(qp["out_head"]["w"]),
                                  np.asarray(dp["out_head"]["w"]))
    # and the quantized LLM is the quantization of the dense one
    q_ref = Q._quantize_llama_impl(dp["llm"])
    np.testing.assert_array_equal(np.asarray(qp["llm"]["lm_head"]["q"]),
                                  np.asarray(q_ref["lm_head"]["q"]))

def test_act_int8_trajectory_agreement_synthetic_world(train_args,
                                                       task_config,
                                                       data_dir):
    """W8A8 (--act_int8) streaming eval on the synthetic world produces
    (near-)identical trajectories to the weight-only int8 policy — the
    end-to-end accuracy contract behind the `--a8` bench headline."""
    import dataclasses
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
    qparams = Q.quantize_nav_params(params)
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5}}})

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 2
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run_eval(c):
        runner = NavModelRunner(c, qparams, tok, dims=RolloutDims.tiny())
        agent = load_agent("r2r", args, world, runner)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p_["instr_id"]: p_["trajectory"] for p_ in preds}

    preds_w = run_eval(cfg)
    cfg8 = NM.NavModelConfig(
        llm=dataclasses.replace(cfg.llm, act_int8=True), pano=cfg.pano)
    preds_a8 = run_eval(cfg8)
    assert preds_w.keys() == preds_a8.keys()
    same = sum(preds_w[k] == preds_a8[k] for k in preds_w)
    assert same >= 0.9 * len(preds_w), (same, len(preds_w))
