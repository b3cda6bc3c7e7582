"""int8 KV-cache accuracy contract (models/llama.py kv_quantize /
quantized prefix + prompt caches).

Covers the three consumers:
  - chunk_forward_cached with a quantized prefix cache (prefill +
    append-write + read-only suffix) vs the bf16 full forward,
  - decode_step against a quantize_kv_stack'ed prompt stack,
  - streaming eval with args.kv_int8 (trajectory agreement vs the
    bf16-cache run, mirroring tests/test_quant.py's contract style).

The reference has no KV cache at all (it re-forwards full prompts,
modified_lm.py:89-118); kv_int8 is a capacity lever for the TPU
deployment (the per-slot cache is the HBM ceiling at 7B on 16 GB).
"""
import jax
import jax.numpy as jnp
import numpy as np

from navillm_tpu.models import llama as L
from navillm_tpu.models import nav_model as NM


def test_kv_quantize_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 3, 128).astype(np.float32) * 4.0)
    q, s = L.kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3, 1)
    back = L.kv_dequantize(q, s, jnp.float32)
    rel = float(jnp.max(jnp.abs(back - x)) / jnp.max(jnp.abs(x)))
    assert rel < 0.01, rel    # one int8 grid step of the per-head amax


def test_quantize_kv_stack_shapes():
    kv = {"k": jnp.ones((4, 2, 6, 3, 128), jnp.bfloat16),
          "v": jnp.ones((4, 2, 6, 3, 128), jnp.bfloat16)}
    qkv = L.quantize_kv_stack(kv)
    assert L.kv_is_quantized(qkv) and not L.kv_is_quantized(kv)
    assert qkv["k"].dtype == jnp.int8
    assert qkv["ks"].shape == (4, 2, 6, 3, 1)


def test_chunk_forward_cached_kv8_close_to_full():
    """The quantized-cache rollout step (ragged prefill -> append write
    -> read-only suffix) stays close to the bf16 full forward; the
    append path must quantize its writes with fresh scales."""
    cfg = L.LlamaConfig.tiny(vocab_size=128)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B, P, A, S, pad = 3, 24, 4, 8, 6
    pre_lens = np.array([10, 24, 5])
    app_lens = np.array([3, 0, 2])
    suf_lens = np.array([7, 4, 6])
    ids = {k: rng.randint(3, 127, (B, n)).astype(np.int32)
           for k, n in (("pre", P), ("app", A), ("suf", S))}

    def wmask(lens, width):
        return np.arange(width)[None, :] < lens[:, None]

    full_hidden = []
    for b in range(B):
        row = np.concatenate([ids["pre"][b, :pre_lens[b]],
                              ids["app"][b, :app_lens[b]],
                              ids["suf"][b, :suf_lens[b]]])[None]
        emb = L.embed_with_injection(params, row)
        h, _ = L.forward_hidden(params, cfg, emb, jnp.ones(row.shape, bool))
        full_hidden.append(np.asarray(h[0]))

    # prefill ragged prefixes, then QUANTIZE into the padded cache
    pm = wmask(pre_lens, P)
    emb = L.embed_with_injection(params, ids["pre"])
    _, kv = L.forward_hidden(params, cfg, emb * pm[:, :, None],
                             jnp.asarray(pm), return_kv=True)
    qkv = L.quantize_kv_stack(kv)
    cache = {k: jnp.concatenate(
        [v, jnp.zeros((*v.shape[:2], pad, *v.shape[3:]), v.dtype)], axis=2)
        for k, v in qkv.items()}
    prefix_mask = np.concatenate([pm, np.zeros((B, pad), bool)], 1)

    am = wmask(app_lens, A)
    pos = pre_lens[:, None] + np.arange(A)[None, :]
    emb = L.embed_with_injection(params, ids["app"])
    h_app, cache = L.chunk_forward_cached(
        params, cfg, emb * am[:, :, None], cache, jnp.asarray(prefix_mask),
        jnp.asarray(am), jnp.asarray(pos),
        write_offsets=jnp.asarray(pre_lens))
    assert cache["k"].dtype == jnp.int8    # writes stayed quantized
    prefix_mask = np.arange(P + pad)[None, :] < \
        (pre_lens + app_lens)[:, None]

    sm = wmask(suf_lens, S)
    pos = (pre_lens + app_lens)[:, None] + np.arange(S)[None, :]
    emb = L.embed_with_injection(params, ids["suf"])
    h_suf, _ = L.chunk_forward_cached(
        params, cfg, emb * sm[:, :, None], cache, jnp.asarray(prefix_mask),
        jnp.asarray(sm), jnp.asarray(pos))

    for b in range(B):
        ref = full_hidden[b]
        scale = np.abs(ref).max()
        if app_lens[b]:
            got = np.asarray(h_app[b, :app_lens[b]])
            want = ref[pre_lens[b]: pre_lens[b] + app_lens[b]]
            assert np.abs(got - want).max() < 0.05 * scale
        got = np.asarray(h_suf[b, :suf_lens[b]])
        want = ref[pre_lens[b] + app_lens[b]:]
        assert np.abs(got - want).max() < 0.05 * scale


def test_decode_step_kv8_close():
    """decode_step against a quantized prompt stack ~= against bf16."""
    cfg = L.LlamaConfig.tiny(vocab_size=128)
    params = L.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(5)
    b, t = 2, 12
    ids = jnp.asarray(rng.randint(3, 127, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), bool)
    emb = L.embed_with_injection(params, ids)
    _, prompt_kv = L.forward_hidden(params, cfg, emb, mask, return_kv=True)

    tok = jnp.asarray(rng.randint(3, 127, (b,)).astype(np.int32))
    x = L.embed_rows(params["embed"], tok)[:, None, :]
    pos = jnp.full((b, 1), t, jnp.int32)
    dec = L.init_decode_cache(cfg, b, 4)
    h_f, _ = L.decode_step(params, cfg, x, prompt_kv, mask, dec,
                           jnp.int32(0), pos)
    h_q, _ = L.decode_step(params, cfg, x, L.quantize_kv_stack(prompt_kv),
                           mask, dec, jnp.int32(0), pos)
    scale = float(jnp.abs(h_f).max())
    assert float(jnp.abs(h_f - h_q).max()) < 0.05 * scale


def test_generate_kv8_tokens_agree():
    """Greedy generate with kv_int8 stays token-compatible with bf16
    (same contract as test_quant.py::test_generate_on_quantized_tree:
    agreement on a majority of emitted tokens — greedy streams diverge
    permanently after a near-tie flip)."""
    from navillm_tpu.models.decoding import generate
    cfg = L.LlamaConfig.tiny(vocab_size=128)
    params = L.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(7)
    ids = jnp.asarray(rng.randint(3, 127, (2, 16)).astype(np.int32))
    mask = jnp.ones((2, 16), bool)
    out_f = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                     max_new_tokens=12)
    out_q = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                     max_new_tokens=12, kv_int8=True)
    assert out_q.shape == out_f.shape
    agree = float(jnp.mean(out_f == out_q))
    assert agree > 0.5, agree


def test_streaming_eval_kv8_trajectory_agreement(train_args, task_config,
                                                 data_dir):
    """Streaming eval with the int8 prefix cache: same episodes, and
    trajectory-identical to the bf16-cache run on >=90% of episodes
    (int8 KV noise only flips near-tie argmaxes)."""
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
    args.prefix_cache = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    agent = load_agent("r2r", args, world, runner)

    def run_eval(kv_int8):
        args.kv_int8 = kv_int8
        agent.runner.rng = jax.random.PRNGKey(123)
        agent.np_rng = np.random.RandomState(77)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    preds_f = run_eval(False)
    preds_q = run_eval(True)
    assert preds_f.keys() == preds_q.keys()
    same = sum(preds_f[k] == preds_q[k] for k in preds_f)
    assert same >= 0.9 * len(preds_f), (same, len(preds_f))


def test_streaming_eval_w8a8_prefix_kv8_composes(train_args, task_config,
                                                 data_dir):
    """The full 7B-eval headline configuration — int8 weights + int8
    activations (W8A8) + prefix cache + int8 KV cache — composes on the
    streaming path: covers every episode and stays trajectory-compatible
    with the weight-only/bf16-cache run."""
    import dataclasses
    from navillm_tpu.agents import load_agent
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.models.tokenization import NavTokenizer
    from navillm_tpu.models import quant as Q
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
    args.prefix_cache = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run_eval(c, kv_int8):
        args.kv_int8 = kv_int8
        runner = NavModelRunner(c, qparams, tok, dims=RolloutDims.tiny())
        agent = load_agent("r2r", args, world, runner)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p_["instr_id"]: p_["trajectory"] for p_ in preds}

    base = run_eval(cfg, kv_int8=False)          # weight-only, bf16 cache
    cfg8 = NM.NavModelConfig(
        llm=dataclasses.replace(cfg.llm, act_int8=True), pano=cfg.pano)
    headline = run_eval(cfg8, kv_int8=True)      # W8A8 + kv8
    assert base.keys() == headline.keys() == {
        x["instr_id"] for x in ds.alldata}
    same = sum(base[k] == headline[k] for k in base)
    # two stacked int8 noise sources: still strong-majority identical
    assert same >= 0.8 * len(base), (same, len(base))


def test_prefix_cache_enabled_kv8_budget():
    """kv_int8 halves the cache budget: a (batch, max_prefix) that is
    rejected in bf16 at 7B-ish scale must be admitted with kv_int8."""
    from navillm_tpu.agents.runner import NavModelRunner

    class _R:   # poke the policy without building a real runner
        device_memory = True
        params = {}
        cfg = None

    import dataclasses as dc
    cfg7 = L.LlamaConfig.vicuna_7b() if hasattr(L.LlamaConfig, "vicuna_7b") \
        else L.LlamaConfig.tiny(vocab_size=128)
    r = _R()
    r.cfg = type("C", (), {"llm": cfg7})()
    # fake params footprint: 7 GB (the int8 weight tree)
    fake = np.zeros(1, np.int8)

    class Leaf:
        size = int(7e9)
        dtype = np.dtype(np.int8)
    r.params = {"w": Leaf()}

    bf16 = NavModelRunner.prefix_cache_enabled(r, batch=16, max_prefix=192,
                                               n_caches=2, kv_int8=False)
    kv8 = NavModelRunner.prefix_cache_enabled(r, batch=16, max_prefix=192,
                                              n_caches=2, kv_int8=True)
    # at tiny cfg both pass trivially; at 7B dims the bf16 cache must
    # cost exactly 2x the int8 one minus the scale overhead
    c = cfg7
    bytes_bf16 = 2 * (2 * c.num_layers * 16 * 192 * c.num_kv_heads
                      * c.head_dim * 2)
    bytes_kv8 = 2 * int(2 * c.num_layers * 16 * 192 * c.num_kv_heads
                        * c.head_dim * (1 + 4 / c.head_dim))
    assert bytes_kv8 < 0.6 * bytes_bf16
    assert kv8 or not bf16   # kv8 is never MORE restrictive


def test_streaming_eval_w4a8_prefix_kv8_composes(train_args, task_config,
                                                 data_dir):
    """The int4 CAPACITY configuration — group-int4 weights + int8
    activations + prefix cache + int8 KV cache — composes on the
    streaming path. Both runs share the same int4 policy, so the only
    delta is the cache quantization: near-total trajectory agreement.
    (int4-vs-bf16 accuracy itself is pinned, looser, in
    tests/test_quant4.py.)"""
    import dataclasses
    from navillm_tpu.agents import load_agent
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.models.tokenization import NavTokenizer
    from navillm_tpu.models import quant as Q
    from navillm_tpu.sim import WorldModel
    from navillm_tpu.utils.config import ConfigDict

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    q4params = Q.quantize_nav_params(params, bits=4)
    cfg = NM.NavModelConfig(
        llm=dataclasses.replace(cfg.llm, act_int8=True), pano=cfg.pano)
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5}}})

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 2
    args.prefix_cache = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run_eval(kv_int8):
        args.kv_int8 = kv_int8
        runner = NavModelRunner(cfg, q4params, tok, dims=RolloutDims.tiny())
        agent = load_agent("r2r", args, world, runner)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, 2, shuffle=False),
            dataset=ds)
        return {p_["instr_id"]: p_["trajectory"] for p_ in preds}

    base = run_eval(kv_int8=False)
    kv8 = run_eval(kv_int8=True)
    assert base.keys() == kv8.keys() == {x["instr_id"] for x in ds.alldata}
    same = sum(base[k] == kv8[k] for k in base)
    assert same >= 0.8 * len(base), (same, len(base))
