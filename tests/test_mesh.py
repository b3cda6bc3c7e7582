"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §2.2:
DP via batch sharding + TP over the LLM, XLA-inserted collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.tokenization import NavTokenizer
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.parallel.mesh import make_mesh, nav_param_specs, shard_params
from navillm_tpu.testing import synthetic_nav_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_param_sharding_specs():
    plan = make_mesh(dp_size=4, tp_size=2)
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    sharded = shard_params(params, nav_param_specs(cfg), plan)
    # TP: attention projections split on the model axis
    wq = sharded["llm"]["layers"]["wq"]
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    full = wq.shape
    assert shard_shapes == {(full[0], full[1], full[2] // 2)}
    # pano encoder replicated
    mp = sharded["pano"]["mapper"]["w"]
    assert all(s.data.shape == mp.shape for s in mp.addressable_shards)


def test_mesh_runner_train_step():
    """Full navigation train step dp=4 x tp=2: loss finite, grads sharded
    like params, params update applies."""
    plan = make_mesh(dp_size=4, tp_size=2)
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                            mesh_plan=plan)
    batch = synthetic_nav_batch(cfg, b=4, g=12, v=8, c=8, hh=4, tlen=64)
    targets = np.full((4,), 2, np.int64)
    runner.zero_grads()
    with plan.mesh:
        logits, fuse, loss = runner.navigation(batch, targets=targets,
                                               coef=1.0, train=True)
    assert np.isfinite(loss)
    assert logits.shape == (4, 12)
    grads = runner.take_grads()
    gq = grads["llm"]["layers"]["wq"]
    full = gq.shape
    assert {s.data.shape for s in gq.addressable_shards} == \
        {(full[0], full[1], full[2] // 2)}
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0


def test_mesh_matches_single_device():
    """dp x tp sharded loss == unsharded loss (same math, just placed)."""
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    batch = synthetic_nav_batch(cfg, b=4, g=12, v=8, c=8, hh=4, tlen=64)
    targets = np.full((4,), 2, np.int64)

    r1 = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    r1.zero_grads()
    _, _, loss1 = r1.navigation(batch, targets=targets, coef=1.0, train=True)

    plan = make_mesh(dp_size=4, tp_size=2)
    r2 = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                        mesh_plan=plan)
    r2.zero_grads()
    with plan.mesh:
        _, _, loss2 = r2.navigation(batch, targets=targets, coef=1.0,
                                    train=True)
    assert abs(loss1 - loss2) < 1e-4 * max(1.0, abs(loss1))


def test_zero1_opt_state_shards_and_matches_replicated():
    """ZeRO-1 (parallel/mesh.py:zero1_shard_opt_state): the Adam
    moments gain a 'data'-axis shard on top of their inherited tp
    sharding, the pinned opt_step keeps params dp-replicated, and two
    optimizer steps produce the same params as the fully-replicated
    path — the memory plan that fits 7B training state on a v5e-8."""
    from navillm_tpu.parallel.mesh import zero1_shard_opt_state
    from navillm_tpu.training.optim import make_optimizer
    from navillm_tpu.training.train_loop import make_opt_step

    plan = make_mesh(dp_size=4, tp_size=2)
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                            mesh_plan=plan)
    tx = make_optimizer(lr=1e-3, grad_clip_norm=40.0)

    opt_rep = tx.init(runner.params)
    opt_z1 = zero1_shard_opt_state(tx.init(runner.params), plan,
                                   min_size=1024)

    # the Adam moments (every params-shaped state leaf: mu and nu)
    # shard over 'data' ON TOP of the inherited tp split: per-device
    # shard = 1/8 of the tensor on the dp=4 x tp=2 mesh
    full = runner.params["llm"]["layers"]["wq"].shape
    moments = [l for l in jax.tree.leaves(opt_z1)
               if getattr(l, "shape", None) == full]
    assert len(moments) >= 2, "expected mu and nu wq-shaped leaves"
    for m in moments:
        per_dev = {s.data.size for s in m.addressable_shards}
        assert per_dev == {int(np.prod(full)) // 8}, per_dev
    # the baseline (dp-replicated, tp-split moments inherited from the
    # params at tx.init) keeps 4x the per-device bytes
    for m in [l for l in jax.tree.leaves(opt_rep)
              if getattr(l, "shape", None) == full]:
        assert {s.data.size for s in m.addressable_shards} == \
            {int(np.prod(full)) // 2}

    # two steps, synthetic grads: ZeRO-1 == replicated, params stay
    # dp-replicated (same shard shapes as before the step)
    def grads_like(seed):
        key = jax.random.PRNGKey(seed)
        leaves, treedef = jax.tree.flatten(runner.params)
        return jax.tree.unflatten(treedef, [
            (jax.random.normal(jax.random.fold_in(key, i), l.shape,
                               jnp.float32) * 0.01).astype(l.dtype)
            for i, l in enumerate(leaves)])

    step_rep = make_opt_step(tx)
    step_z1 = make_opt_step(tx, runner.params, opt_z1)
    p_rep = jax.tree.map(jnp.copy, runner.params)
    p_z1 = jax.tree.map(jnp.copy, runner.params)
    for seed in (0, 1):
        g = grads_like(seed)
        with plan.mesh:
            p_rep, opt_rep = step_rep(p_rep, opt_rep,
                                      jax.tree.map(jnp.copy, g))
            p_z1, opt_z1 = step_z1(p_z1, opt_z1,
                                   jax.tree.map(jnp.copy, g))
    wq_rep = np.asarray(p_rep["llm"]["layers"]["wq"], np.float32)
    wq_z1 = np.asarray(p_z1["llm"]["layers"]["wq"], np.float32)
    np.testing.assert_allclose(wq_z1, wq_rep, rtol=1e-5, atol=1e-7)
    # params kept their original (dp-replicated, tp-split) layout
    full = p_z1["llm"]["layers"]["wq"].shape
    assert {s.data.shape
            for s in p_z1["llm"]["layers"]["wq"].addressable_shards} \
        == {(full[0], full[1], full[2] // 2)}


def test_dp_pad_rows_keeps_data_parallel():
    """Row counts not divisible by dp are padded (loss-invariantly) rather
    than falling back to replicated placement (runner._dp_pad_rows)."""
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    batch = synthetic_nav_batch(cfg, b=5, g=12, v=8, c=8, hh=4, tlen=64)
    targets = np.full((5,), 2, np.int64)

    r1 = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    r1.zero_grads()
    logits1, _, loss1 = r1.navigation(batch, targets=targets, coef=1.0,
                                      train=True)

    plan = make_mesh(dp_size=4, tp_size=2)
    r2 = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                        mesh_plan=plan)
    r2.zero_grads()
    with plan.mesh:
        logits2, _, loss2 = r2.navigation(batch, targets=targets, coef=1.0,
                                          train=True)
    assert r2.replicated_puts == 0, "padding should avoid replicated puts"
    assert logits2.shape == logits1.shape == (5, 12)
    assert abs(loss1 - loss2) < 1e-4 * max(1.0, abs(loss1))
    np.testing.assert_allclose(logits1, logits2, rtol=2e-4, atol=2e-4)


def test_mesh_streaming_eval_matches_single_device(train_args, task_config,
                                                   data_dir):
    """Streaming eval executes on a dp=4 x tp=2 mesh and reproduces the
    single-device trajectories — the basis of the 'eval scales
    embarrassingly across chips' claim (episode slots are independent;
    PERFORMANCE.md north-star accounting)."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.utils.config import ConfigDict
    from navillm_tpu.sim import WorldModel

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 4
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5},
                                      "train_max_action_len": {"R2R": 4}}})
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run(mesh_plan):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                mesh_plan=mesh_plan, seed=7)
        agent = load_agent("r2r", args, world, runner)
        loader = Dataloader(ds, batch_size=4, shuffle=False)
        ctx = mesh_plan.mesh if mesh_plan is not None else \
            __import__("contextlib").nullcontext()
        with ctx:
            preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                             dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    single = run(None)
    sharded = run(make_mesh(dp_size=4, tp_size=2))
    assert set(single) == set(sharded) == {
        x["instr_id"] for x in ds.alldata}
    assert single == sharded, "sharded eval diverged from single-device"


def test_quantized_params_shard_on_model_axis():
    """int8 weight-only params (the 7B eval deployment path,
    models/quant.py) keep megatron TP: the int8 tensor splits on the
    model axis and its per-output-channel scale follows — not the
    silent replicate fallback shard_params uses for spec misses."""
    plan = make_mesh(dp_size=4, tp_size=2)
    tok = NavTokenizer()
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg,
                                quantize_llm=True)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                            mesh_plan=plan)
    wq = runner.params["llm"]["layers"]["wq"]
    assert np.asarray(wq["q"].addressable_shards[0].data).dtype == np.int8
    full = wq["q"].shape
    assert {s.data.shape for s in wq["q"].addressable_shards} == \
        {(full[0], full[1], full[2] // 2)}, "int8 tensor must TP-split"
    sfull = wq["s"].shape
    assert {s.data.shape for s in wq["s"].addressable_shards} == \
        {(sfull[0], sfull[1], sfull[2] // 2)}, "scale must follow"


def test_mesh_streaming_eval_quantized_matches_single_device(
        train_args, task_config, data_dir):
    """Quantized streaming eval on the dp=4 x tp=2 mesh reproduces the
    single-device quantized trajectories — validates the combined
    int8 + TP deployment (sharded dequant-in-matmul) end to end."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.utils.config import ConfigDict
    from navillm_tpu.sim import WorldModel

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg,
                                quantize_llm=True)
    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 4
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5},
                                      "train_max_action_len": {"R2R": 4}}})
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run(mesh_plan):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                mesh_plan=mesh_plan, seed=7)
        agent = load_agent("r2r", args, world, runner)
        loader = Dataloader(ds, batch_size=4, shuffle=False)
        ctx = mesh_plan.mesh if mesh_plan is not None else \
            __import__("contextlib").nullcontext()
        with ctx:
            preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                             dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    single = run(None)
    sharded = run(make_mesh(dp_size=4, tp_size=2))
    assert set(single) == set(sharded) == {
        x["instr_id"] for x in ds.alldata}
    assert single == sharded, \
        "quantized sharded eval diverged from single-device"


def test_mesh_streaming_eval_kv8_prefix_cache_matches_single_device(
        train_args, task_config, data_dir):
    """int8-prefix-cache streaming eval on the dp=4 x tp=2 mesh
    reproduces the single-device kv8 trajectories — the full 7B eval
    deployment stack (int8 weights x TP x prefix cache x int8 KV) on
    the virtual mesh."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.utils.config import ConfigDict
    from navillm_tpu.sim import WorldModel

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg,
                                quantize_llm=True)
    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 4
    args.prefix_cache = True
    args.kv_int8 = True
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5},
                                      "train_max_action_len": {"R2R": 4}}})
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run(mesh_plan):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                mesh_plan=mesh_plan, seed=7)
        agent = load_agent("r2r", args, world, runner)
        loader = Dataloader(ds, batch_size=4, shuffle=False)
        ctx = mesh_plan.mesh if mesh_plan is not None else \
            __import__("contextlib").nullcontext()
        with ctx:
            preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                             dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    single = run(None)
    sharded = run(make_mesh(dp_size=4, tp_size=2))
    assert set(single) == set(sharded) == {
        x["instr_id"] for x in ds.alldata}
    assert single == sharded, \
        "kv8 prefix-cache sharded eval diverged from single-device"


def test_mesh_streaming_eval_int4_matches_single_device(
        train_args, task_config, data_dir):
    """int4 (group-scaled, quant_bits=4) streaming eval on the
    dp=4 x tp=2 mesh reproduces the single-device int4 trajectories —
    validates the blockwise int4 matmul under GSPMD: the s4 tensor
    TP-splits, the replicated group scales slice locally, and the
    h-sharded weights' group contraction psums correctly."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.utils.config import ConfigDict
    from navillm_tpu.sim import WorldModel

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg,
                                quantize_llm=True, quant_bits=4)
    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 4
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"R2R": 5},
                                      "train_max_action_len": {"R2R": 4}}})
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    def run(mesh_plan):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                mesh_plan=mesh_plan, seed=7)
        agent = load_agent("r2r", args, world, runner)
        loader = Dataloader(ds, batch_size=4, shuffle=False)
        ctx = mesh_plan.mesh if mesh_plan is not None else \
            __import__("contextlib").nullcontext()
        with ctx:
            preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                             dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    single = run(None)
    sharded = run(make_mesh(dp_size=4, tp_size=2))
    assert set(single) == set(sharded) == {
        x["instr_id"] for x in ds.alldata}
    assert single == sharded, \
        "int4 sharded eval diverged from single-device"


def test_mesh_fused_teacher_step(train_args, task_config, data_dir):
    """The flagship fused-teacher training path stays data-parallel on a
    dp=4 x tp=2 mesh: T*B rows get padded to a dp multiple, no array
    falls back to replicated placement, loss is finite."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.agents.fused_teacher import rollout_teacher_fused
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.models.pano_encoder import PanoConfig
    from navillm_tpu.sim import WorldModel
    from navillm_tpu.utils.config import ConfigDict

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    llm = NM.L.LlamaConfig.tiny(vocab_size=tok.vocab_size)
    cfg = NM.NavModelConfig(
        llm=llm, pano=PanoConfig.tiny(output_size=llm.hidden_size))
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    plan = make_mesh(dp_size=4, tp_size=2)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                            mesh_plan=plan)

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    optim_cfg = ConfigDict({"Optim": {"train_max_action_len": {"R2R": 4},
                                      "val_max_action_len": {"R2R": 5}}})

    agent = load_agent("r2r", args, world, runner)
    runner.zero_grads()
    with plan.mesh:
        loss, traj = rollout_teacher_fused(agent, args, "R2R",
                                           optim_cfg.Optim, batch,
                                           dataset=ds, train_ml=1.0)
    assert np.isfinite(loss) and loss > 0
    assert runner.replicated_puts == 0, \
        "fused-teacher rows must shard over the data axis"
    grads = runner.take_grads()
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert total > 0
