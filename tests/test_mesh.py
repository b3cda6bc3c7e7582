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
