"""Continuous-refill streaming evaluation vs batched evaluation."""
import jax
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import (SyntheticImageFeaturesDB,
                                         synthetic_object_db)
from navillm_tpu.data.loaders import Dataloader
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.tokenization import NavTokenizer
from navillm_tpu.sim import WorldModel
from navillm_tpu.utils.config import ConfigDict


@pytest.fixture(scope="module")
def runner():
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    return NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())


@pytest.fixture()
def optim_cfg():
    return ConfigDict({"Optim": {
        "train_max_action_len": {"R2R": 4, "REVERIE": 4},
        "val_max_action_len": {"R2R": 5, "REVERIE": 5},
    }})


def test_streaming_covers_all_episodes(train_args, task_config, data_dir,
                                       runner, optim_cfg):
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                     dataset=ds)
    assert len(preds) == len(ds)
    assert {p["instr_id"] for p in preds} == set(
        x["instr_id"] for x in ds.alldata)
    avg, _ = ds.eval_metrics(preds, None, "R2R")
    assert 0.0 <= avg["sr"] <= 100.0


def test_streaming_deep_pipeline_covers_and_is_deterministic(
        train_args, task_config, data_dir, runner, optim_cfg):
    """eval_streams != 2 (the latency-hiding knob for slow-link chips):
    every episode is still evaluated exactly once through the
    refill/reset/prefix-cache bookkeeping at non-default pipeline
    depths, and a repeat run with the same rngs is bit-identical.
    (Trajectory equality ACROSS stream counts is not an invariant: the
    shared np_rng's candidate-permutation draws interleave in stream
    order.)"""
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    args.prefix_cache = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)

    def run(streams):
        args.eval_streams = streams
        agent.runner.rng = jax.random.PRNGKey(5)
        agent.np_rng = np.random.RandomState(11)
        preds = agent.validate_streaming(
            "R2R", args, optim_cfg, Dataloader(ds, batch_size=2,
                                               shuffle=False), dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    all_ids = {x["instr_id"] for x in ds.alldata}
    for streams in (1, 3):
        first = run(streams)
        assert set(first) == all_ids
        assert run(streams) == first
    args.eval_streams = 2


def test_streaming_matches_batched_single_slot(train_args, task_config,
                                               data_dir, runner, optim_cfg):
    """With one slot and bs=1, the RNG stream and per-step math match the
    batched validate exactly -> identical trajectories."""
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 1
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))

    a1 = load_agent("r2r", args, world, runner)
    preds_batched = a1.validate("R2R", args, optim_cfg,
                                Dataloader(ds, 1, shuffle=False), dataset=ds)
    a2 = load_agent("r2r", args, world, runner)
    preds_stream = a2.validate_streaming("R2R", args, optim_cfg,
                                         Dataloader(ds, 1, shuffle=False),
                                         dataset=ds)
    got = {p["instr_id"]: p["trajectory"] for p in preds_stream}
    want = {p["instr_id"]: p["trajectory"] for p in preds_batched}
    assert got == want


def test_streaming_reverie_og(train_args, task_config, data_dir, runner,
                              optim_cfg):
    args = train_args
    args.enable_og = True
    args.val_batch_size = 1
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("reverie", args, task_config, training=False,
                      source="REVERIE", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size),
                    synthetic_object_db("reverie",
                                        runner.cfg.pano.obj_feat_size))
    agent = load_agent("reverie", args, world, runner)
    preds = agent.validate_streaming("REVERIE", args, optim_cfg,
                                     Dataloader(ds, 1, shuffle=False),
                                     dataset=ds)
    assert len(preds) == len(ds)
    assert all("pred_objid" in p for p in preds)
    avg, _ = ds.eval_metrics(preds, None, "REVERIE")
    assert "rgs" in avg


def test_device_memory_matches_host_path(train_args, task_config, data_dir,
                                         optim_cfg):
    """Streaming eval with on-chip graph memory == host-memory path."""
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    args.val_batch_size = 2
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    preds = {}
    for dev_mem in (False, True):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                device_memory=dev_mem)
        agent = load_agent("r2r", args, world, runner)
        out = agent.validate_streaming("R2R", args, optim_cfg,
                                       Dataloader(ds, 2, shuffle=False),
                                       dataset=ds)
        preds[dev_mem] = {p["instr_id"]: p["trajectory"] for p in out}
    assert preds[True] == preds[False]


def test_streaming_eqa_with_oracle(train_args, task_config, data_dir,
                                   runner):
    """EQA streams end-to-end: trie-constrained answers per finishing
    slot, plus the teacher-forced oracle second pass re-enqueued into
    the same slot (reference mp3d_agent.py:530-590)."""
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    args.prefix_cache = True     # cover trie+oracle on the cached path
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"EQA": 5},
                                      "train_max_action_len": {"EQA": 4}}})
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("eqa", args, task_config, training=False, source="EQA",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("eqa", args, world, runner)
    loader = Dataloader(ds, batch_size=1, shuffle=False)
    preds = agent.validate_streaming("EQA", args, optim_cfg, loader,
                                     dataset=ds)
    assert len(preds) == len(ds)
    for p in preds:
        assert p["pred_answer"] in ds.answer_vocab
        assert p["oracle_pred_answer"] in ds.answer_vocab
    avg, _ = ds.eval_metrics(preds, None, "EQA")
    assert "exact_match" in avg and "oracle_exact_match" in avg


def test_streaming_gen_queue_drains_under_flood(train_args, task_config,
                                                tmp_path, runner):
    """Regression: with two slot groups, EVERY slot can finish on the
    same iteration (max_action_len=1 forces it), so the generation
    queue grows by up to 2x the flush width per iteration and holds
    >flush_width leftovers at exit — the force flush must loop until
    drained or EQA answers are silently dropped. Needs a dataset much
    larger than the slot count (the shared fixture has 1 item)."""
    import json
    from navillm_tpu.testing import make_grid_connectivity

    root = tmp_path / "flood"
    make_grid_connectivity(root / "connectivity", scan="scan0", rows=4,
                           cols=4)
    eqa_dir = root / "EQA" / "annotations"
    eqa_dir.mkdir(parents=True)
    items = [{"sample_idx": i, "scan": "scan0",
              "path": [f"vp_{i % 4}_{i // 4 % 4}",
                       f"vp_{(i + 1) % 4}_{i // 4 % 4}"],
              "question": {"question_text": f"what color is object {i}",
                           "answer_text": "red"}}
             for i in range(12)]
    (eqa_dir / "val_unseen.json").write_text(json.dumps(items))
    (eqa_dir / "answer_vocab.json").write_text(
        json.dumps(["red", "blue", "green"]))

    args = train_args
    args.data_dir = str(root)
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    args.prefix_cache = True     # flood the cached path's refill/prefill
    optim_cfg = ConfigDict({"Optim": {"val_max_action_len": {"EQA": 1},
                                      "train_max_action_len": {"EQA": 1}}})
    world = WorldModel(str(root / "connectivity"))
    ds = load_dataset("eqa", args, task_config, training=False, source="EQA",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("eqa", args, world, runner)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    preds = agent.validate_streaming("EQA", args, optim_cfg, loader,
                                     dataset=ds)
    assert len(preds) == len(ds) == 12
    for p in preds:
        assert p["pred_answer"] in ds.answer_vocab, p["instr_id"]
        assert p["oracle_pred_answer"] in ds.answer_vocab, p["instr_id"]


def test_streaming_summarization_test_mode(train_args, task_config, data_dir,
                                           runner, optim_cfg):
    """args.mode='test' + enable_summarize: every finished slot gets a
    generated summary through the streaming generation queue."""
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    args.enable_summarize = True
    args.mode = "test"
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                     dataset=ds)
    assert len(preds) == len(ds)
    # summarization writes generated_sentences + answer onto each traj,
    # surfaced by get_results as pred/gt answers
    for p in preds:
        assert "pred_answer" in p and isinstance(p["pred_answer"], str)


def test_prefix_cache_matches_uncached(train_args, task_config, data_dir,
                                       runner, optim_cfg):
    """Prefix-cached streaming eval == uncached streaming eval,
    trajectory for trajectory (the cache is a pure compute-saving
    transform: causal attention over an append-only prefix)."""
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.val_batch_size = 2
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)

    def run(prefix_cache):
        args.prefix_cache = prefix_cache
        # reset BOTH rng streams so the runs are bit-comparable: the
        # device policy rng AND the host np_rng that draws candidate
        # permutations (candidate order changes prompt positions, which
        # the model is not invariant to)
        agent.runner.rng = jax.random.PRNGKey(123)
        agent.np_rng = np.random.RandomState(77)
        loader = Dataloader(ds, batch_size=2, shuffle=False)
        preds = agent.validate_streaming("R2R", args, optim_cfg, loader,
                                         dataset=ds)
        return {p["instr_id"]: p["trajectory"] for p in preds}

    cached = run(True)
    uncached = run(False)
    args.prefix_cache = True
    assert set(cached) == set(uncached)
    assert cached == uncached
