"""End-to-end rollout: synthetic world + tiny model + R2R/REVERIE data.

This is the hermetic full-stack test SURVEY.md §4 calls for: fake
nav-graph world drives real rollouts through the real model code.
"""
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
    return NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                          feat_dropout=0.4)


@pytest.fixture()
def optim_cfg():
    return ConfigDict({"Optim": {
        "train_max_action_len": {"R2R": 4, "REVERIE": 4, "CVDN": 4,
                                 "SOON": 4, "EQA": 3},
        "val_max_action_len": {"R2R": 5, "REVERIE": 5, "CVDN": 5,
                               "SOON": 5, "EQA": 3},
    }, "Multi": {"LOSS_COEF": {"R2R": 1.0}}})


def _args(train_args, runner):
    train_args.image_feat_size = runner.cfg.pano.image_feat_size
    train_args.obj_feat_size = runner.cfg.pano.obj_feat_size
    return train_args


def _mp3d_batch(ds, n=2):
    dl = Dataloader(ds, batch_size=n, shuffle=False)
    return next(iter(dl))


def test_r2r_teacher_rollout_train(train_args, task_config, data_dir, runner,
                                   optim_cfg):
    args = _args(train_args, runner)
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    batch = _mp3d_batch(ds)
    runner.zero_grads()
    loss, traj = agent.rollout(args, "R2R", optim_cfg.Optim, batch,
                               dataset=ds, feedback="teacher", train_ml=1.0)
    assert np.isfinite(loss) and loss > 0
    grads = runner.take_grads()
    gsum = float(sum(float(abs(np.asarray(g)).sum())
                     for g in jax.tree.leaves(grads)))
    assert gsum > 0
    # teacher rollout follows the gt path exactly
    for s, item in zip(traj, batch["item"]):
        flat = [vp for seg in s["path"] for vp in seg]
        assert flat == item["path"], (flat, item["path"])


def test_r2r_argmax_validate(train_args, task_config, data_dir, runner,
                             optim_cfg):
    args = _args(train_args, runner)
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    preds = agent.validate("R2R", args, optim_cfg, loader, dataset=ds)
    assert len(preds) == len(ds)
    avg, _ = ds.eval_metrics(preds, None, "R2R")
    assert 0.0 <= avg["sr"] <= 100.0
    # trajectory starts at the gt start (required by the metric)
    for p in preds:
        scan, gt = ds.gt_trajs[p["instr_id"]]
        assert p["trajectory"][0][0] == gt[0]


def test_reverie_og_rollout(train_args, task_config, data_dir, runner,
                            optim_cfg):
    args = _args(train_args, runner)
    args.enable_og = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("reverie", args, task_config, training=True,
                      source="REVERIE", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size),
                    synthetic_object_db("reverie",
                                        runner.cfg.pano.obj_feat_size))
    agent = load_agent("reverie", args, world, runner)
    batch = _mp3d_batch(ds, n=1)
    runner.zero_grads()
    loss, traj = agent.rollout(args, "REVERIE", optim_cfg.Optim, batch,
                               dataset=ds, feedback="teacher", train_ml=1.0)
    assert np.isfinite(loss)
    assert "pred_objid" in traj[0]
    runner.take_grads()


def test_eqa_validate_with_trie(train_args, task_config, data_dir, runner,
                                optim_cfg):
    args = _args(train_args, runner)
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("eqa", args, task_config, training=False, source="EQA",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("eqa", args, world, runner)
    loader = Dataloader(ds, batch_size=1, shuffle=False)
    preds = agent.validate("EQA", args, optim_cfg, loader, dataset=ds)
    assert len(preds) == 1
    p = preds[0]
    # trie-constrained answers must come from the vocab
    assert p["pred_answer"] in ds.answer_vocab
    assert p["oracle_pred_answer"] in ds.answer_vocab
    assert p["gt_answer"] == "red"
    avg, _ = ds.eval_metrics(preds, None, "EQA")
    assert "exact_match" in avg


def test_scanqa_agent_train_and_validate(train_args, task_config, runner):
    args = _args(train_args, runner)
    ds = load_dataset("scanqa", args, task_config, training=True,
                      source="ScanQA")
    ds.init_feat_db(SyntheticImageFeaturesDB(
        runner.cfg.pano.image_feat_size, num_views=1))
    agent = load_agent("scanqa", args, None, runner)
    dl = Dataloader(ds, batch_size=1, shuffle=False)
    batch = next(iter(dl))
    cfg = ConfigDict({"Multi": {"LOSS_COEF": {"ScanQA": 1.0}}})
    runner.zero_grads()
    loss = agent.train("ScanQA", batch, args, cfg)
    assert np.isfinite(loss) and loss > 0
    runner.take_grads()

    vds = load_dataset("scanqa", args, task_config, training=False,
                       source="ScanQA")
    vds.init_feat_db(SyntheticImageFeaturesDB(
        runner.cfg.pano.image_feat_size, num_views=1))
    preds = agent.validate("ScanQA", args, cfg,
                           Dataloader(vds, 1, shuffle=False))
    assert len(preds) == 1
    assert isinstance(preds[0]["generated_sentences"][0], str)


def test_sample_feedback_dagger(train_args, task_config, data_dir, runner,
                                optim_cfg):
    """DAgger: sampled actions + per-step loss still trains."""
    args = _args(train_args, runner)
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    batch = _mp3d_batch(ds, n=2)
    runner.zero_grads()
    loss, traj = agent.rollout(args, "R2R", optim_cfg.Optim, batch,
                               dataset=ds, feedback="sample", train_ml=1.0)
    assert np.isfinite(loss) and loss > 0
    grads = runner.take_grads()
    total = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree.leaves(grads))
    assert total > 0
    # sampled trajectories still start at the gt start
    for s, item in zip(traj, batch["item"]):
        assert s["path"][0][0] == item["path"][0]


def test_enc_full_graph_false(train_args, task_config, data_dir, runner,
                              optim_cfg):
    """enc_full_graph=False: only unvisited nodes enter the gmap
    (reference nav_gmap_variable else-branch, mp3d_agent.py:322-325)."""
    args = _args(train_args, runner)
    args.enc_full_graph = False
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=False, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    preds = agent.validate("R2R", args, optim_cfg, loader, dataset=ds)
    assert len(preds) == len(ds)
    args.enc_full_graph = True
