"""Sub-task heads: summarization + FGR2R generation losses in training."""
import json

import jax
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.fused_teacher import rollout_teacher_fused
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
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
        "train_max_action_len": {"R2R": 4},
        "val_max_action_len": {"R2R": 5}}})


def _fg_dataset(data_dir, tmp_path, args, task_config, world):
    """R2R annotations with FGR2R fine-grained chunks."""
    path = ["vp_0_0", "vp_0_1", "vp_0_2", "vp_1_2"]
    items = [{
        "distance": 6.0, "scan": "scan0", "path_id": 99, "path": path,
        "heading": 0.0,
        "instructions": ["walk east twice then go south"],
        "new_instructions": "[[['walk', 'east'], ['then', 'south']]]",
        "chunk_view": [[[1, 3], [3, 4]]],
    }]
    d = tmp_path / "R2R" / "annotations"
    d.mkdir(parents=True)
    (d / "fg_train.json").write_text(json.dumps(items))
    cfg = ConfigDict(dict(task_config))
    cfg["R2R"] = {"DIR": str(tmp_path / "R2R"),
                  "SPLIT": {"train": "annotations/fg_train.json"}}
    # DIR absolute -> get_anno_file_path uses it directly
    cfg["R2R"]["DIR"] = str(tmp_path / "R2R")
    ds = load_dataset("r2r", args, cfg, training=True, source="R2R",
                      world=world)
    return ds


def test_summarization_head_trains(train_args, task_config, data_dir, runner,
                                   optim_cfg):
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.enable_summarize = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    batch = next(iter(Dataloader(ds, 1, shuffle=False)))
    runner.zero_grads()
    loss, _ = agent.rollout(args, "R2R", optim_cfg.Optim, batch, dataset=ds,
                            feedback="teacher", train_ml=1.0)
    runner.take_grads()
    assert np.isfinite(loss) and loss > 0
    args.enable_summarize = False


def test_fgr2r_head_trains(train_args, task_config, data_dir, tmp_path,
                           runner, optim_cfg):
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.enable_fgr2r = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = _fg_dataset(data_dir, tmp_path, args, task_config, world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    assert "fg_instruction" in ds.alldata[0]
    agent = load_agent("r2r", args, world, runner)
    batch = next(iter(Dataloader(ds, 1, shuffle=False)))
    assert "fg_instruction" in batch["observations"][0]
    runner.zero_grads()
    loss, _ = agent.rollout(args, "R2R", optim_cfg.Optim, batch, dataset=ds,
                            feedback="teacher", train_ml=1.0)
    runner.take_grads()
    assert np.isfinite(loss) and loss > 0

    # fused path handles fgr2r rows too
    batch2 = next(iter(Dataloader(ds, 1, shuffle=False)))
    runner.zero_grads()
    loss2, _ = rollout_teacher_fused(agent, args, "R2R", optim_cfg.Optim,
                                     batch2, dataset=ds, train_ml=1.0)
    runner.take_grads()
    assert np.isfinite(loss2) and loss2 > 0
    args.enable_fgr2r = False
