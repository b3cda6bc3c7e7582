"""LLaVAAgent / ScanQAAgent — the non-embodied train/validate loops
(SURVEY.md §3.4: LLaVAAgent.train/validate -> NavModel.forward_3dqa;
reference tasks/agents/llava.py:19-85, scanqa.py:7-20)."""
import jax
import numpy as np

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
from navillm_tpu.data.loaders import Dataloader
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.tokenization import NavTokenizer
from navillm_tpu.utils.config import ConfigDict


def _runner():
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    return NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())


def _mix_cfg(task_config, sources):
    cfg = ConfigDict(dict(task_config))
    cfg["Multi"] = {"SOURCE": sources, "Ratio": [1] * len(sources),
                    "LOSS_COEF": {}}
    return cfg


def test_scanqa_agent_train_accumulates_grads(train_args, task_config):
    runner = _runner()
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    cfg = _mix_cfg(task_config, ["ScanQA"])
    ds = load_dataset("scanqa", args, cfg, training=True, source="ScanQA")
    ds.init_feat_db(SyntheticImageFeaturesDB(
        runner.cfg.pano.image_feat_size, num_views=1))
    agent = load_agent("scanqa", args, None, runner)

    batch = next(iter(Dataloader(ds, batch_size=1, shuffle=False)))
    runner.zero_grads()
    loss = agent.train("ScanQA", batch, args, cfg, dataset=ds)
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0
    grads = runner.take_grads()
    # the pano encoder trains through the 3dqa loss jit, not only the LLM
    pano_g = sum(float(jax.numpy.abs(g).sum())
                 for g in jax.tree.leaves(grads["pano"]))
    llm_g = sum(float(jax.numpy.abs(g).sum())
                for g in jax.tree.leaves(grads["llm"]))
    assert pano_g > 0 and llm_g > 0


def test_llava_agent_train_path(train_args, task_config):
    """LLaVA rides the same 3dqa loss with its own prompt schema."""
    runner = _runner()
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    cfg = _mix_cfg(task_config, ["LLaVA"])
    ds = load_dataset("llava", args, cfg, training=True, source="LLaVA")
    ds.init_feat_db(SyntheticImageFeaturesDB(
        runner.cfg.pano.image_feat_size, num_views=1))
    agent = load_agent("llava", args, None, runner)
    batch = next(iter(Dataloader(ds, batch_size=1, shuffle=False)))
    runner.zero_grads()
    loss = float(agent.train("LLaVA", batch, args, cfg, dataset=ds))
    assert np.isfinite(loss) and loss > 0


def test_scanqa_agent_validate_generates_and_scores(train_args, task_config):
    """validate(): max-20-token greedy decode per question (reference
    llava.py:45-85), predictions score through ScanQA's EM/ROUGE."""
    runner = _runner()
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.do_sample = False
    cfg = _mix_cfg(task_config, ["ScanQA"])
    ds = load_dataset("scanqa", args, cfg, training=False, source="ScanQA")
    ds.init_feat_db(SyntheticImageFeaturesDB(
        runner.cfg.pano.image_feat_size, num_views=1))
    agent = load_agent("scanqa", args, None, runner)

    preds = agent.validate("ScanQA", args, cfg,
                           Dataloader(ds, batch_size=1, shuffle=False),
                           dataset=ds)
    assert len(preds) == len(ds)
    for p in preds:
        assert isinstance(p["generated_sentences"][0], str)
        assert p["question_id"] == "q0"
    avg, _ = ds.eval_metrics(preds, None, "ScanQA")
    assert 0.0 <= avg["exact_match"] <= 100.0
    assert 0.0 <= avg["rouge"] <= 100.0
