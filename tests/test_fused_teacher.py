"""Fused whole-trajectory teacher forcing == per-step rollout (gradients)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.fused_teacher import rollout_teacher_fused
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
from navillm_tpu.data.loaders import Dataloader
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.pano_encoder import PanoConfig
from navillm_tpu.models.tokenization import NavTokenizer
from navillm_tpu.sim import WorldModel
from navillm_tpu.utils.config import ConfigDict


@pytest.fixture(scope="module")
def det_runner():
    """Dropout-free runner so per-step and fused paths are deterministic."""
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    llm = NM.L.LlamaConfig.tiny(vocab_size=tok.vocab_size)
    pano = PanoConfig.tiny(output_size=llm.hidden_size,
                           hidden_dropout_prob=0.0)
    cfg = NM.NavModelConfig(llm=llm, pano=pano)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    return NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                          feat_dropout=0.0)


@pytest.fixture()
def optim_cfg():
    return ConfigDict({"Optim": {
        "train_max_action_len": {"R2R": 4},
        "val_max_action_len": {"R2R": 5}}})


class _IdentityRng:
    """np_rng stand-in whose permutation is the identity."""

    def permutation(self, x):
        return np.asarray(x)

    def choice(self, n, p=None):
        return 0


def _identity_perm(agent):
    agent.np_rng = _IdentityRng()


def _grads_norm_tree(grads):
    return {".".join(map(str, path)): float(jnp.abs(leaf).sum())
            for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]
            if float(jnp.abs(leaf).sum()) > 0}


def test_fused_matches_per_step(train_args, task_config, data_dir,
                                det_runner, optim_cfg):
    args = train_args
    args.image_feat_size = det_runner.cfg.pano.image_feat_size
    args.obj_feat_size = det_runner.cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(
        det_runner.cfg.pano.image_feat_size))
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))

    # per-step reference path
    a1 = load_agent("r2r", args, world, det_runner)
    _identity_perm(a1)
    det_runner.zero_grads()
    loss_step, traj_step = a1.rollout(args, "R2R", optim_cfg.Optim, batch,
                                      dataset=ds, feedback="teacher",
                                      train_ml=1.0)
    grads_step = det_runner.take_grads()

    # fused path (fresh batch: env state was consumed)
    batch2 = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    a2 = load_agent("r2r", args, world, det_runner)
    _identity_perm(a2)
    det_runner.zero_grads()
    loss_fused, traj_fused = rollout_teacher_fused(
        a2, args, "R2R", optim_cfg.Optim, batch2, dataset=ds, train_ml=1.0)
    grads_fused = det_runner.take_grads()

    # identical teacher trajectories
    assert [t["path"] for t in traj_step] == [t["path"] for t in traj_fused]
    # identical total loss
    assert loss_fused == pytest.approx(loss_step, rel=1e-4), \
        (loss_step, loss_fused)
    # identical accumulated gradients
    flat_s = jax.tree.leaves(grads_step)
    flat_f = jax.tree.leaves(grads_fused)
    for s, f in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(f), np.asarray(s), rtol=2e-3,
                                   atol=2e-5)


def test_fused_via_train_entrypoint(train_args, task_config, data_dir,
                                    det_runner, optim_cfg):
    args = train_args
    args.image_feat_size = det_runner.cfg.pano.image_feat_size
    args.obj_feat_size = det_runner.cfg.pano.obj_feat_size
    args.fused_teacher = True
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(
        det_runner.cfg.pano.image_feat_size))
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    agent = load_agent("r2r", args, world, det_runner)
    cfg = ConfigDict({"Multi": {"LOSS_COEF": {}},
                      "Optim": optim_cfg.Optim})
    det_runner.zero_grads()
    loss = agent.train("R2R", batch, args, cfg, dataset=ds, step=0)
    assert np.isfinite(loss) and loss > 0
    det_runner.take_grads()


def test_device_memory_train_matches_host(train_args, task_config, data_dir,
                                          optim_cfg):
    """Per-step training with on-chip memory == host-memory path
    (loss and accumulated gradients), dropout disabled."""
    from navillm_tpu.data.loaders import Dataloader as DL
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    llm = NM.L.LlamaConfig.tiny(vocab_size=tok.vocab_size)
    pano = PanoConfig.tiny(output_size=llm.hidden_size,
                           hidden_dropout_prob=0.0)
    cfg = NM.NavModelConfig(llm=llm, pano=pano)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)

    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))

    out = {}
    for dev_mem in (False, True):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                feat_dropout=0.0, device_memory=dev_mem)
        agent = load_agent("r2r", args, world, runner)
        _identity_perm(agent)
        batch = next(iter(DL(ds, 2, shuffle=False)))
        runner.zero_grads()
        loss, traj = agent.rollout(args, "R2R", optim_cfg.Optim, batch,
                                   dataset=ds, feedback="teacher",
                                   train_ml=1.0)
        out[dev_mem] = (loss, runner.take_grads(),
                        [t["path"] for t in traj])
    assert out[True][2] == out[False][2]
    assert out[True][0] == pytest.approx(out[False][0], rel=1e-4)
    for a, b in zip(jax.tree.leaves(out[True][1]),
                    jax.tree.leaves(out[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)

def test_fused_row_compaction_skips_ended_rows(train_args, task_config,
                                               data_dir, det_runner,
                                               optim_cfg, monkeypatch):
    """Rows of ended episodes are dropped from the pano + grad chunks
    (they carry ignoreid targets and zero grads); the number of rows
    fed to pano_navigation_train equals the live-row count, not T*B."""
    args = train_args
    args.image_feat_size = det_runner.cfg.pano.image_feat_size
    args.obj_feat_size = det_runner.cfg.pano.obj_feat_size
    args.fused_rows_per_call = 0     # one chunk: row count == n_live
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(
        det_runner.cfg.pano.image_feat_size))
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    agent = load_agent("r2r", args, world, det_runner)
    _identity_perm(agent)

    rows_seen = []
    orig = NavModelRunner.pano_navigation_train

    def spy(self, pano_inputs, rng, b, targets, coef, need_outputs=True):
        rows_seen.append(len(targets))
        return orig(self, pano_inputs, rng, b, targets, coef, need_outputs)

    monkeypatch.setattr(NavModelRunner, "pano_navigation_train", spy)
    det_runner.zero_grads()
    loss, traj = rollout_teacher_fused(
        agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds, train_ml=1.0)
    det_runner.take_grads()
    assert np.isfinite(float(loss))
    # every row in every chunk corresponds to a live (not-ended) step;
    # with the synthetic grid's short episodes, that is strictly fewer
    # than T*B for at least one trajectory ending before max_action_len
    T = max(len(t["path"]) for t in traj)
    assert sum(rows_seen) <= T * len(traj)
    lens = [len(t["path"]) for t in traj]
    if len(set(lens)) > 1 or min(lens) < 4:
        assert sum(rows_seen) < 4 * len(traj)
