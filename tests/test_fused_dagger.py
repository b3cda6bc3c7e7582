"""Fused DAgger (no-grad sampling rollout + one fused loss pass) ==
per-step sample-feedback training, given the same trajectory.

The per-step reference path (reference mp3d_agent.py:593-778) runs a
fwd+bwd at every rollout step and samples the action from that same
forward. The fused path (agents/fused_teacher.rollout_dagger_fused)
splits this: a gradient-free sampling rollout picks the trajectory,
then ONE fused whole-trajectory loss pass computes the gradient. Given
the trajectory, the gradient must be identical (dropout disabled here
so both paths are deterministic); the candidate permutations used by
the loss are the ones the sampling pass drew — the same one-permutation
-per-step pairing the per-step path has.
"""
import jax
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.fused_teacher import rollout_dagger_fused
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


class _ArgmaxRecordingRng:
    """Deterministic 'sampling': identity permutations, argmax choice,
    every chosen action recorded (to replay into the fused path)."""

    def __init__(self):
        self.actions = []

    def permutation(self, x):
        return np.asarray(x)

    def choice(self, n, p=None):
        a = int(np.argmax(p))
        self.actions.append(a)
        return a


class _IdentityRng:
    def permutation(self, x):
        return np.asarray(x)


def _setup(train_args, task_config, data_dir, det_runner):
    args = train_args
    args.image_feat_size = det_runner.cfg.pano.image_feat_size
    args.obj_feat_size = det_runner.cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(
        det_runner.cfg.pano.image_feat_size))
    return args, world, ds


def test_fused_dagger_matches_per_step(train_args, task_config, data_dir,
                                       det_runner, optim_cfg):
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    B = len(batch["observations"])

    # per-step reference path, recording the sampled actions
    a1 = load_agent("r2r", args, world, det_runner)
    rec = _ArgmaxRecordingRng()
    det_runner.zero_grads()
    loss_step, traj_step = a1.rollout(args, "R2R", optim_cfg.Optim, batch,
                                      dataset=ds, feedback="sample",
                                      train_ml=1.0, np_rng=rec)
    grads_step = det_runner.take_grads()
    assert len(rec.actions) % B == 0 and len(rec.actions) > 0
    T = len(rec.actions) // B
    forced = [np.asarray(rec.actions[t * B:(t + 1) * B], np.int64)
              for t in range(T)]

    # fused path replays the identical trajectory (fresh batch: env
    # state was consumed)
    batch2 = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    a2 = load_agent("r2r", args, world, det_runner)
    det_runner.zero_grads()
    loss_fused, traj_fused = rollout_dagger_fused(
        a2, args, "R2R", optim_cfg.Optim, batch2, dataset=ds, train_ml=1.0,
        forced_actions=forced, np_rng=_IdentityRng())
    grads_fused = det_runner.take_grads()

    # identical trajectories
    assert [t["path"] for t in traj_step] == [t["path"] for t in traj_fused]
    # identical total loss
    assert float(loss_fused) == pytest.approx(float(loss_step), rel=1e-4), \
        (float(loss_step), float(loss_fused))
    # identical accumulated gradients
    for s, f in zip(jax.tree.leaves(grads_step), jax.tree.leaves(grads_fused)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(s), rtol=2e-3,
                                   atol=2e-5)


def test_fused_dagger_device_memory_matches_host(train_args, task_config,
                                                 data_dir, optim_cfg):
    """Sampling rollout on the device-memory eval path == the host-
    arrays fallback (loss, accumulated gradients, trajectories), given
    the same forced trajectory. Keeps the `use_mem=False` branch of
    rollout_dagger_fused covered now that device memory is the
    default."""
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

    # record a deterministic (argmax) trajectory on the host path, then
    # replay it into both paths via forced_actions
    rec = _ArgmaxRecordingRng()
    runner0 = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                             feat_dropout=0.0, device_memory=False)
    agent0 = load_agent("r2r", args, world, runner0)
    batch0 = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    runner0.zero_grads()
    rollout_dagger_fused(agent0, args, "R2R", optim_cfg.Optim, batch0,
                         dataset=ds, train_ml=1.0, np_rng=rec)
    runner0.take_grads()
    B = 2
    assert len(rec.actions) % B == 0 and len(rec.actions) > 0
    T = len(rec.actions) // B
    forced = [np.asarray(rec.actions[t * B:(t + 1) * B], np.int64)
              for t in range(T)]

    out = {}
    for dev_mem in (False, True):
        runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                                feat_dropout=0.0, device_memory=dev_mem)
        agent = load_agent("r2r", args, world, runner)
        batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
        runner.zero_grads()
        loss, traj = rollout_dagger_fused(
            agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds,
            train_ml=1.0, forced_actions=forced, np_rng=_IdentityRng())
        out[dev_mem] = (float(loss), runner.take_grads(),
                        [t["path"] for t in traj])
    assert out[True][2] == out[False][2]
    assert out[True][0] == pytest.approx(out[False][0], rel=1e-4)
    for a, b in zip(jax.tree.leaves(out[True][1]),
                    jax.tree.leaves(out[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_fused_dagger_samples_without_gradients(train_args, task_config,
                                                data_dir, det_runner,
                                                optim_cfg, monkeypatch):
    """The sampling rollout is gradient-free: the ONLY grad-producing
    device calls are the fused chunks (pano_navigation_train), never a
    per-step train call — and inference forwards run per step."""
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    agent = load_agent("r2r", args, world, det_runner)
    agent.np_rng = np.random.RandomState(7)

    calls = {"grad_chunks": 0, "per_step_train": 0, "infer": 0}
    orig_fused = NavModelRunner.pano_navigation_train
    orig_mem = NavModelRunner.pano_mem_navigation_train
    orig_nav = NavModelRunner.navigation
    orig_eval = NavModelRunner.eval_step
    orig_eval_cached = NavModelRunner.eval_step_cached
    orig_eval_q = NavModelRunner.eval_step_q
    orig_eval_cached_q = NavModelRunner.eval_step_cached_q

    def spy_fused(self, *a, **k):
        calls["grad_chunks"] += 1
        return orig_fused(self, *a, **k)

    def spy_mem(self, *a, **k):
        calls["per_step_train"] += 1
        return orig_mem(self, *a, **k)

    def spy_nav(self, b, targets=None, coef=1.0, train=False):
        if train:
            calls["per_step_train"] += 1
        else:
            calls["infer"] += 1
        return orig_nav(self, b, targets=targets, coef=coef, train=train)

    def spy_eval(self, *a, **k):
        calls["infer"] += 1          # fused no-grad eval step (mem path)
        return orig_eval(self, *a, **k)

    def spy_eval_cached(self, *a, **k):
        calls["infer"] += 1          # prefix-cached no-grad eval step
        return orig_eval_cached(self, *a, **k)

    def spy_eval_q(self, *a, **k):
        calls["infer"] += 1          # int8 sampling-policy eval step
        return orig_eval_q(self, *a, **k)

    def spy_eval_cached_q(self, *a, **k):
        calls["infer"] += 1
        return orig_eval_cached_q(self, *a, **k)

    monkeypatch.setattr(NavModelRunner, "pano_navigation_train", spy_fused)
    monkeypatch.setattr(NavModelRunner, "pano_mem_navigation_train", spy_mem)
    monkeypatch.setattr(NavModelRunner, "navigation", spy_nav)
    monkeypatch.setattr(NavModelRunner, "eval_step", spy_eval)
    monkeypatch.setattr(NavModelRunner, "eval_step_cached", spy_eval_cached)
    monkeypatch.setattr(NavModelRunner, "eval_step_q", spy_eval_q)
    monkeypatch.setattr(NavModelRunner, "eval_step_cached_q",
                        spy_eval_cached_q)

    det_runner.zero_grads()
    loss, traj = rollout_dagger_fused(
        agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds, train_ml=1.0)
    grads = det_runner.take_grads()
    assert np.isfinite(float(loss))
    assert calls["per_step_train"] == 0
    assert calls["grad_chunks"] >= 1
    assert calls["infer"] >= 1          # one policy forward per step
    assert sum(float(np.abs(g).sum()) for g in jax.tree.leaves(grads)) > 0
    assert all(len(t["path"]) >= 1 for t in traj)


def test_train_routes_dagger_through_fused(train_args, task_config, data_dir,
                                           det_runner, optim_cfg,
                                           monkeypatch):
    """train() on an odd (DAgger) step dispatches to the fused path when
    args.fused_dagger is on (the default)."""
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    agent = load_agent("r2r", args, world, det_runner)
    cfg = ConfigDict({"Multi": {"LOSS_COEF": {"R2R": 1.0}},
                      "Optim": optim_cfg.Optim})

    import navillm_tpu.agents.fused_teacher as FT
    calls = {"fused": 0}
    orig = FT.rollout_dagger_fused

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(FT, "rollout_dagger_fused", spy)
    args.fused_dagger = True
    det_runner.zero_grads()
    loss = agent.train("R2R", batch, args, cfg, dataset=ds, step=1)
    det_runner.take_grads()
    assert np.isfinite(float(loss))
    assert calls["fused"] == 1


def test_fused_dagger_groups_match_single_group(train_args, task_config,
                                                data_dir, det_runner,
                                                optim_cfg):
    """Pipelined slot groups (dagger_streams=2) == the serial single
    group, given the same forced trajectory: identical trajectories,
    loss, and accumulated gradients. The scheduler only reorders WHEN
    host work runs; episodes are disjoint and the per-group fused loss
    passes sum with the batch-level denominator."""
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)

    # record a trajectory at B=4 (two groups of 2) on the per-step path
    # (host-side sampling, so the recording rng actually sees the draws)
    rec = _ArgmaxRecordingRng()
    a0 = load_agent("r2r", args, world, det_runner)
    batch0 = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))
    B = len(batch0["observations"])
    assert B == 4
    det_runner.zero_grads()
    a0.rollout(args, "R2R", optim_cfg.Optim, batch0, dataset=ds,
               feedback="sample", train_ml=1.0, np_rng=rec)
    det_runner.take_grads()
    T = len(rec.actions) // B
    forced = [np.asarray(rec.actions[t * B:(t + 1) * B], np.int64)
              for t in range(T)]

    out = {}
    for streams in (1, 2):
        args.dagger_streams = streams
        agent = load_agent("r2r", args, world, det_runner)
        batch = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))
        det_runner.zero_grads()
        loss, traj = rollout_dagger_fused(
            agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds,
            train_ml=1.0, forced_actions=forced, np_rng=_IdentityRng())
        out[streams] = (float(loss), det_runner.take_grads(),
                        [t["path"] for t in traj])
    assert out[1][2] == out[2][2]
    assert out[2][0] == pytest.approx(out[1][0], rel=1e-4)
    for a, b in zip(jax.tree.leaves(out[1][1]), jax.tree.leaves(out[2][1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=2e-5)


def test_fused_dagger_mid_batch_cache_bailout(train_args, task_config,
                                              data_dir, det_runner,
                                              optim_cfg, monkeypatch):
    """VERDICT r4 #6: when a prompt outgrows the prefix-cache budget
    MID-BATCH, _cached_prompt_windows raises and the rest of the batch
    falls back to full-prompt stepping (fused_teacher RuntimeError
    branch). The fallback must preserve the reference's per-step
    semantics: trajectory + loss + gradients equal the never-cached
    run, and the cache buffer is handed back to the pool (advisor r4)
    instead of being dropped."""
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)
    args.dagger_streams = 1

    # record the trajectory once on the per-step path (host-side
    # sampling) to force into every run
    rec = _ArgmaxRecordingRng()
    a0 = load_agent("r2r", args, world, det_runner)
    batch0 = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    B = len(batch0["observations"])
    det_runner.zero_grads()
    a0.rollout(args, "R2R", optim_cfg.Optim, batch0, dataset=ds,
               feedback="sample", train_ml=1.0, np_rng=rec)
    det_runner.take_grads()
    T = len(rec.actions) // B
    forced = [np.asarray(rec.actions[t * B:(t + 1) * B], np.int64)
              for t in range(T)]

    def run(prefix_cache: bool, bailout_at=None):
        args.dagger_prefix_cache = prefix_cache
        agent = load_agent("r2r", args, world, det_runner)
        if bailout_at is not None:
            from navillm_tpu.agents.mp3d_agent import MP3DAgent
            orig = MP3DAgent._cached_prompt_windows
            calls = {"n": 0}

            def boom(self, *a, **k):
                calls["n"] += 1
                if calls["n"] == bailout_at:
                    # what a prompt outgrowing max_prefix raises
                    raise RuntimeError("prompt outgrew cache budget")
                return orig(self, *a, **k)

            monkeypatch.setattr(MP3DAgent, "_cached_prompt_windows", boom)
        batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
        det_runner.zero_grads()
        loss, traj = rollout_dagger_fused(
            agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds,
            train_ml=1.0, forced_actions=forced, np_rng=_IdentityRng())
        grads = det_runner.take_grads()
        if bailout_at is not None:
            monkeypatch.setattr(MP3DAgent, "_cached_prompt_windows", orig)
            assert calls["n"] == bailout_at   # the bailout actually fired
            # advisor r4: the overflow fallback must RETAIN the buffer
            pool = getattr(agent, "_dagger_cache_pool", [])
            assert len(pool) >= 1
        return float(loss), grads, [t["path"] for t in traj]

    never_cached = run(False)
    # bail out on the SECOND step: step 0 runs cached (prefill + cached
    # eval step), step 1 raises mid-batch and the rest falls back
    bailed = run(True, bailout_at=2)
    assert bailed[2] == never_cached[2]
    assert bailed[0] == pytest.approx(never_cached[0], rel=1e-4)
    for a, b in zip(jax.tree.leaves(never_cached[1]),
                    jax.tree.leaves(bailed[1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=2e-5)


def test_quant_sampling_policy(train_args, task_config, data_dir,
                               det_runner, optim_cfg):
    """W8A8 sampling policy (r5): given the same forced trajectory,
    dagger_sample_quant on/off produce identical loss, gradients, and
    paths — the int8 policy only changes which actions get SAMPLED,
    never the bf16 fused loss pass. Unforced, the quantized path must
    still produce valid trajectories and nonzero gradients."""
    args, world, ds = _setup(train_args, task_config, data_dir, det_runner)
    args.dagger_streams = 1

    rec = _ArgmaxRecordingRng()
    a0 = load_agent("r2r", args, world, det_runner)
    batch0 = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    B = len(batch0["observations"])
    det_runner.zero_grads()
    a0.rollout(args, "R2R", optim_cfg.Optim, batch0, dataset=ds,
               feedback="sample", train_ml=1.0, np_rng=rec)
    det_runner.take_grads()
    T = len(rec.actions) // B
    forced = [np.asarray(rec.actions[t * B:(t + 1) * B], np.int64)
              for t in range(T)]

    out = {}
    for quant in (False, True):
        args.dagger_sample_quant = quant
        agent = load_agent("r2r", args, world, det_runner)
        batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
        det_runner.zero_grads()
        loss, traj = rollout_dagger_fused(
            agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds,
            train_ml=1.0, forced_actions=forced, np_rng=_IdentityRng())
        out[quant] = (float(loss), det_runner.take_grads(),
                      [t["path"] for t in traj])
    assert out[True][2] == out[False][2]
    assert out[True][0] == pytest.approx(out[False][0], rel=1e-4)
    for a, b in zip(jax.tree.leaves(out[False][1]),
                    jax.tree.leaves(out[True][1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=2e-5)

    # unforced smoke on the quantized path: valid trajectory, real grads
    args.dagger_sample_quant = True
    agent = load_agent("r2r", args, world, det_runner)
    agent.np_rng = np.random.RandomState(3)
    batch = next(iter(Dataloader(ds, batch_size=2, shuffle=False)))
    det_runner.zero_grads()
    loss, traj = rollout_dagger_fused(
        agent, args, "R2R", optim_cfg.Optim, batch, dataset=ds,
        train_ml=1.0)
    grads = det_runner.take_grads()
    assert np.isfinite(float(loss))
    assert all(len(t["path"]) >= 1 for t in traj)
    assert sum(float(np.abs(g).sum())
               for g in jax.tree.leaves(grads)) > 0
