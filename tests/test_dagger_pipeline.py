"""Interleaved (double-buffered) DAgger training pipeline.

`MP3DAgent.rollout_interleaved` splits a sample-feedback training batch
into two streams advanced in lockstep so one stream's host work hides
under the other's dispatched device step. These tests pin its contract:
with near-argmax temperature (so action sampling is order-independent),
the pipelined run must produce the SAME trajectories and matching
loss/gradients as the unsplit single-stream rollout (reference gradient
structure: tasks/agents/mp3d_agent.py's per-step sample-feedback loop).
"""
import dataclasses

import jax
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.mp3d_agent import _split_batch_dict
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
    """Dropout-free runner: parity across execution orders requires the
    device rng draws (consumed in a different interleave order) to be
    inert."""
    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    llm = NM.L.LlamaConfig.tiny(vocab_size=tok.vocab_size)
    pano = PanoConfig.tiny(output_size=llm.hidden_size,
                           hidden_dropout_prob=0.0)
    cfg = NM.NavModelConfig(llm=llm, pano=pano)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    return NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny(),
                          feat_dropout=0.0, device_memory=True)


@pytest.fixture()
def optim_cfg():
    return ConfigDict({"Optim": {
        "train_max_action_len": {"R2R": 4},
        "val_max_action_len": {"R2R": 5},
    }, "Multi": {"LOSS_COEF": {"R2R": 1.0}}})


def _setup(train_args, task_config, data_dir, runner):
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    args.temperature = 1e-8   # near-argmax: sampling order-independent
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("r2r", args, task_config, training=True, source="R2R",
                      world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("r2r", args, world, runner)
    return args, ds, agent


def _grab(runner):
    grads = runner.take_grads()
    return [np.asarray(g) for g in jax.tree.leaves(grads)]


def test_interleaved_matches_sequential_streams(train_args, task_config,
                                                data_dir, det_runner,
                                                optim_cfg):
    """rollout_interleaved == sequentially draining the same streams
    with the same per-stream rngs: identical trajectories, matching
    loss, allclose accumulated grads (fp reordering only). The
    candidate-order permutation and action sampling draw from
    per-stream rngs precisely so the interleave order cannot change
    model inputs."""
    args, ds, agent = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))
    halves = _split_batch_dict(batch)

    det_runner.zero_grads()
    loss_ref, traj_ref = 0.0, []
    for k, h in enumerate(halves):
        gen = agent._rollout_gen(
            args, "R2R", optim_cfg.Optim, h, ds, "sample", 1.0,
            loss_denom=4, np_rng=np.random.RandomState(100 + k))
        while True:
            try:
                next(gen)
            except StopIteration as e:
                loss_ref += float(e.value[0])
                traj_ref.extend(e.value[1])
                break
    grads_ref = _grab(det_runner)

    det_runner.zero_grads()
    loss_pipe, traj_pipe = agent.rollout_interleaved(
        args, "R2R", optim_cfg.Optim, halves, dataset=ds,
        feedback="sample", train_ml=1.0,
        stream_rngs=[np.random.RandomState(100 + k)
                     for k in range(len(halves))])
    loss_pipe = float(loss_pipe)
    grads_pipe = _grab(det_runner)

    assert [t["path"] for t in traj_pipe] == [t["path"] for t in traj_ref]
    assert loss_pipe == pytest.approx(loss_ref, rel=1e-4)
    for a, b in zip(grads_pipe, grads_ref):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_split_full_batch_same_gradient_structure(train_args, task_config,
                                                  data_dir, det_runner,
                                                  optim_cfg):
    """Unsplit vs split-batch training: same trajectories (near-argmax
    sampling; the synthetic episodes' stops are gt-driven) and the same
    loss normalization (full-batch denominator), so the split batch's
    loss lands within the candidate-permutation jitter of the unsplit
    one. The permutation is data augmentation drawn per-stream; exact
    equality is intentionally NOT the contract (reference shuffles
    candidate order per row too)."""
    args, ds, agent = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))

    det_runner.zero_grads()
    loss_full, traj_full = agent.rollout(
        args, "R2R", optim_cfg.Optim, batch, dataset=ds,
        feedback="sample", train_ml=1.0)
    loss_full = float(loss_full)
    g_full = sum(float(np.abs(g).sum()) for g in _grab(det_runner))

    det_runner.zero_grads()
    loss_pipe, traj_pipe = agent.rollout_interleaved(
        args, "R2R", optim_cfg.Optim, _split_batch_dict(batch),
        dataset=ds, feedback="sample", train_ml=1.0)
    loss_pipe = float(loss_pipe)
    g_pipe = sum(float(np.abs(g).sum()) for g in _grab(det_runner))

    assert [t["path"] for t in traj_pipe] == [t["path"] for t in traj_full]
    # same normalization: losses comparable within augmentation jitter
    assert loss_pipe == pytest.approx(loss_full, rel=0.25)
    assert g_pipe == pytest.approx(g_full, rel=0.5)


def test_split_batch_dict_covers_all_rows():
    batch = {"observations": list(range(5)), "env": list(range(5)),
             "item": list(range(5)), "data_type": ["r2r"] * 5,
             "instr_id": list(range(5)), "batch_size": 5,
             "scalar_key": "shared"}
    halves = _split_batch_dict(batch)
    assert [h["batch_size"] for h in halves] == [2, 3]
    assert halves[0]["observations"] + halves[1]["observations"] \
        == batch["observations"]
    assert all(h["scalar_key"] == "shared" for h in halves)


def test_train_routes_sample_batches_through_pipeline(
        train_args, task_config, data_dir, det_runner, optim_cfg,
        monkeypatch):
    """train() on an odd (DAgger) step uses rollout_interleaved when
    dagger_pipeline is on and falls back to rollout() when off."""
    args, ds, agent = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))
    cfg = ConfigDict({"Multi": {"LOSS_COEF": {"R2R": 1.0}},
                      "Optim": optim_cfg.Optim})

    calls = {"interleaved": 0, "plain": 0}
    orig_i = agent.rollout_interleaved
    orig_r = agent.rollout

    def spy_i(*a, **k):
        calls["interleaved"] += 1
        return orig_i(*a, **k)

    def spy_r(*a, **k):
        calls["plain"] += 1
        return orig_r(*a, **k)

    monkeypatch.setattr(agent, "rollout_interleaved", spy_i)
    monkeypatch.setattr(agent, "rollout", spy_r)

    det_runner.zero_grads()
    args.fused_dagger = False   # this test targets the layer below
    args.dagger_pipeline = True
    loss = agent.train("R2R", batch, args, cfg, dataset=ds, step=1)
    assert np.isfinite(float(loss))
    assert calls["interleaved"] == 1 and calls["plain"] == 0
    total = sum(float(np.abs(g).sum()) for g in _grab(det_runner))
    assert total > 0

    det_runner.zero_grads()
    args.dagger_pipeline = False
    loss = agent.train("R2R", batch, args, cfg, dataset=ds, step=1)
    assert np.isfinite(float(loss))
    assert calls["plain"] == 1


def test_train_streams1_is_the_serial_baseline(
        train_args, task_config, data_dir, det_runner, optim_cfg,
        monkeypatch):
    """dagger_streams=1 must actually measure the serial path (plain
    rollout), not be silently coerced to the 2-stream pipeline — the
    --streams 1 bench point is the A/B control for the knob."""
    args, ds, agent = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=4, shuffle=False)))
    cfg = ConfigDict({"Multi": {"LOSS_COEF": {"R2R": 1.0}},
                      "Optim": optim_cfg.Optim})

    calls = {"interleaved": 0, "plain": 0}
    orig_i, orig_r = agent.rollout_interleaved, agent.rollout
    monkeypatch.setattr(agent, "rollout_interleaved",
                        lambda *a, **k: (calls.__setitem__(
                            "interleaved", calls["interleaved"] + 1),
                            orig_i(*a, **k))[1])
    monkeypatch.setattr(agent, "rollout",
                        lambda *a, **k: (calls.__setitem__(
                            "plain", calls["plain"] + 1),
                            orig_r(*a, **k))[1])

    det_runner.zero_grads()
    args.fused_dagger = False   # this test targets the layer below
    args.dagger_pipeline = True
    args.dagger_streams = 1
    loss = agent.train("R2R", batch, args, cfg, dataset=ds, step=1)
    assert np.isfinite(float(loss))
    assert calls["plain"] == 1 and calls["interleaved"] == 0


def test_split_batch_dict_n_streams():
    batch = {"observations": list(range(10)), "env": list(range(10)),
             "item": list(range(10)), "data_type": ["r2r"] * 10,
             "instr_id": list(range(10)), "batch_size": 10}
    for n in (2, 3, 4):
        parts = _split_batch_dict(batch, n)
        assert len(parts) == n
        assert sum(p["batch_size"] for p in parts) == 10
        joined = [o for p in parts for o in p["observations"]]
        assert joined == batch["observations"]
    # degenerate requests clamp instead of emitting empty streams
    assert len(_split_batch_dict(batch, 1)) == 1
    assert len(_split_batch_dict(batch, 99)) == 10


def test_interleaved_three_streams(train_args, task_config, data_dir,
                                   det_runner, optim_cfg):
    """A 3-way interleave still produces valid trajectories and
    nonzero grads — the dagger_streams knob's basic contract."""
    args, ds, agent = _setup(train_args, task_config, data_dir, det_runner)
    batch = next(iter(Dataloader(ds, batch_size=6, shuffle=False)))
    n = len(batch["observations"])
    assert n >= 3
    det_runner.zero_grads()
    loss, traj = agent.rollout_interleaved(
        args, "R2R", optim_cfg.Optim, _split_batch_dict(batch, 3),
        dataset=ds, feedback="sample", train_ml=1.0)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert len(traj) == n
    total = sum(float(np.abs(g).sum()) for g in _grab(det_runner))
    assert total > 0
