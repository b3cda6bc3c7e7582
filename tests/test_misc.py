"""Odds and ends: METEOR gating, sampling decode, CLI flags, fused CVDN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.eval.captioning import Meteor
from navillm_tpu.models import llama as L
from navillm_tpu.models.decoding import decode_to_text, generate
from navillm_tpu.models.tokenization import NavTokenizer
from navillm_tpu.utils.config import build_arg_parser


def test_meteor_gated():
    m = Meteor()
    if not m.available():
        with pytest.raises(RuntimeError):
            m.compute_score({"a": ["x"]}, {"a": ["x"]})


def test_sampling_decode_respects_temperature():
    cfg = L.LlamaConfig.tiny(vocab_size=128)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 100, (2, 8)),
                      jnp.int32)
    mask = jnp.ones((2, 8), bool)
    greedy = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                      max_new_tokens=6)
    # T->0 sampling converges to greedy
    cold = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                    max_new_tokens=6, do_sample=True, temperature=1e-4,
                    rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(cold))
    # hot sampling with different seeds diverges (overwhelmingly likely)
    hot1 = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                    max_new_tokens=6, do_sample=True, temperature=5.0,
                    rng=jax.random.PRNGKey(2))
    hot2 = generate(params, cfg, ids, mask, eos_id=-1, pad_id=0,
                    max_new_tokens=6, do_sample=True, temperature=5.0,
                    rng=jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(hot1), np.asarray(hot2))


def test_decode_to_text_strips_eos_and_pad():
    tok = NavTokenizer()
    ids = np.array([[tok.encode("hi", add_bos=False)[0], tok.eos_id,
                     tok.pad_id, tok.pad_id]])
    out = decode_to_text(tok, ids)
    assert out[0] == "h"


def test_cli_boolean_optional_flags():
    p = build_arg_parser()
    ns = p.parse_args(["--cfg_file", "x", "--no-streaming_eval",
                       "--no-fused_teacher", "--enable_og"])
    assert ns.streaming_eval is False
    assert ns.fused_teacher is False
    assert ns.enable_og is True
    ns2 = p.parse_args(["--cfg_file", "x"])
    assert ns2.streaming_eval is True and ns2.fused_teacher is True


def test_fused_teacher_cvdn(train_args, task_config, data_dir):
    """Fused path on a non-R2R task (greedy expert, dialog prompts)."""
    from navillm_tpu.agents import load_agent
    from navillm_tpu.agents.fused_teacher import rollout_teacher_fused
    from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
    from navillm_tpu.data.datasets import load_dataset
    from navillm_tpu.data.feature_db import SyntheticImageFeaturesDB
    from navillm_tpu.data.loaders import Dataloader
    from navillm_tpu.models import nav_model as NM
    from navillm_tpu.sim import WorldModel
    from navillm_tpu.utils.config import ConfigDict

    tok = NavTokenizer(max_length=2048, pad_to_multiple=128)
    cfg = NM.NavModelConfig.tiny(vocab_size=tok.vocab_size)
    params = NM.init_nav_params(jax.random.PRNGKey(0), cfg)
    runner = NavModelRunner(cfg, params, tok, dims=RolloutDims.tiny())
    args = train_args
    args.image_feat_size = cfg.pano.image_feat_size
    args.obj_feat_size = cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("cvdn", args, task_config, training=True,
                      source="CVDN", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(cfg.pano.image_feat_size))
    agent = load_agent("cvdn", args, world, runner)
    optim = ConfigDict({"train_max_action_len": {"CVDN": 4},
                        "val_max_action_len": {"CVDN": 4}})
    batch = next(iter(Dataloader(ds, 1, shuffle=False)))
    runner.zero_grads()
    loss, traj = rollout_teacher_fused(agent, args, "CVDN", optim, batch,
                                       dataset=ds, train_ml=1.0)
    runner.take_grads()
    assert np.isfinite(loss) and loss > 0
    flat = [vp for seg in traj[0]["path"] for vp in seg]
    assert flat == batch["item"][0]["path"]
