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
