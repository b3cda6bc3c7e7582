"""CVDN + SOON end-to-end rollouts; panorama object-fusion path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.agents import load_agent
from navillm_tpu.agents.runner import NavModelRunner, RolloutDims
from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import (SyntheticImageFeaturesDB,
                                         synthetic_object_db)
from navillm_tpu.data.loaders import Dataloader
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.pano_encoder import (PanoConfig, forward_panorama,
                                             init_pano_params)
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
        "train_max_action_len": {"CVDN": 4, "SOON": 4},
        "val_max_action_len": {"CVDN": 5, "SOON": 5}}})


def test_cvdn_rollout_train_and_validate(train_args, task_config, data_dir,
                                         runner, optim_cfg):
    args = train_args
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("cvdn", args, task_config, training=True,
                      source="CVDN", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    agent = load_agent("cvdn", args, world, runner)
    batch = next(iter(Dataloader(ds, 1, shuffle=False)))
    runner.zero_grads()
    loss, traj = agent.rollout(args, "CVDN", optim_cfg.Optim, batch,
                               dataset=ds, feedback="teacher", train_ml=1.0)
    runner.take_grads()
    assert np.isfinite(loss) and loss > 0
    # teacher follows the (trusted) planner path
    flat = [vp for seg in traj[0]["path"] for vp in seg]
    assert flat == batch["item"][0]["path"]

    vds = load_dataset("cvdn", args, task_config, training=False,
                       source="CVDN", world=world)
    vds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size))
    preds = agent.validate_streaming("CVDN", args, optim_cfg,
                                     Dataloader(vds, 1, shuffle=False),
                                     dataset=vds)
    avg, _ = vds.eval_metrics(preds, None, "CVDN")
    assert "dist_to_end_reduction" in avg


def test_soon_rollout_with_og(train_args, task_config, data_dir, runner,
                              optim_cfg):
    args = train_args
    args.enable_og = True
    args.image_feat_size = runner.cfg.pano.image_feat_size
    args.obj_feat_size = runner.cfg.pano.obj_feat_size
    world = WorldModel(str(data_dir / "connectivity"))
    ds = load_dataset("soon", args, task_config, training=False,
                      source="SOON", world=world)
    ds.init_feat_db(SyntheticImageFeaturesDB(runner.cfg.pano.image_feat_size),
                    synthetic_object_db("soon", runner.cfg.pano.obj_feat_size))
    agent = load_agent("soon", args, world, runner)
    preds = agent.validate_streaming("SOON", args, optim_cfg,
                                     Dataloader(ds, 1, shuffle=False),
                                     dataset=ds)
    assert len(preds) == len(ds)
    # SOON OG yields an object direction (normalized heading/elevation)
    p = preds[0]
    assert "pred_obj_direction" in p
    avg, _ = ds.eval_metrics(preds, None, "SOON")
    assert "det_sr" in avg
    args.enable_og = False


def test_pano_fuse_obj_path():
    """fuse_obj=True: object tokens join the encoder sequence; outputs
    keep the pano token slots (reference image_embedding.py:78-94)."""
    cfg = PanoConfig.tiny(output_size=64, use_obj=True, fuse_obj=True)
    params = init_pano_params(jax.random.PRNGKey(0), cfg)
    r = np.random.RandomState(0)
    b, v, o = 2, 8, 3
    out = forward_panorama(
        params, cfg,
        jnp.asarray(r.randn(b, v, cfg.image_feat_size), jnp.float32),
        jnp.asarray([8, 5]),
        loc_fts=jnp.zeros((b, v, cfg.loc_size)),
        nav_types=jnp.ones((b, v), jnp.int32),
        obj_img_fts=jnp.asarray(r.randn(b, o, cfg.obj_feat_size), jnp.float32),
        obj_lens=jnp.asarray([3, 1]),
        obj_loc_fts=jnp.zeros((b, o, cfg.loc_size)))
    assert out["pano_embeds"].shape == (b, v, 64)
    assert out["obj_embeds"].shape == (b, o, 64)
    assert np.isfinite(np.asarray(out["pano_embeds"])).all()
    # masked views zero
    assert float(jnp.abs(out["pano_embeds"][1, 5:]).max()) == 0.0
