"""Shipped config files: structure and stage arithmetic."""
from pathlib import Path

import pytest

from navillm_tpu.utils.config import TrainArgs, load_yaml_config

CONFIG_DIR = Path(__file__).parents[1] / "configs"
ALL_CONFIGS = sorted(CONFIG_DIR.rglob("*.yaml"))


def test_configs_exist():
    names = {p.name for p in ALL_CONFIGS}
    assert "multi.yaml" in names
    assert {"held_out_cvdn.yaml", "held_out_reverie.yaml",
            "held_out_soon.yaml"} <= names
    assert {"cvdn.yaml", "reverie.yaml", "soon.yaml", "scanqa.yaml",
            "fgr2r.yaml"} <= names


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: str(
    p.relative_to(CONFIG_DIR)))
def test_config_structure(path):
    cfg = load_yaml_config(path)
    assert "Feature" in cfg and "Dataset" in cfg and "Multi" in cfg
    assert cfg.Feature.image_feat_size == 1024
    assert cfg.Feature.angle_feat_size == 4
    # stage mixtures are consistent
    for stage in ("Pretrain", "Multi"):
        if stage not in cfg:
            continue
        sources = cfg[stage].SOURCE
        ratios = cfg[stage].get("Ratio", [1] * len(sources))
        assert len(sources) == len(ratios)
        for src in sources:
            assert src in cfg.Dataset, f"{src} missing from Dataset in {path}"
    # action-length tables cover the navigation sources
    for src in cfg.Multi.SOURCE:
        if src in ("ScanQA", "LLaVA"):
            continue
        assert src in cfg.Optim.train_max_action_len, (path, src)
        assert src in cfg.Optim.val_max_action_len, (path, src)


def test_args_sync_from_multi():
    cfg = load_yaml_config(CONFIG_DIR / "multi.yaml")
    args = TrainArgs().sync_from_config(cfg)
    assert args.image_feat_size == 1024
    assert args.num_pano_layers == 2
    assert args.enc_full_graph is True
    assert args.expert_policy == "spl"
