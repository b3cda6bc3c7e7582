"""ViT parity vs HF CLIPVisionModel + eva02-path sanity."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from navillm_tpu.vision.vit import (ViTConfig, convert_hf_clip_vision,
                                    init_vit_params, vit_forward_features)


def test_clip_vit_parity_with_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    hf_cfg = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=28, patch_size=14,
                              layer_norm_eps=1e-6, hidden_act="gelu")
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = ViTConfig(image_size=28, patch_size=14, width=64, num_layers=2,
                    num_heads=4, mlp_ratio=2.0, style="clip", ln_eps=1e-6)
    params = convert_hf_clip_vision(hf, cfg)

    rng = np.random.RandomState(0)
    imgs = rng.randn(3, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        # HF expects NCHW
        out = hf(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)))
        # forward_features analogue: post-LN CLS
        ref = out.pooler_output.numpy()
    got = np.asarray(vit_forward_features(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_eva02_style_runs_and_differs_from_clip():
    cfg = ViTConfig.tiny(style="eva02", mlp_ratio=8 / 3)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.RandomState(1).randn(2, 28, 28, 3),
                       jnp.float32)
    out = vit_forward_features(params, cfg, imgs)
    assert out.shape == (2, cfg.width)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_extraction_is_consistent():
    """Feature of an image must not depend on its batch companions."""
    cfg = ViTConfig.tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(4, 28, 28, 3), jnp.float32)
    full = np.asarray(vit_forward_features(params, cfg, imgs))
    solo = np.asarray(vit_forward_features(params, cfg, imgs[2:3]))
    np.testing.assert_allclose(full[2:3], solo, rtol=1e-4, atol=1e-5)
