"""Vision transformer for offline view-feature extraction (TPU-native).

Replaces the reference's torch EVA02-CLIP-L-14-336 `forward_features`
path used by scripts/data_tools/extract_features_*.py (reference
extract_features_mp3d.py:38-79): batched [N, H, W, 3] images -> [N, D]
view features, fully jitted for the MXU.

Two architecture families behind one config:
  - style="clip": vanilla CLIP ViT (pre-norm, GELU MLP, learned pos
    embeds, CLS pooling) — numerically parity-tested against HF
    CLIPVisionModel (tests/test_vit_parity.py);
  - style="eva02": EVA02 options — SwiGLU FFN with inner sub-LN and 2D
    rotary embeddings on q/k (arXiv:2303.11331), matching the
    EVA02-CLIP visual tower layout for checkpoint conversion.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.pano_encoder import layer_norm
from ..ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    style: str = "clip"            # clip | eva02
    ln_eps: float = 1e-6
    use_cls_token: bool = True
    rope_theta: float = 100.0
    # Pretraining patch grid for rope frequency interpolation (official
    # `pt_seq_len`; positions are arange(grid)/grid*pt_grid). None -> no
    # interpolation (positions are arange(grid)).
    rope_pt_grid: int | None = None
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + (1 if self.use_cls_token else 0)

    @property
    def mlp_dim(self) -> int:
        return int(self.width * self.mlp_ratio)

    @classmethod
    def eva02_clip_l_14_336(cls, **kw) -> "ViTConfig":
        kw.setdefault("style", "eva02")
        kw.setdefault("rope_pt_grid", 16)
        return cls(image_size=336, patch_size=14, width=1024, num_layers=24,
                   num_heads=16, mlp_ratio=4 * 2 / 3, **kw)

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        return cls(image_size=28, patch_size=14, width=64, num_layers=2,
                   num_heads=4, **kw)


def _lin(key, d_in, d_out, dtype):
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * (d_in ** -0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def _ln(d, dtype):
    return {"s": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def init_vit_params(rng: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    w, L = cfg.width, cfg.num_layers
    ks = iter(jax.random.split(rng, 12))
    p: Dict[str, Any] = {
        "patch_embed": _lin(next(ks), cfg.patch_size * cfg.patch_size * 3, w,
                            cfg.dtype),
        "pos_embed": (jax.random.normal(next(ks), (cfg.seq_len, w),
                                        jnp.float32) * 0.02).astype(cfg.dtype),
        "ln_post": _ln(w, cfg.dtype),
    }
    if cfg.style != "eva02":
        # Official EVA-02 towers have no pre-LN (an identity-parameter
        # LayerNorm still normalizes, so it cannot stand in for "absent").
        p["ln_pre"] = _ln(w, cfg.dtype)
    if cfg.use_cls_token:
        p["cls_token"] = jnp.zeros((w,), cfg.dtype)

    def stack(maker):
        outs = [maker(k) for k in jax.random.split(next(ks), L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    layers = {
        "ln1": stack(lambda k: _ln(w, cfg.dtype)),
        "qkv": stack(lambda k: _lin(k, w, 3 * w, cfg.dtype)),
        "proj": stack(lambda k: _lin(k, w, w, cfg.dtype)),
        "ln2": stack(lambda k: _ln(w, cfg.dtype)),
    }
    if cfg.style == "eva02":
        layers.update({
            "attn_ln": stack(lambda k: _ln(w, cfg.dtype)),
            "w1": stack(lambda k: _lin(k, w, cfg.mlp_dim, cfg.dtype)),
            "w2": stack(lambda k: _lin(k, w, cfg.mlp_dim, cfg.dtype)),
            "ffn_ln": stack(lambda k: _ln(cfg.mlp_dim, cfg.dtype)),
            "w3": stack(lambda k: _lin(k, cfg.mlp_dim, w, cfg.dtype)),
        })
    else:
        layers.update({
            "fc1": stack(lambda k: _lin(k, w, cfg.mlp_dim, cfg.dtype)),
            "fc2": stack(lambda k: _lin(k, cfg.mlp_dim, w, cfg.dtype)),
        })
    p["layers"] = layers
    return p


def _rope_2d(cfg: ViTConfig):
    """2D axial rotary tables for patch tokens; identity on CLS.

    Matches the official EVA-02 VisionRotaryEmbeddingFast exactly
    (arXiv:2303.11331; rope dim = head_dim/2 per axis, theta=100,
    lucidrains interleaved-pair layout: each frequency occupies an
    adjacent channel pair, row angles fill the first half of the head
    dim and column angles the second) so converted checkpoints need no
    channel permutation."""
    d = cfg.width // cfg.num_heads
    d4 = d // 4                                    # freqs per axis
    freqs = 1.0 / (cfg.rope_theta
                   ** (jnp.arange(0, d4, dtype=jnp.float32) / d4))
    pos = jnp.arange(cfg.grid, dtype=jnp.float32)
    if cfg.rope_pt_grid is not None:
        # official ft_seq_len interpolation: t = arange(ft)/ft*pt
        pos = pos / cfg.grid * cfg.rope_pt_grid
    ang = pos[:, None] * freqs[None, :]            # [G, d/4]
    ang = jnp.repeat(ang, 2, axis=-1)              # [G, d/2] pairs
    row = jnp.repeat(ang[:, None, :], cfg.grid, 1).reshape(-1, d * 2 // 4)
    col = jnp.repeat(ang[None, :, :], cfg.grid, 0).reshape(-1, d * 2 // 4)
    angles = jnp.concatenate([row, col], -1)       # [G*G, d]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    if cfg.use_cls_token:
        cos = jnp.concatenate([jnp.ones((1, d)), cos], 0)
        sin = jnp.concatenate([jnp.zeros((1, d)), sin], 0)
    return cos, sin


def _apply_rope(x, cos, sin):
    """x: [B, T, N, D]; interleaved-pair rotation (lucidrains
    rotate_half: pair (2i, 2i+1) -> (-x_odd, x_even))."""
    xp = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-xp[..., 1], xp[..., 0]], -1).reshape(x.shape)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + rot * s


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, H/p * W/p, p*p*3]."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def vit_forward_features(params, cfg: ViTConfig, images: jnp.ndarray
                         ) -> jnp.ndarray:
    """[B, H, W, 3] float images -> [B, width] pooled features
    (CLS token after the final LN — the reference's forward_features)."""
    b = images.shape[0]
    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None]
    if cfg.style != "eva02":
        x = layer_norm(x, params["ln_pre"]["s"], params["ln_pre"]["b"],
                       cfg.ln_eps)

    nh = cfg.num_heads
    d = cfg.width // nh
    rope = _rope_2d(cfg) if cfg.style == "eva02" else None

    def block(x, lp):
        b_, t, w_ = x.shape
        y = layer_norm(x, lp["ln1"]["s"], lp["ln1"]["b"], cfg.ln_eps)
        qkv = y @ lp["qkv"]["w"] + lp["qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b_, t, nh, d)
        k = k.reshape(b_, t, nh, d)
        v = v.reshape(b_, t, nh, d)
        if rope is not None:
            q = _apply_rope(q, *rope)
            k = _apply_rope(k, *rope)
        attn = multi_head_attention(q, k, v, causal=False, impl="xla")
        attn = attn.reshape(b_, t, w_)
        if cfg.style == "eva02":
            # sub-LN (Magneto): extra LN on the attention output before
            # the out-projection (official `inner_attn_ln`, subln=True).
            attn = layer_norm(attn, lp["attn_ln"]["s"], lp["attn_ln"]["b"],
                              cfg.ln_eps)
        x = x + attn @ lp["proj"]["w"] + lp["proj"]["b"]
        y = layer_norm(x, lp["ln2"]["s"], lp["ln2"]["b"], cfg.ln_eps)
        if cfg.style == "eva02":
            h = jax.nn.silu(y @ lp["w1"]["w"] + lp["w1"]["b"]) * \
                (y @ lp["w2"]["w"] + lp["w2"]["b"])
            h = layer_norm(h, lp["ffn_ln"]["s"], lp["ffn_ln"]["b"], cfg.ln_eps)
            x = x + h @ lp["w3"]["w"] + lp["w3"]["b"]
        else:
            h = jax.nn.gelu(y @ lp["fc1"]["w"] + lp["fc1"]["b"],
                            approximate=False)
            x = x + h @ lp["fc2"]["w"] + lp["fc2"]["b"]
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    x = layer_norm(x, params["ln_post"]["s"], params["ln_post"]["b"],
                   cfg.ln_eps)
    return x[:, 0] if cfg.use_cls_token else x.mean(axis=1)


def convert_hf_clip_vision(hf_model, cfg: ViTConfig) -> Dict[str, Any]:
    """HF CLIPVisionModel -> our param tree (style='clip')."""
    import numpy as np
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in hf_model.state_dict().items()}
    pre = "vision_model."
    L = cfg.num_layers

    def lin(name):
        return {"w": jnp.asarray(sd[name + ".weight"].T, cfg.dtype),
                "b": jnp.asarray(sd[name + ".bias"], cfg.dtype)}

    def ln(name):
        return {"s": jnp.asarray(sd[name + ".weight"], cfg.dtype),
                "b": jnp.asarray(sd[name + ".bias"], cfg.dtype)}

    def stack(fn):
        outs = [fn(i) for i in range(L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    # conv patch embed [W, 3, p, p] -> [p*p*3, W] matching patchify order
    conv = sd[pre + "embeddings.patch_embedding.weight"]
    w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.width)

    def qkv(i):
        base = pre + f"encoder.layers.{i}.self_attn."
        ws = [sd[base + n + ".weight"].T for n in ("q_proj", "k_proj",
                                                   "v_proj")]
        bs = [sd[base + n + ".bias"] for n in ("q_proj", "k_proj", "v_proj")]
        import numpy as np
        return {"w": jnp.asarray(np.concatenate(ws, 1), cfg.dtype),
                "b": jnp.asarray(np.concatenate(bs, 0), cfg.dtype)}

    return {
        "patch_embed": {"w": jnp.asarray(w, cfg.dtype),
                        "b": jnp.zeros((cfg.width,), cfg.dtype)},
        "cls_token": jnp.asarray(
            sd[pre + "embeddings.class_embedding"], cfg.dtype),
        "pos_embed": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"], cfg.dtype),
        "ln_pre": ln(pre + "pre_layrnorm"),
        "ln_post": ln(pre + "post_layernorm"),
        "layers": {
            "ln1": stack(lambda i: ln(pre + f"encoder.layers.{i}.layer_norm1")),
            "qkv": stack(qkv),
            "proj": stack(lambda i: lin(
                pre + f"encoder.layers.{i}.self_attn.out_proj")),
            "ln2": stack(lambda i: ln(pre + f"encoder.layers.{i}.layer_norm2")),
            "fc1": stack(lambda i: lin(pre + f"encoder.layers.{i}.mlp.fc1")),
            "fc2": stack(lambda i: lin(pre + f"encoder.layers.{i}.mlp.fc2")),
        },
    }


def convert_eva02_clip(state_dict, cfg: ViTConfig) -> Dict[str, Any]:
    """EVA-CLIP `visual.*` state dict -> our param tree (style='eva02').

    Layout follows the official EVA-CLIP release (EVA02-CLIP-L-14-336):
    patch_embed.proj (conv), pos_embed, cls_token, blocks.N.{norm1,
    attn.{q_proj,k_proj,v_proj,proj}, norm2, mlp.{w1,w2,ffn_ln,w3}},
    norm. Numerical validation requires the actual checkpoint (not
    available in this zero-egress image) — layout is kept convertible.
    """
    import numpy as np

    def g(name):
        return np.asarray(state_dict[name])

    L = cfg.num_layers
    conv = g("visual.patch_embed.proj.weight")
    w = conv.transpose(2, 3, 1, 0).reshape(-1, cfg.width)
    bias = state_dict.get("visual.patch_embed.proj.bias")

    def lin(name):
        return {"w": jnp.asarray(g(name + ".weight").T, cfg.dtype),
                "b": jnp.asarray(g(name + ".bias"), cfg.dtype)}

    def ln(name):
        return {"s": jnp.asarray(g(name + ".weight"), cfg.dtype),
                "b": jnp.asarray(g(name + ".bias"), cfg.dtype)}

    def stack(fn):
        outs = [fn(i) for i in range(L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def qkv(i):
        base = f"visual.blocks.{i}.attn."
        ws = [g(base + "q_proj.weight").T, g(base + "k_proj.weight").T,
              g(base + "v_proj.weight").T]
        qb = g(base + "q_bias") if base + "q_bias" in state_dict \
            else g(base + "q_proj.bias")
        vb = g(base + "v_bias") if base + "v_bias" in state_dict \
            else g(base + "v_proj.bias")
        kb = np.zeros_like(qb)
        return {"w": jnp.asarray(np.concatenate(ws, 1), cfg.dtype),
                "b": jnp.asarray(np.concatenate([qb, kb, vb], 0), cfg.dtype)}

    return {
        "patch_embed": {
            "w": jnp.asarray(w, cfg.dtype),
            "b": jnp.asarray(bias, cfg.dtype) if bias is not None
            else jnp.zeros((cfg.width,), cfg.dtype)},
        "cls_token": jnp.asarray(g("visual.cls_token").reshape(-1), cfg.dtype),
        "pos_embed": jnp.asarray(g("visual.pos_embed").reshape(
            cfg.seq_len, cfg.width), cfg.dtype),
        "ln_post": ln("visual.norm"),
        "layers": {
            "ln1": stack(lambda i: ln(f"visual.blocks.{i}.norm1")),
            "qkv": stack(qkv),
            "attn_ln": stack(
                lambda i: ln(f"visual.blocks.{i}.attn.inner_attn_ln")),
            "proj": stack(lambda i: lin(f"visual.blocks.{i}.attn.proj")),
            "ln2": stack(lambda i: ln(f"visual.blocks.{i}.norm2")),
            "w1": stack(lambda i: lin(f"visual.blocks.{i}.mlp.w1")),
            "w2": stack(lambda i: lin(f"visual.blocks.{i}.mlp.w2")),
            "ffn_ln": stack(lambda i: ln(f"visual.blocks.{i}.mlp.ffn_ln")),
            "w3": stack(lambda i: lin(f"visual.blocks.{i}.mlp.w3")),
        },
    }
