"""Numerical parity against the REFERENCE'S OWN torch modules.

Feeds identical seeded inputs through /root/reference's modules and our
JAX stack with converted weights, and requires agreement:

  - panorama embeddings: reference models/image_embedding.py:51-121
    (ImageEmbeddings.forward_panorama_per_step) vs forward_panorama;
  - full navigation forward (fusion + visited masking + backtrack dedup
    + candidate injection + LLM + logit scatter): reference
    models/nav_model.py:129-248 (with a tiny random HF Llama) vs
    forward_navigation;
  - generation LM loss with soft-token injection + special-token logit
    masking: reference models/modified_lm.py:89-146 vs
    forward_generation_loss.

The reference model code runs UNMODIFIED except for two injected seams:
torch.randperm -> identity (candidate permutation is an explicit input
on our side) and ModifiedLM.tokenize -> our NavTokenizer (the reference
tokenizer needs Vicuna files; tokenization must be identical on both
sides for logits to be comparable).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")
if str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

import jax
import jax.numpy as jnp

from navillm_tpu.agents import prompts as P
from navillm_tpu.models import llama as L
from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.convert import config_from_hf, convert_hf_llama
from navillm_tpu.models.pano_encoder import PanoConfig, forward_panorama, init_pano_params
from navillm_tpu.models.tokenization import NavTokenizer

H = 64


def _vis_cfg(output_size=H):
    return types.SimpleNamespace(
        hidden_size=H, num_attention_heads=4, intermediate_size=128,
        hidden_dropout_prob=0.0, hidden_act="gelu", image_feat_size=32,
        angle_feat_size=4, obj_feat_size=16, obj_loc_size=3,
        num_pano_layers=2, output_size=output_size, max_action_steps=100,
        type_vocab_size=3)


def _t2n(t):
    return t.detach().cpu().numpy()


def _lin(mod):
    return {"w": jnp.asarray(_t2n(mod.weight).T), "b": jnp.asarray(_t2n(mod.bias))}


def _ln(mod):
    return {"s": jnp.asarray(_t2n(mod.weight)), "b": jnp.asarray(_t2n(mod.bias))}


def _mlp_ln(seq):
    lin, ln = seq[0], seq[1]
    return {"w": jnp.asarray(_t2n(lin.weight).T),
            "b": jnp.asarray(_t2n(lin.bias)),
            "ln_s": jnp.asarray(_t2n(ln.weight)),
            "ln_b": jnp.asarray(_t2n(ln.bias))}


def _convert_pano(ref, n_layers):
    """Reference ImageEmbeddings state -> our pano params pytree."""
    def stacked(get):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[get(ref.pano_encoder.layers[l])
                              for l in range(n_layers)])
    p = {
        "img_linear": _lin(ref.img_linear), "img_ln": _ln(ref.img_layer_norm),
        "loc_linear": _lin(ref.loc_linear), "loc_ln": _ln(ref.loc_layer_norm),
        "nav_type_emb": jnp.asarray(_t2n(ref.nav_type_embedding.weight)),
        "ln": _ln(ref.layer_norm),
        "mapper": _lin(ref.mapper),
        "encoder": stacked(lambda lay: {
            "ln1": _ln(lay.norm1),
            "qkv": {"w": jnp.asarray(_t2n(lay.self_attn.in_proj_weight).T),
                    "b": jnp.asarray(_t2n(lay.self_attn.in_proj_bias))},
            "out": _lin(lay.self_attn.out_proj),
            "ln2": _ln(lay.norm2),
            "ffn1": _lin(lay.linear1),
            "ffn2": _lin(lay.linear2),
        }),
        "encoder_norm": _ln(ref.pano_encoder.norm),
    }
    if getattr(ref, "obj_projector", None) is not None:
        p["obj_projector"] = _lin(ref.obj_projector[0])
        p["obj_projector_ln"] = _ln(ref.obj_projector[1])
    return p


def test_pano_parity():
    """forward_panorama == reference forward_panorama_per_step."""
    from models.image_embedding import ImageEmbeddings

    cfgns = _vis_cfg()
    torch.manual_seed(0)
    ref = ImageEmbeddings(cfgns, use_obj=True, fuse_obj=False).eval()

    cfg = PanoConfig.tiny(output_size=H, hidden_dropout_prob=0.0,
                          use_obj=True)
    params = _convert_pano(ref, cfg.num_pano_layers)

    rng = np.random.RandomState(0)
    b, v, o = 3, 10, 4
    view = rng.randn(b, v, cfgns.image_feat_size).astype(np.float32)
    lens = np.array([10, 7, 5], np.int64)
    loc = rng.randn(b, v, 7).astype(np.float32)
    navt = (rng.rand(b, v) < 0.5).astype(np.int64)
    obj = rng.randn(b, o, cfgns.obj_feat_size).astype(np.float32)
    obj_lens = np.array([4, 2, 0], np.int64)
    obj_loc = rng.randn(b, o, 7).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.forward_panorama_per_step(
            torch.tensor(view), torch.tensor(lens), torch.tensor(loc),
            torch.tensor(navt), torch.tensor(obj), torch.tensor(obj_lens),
            torch.tensor(obj_loc))

    out = forward_panorama(params, cfg, jnp.asarray(view),
                           jnp.asarray(lens, jnp.int32),
                           loc_fts=jnp.asarray(loc),
                           nav_types=jnp.asarray(navt, jnp.int32),
                           obj_img_fts=jnp.asarray(obj),
                           obj_lens=jnp.asarray(obj_lens, jnp.int32),
                           obj_loc_fts=jnp.asarray(obj_loc),
                           deterministic=True)

    np.testing.assert_array_equal(np.asarray(out["pano_masks"]),
                                  _t2n(out_ref["pano_masks"]))
    np.testing.assert_allclose(np.asarray(out["pano_embeds"]),
                               _t2n(out_ref["pano_embeds"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["obj_embeds"]) * np.asarray(out["obj_masks"])[..., None],
        _t2n(out_ref["obj_embeds"]) * _t2n(out_ref["obj_masks"])[..., None],
        rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------- #
# Full navigation-forward parity (fusion + LLM + scatter)
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def nav_stacks():
    """(reference NavModel w/ tiny HF Llama, our params, our cfg, tok)."""
    from models.nav_model import NavModel
    from models.modified_lm import ModifiedLlamaForCausalLM

    tok = NavTokenizer(max_length=1024, pad_to_multiple=64)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=tok.vocab_size, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=1024, rms_norm_eps=1e-6, rope_theta=10000.0)
    torch.manual_seed(1)
    extra = types.SimpleNamespace(precision="fp32")
    lang = ModifiedLlamaForCausalLM(hf_cfg, extra).eval()
    # tokenizer seam: same special ids as our NavTokenizer; alignment
    # rows beyond the true vocab masked on both sides
    lang.cand_token_id = [tok.cand_id]
    lang.hist_token_id = [tok.hist_id]
    lang.obj_token_id = [tok.obj_id]
    lang.cls_token_id = list(tok.cls_ids)
    lang.special_token_ids = (
        list(tok.special_token_ids)
        + list(range(tok.true_vocab_size, tok.vocab_size)))

    def tokenize(texts, add_special_tokens=True):
        tb = tok(texts)
        return transformers.BatchEncoding({
            "input_ids": torch.tensor(tb.input_ids.astype(np.int64)),
            "attention_mask": torch.tensor(
                tb.attention_mask.astype(np.int64))})
    lang.tokenize = tokenize

    nm = NavModel.__new__(NavModel)
    torch.nn.Module.__init__(nm)
    torch.manual_seed(2)
    nm.config = _vis_cfg()
    nm.lang_model = lang
    nm.hidden_size = H
    nm.model_type = torch.float32
    nm.token_type_embeddings = torch.nn.Embedding(3, H)
    nm.gmap_pos_embeddings = torch.nn.Sequential(
        torch.nn.Linear(7, H), torch.nn.LayerNorm(H, eps=1e-12))
    nm.gmap_step_embeddings = torch.nn.Embedding(100, H)
    nm.vp_pos_embeddings = torch.nn.Sequential(
        torch.nn.Linear(14, H), torch.nn.LayerNorm(H, eps=1e-12))
    nm.obj_pos_embeddings = torch.nn.Sequential(
        torch.nn.Linear(7, H), torch.nn.LayerNorm(H, eps=1e-12))
    nm.out_head = torch.nn.Sequential(torch.nn.Linear(H, 100))
    nm.eval()

    llm_cfg = config_from_hf(hf_cfg, dtype=jnp.float32)
    llm_cfg = L.LlamaConfig(**{**llm_cfg.__dict__, "remat": False})
    cfg = NM.NavModelConfig(
        llm=llm_cfg, pano=PanoConfig.tiny(output_size=H,
                                          hidden_dropout_prob=0.0))
    params = {
        "llm": convert_hf_llama(lang, llm_cfg),
        "pano": init_pano_params(jax.random.PRNGKey(0), cfg.pano),
        "token_type_emb": jnp.asarray(_t2n(nm.token_type_embeddings.weight)),
        "gmap_pos": _mlp_ln(nm.gmap_pos_embeddings),
        "gmap_step_emb": jnp.asarray(_t2n(nm.gmap_step_embeddings.weight)),
        "vp_pos": _mlp_ln(nm.vp_pos_embeddings),
        "obj_pos": _mlp_ln(nm.obj_pos_embeddings),
        "out_head": _lin(nm.out_head[0]),
    }
    return nm, params, cfg, tok


def test_navigation_forward_parity(nav_stacks, monkeypatch):
    """Reference forward_navigation (nav_model.py:129-248) == ours:
    same weights, same inputs, identity candidate permutation."""
    nm, params, cfg, tok = nav_stacks
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **kw: torch.arange(n))

    rng = np.random.RandomState(3)
    B, G, V, Hh = 2, 6, 5, 3
    gmap_img = rng.randn(B, G, H).astype(np.float32)
    gmap_step = rng.randint(0, 20, (B, G)).astype(np.int64)
    gmap_pos = rng.randn(B, G, 7).astype(np.float32)
    gmap_masks = np.zeros((B, G), bool)
    gmap_masks[0, :5] = True
    gmap_masks[1, :4] = True
    visited = np.zeros((B, G), bool)
    visited[0, 1] = True
    visited[1, 1] = True
    visited[1, 2] = True
    gmap_vpids = [[None, "a", "b", "c", "d", None],
                  [None, "p", "q", "r", None, None]]

    # local branch: stop + 4 views; includes a visited vpid ("a") and a
    # vpid absent from the gmap ("x") to exercise dedup branches
    vp_img = rng.randn(B, V, H).astype(np.float32)
    vp_img[:, 0] = 0.0
    vp_pos = rng.randn(B, V, 14).astype(np.float32)
    pano_masks = np.zeros((B, V), bool)
    pano_masks[0, :5] = True
    pano_masks[1, :4] = True
    vp_cand_vpids = [[None, "a", "b", "x", "c"],
                     [None, "q", "r", None, None]]

    hist_vis_np = [rng.randn(2, H).astype(np.float32),
                   rng.randn(1, H).astype(np.float32)]
    history = [["<hist>"] * 2, ["<hist>"]]
    instructions = ["walk to the red chair", "find the kitchen"]

    # candidate counts: unvisited masked non-stop slots, slot order
    cand_slots = [[k for k in range(G) if k > 0 and gmap_masks[i, k]
                   and not visited[i, k]] for i in range(B)]
    prompts = [P.navigation_prompt(
        "r2r", instruction=instructions[i], hist_num=len(history[i]),
        cand_num=len(cand_slots[i]) + 1, cls_token="<cls_1>")
        for i in range(B)]

    ref_batch = {
        "data_type": ["r2r"] * B,
        "vp_img_embeds": torch.tensor(vp_img),
        "gmap_img_embeds": torch.tensor(gmap_img),
        "gmap_step_ids": torch.tensor(gmap_step),
        "gmap_pos_fts": torch.tensor(gmap_pos),
        "gmap_masks": torch.tensor(gmap_masks),
        "gmap_pair_dists": None,
        "gmap_visited_masks": torch.tensor(visited),
        "gmap_vpids": gmap_vpids,
        "vp_pos_fts": torch.tensor(vp_pos),
        "vp_nav_masks": None,
        "vp_cand_vpids": vp_cand_vpids,
        "pano_masks": torch.tensor(pano_masks),
        "instruction": instructions,
        "history": history,
        "hist_vis": [[torch.tensor(v) for v in hv] for hv in hist_vis_np],
        "prompts": prompts,
    }
    with torch.no_grad():
        out_ref = nm.forward("navigation", ref_batch)

    # ---- our fixed-shape batch ----
    C = 8
    tb = tok(prompts)
    ids = tb.input_ids
    cand_positions = np.full((B, C), -1, np.int32)
    hist_positions = np.full((B, Hh), -1, np.int32)
    cls_pos = np.zeros((B,), np.int32)
    for i in range(B):
        cpos = np.where(ids[i] == tok.cand_id)[0]
        cand_positions[i, :len(cpos)] = cpos
        hpos = np.where(ids[i] == tok.hist_id)[0]
        hist_positions[i, :len(hpos)] = hpos
        cls_pos[i] = np.where(ids[i] == tok.cls_ids[0])[0][-1]
    cand_order = np.full((B, C), -1, np.int32)
    for i in range(B):
        cand_order[i, :len(cand_slots[i])] = cand_slots[i]
    hist_embeds = np.zeros((B, Hh, H), np.float32)
    for i, hv in enumerate(hist_vis_np):
        hist_embeds[i, :len(hv)] = hv
    match = np.full((B, V), -1, np.int32)
    for i in range(B):
        idx = {vp: k for k, vp in enumerate(gmap_vpids[i]) if vp}
        for j, vp in enumerate(vp_cand_vpids[i]):
            if j > 0 and vp is not None and vp in idx \
                    and not visited[i, idx[vp]]:
                match[i, j] = idx[vp]

    our_batch = {
        "gmap_img_embeds": jnp.asarray(gmap_img),
        "gmap_step_ids": jnp.asarray(gmap_step, jnp.int32),
        "gmap_pos_fts": jnp.asarray(gmap_pos),
        "gmap_masks": jnp.asarray(gmap_masks),
        "gmap_visited_masks": jnp.asarray(visited),
        "vp_img_embeds": jnp.asarray(vp_img),
        "vp_pos_fts": jnp.asarray(vp_pos),
        "pano_masks": jnp.asarray(pano_masks),
        "local_match_slot": jnp.asarray(match),
        "cand_order": jnp.asarray(cand_order),
        "cand_positions": jnp.asarray(cand_positions),
        "hist_positions": jnp.asarray(hist_positions),
        "hist_embeds": jnp.asarray(hist_embeds),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(tb.attention_mask),
        "cls_pos": jnp.asarray(cls_pos),
    }
    out = NM.forward_navigation(params, cfg, our_batch)

    ref_fuse = _t2n(out_ref["fuse_embeds"])
    got_fuse = np.asarray(out["fuse_embeds"])
    np.testing.assert_allclose(got_fuse, ref_fuse, rtol=2e-4, atol=2e-4)

    ref_logits = _t2n(out_ref["fuse_logits"])
    got_logits = np.asarray(out["fuse_logits"])
    finite = np.isfinite(ref_logits)
    # our masked slots use NEG_INF = -1e30 (softmax-equivalent) where the
    # reference uses true -inf
    assert (got_logits[~finite] <= -1e29).all()
    assert (got_logits[finite] > -1e29).all()
    np.testing.assert_allclose(got_logits[finite], ref_logits[finite],
                               rtol=5e-4, atol=5e-4)


def test_generation_loss_parity(nav_stacks):
    """Reference ModifiedLM LM loss (modified_lm.py:89-146) == our
    forward_generation_loss, with injection + special-token masking."""
    nm, params, cfg, tok = nav_stacks
    lang = nm.lang_model

    rng = np.random.RandomState(4)
    B, Cc, Hh = 2, 3, 2
    prompts = []
    answers = ["a red chair near the window", "go left"]
    for i in range(B):
        prompts.append(P.summarization_prompt(
            "r2r", instruction="describe the path",
            hist_num=Hh, cand_num=Cc + 1))
    tb = tok([(p, a) for p, a in zip(prompts, answers)])
    ids = tb.input_ids
    labels = np.where(tb.token_type_ids == 1,
                      ids.astype(np.int64), -100)
    labels = np.where(tb.attention_mask, labels, -100)

    cand_embeds = rng.randn(B, Cc + 1, H).astype(np.float32)
    hist_embeds = rng.randn(B, Hh, H).astype(np.float32)
    cand_positions = np.full((B, Cc + 1), -1, np.int32)
    hist_positions = np.full((B, Hh), -1, np.int32)
    ref_cand, ref_hist = [], []
    for i in range(B):
        cpos = np.where(ids[i] == tok.cand_id)[0]
        cand_positions[i, :len(cpos)] = cpos
        ref_cand.extend(cand_embeds[i, :len(cpos)])
        hpos = np.where(ids[i] == tok.hist_id)[0]
        hist_positions[i, :len(hpos)] = hpos
        ref_hist.extend(hist_embeds[i, :len(hpos)])

    with torch.no_grad():
        out_ref = lang(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(tb.attention_mask.astype(np.int64)),
            labels=torch.tensor(labels),
            cand_vis=torch.tensor(np.stack(ref_cand)),
            hist_vis=torch.tensor(np.stack(ref_hist)))

    our_batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(tb.attention_mask),
        "labels": jnp.asarray(labels),
        "cand_positions": jnp.asarray(cand_positions),
        "cand_embeds": jnp.asarray(cand_embeds),
        "hist_positions": jnp.asarray(hist_positions),
        "hist_embeds": jnp.asarray(hist_embeds),
        "special_token_mask": jnp.asarray(tok.special_logit_mask()),
    }
    out = NM.forward_generation_loss(params, cfg, our_batch)
    ref_loss = float(out_ref.loss)
    got_loss = float(out["loss"])
    assert abs(got_loss - ref_loss) < 2e-4 * max(1.0, abs(ref_loss)), \
        (got_loss, ref_loss)
