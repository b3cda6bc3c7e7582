import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navillm_tpu.models import nav_model as NM
from navillm_tpu.models.pano_encoder import forward_panorama
from navillm_tpu.ops.masking import NEG_INF

CFG = NM.NavModelConfig.tiny(vocab_size=300)
H = CFG.hidden_size


@pytest.fixture(scope="module")
def params():
    return NM.init_nav_params(jax.random.PRNGKey(0), CFG)


def test_panorama_shapes(params):
    b, v = 2, 36
    fts = jnp.asarray(np.random.RandomState(0).randn(b, v, CFG.pano.image_feat_size),
                      jnp.float32)
    lens = jnp.array([36, 20])
    loc = jnp.zeros((b, v, CFG.pano.loc_size))
    out = forward_panorama(params["pano"], CFG.pano, fts, lens, loc_fts=loc)
    assert out["pano_embeds"].shape == (b, v, H)
    assert out["pano_masks"].shape == (b, v)
    # masked views must be zero
    assert float(jnp.abs(out["pano_embeds"][1, 20:]).max()) == 0.0


def _nav_batch(rng, b=2, g=8, v=6, c=5, hh=3, tlen=32):
    r = np.random.RandomState(rng)
    gmask = np.zeros((b, g), bool)
    gmask[:, :5] = True
    visited = np.zeros((b, g), bool)
    visited[:, 1] = True          # node 1 visited
    # local candidates 1..3 map to gmap slots 2..4 (unvisited)
    match = np.full((b, v), -1, np.int32)
    match[:, 1] = 2
    match[:, 2] = 3
    match[:, 3] = 4
    pano_m = np.zeros((b, v), bool)
    pano_m[:, :4] = True
    # cand tokens: slots 2,3,4 in some order
    order = np.full((b, c), -1, np.int32)
    order[:, :3] = [3, 2, 4]
    cand_pos = np.full((b, c), -1, np.int32)
    cand_pos[:, :3] = [[5, 7, 9]] * b
    hist_pos = np.full((b, hh), -1, np.int32)
    hist_pos[:, 0] = 3
    ids = r.randint(3, 200, size=(b, tlen)).astype(np.int32)
    cls_pos = np.full((b,), tlen - 1, np.int32)
    return {
        "gmap_img_embeds": jnp.asarray(r.randn(b, g, H), jnp.float32),
        "gmap_step_ids": jnp.asarray(r.randint(0, 5, (b, g)), jnp.int32),
        "gmap_pos_fts": jnp.asarray(r.randn(b, g, 7), jnp.float32),
        "gmap_masks": jnp.asarray(gmask),
        "gmap_visited_masks": jnp.asarray(visited),
        "vp_img_embeds": jnp.asarray(r.randn(b, v, H), jnp.float32),
        "vp_pos_fts": jnp.asarray(r.randn(b, v, 14), jnp.float32),
        "pano_masks": jnp.asarray(pano_m),
        "local_match_slot": jnp.asarray(match),
        "cand_order": jnp.asarray(order),
        "cand_positions": jnp.asarray(cand_pos),
        "hist_positions": jnp.asarray(hist_pos),
        "hist_embeds": jnp.asarray(r.randn(b, hh, H), jnp.float32),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, tlen), bool),
        "cls_pos": jnp.asarray(cls_pos),
    }


def test_forward_navigation_logit_structure(params):
    batch = _nav_batch(0)
    out = NM.forward_navigation(params, CFG, batch)
    logits = np.asarray(out["fuse_logits"])
    b, g = logits.shape
    assert g == 8
    # candidate slots: 0 (stop), 2, 3, 4 -> finite; visited/invalid -> -inf
    for bi in range(b):
        assert np.isfinite(logits[bi, [0, 2, 3, 4]]).all()
        assert (logits[bi, [1, 5, 6, 7]] <= NEG_INF).all()
    assert out["fuse_embeds"].shape == (b, 8, H)


def test_forward_navigation_scatter_mapping(params):
    """Slot logits must follow cand_order: preds[:,0]->slot0,
    preds[:,k+1]->slot order[k]."""
    batch = _nav_batch(1)
    out = NM.forward_navigation(params, CFG, batch)
    logits = np.asarray(out["fuse_logits"])

    # recompute predictions by hand
    import navillm_tpu.models.llama as L
    fuse, cand_masks = NM.fuse_gmap_local(params, CFG, batch)
    b = fuse.shape[0]
    order = np.asarray(batch["cand_order"])
    cand_embeds = np.zeros((b, order.shape[1], H), np.float32)
    for bi in range(b):
        for k, s in enumerate(order[bi]):
            if s >= 0:
                cand_embeds[bi, k] = np.asarray(fuse)[bi, s]
    pos = jnp.concatenate([batch["cand_positions"], batch["hist_positions"]], 1)
    emb = jnp.concatenate([jnp.asarray(cand_embeds), batch["hist_embeds"]], 1)
    x = L.embed_with_injection(params["llm"], batch["input_ids"], pos, emb)
    h, _ = L.forward_hidden(params["llm"], CFG.llm, x, batch["attention_mask"])
    cls_h = h[jnp.arange(b), batch["cls_pos"]]
    preds = np.asarray((cls_h @ params["out_head"]["w"] + params["out_head"]["b"])
                       .astype(jnp.float32))
    for bi in range(b):
        np.testing.assert_allclose(logits[bi, 0], preds[bi, 0], rtol=1e-4)
        for k, s in enumerate(order[bi]):
            if s >= 0:
                np.testing.assert_allclose(logits[bi, s], preds[bi, k + 1],
                                           rtol=1e-4)


def test_navigation_loss(params):
    batch = _nav_batch(2)
    out = NM.forward_navigation(params, CFG, batch)
    targets = jnp.array([2, -100])
    loss = NM.navigation_loss(out["fuse_logits"], targets)
    assert np.isfinite(float(loss))
    # gradient flows
    def f(p):
        o = NM.forward_navigation(p, CFG, batch)
        return NM.navigation_loss(o["fuse_logits"], targets)
    grads = jax.grad(f)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert gnorm > 0


def test_generation_loss(params):
    b, tlen, c = 2, 24, 4
    r = np.random.RandomState(3)
    ids = jnp.asarray(r.randint(3, 200, (b, tlen)), jnp.int32)
    labels = jnp.asarray(ids).at[:, :12].set(-100)
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones((b, tlen), bool),
        "labels": labels,
        "cand_positions": jnp.asarray([[2, 4, -1, -1]] * b, jnp.int32),
        "cand_embeds": jnp.asarray(r.randn(b, c, H), jnp.float32),
        "hist_positions": jnp.full((b, 1), -1, jnp.int32),
        "hist_embeds": jnp.zeros((b, 1, H), jnp.float32),
    }
    out = NM.forward_generation_loss(params, CFG, batch)
    assert np.isfinite(float(out["loss"]))


def test_object_grounding(params):
    b, o, tlen = 2, 5, 20
    r = np.random.RandomState(4)
    omask = np.zeros((b, o), bool)
    omask[0, :3] = True
    omask[1, :5] = True
    batch = {
        "obj_embeds": jnp.asarray(r.randn(b, o, H), jnp.float32),
        "obj_loc_fts": jnp.asarray(r.randn(b, o, 7), jnp.float32),
        "obj_masks": jnp.asarray(omask),
        "input_ids": jnp.asarray(r.randint(3, 200, (b, tlen)), jnp.int32),
        "attention_mask": jnp.ones((b, tlen), bool),
        "cand_positions": jnp.asarray([[4, 6, 8, -1, -1]] * b, jnp.int32),
        "hist_positions": jnp.full((b, 1), -1, jnp.int32),
        "hist_embeds": jnp.zeros((b, 1, H), jnp.float32),
        "cls_pos": jnp.asarray([tlen - 1] * b, jnp.int32),
    }
    out = NM.forward_object_grounding(params, CFG, batch)
    logits = np.asarray(out["obj_logits"])
    assert logits.shape == (b, NM.NUM_CAND_SLOTS)
    assert np.isfinite(logits[0, :4]).all() and (logits[0, 4:] <= NEG_INF).all()
    assert np.isfinite(logits[1, :6]).all() and (logits[1, 6:] <= NEG_INF).all()
