"""NavModelRunner: jitted device entry points for the rollout engine.

Owns params + config + tokenizer and exposes the per-step device calls
the host rollout makes (SURVEY.md §3.2): panorama encode, navigation
step (loss+grads or inference), generation loss, object grounding,
constrained generate. Gradients accumulate into a device-resident
pytree (the TPU equivalent of the reference's per-step backward into
.grad buffers, mp3d_agent.py:750-757); the training driver fetches and
zeroes it at optimizer boundaries.

All functions take numpy arrays with FIXED padded shapes (RolloutDims)
so jit compiles once per (shape-bucket, mode).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as L
from ..models import nav_model as NM
from ..models.decoding import generate as decode_generate
from ..models.pano_encoder import forward_panorama
from ..models.tokenization import NavTokenizer


def _useful_tokens(batch: Dict[str, Any], mask_key: str = "attention_mask",
                   ids_key: str = "input_ids") -> float:
    """Mask-summed (unpadded) token count for MFU accounting: useful
    model work, excluding bucket padding and inactive rows the MXU
    still computes. Falls back to the padded size when no mask ships
    with the batch."""
    m = batch.get(mask_key)
    if m is not None:
        return float(np.asarray(m).sum())
    return float(np.asarray(batch[ids_key]).size)


# device graph-memory node capacity (per-episode stable node ids; ids
# beyond it fall back to -1 = not-memorized, same as the eval path)
MEM_CAPACITY = 256


@dataclasses.dataclass(frozen=True)
class RolloutDims:
    """Static padded sizes for the rollout's device batches.

    max_cands mirrors the reference's 100-slot out_head (nav_model.py:87):
    every unvisited graph node is a candidate, so truncating below 99
    would silently remove reachable actions on long CVDN episodes."""
    max_gmap_nodes: int = 160   # [stop] + discovered nodes (30-step CVDN)
    max_views: int = 44         # candidates + non-cand views (<= 36 + dup cands)
    max_cands: int = 99         # <cand> tokens per prompt (out_head slots - 1)
    max_hist: int = 32          # <hist> tokens (max action len is 30)
    max_objects: int = 72
    # prompt-prefix KV cache capacity per slot (instruction + history
    # tokens; streaming eval raises if a prompt's cacheable prefix
    # outgrows this — raise it for very long CVDN dialogs)
    max_prefix: int = 768

    @classmethod
    def tiny(cls) -> "RolloutDims":
        return cls(max_gmap_nodes=16, max_views=40, max_cands=8, max_hist=8,
                   max_objects=8, max_prefix=448)


class NavModelRunner:
    def __init__(self, cfg: NM.NavModelConfig, params, tokenizer: NavTokenizer,
                 dims: RolloutDims = RolloutDims(), feat_dropout: float = 0.4,
                 ignore_id: int = -100, seed: int = 0, mesh_plan=None,
                 device_memory: bool = True, kv_int8: bool = False):
        """mesh_plan: optional parallel.mesh.MeshPlan — params get their
        (data, model) shardings (LLM tensor-parallel over 'model', small
        modules replicated) and batch arrays shard their leading episode
        axis over 'data'; XLA then inserts the grad psum / TP collectives
        (the DDP/NCCL replacement, SURVEY.md §2.2)."""
        from ..utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.tok = tokenizer
        self.dims = dims
        self.feat_dropout = feat_dropout
        self.ignore_id = ignore_id
        self.rng = jax.random.PRNGKey(seed)
        # the LLM embedding table may be wider than the tokenizer vocab
        # (e.g. 7B benches keep the true 32k-wide table for honest
        # memory/FLOP accounting while the hermetic tokenizer has ~1k
        # ids): alignment-padding columns beyond the tokenizer are
        # masked like specials
        smask = np.asarray(tokenizer.special_logit_mask())
        v = cfg.llm.vocab_size
        if smask.shape[0] < v:
            smask = np.concatenate(
                [smask, np.ones(v - smask.shape[0], bool)])
        self._special_mask = jnp.asarray(smask[:v])
        self.grad_accum = None
        self.plan = mesh_plan
        # diagnostic: count of device_put calls that fell back to
        # replicated placement (training paths should keep this at 0
        # via _dp_pad_rows)
        self.replicated_puts = 0
        # MFU accounting (bench.py): UNPADDED (mask-summed) token count
        # dispatched through the LLM, in forward-equivalents (a fwd+bwd
        # call counts 3x its tokens — the standard 2:1 bwd:fwd FLOP
        # ratio). Useful tokens, not padded buffer widths: MFU is
        # useful model FLOPs over hardware capability, so pad rows and
        # bucket padding (which the MXU does compute) count as lost
        # utilization, not as work. Model FLOPs = llm_token_units *
        # per-token matmul FLOPs (bench.llm_flops_per_token).
        self.llm_token_units = 0.0
        # device-resident rollout memory (agents/device_memory.py): graph
        # node embeddings + history stay in HBM; per-step host traffic is
        # integer bookkeeping + [B, G] logits only
        self.device_memory = device_memory
        # int8 storage for the decode prompt-KV stack (generate); the
        # streaming prefix cache takes its own kv_int8 through
        # prefix_cache_init (both: models/llama.py:kv_quantize)
        self.kv_int8 = kv_int8
        if mesh_plan is not None:
            from ..parallel.mesh import nav_param_specs, shard_params
            from ..models.quant import is_quantized, weight_bits
            quantized = is_quantized(params)
            bits = weight_bits(params) if quantized else 8
            params = shard_params(params, nav_param_specs(
                cfg, quantized=quantized, bits=bits), mesh_plan)
        self.params = params
        self._build_fns()

    def _put_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Host arrays -> device, batch axis sharded over 'data'.

        Arrays whose leading dim is not divisible by dp (e.g. a ragged
        final batch on an inference path) fall back to replicated
        placement — correct, just not data-parallel. Training entry
        points avoid that fallback by padding rows first (_dp_pad_rows)."""
        if self.plan is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        sh = self.plan.data_sharding()
        rep = self.plan.named(jax.sharding.PartitionSpec())
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            ok = v.ndim >= 1 and v.shape[0] % self.plan.dp_size == 0
            if not ok:
                self.replicated_puts += 1
            out[k] = jax.device_put(v, sh if ok else rep)
        return out

    def _dp_pad_rows(self, *dicts, targets=None, labels_key: Optional[str]
                     = None, rows: Optional[int] = None):
        """Pad every row-indexed array to the next dp multiple so training
        batches shard over 'data' instead of replicating (the fused teacher
        path's T*B row count is rarely dp-divisible). Pad rows replicate
        the last real row — numerically benign inputs — while their loss
        contribution is zeroed: nav/og targets get ignore_id (sum-with-
        ignore CE), generation labels get -100 (mean over valid tokens
        counts no new valid positions). Loss values and gradients are
        bit-identical to the unpadded batch.

        Returns (padded_dicts..., padded_targets). Arrays whose leading
        dim != rows (e.g. a vocab mask) pass through untouched."""
        if targets is not None:
            rows = len(targets)
        assert rows is not None
        if self.plan is None or self.plan.dp_size <= 1:
            return (*dicts, targets)
        pad = (-rows) % self.plan.dp_size
        if pad == 0:
            return (*dicts, targets)

        def pad_arr(v, fill=None):
            v = np.asarray(v)
            tail = np.repeat(v[-1:], pad, axis=0) if fill is None else \
                np.full((pad, *v.shape[1:]), fill, v.dtype)
            return np.concatenate([v, tail], axis=0)

        out = []
        for d in dicts:
            nd = {}
            for k, v in d.items():
                a = np.asarray(v)
                if a.ndim >= 1 and a.shape[0] == rows:
                    nd[k] = pad_arr(a, fill=-100 if k == labels_key else None)
                else:
                    nd[k] = v
            out.append(nd)
        if targets is not None:
            targets = pad_arr(np.asarray(targets), fill=self.ignore_id)
        return (*out, targets)

    # ------------------------------------------------------------------ #
    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def zero_grads(self):
        self.grad_accum = jax.tree.map(jnp.zeros_like, self.params)

    def take_grads(self):
        g = self.grad_accum
        self.grad_accum = None
        return g

    def _build_fns(self):
        cfg = self.cfg
        ignore_id = self.ignore_id
        feat_dropout = self.feat_dropout

        def pano_apply(params, rng, pano_in, deterministic):
            """Feature dropout + panorama forward. Deterministic given
            (params, rng): training jits recompute it inside the loss so
            panorama gradients flow (the reference trains ImageEmbeddings
            through the nav/gen/og losses via the local branch)."""
            view = pano_in["view_img_fts"]
            obj = pano_in.get("obj_img_fts")
            if not deterministic:
                rng, d1, d2 = jax.random.split(rng, 3)
                keep = jax.random.bernoulli(d1, 1.0 - feat_dropout,
                                            view.shape)
                view = jnp.where(keep, view / (1 - feat_dropout), 0)
                if obj is not None:
                    keep_o = jax.random.bernoulli(d2, 1.0 - feat_dropout,
                                                  obj.shape)
                    obj = jnp.where(keep_o, obj / (1 - feat_dropout), 0)
            kw = {}
            if obj is not None:
                kw = dict(obj_img_fts=obj, obj_lens=pano_in["obj_lens"],
                          obj_loc_fts=pano_in["obj_loc_fts"])
            return forward_panorama(params["pano"], cfg.pano, view,
                                    pano_in["view_lens"],
                                    loc_fts=pano_in["loc_fts"],
                                    nav_types=pano_in["nav_types"], rng=rng,
                                    deterministic=deterministic, **kw)

        self._pano_apply = pano_apply

        @functools.partial(jax.jit, static_argnames=("deterministic",))
        def pano_dict_fn(params, rng, pano_in, deterministic):
            return pano_apply(params, rng, pano_in, deterministic)

        @functools.partial(jax.jit, static_argnames=("deterministic",))
        def pano_fn(params, rng, view_img_fts, view_lens, loc_fts, nav_types,
                    deterministic):
            return pano_apply(params, rng,
                              {"view_img_fts": view_img_fts,
                               "view_lens": view_lens, "loc_fts": loc_fts,
                               "nav_types": nav_types}, deterministic)

        @jax.jit
        def pano_fwd_fn(params, rng, pano_in):
            """Training-mode panorama forward (dropout on); embeds stay
            on device for the cotangent-split train step."""
            po = pano_apply(params, rng, pano_in, False)
            return po["pano_embeds"], po["pano_masks"]

        @jax.jit
        def pano_vjp_fn(params, accum, rng, pano_in, cot_embeds):
            """Backprop a pano-embedding cotangent into the params."""
            def f(p):
                return pano_apply(p, rng, pano_in, False)["pano_embeds"]
            _, vjp = jax.vjp(f, params)
            (gp,) = vjp(cot_embeds)
            return jax.tree.map(jnp.add, accum, gp)

        @jax.jit
        def nav_train_cot_fn(params, accum, batch, pano_embeds, targets,
                             coef):
            """Navigation loss + grads wrt params AND pano embeddings.

            Splitting the panorama out of this jit keeps the backend
            compile tractable (the pano-scan-inside-LLM-grad composition
            compiles pathologically slowly); pano_vjp_fn completes the
            chain with identical math."""
            def loss_fn(p, pe):
                stop = jnp.zeros((pe.shape[0], 1, pe.shape[2]), pe.dtype)
                full = dict(batch)
                full["vp_img_embeds"] = jnp.concatenate([stop, pe], axis=1)
                out = NM.forward_navigation(p, cfg, full)
                loss = NM.navigation_loss(out["fuse_logits"], targets,
                                          ignore_id) * coef
                return loss, (out["fuse_logits"], out["fuse_embeds"])
            (loss, aux), (gp, gpe) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, pano_embeds)
            accum = jax.tree.map(jnp.add, accum, gp)
            return accum, loss, aux[0], aux[1], gpe

        @jax.jit
        def nav_mem_train_cot_fn(params, accum, state, batch, pano_embeds,
                                 pano_masks, targets, coef):
            """Memory-path variant: detached memory update + assembly in
            the same call; gradients flow to params and pano embeddings."""
            # DM binds lazily (closure over _build_fns locals): defined
            # further down, resolved at trace time
            new_state = DM.memory_update(state,
                                         jax.lax.stop_gradient(pano_embeds),
                                         pano_masks, batch["cur_ids"],
                                         batch["cand_ids"])

            def loss_fn(p, pe):
                gmap, vp = DM.assemble_from_memory(new_state,
                                                   batch["slot_ids"], pe)
                full = {k: v for k, v in batch.items()
                        if k not in ("cur_ids", "cand_ids", "slot_ids")}
                full["gmap_img_embeds"] = gmap
                full["vp_img_embeds"] = vp
                full["hist_embeds"] = new_state["hist_buf"]
                out = NM.forward_navigation(p, cfg, full)
                loss = NM.navigation_loss(out["fuse_logits"], targets,
                                          ignore_id) * coef
                return loss, (out["fuse_logits"], out["fuse_embeds"])
            (loss, aux), (gp, gpe) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, pano_embeds)
            accum = jax.tree.map(jnp.add, accum, gp)
            return accum, new_state, loss, aux[0], aux[1], gpe

        @jax.jit
        def pano_vjp_obj_fn(params, accum, rng, pano_in, cot_obj):
            def f(p):
                return pano_apply(p, rng, pano_in, False)["obj_embeds"]
            _, vjp = jax.vjp(f, params)
            (gp,) = vjp(cot_obj)
            return jax.tree.map(jnp.add, accum, gp)

        @jax.jit
        def gen_train_cot_fn(params, accum, batch, vp_img_embeds, coef):
            def loss_fn(p, vp):
                full = dict(batch)
                full["vp_img_embeds"] = vp
                return NM.forward_generation_loss(p, cfg, full)["loss"] * coef
            loss, (gp, gv) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, vp_img_embeds)
            accum = jax.tree.map(jnp.add, accum, gp)
            return accum, loss, gv

        @jax.jit
        def og_train_cot_fn(params, accum, batch, obj_embeds, targets, coef):
            def loss_fn(p, oe):
                full = dict(batch)
                full["obj_embeds"] = oe
                out = NM.forward_object_grounding(p, cfg, full)
                loss = NM.navigation_loss(out["obj_logits"], targets,
                                          ignore_id) * coef
                return loss, out["obj_logits"]
            (loss, logits), (gp, go) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, obj_embeds)
            accum = jax.tree.map(jnp.add, accum, gp)
            return accum, loss, logits, go

        @jax.jit
        def fuse_only_fn(params, batch):
            fuse, cand_masks = NM.fuse_gmap_local(params, cfg, batch)
            return fuse

        @jax.jit
        def replay_fuse_scan_fn(params, state, pe_grid, pm_grid, cur_ids,
                                cand_ids, slot_ids, fuse_sts, acts):
            """Device-resident replay of a trajectory batch (the fused
            trainer's phases 3-4 in ONE executable): per step, memory
            update -> gmap/vp assembly -> graph/local fusion -> history
            append — the same primitives the streaming evaluator runs
            per step (device_memory.py), scanned over the step axis so
            the embeddings never visit the host (the host-replay form
            downloaded every pano embed and re-uploaded every gmap/hist
            array; on relay-attached chips that marshaling dominated
            training wall-clock).

            pe_grid [T,B,V,H]; pm_grid [T,B,V]; cur_ids [T,B];
            cand_ids [T,B,V]; slot_ids [T,B,G]; fuse_sts: dict of
            [T,B,...] fusion inputs (gmap_step_ids/pos/masks/visited,
            vp_pos_fts, pano_masks, local_match_slot); acts [T,B]
            (-1 = no history append). Steps padded past the real T use
            -1 ids/acts: memory and history are untouched and their
            emitted rows are never gathered. Returns
            (gmap_seq [T,B,G,H], hist_seq [T,B,Hh,H], final_state) with
            hist_seq[t] the history BEFORE step t's append — exactly
            the embeddings the loss pass at step t conditions on."""
            def body(st, xs):
                pe, pm, cur, cand, slots, fin, a = xs
                st = DM.memory_update(st, pe, pm, cur, cand)
                gmap, vp = DM.assemble_from_memory(st, slots, pe)
                full = dict(fin)
                full["gmap_img_embeds"] = gmap
                full["vp_img_embeds"] = vp
                fuse, _ = NM.fuse_gmap_local(params, cfg, full)
                ys = (gmap, st["hist_buf"])
                st = DM.hist_append(st, fuse, a)
                return st, ys
            final, (gmap_seq, hist_seq) = jax.lax.scan(
                body, state, (pe_grid, pm_grid, cur_ids, cand_ids,
                              slot_ids, fuse_sts, acts))
            return gmap_seq, hist_seq, final

        # ---- device-resident rollout memory (agents/device_memory.py) ----
        from . import device_memory as DM

        @jax.jit
        def mem_update_fn(state, pano_embeds, pano_masks, cur_ids, cand_ids):
            return DM.memory_update(state, pano_embeds, pano_masks, cur_ids,
                                    cand_ids)

        @jax.jit
        def mem_reset_fn(state, reset_mask):
            z = reset_mask
            return {
                "mem_sum": jnp.where(z[:, None, None], 0, state["mem_sum"]),
                "mem_cnt": jnp.where(z[:, None], 0, state["mem_cnt"]),
                "hist_buf": jnp.where(z[:, None, None], 0, state["hist_buf"]),
                "hist_cnt": jnp.where(z, 0, state["hist_cnt"]),
            }

        @jax.jit
        def nav_mem_infer_fn(params, state, batch, pano_embeds):
            return DM.nav_step_from_memory(params, cfg, state, batch,
                                           pano_embeds)

        @functools.partial(jax.jit, static_argnames=("do_sample",),
                           donate_argnames=("state",))
        def eval_step_fn(params, state, pano_in, batch, reset_mask, cur_ids,
                         cand_ids, active_mask, a_t_override, rng,
                         temperature, do_sample):
            return DM.eval_step(params, cfg, pano_apply, state, pano_in,
                                batch, reset_mask, cur_ids, cand_ids,
                                active_mask, a_t_override, rng, do_sample,
                                temperature)

        @functools.partial(jax.jit, static_argnames=("do_sample",),
                           donate_argnames=("state", "cache"))
        def eval_step_cached_fn(params, state, cache, pano_in, batch,
                                reset_mask, cur_ids, cand_ids, active_mask,
                                a_t_override, rng, temperature, do_sample):
            return DM.eval_step_cached(params, cfg, pano_apply, state, cache,
                                       pano_in, batch, reset_mask, cur_ids,
                                       cand_ids, active_mask, a_t_override,
                                       rng, do_sample, temperature)

        @functools.partial(jax.jit, donate_argnames=("cache",))
        def prefill_prefix_fn(params, cache, ids, mask, rows, valid):
            return DM.prefill_prefix(params, cfg.llm, cache, ids, mask,
                                     rows, valid)

        # ---- W8A8 sampling-policy variants (fused DAgger, r5) ----
        # The no-grad sampling rollout can run its policy forwards in
        # int8 weights + int8 activations — the SAME numerics class as
        # the eval headline (W8A8, trajectory-agreement-tested in
        # tests/test_quant.py). Gradients are untouched: the fused loss
        # pass recomputes everything in bf16 from the trajectory. Only
        # the exploration distribution shifts, exactly as eval does.
        import dataclasses as _dc
        cfg_q = _dc.replace(cfg, llm=_dc.replace(cfg.llm, act_int8=True))

        from ..models.quant import _quantize_llama_impl

        @jax.jit
        def quant_sampling_fn(params):
            # NON-donating (quantize_llama_params donates — it would
            # delete the live training tree)
            return dict(params, llm=_quantize_llama_impl(params["llm"], 8))

        @functools.partial(jax.jit, static_argnames=("do_sample",),
                           donate_argnames=("state",))
        def eval_step_q_fn(params, state, pano_in, batch, reset_mask,
                           cur_ids, cand_ids, active_mask, a_t_override,
                           rng, temperature, do_sample):
            return DM.eval_step(params, cfg_q, pano_apply, state, pano_in,
                                batch, reset_mask, cur_ids, cand_ids,
                                active_mask, a_t_override, rng, do_sample,
                                temperature)

        @functools.partial(jax.jit, static_argnames=("do_sample",),
                           donate_argnames=("state", "cache"))
        def eval_step_cached_q_fn(params, state, cache, pano_in, batch,
                                  reset_mask, cur_ids, cand_ids,
                                  active_mask, a_t_override, rng,
                                  temperature, do_sample):
            return DM.eval_step_cached(params, cfg_q, pano_apply, state,
                                       cache, pano_in, batch, reset_mask,
                                       cur_ids, cand_ids, active_mask,
                                       a_t_override, rng, do_sample,
                                       temperature)

        @functools.partial(jax.jit, donate_argnames=("cache",))
        def prefill_prefix_q_fn(params, cache, ids, mask, rows, valid):
            return DM.prefill_prefix(params, cfg_q.llm, cache, ids, mask,
                                     rows, valid)

        @jax.jit
        def hist_append_fn(state, fuse_embeds, a_t):
            return DM.hist_append(state, fuse_embeds, a_t)

        @jax.jit
        def nav_infer_fn(params, batch):
            out = NM.forward_navigation(params, cfg, batch)
            return out["fuse_logits"], out["fuse_embeds"]

        @jax.jit
        def nav_train_fn(params, accum, batch, targets, coef):
            def loss_fn(p):
                out = NM.forward_navigation(p, cfg, batch)
                loss = NM.navigation_loss(out["fuse_logits"], targets,
                                          ignore_id) * coef
                return loss, (out["fuse_logits"], out["fuse_embeds"])
            (loss, (logits, fuse)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            accum = jax.tree.map(jnp.add, accum, grads)
            return accum, loss, logits, fuse

        @jax.jit
        def gen_loss_fn(params, batch):
            return NM.forward_generation_loss(params, cfg, batch)["loss"]

        @jax.jit
        def gen_train_fn(params, accum, batch, coef):
            def loss_fn(p):
                return NM.forward_generation_loss(p, cfg, batch)["loss"] * coef
            loss, grads = jax.value_and_grad(loss_fn)(params)
            accum = jax.tree.map(jnp.add, accum, grads)
            return accum, loss

        @jax.jit
        def gen_embeds_fn(params, vp_img_embeds, vp_masks):
            return NM.prep_generation_embeds(params, cfg, vp_img_embeds,
                                             vp_masks)

        @jax.jit
        def og_infer_fn(params, batch):
            return NM.forward_object_grounding(params, cfg, batch)["obj_logits"]

        @jax.jit
        def og_train_fn(params, accum, batch, targets, coef):
            def loss_fn(p):
                out = NM.forward_object_grounding(p, cfg, batch)
                loss = NM.navigation_loss(out["obj_logits"], targets,
                                          ignore_id) * coef
                return loss, out["obj_logits"]
            (loss, logits), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            accum = jax.tree.map(jnp.add, accum, grads)
            return accum, loss, logits

        self._eval_step_fn = eval_step_fn
        self._eval_step_cached_fn = eval_step_cached_fn
        self._prefill_prefix_fn = prefill_prefix_fn
        self._eval_step_q_fn = eval_step_q_fn
        self._eval_step_cached_q_fn = eval_step_cached_q_fn
        self._prefill_prefix_q_fn = prefill_prefix_q_fn
        self._quant_sampling_fn = quant_sampling_fn
        self._samp_src = None
        self._samp_q = None
        self._pano_dict_fn = pano_dict_fn
        self._pano_fwd_fn = pano_fwd_fn
        self._pano_vjp_fn = pano_vjp_fn
        self._nav_train_cot_fn = nav_train_cot_fn
        self._nav_mem_train_cot_fn = nav_mem_train_cot_fn
        self._pano_vjp_obj_fn = pano_vjp_obj_fn
        self._gen_train_cot_fn = gen_train_cot_fn
        self._og_train_cot_fn = og_train_cot_fn
        self._fuse_only_fn = fuse_only_fn
        self._replay_fuse_scan_fn = replay_fuse_scan_fn
        self._mem_update_fn = mem_update_fn
        self._mem_reset_fn = mem_reset_fn
        self._nav_mem_infer_fn = nav_mem_infer_fn
        self._hist_append_fn = hist_append_fn
        self._gen_embeds_fn = gen_embeds_fn
        self._pano_fn = pano_fn
        self._nav_infer_fn = nav_infer_fn
        self._nav_train_fn = nav_train_fn
        self._gen_loss_fn = gen_loss_fn
        self._gen_train_fn = gen_train_fn
        self._og_infer_fn = og_infer_fn
        self._og_train_fn = og_train_fn

    # ------------------------------------------------------------------ #
    PANO_KEYS = ("view_img_fts", "view_lens", "loc_fts", "nav_types",
                 "obj_img_fts", "obj_lens", "obj_loc_fts")

    def _pano_dev_inputs(self, pano_inputs):
        return {k: jnp.asarray(v) for k, v in pano_inputs.items()
                if k in self.PANO_KEYS}

    def panorama(self, pano_inputs: Dict[str, np.ndarray],
                 deterministic: bool, rng=None) -> Dict[str, np.ndarray]:
        rng = rng if rng is not None else self._next_rng()
        out = self._pano_dict_fn(self.params, rng,
                                 self._pano_dev_inputs(pano_inputs),
                                 deterministic=deterministic)
        return {k: np.asarray(v) for k, v in out.items()}

    def panorama_dev_dict(self, pano_inputs: Dict[str, np.ndarray],
                          deterministic: bool, rng=None):
        """panorama() without the download: the full output dict stays
        on device (jax arrays). The fused trainer's replay consumes the
        embeddings on chip (replay_fuse_scan), so materializing them —
        ~14 MB/chunk over a relay measured at ~14 MB/s d2h — would be
        pure waste."""
        rng = rng if rng is not None else self._next_rng()
        return self._pano_dict_fn(self.params, rng,
                                  self._pano_dev_inputs(pano_inputs),
                                  deterministic=deterministic)

    def replay_fuse_scan(self, pe_chunks, live_rows, t_pad, pm_grid, cur_ids,
                         cand_ids, slot_ids, fuse_sts, acts):
        """Scatter the compact live-row pano embeds onto the [T*B] grid
        (eager device ops — n_live varies per batch and must not leak
        into the scan's compiled shape), then run the scanned replay.

        pe_chunks: list of FIXED-WIDTH [chunk, V, H] device arrays (the
        phase-2 pano outputs). live_rows [n_chunks*chunk] maps each
        chunk row to its grid row, padded with the trash index t_pad*b:
        the grid has one extra row that absorbs padding scatters and is
        dropped before the reshape. Scattering PER CHUNK keeps every
        eager op at one shape — the r4 form concatenated the chunks
        first, so each new chunk COUNT emitted a fresh concat+scatter
        executable (~seconds each on a 1-core host, every few batches
        as trajectory lengths drifted).
        Returns (gmap_flat [T*B,G,H], hist_flat [T*B,Hh,H], final_state)
        as DEVICE arrays."""
        t_pad, b = np.asarray(cur_ids).shape
        v, h = pe_chunks[0].shape[1], pe_chunks[0].shape[2]
        chunk = int(pe_chunks[0].shape[0])
        grid = jnp.zeros((t_pad * b + 1, v, h), pe_chunks[0].dtype)
        for ci, pe in enumerate(pe_chunks):
            rows = jnp.asarray(live_rows[ci * chunk: (ci + 1) * chunk])
            grid = grid.at[rows].set(pe)
        pe_grid = grid[:t_pad * b].reshape(t_pad, b, v, h)
        state0 = self.memory_init(b)
        gmap_seq, hist_seq, final = self._replay_fuse_scan_fn(
            self.params, state0, pe_grid, jnp.asarray(pm_grid),
            jnp.asarray(cur_ids), jnp.asarray(cand_ids),
            jnp.asarray(slot_ids),
            {k: jnp.asarray(val) for k, val in fuse_sts.items()},
            jnp.asarray(acts))
        g = gmap_seq.shape[2]
        hh = hist_seq.shape[2]
        return (gmap_seq.reshape(t_pad * b, g, h),
                hist_seq.reshape(t_pad * b, hh, h), final)

    def pano_navigation_train(self, pano_inputs, rng, batch, targets,
                              coef: float, need_outputs: bool = True):
        """Pano-differentiable navigation train step, split into three
        jits (pano fwd -> nav loss/grads + embedding cotangent -> pano
        vjp) — mathematically one fused step, but each piece compiles
        fast (the pano-inside-LLM-grad composition compiles ~20x
        slower as a single program).
        Returns (logits, fuse_embeds, pano_embeds, pano_masks, loss).

        need_outputs=False skips EVERY device->host download and returns
        (None, None, None, None, loss) with loss a DEVICE scalar: the
        fused-teacher path discards the outputs, and materializing them
        cost ~60 MB of relay downloads per trajectory batch AND forced a
        host sync on the grad chain. The caller materializes the loss a
        step later (one-step-lag training pipeline, train_loop)."""
        assert self.grad_accum is not None
        n_rows = len(targets)
        # pad on HOST, then upload once (padding a device dict would
        # download every pano array just to re-upload it padded)
        pano_host = {k: v for k, v in pano_inputs.items()
                     if k in self.PANO_KEYS}
        pano_host, batch, targets = self._dp_pad_rows(
            pano_host, batch, targets=targets)
        self.llm_token_units += 3.0 * _useful_tokens(batch)
        pano_dev = self._pano_dev_inputs(pano_host)
        pe, pm = self._pano_fwd_fn(self.params, rng, pano_dev)
        dev = self._put_batch(batch)
        tgt = self._put_batch({"t": targets})["t"]
        self.grad_accum, loss, logits, fuse, gpe = self._nav_train_cot_fn(
            self.params, self.grad_accum, dev, pe, tgt, jnp.float32(coef))
        self.grad_accum = self._pano_vjp_fn(self.params, self.grad_accum,
                                            rng, pano_dev, gpe)
        if not need_outputs:
            return None, None, None, None, loss
        return (np.asarray(logits)[:n_rows], np.asarray(fuse)[:n_rows],
                np.asarray(pe)[:n_rows], np.asarray(pm)[:n_rows],
                float(loss))

    def pano_generation_train(self, pano_inputs, rng, batch, coef: float):
        """Returns the loss as a DEVICE scalar (no host sync) — callers
        accumulate lazily; train_loop materializes one step later."""
        assert self.grad_accum is not None
        pano_host = {k: v for k, v in pano_inputs.items()
                     if k in self.PANO_KEYS}
        pano_host, batch, _ = self._dp_pad_rows(
            pano_host, batch, labels_key="labels",
            rows=len(batch["input_ids"]))
        self.llm_token_units += 3.0 * _useful_tokens(batch)
        pano_dev = self._pano_dev_inputs(pano_host)
        pe, _ = self._pano_fwd_fn(self.params, rng, pano_dev)
        dev = self._put_batch(batch)
        dev["special_token_mask"] = self._special_mask
        self.grad_accum, loss, gv = self._gen_train_cot_fn(
            self.params, self.grad_accum, dev, pe, jnp.float32(coef))
        self.grad_accum = self._pano_vjp_fn(self.params, self.grad_accum,
                                            rng, pano_dev, gv)
        return loss

    def pano_og_train(self, pano_inputs, rng, batch, targets, coef: float,
                      need_logits: bool = True):
        """Returns (logits, loss) with loss a DEVICE scalar. The logits
        download syncs the queued grad chain, but traj parity requires
        pred_objid on training rollouts too (reference
        mp3d_agent.py:788-842) and OG fires once per trajectory at most
        — only SOON/REVERIE batches pay the pipeline bubble."""
        assert self.grad_accum is not None
        n_rows = len(targets)
        pano_host = {k: v for k, v in pano_inputs.items()
                     if k in self.PANO_KEYS}
        pano_host, batch, targets = self._dp_pad_rows(
            pano_host, batch, targets=targets)
        pano_dev = self._pano_dev_inputs(pano_host)
        out = self._pano_dict_fn(self.params, rng, pano_dev,
                                 deterministic=False)
        dev = self._put_batch(batch)
        tgt = self._put_batch({"t": targets})["t"]
        self.grad_accum, loss, logits, go = self._og_train_cot_fn(
            self.params, self.grad_accum, dev, out["obj_embeds"], tgt,
            jnp.float32(coef))
        self.grad_accum = self._pano_vjp_obj_fn(self.params, self.grad_accum,
                                                rng, pano_dev, go)
        if not need_logits:
            return None, loss
        return np.asarray(logits)[:n_rows], loss

    def navigation(self, batch: Dict[str, np.ndarray],
                   targets: Optional[np.ndarray] = None,
                   coef: float = 1.0, train: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray, float]:
        if train:
            assert self.grad_accum is not None, "call zero_grads() first"
            n_rows = len(targets)
            batch, targets = self._dp_pad_rows(batch, targets=targets)
            self.llm_token_units += 3.0 * _useful_tokens(batch)
            dev = self._put_batch(batch)
            tgt = self._put_batch({"t": targets})["t"]
            self.grad_accum, loss, logits, fuse = self._nav_train_fn(
                self.params, self.grad_accum, dev, tgt, jnp.float32(coef))
            return (np.asarray(logits)[:n_rows], np.asarray(fuse)[:n_rows],
                    float(loss))
        self.llm_token_units += _useful_tokens(batch)
        dev = self._put_batch(batch)
        logits, fuse = self._nav_infer_fn(self.params, dev)
        return np.asarray(logits), np.asarray(fuse), 0.0

    def generation(self, batch: Dict[str, np.ndarray], coef: float = 1.0,
                   train: bool = False) -> float:
        self.llm_token_units += (3.0 if train else 1.0) * _useful_tokens(batch)
        if train:
            assert self.grad_accum is not None
            batch, _ = self._dp_pad_rows(batch, labels_key="labels",
                                         rows=len(batch["input_ids"]))
            dev = self._put_batch(batch)
            dev["special_token_mask"] = self._special_mask
            self.grad_accum, loss = self._gen_train_fn(
                self.params, self.grad_accum, dev, jnp.float32(coef))
            return float(loss)
        dev = self._put_batch(batch)
        dev["special_token_mask"] = self._special_mask
        return float(self._gen_loss_fn(self.params, dev))

    def object_grounding(self, batch: Dict[str, np.ndarray],
                         targets: Optional[np.ndarray] = None,
                         coef: float = 1.0, train: bool = False
                         ) -> Tuple[np.ndarray, float]:
        if train:
            assert self.grad_accum is not None
            n_rows = len(targets)
            batch, targets = self._dp_pad_rows(batch, targets=targets)
            dev = self._put_batch(batch)
            tgt = self._put_batch({"t": targets})["t"]
            self.grad_accum, loss, logits = self._og_train_fn(
                self.params, self.grad_accum, dev, tgt, jnp.float32(coef))
            return np.asarray(logits)[:n_rows], float(loss)
        dev = self._put_batch(batch)
        return np.asarray(self._og_infer_fn(self.params, dev)), 0.0

    # ---------- device-resident rollout memory API ---------------------- #
    def memory_init(self, batch: int, capacity: int = None):
        from . import device_memory as DM
        return DM.init_memory(batch, capacity or MEM_CAPACITY,
                              self.dims.max_hist,
                              self.cfg.hidden_size, jnp.float32)

    def panorama_device(self, pano_inputs: Dict[str, np.ndarray],
                        deterministic: bool):
        """Panorama encode; embeddings STAY on device (jax array).

        (fp16 staging was tried for the upload and reverted: TPUs have
        no native fp16, the conversion runs an emulated slow path.)"""
        out = self._pano_fn(self.params, self._next_rng(),
                            jnp.asarray(pano_inputs["view_img_fts"]),
                            jnp.asarray(pano_inputs["view_lens"]),
                            jnp.asarray(pano_inputs["loc_fts"]),
                            jnp.asarray(pano_inputs["nav_types"]),
                            deterministic=deterministic)
        return out["pano_embeds"], out["pano_masks"]

    def memory_update(self, state, pano_embeds, pano_masks, cur_ids,
                      cand_ids):
        return self._mem_update_fn(state, pano_embeds, pano_masks,
                                   jnp.asarray(cur_ids),
                                   jnp.asarray(cand_ids))

    def memory_reset_slots(self, state, reset_mask):
        return self._mem_reset_fn(state, jnp.asarray(reset_mask))

    def eval_step(self, state, pano_inputs, batch, reset_mask, cur_ids,
                  cand_ids, active_mask, a_t_override=None,
                  do_sample: bool = False, temperature: float = 1.0,
                  sync: bool = True):
        """ONE device call per streaming-eval rollout step (reset ->
        pano -> memory update -> nav forward -> action select -> hist
        append). a_t_override [B] (-1 = policy action) forces actions
        for oracle rows. Returns (new_state, a_t, logits device[B, G]).
        Only a_t needs downloading; logits stay on device.

        sync=False returns a_t as a DEVICE array without waiting: the
        dispatch is async, so the caller can overlap host work for
        another slot group with this step's execution and materialize
        a_t later (np.asarray) — the two-stream pipeline in
        validate_streaming."""
        pano_dev = self._pano_dev_inputs(pano_inputs)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        self.llm_token_units += _useful_tokens(batch)
        if a_t_override is None:
            a_t_override = np.full(len(cur_ids), -1, np.int32)
        state, a_t, logits = self._eval_step_fn(
            self.params, state, pano_dev, dev, jnp.asarray(reset_mask),
            jnp.asarray(cur_ids), jnp.asarray(cand_ids),
            jnp.asarray(active_mask),
            jnp.asarray(a_t_override, jnp.int32), self._next_rng(),
            jnp.float32(temperature), do_sample=do_sample)
        return state, (np.asarray(a_t) if sync else a_t), logits

    def prefix_cache_init(self, batch: int, max_prefix: int,
                          kv_int8: bool = False):
        from . import device_memory as DM
        return DM.init_prefix_cache(self.cfg.llm, batch, max_prefix,
                                    kv_int8=kv_int8)

    def prefix_cache_enabled(self, batch: int, max_prefix: int,
                             n_caches: int = 1,
                             kv_int8: bool = False) -> bool:
        """Auto policy: cache the prompt prefix when the K/V caches fit
        comfortably next to the weights. n_caches: one per slot group
        (the two-stream pipeline allocates two). 7B bf16 (~13.5 GB)
        fails this; 7B int8 (~6.8 GB, models/quant.py) passes with
        right-sized max_prefix — params_bytes is computed from the
        ACTUAL leaves, so quantization widens the budget automatically.
        kv_int8 halves the per-element cache cost (plus 4/head_dim
        scale overhead). The 12 GB ceiling leaves ~3 GB of a 16 GB chip
        for activations, executables, and the XLA workspace."""
        c = self.cfg.llm
        itemsize = (1 + 4 / c.head_dim) if kv_int8 \
            else jnp.dtype(c.dtype).itemsize
        bytes_needed = n_caches * int(2 * c.num_layers * batch * max_prefix
                                      * c.num_kv_heads * c.head_dim
                                      * itemsize)
        # int4 weights are uint8 nibble-packed (models/quant.py:
        # pack_int4), so plain itemsize accounting is already correct
        params_bytes = int(sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(self.params)))
        return self.device_memory and \
            (bytes_needed + params_bytes) < 12e9

    def prefill(self, cache, ids, mask, rows, valid):
        """Prefill refilled rows' prefixes; rows must be distinct (pad
        entries point at rows not being prefilled, valid=False)."""
        # valid rows' mask-summed prefix lengths only (invalid pad
        # entries and right-padding are not useful work)
        v = np.asarray(valid)
        self.llm_token_units += float(
            (np.asarray(mask) * v[:, None]).sum())
        return self._prefill_prefix_fn(
            self.params, cache, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(rows, jnp.int32), jnp.asarray(valid))

    def eval_step_cached(self, state, cache, pano_inputs, batch, reset_mask,
                         cur_ids, cand_ids, active_mask, a_t_override=None,
                         do_sample: bool = False, temperature: float = 1.0,
                         sync: bool = True):
        """Prefix-cached fused eval step (device_memory.eval_step_cached).
        Same contract as eval_step plus the cache; returns
        (state', cache', a_t, logits)."""
        import os
        import time as _t
        prof = os.environ.get("NAVILLM_EVAL_STEP_PROF")
        t0 = _t.perf_counter()
        pano_dev = self._pano_dev_inputs(pano_inputs)
        t1 = _t.perf_counter()
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        t2 = _t.perf_counter()
        act = np.asarray(active_mask)
        self.llm_token_units += float(
            (np.asarray(batch["app_mask"]) * act[:, None]).sum()
            + (np.asarray(batch["suf_mask"]) * act[:, None]).sum())
        if a_t_override is None:
            a_t_override = np.full(len(cur_ids), -1, np.int32)
        t3 = _t.perf_counter()
        state, cache, a_t, logits = self._eval_step_cached_fn(
            self.params, state, cache, pano_dev, dev,
            jnp.asarray(reset_mask), jnp.asarray(cur_ids),
            jnp.asarray(cand_ids), jnp.asarray(active_mask),
            jnp.asarray(a_t_override, jnp.int32), self._next_rng(),
            jnp.float32(temperature), do_sample=do_sample)
        t4 = _t.perf_counter()
        if prof:
            import sys
            print(f"[eval_step_cached] pano_up {1e3*(t1-t0):.0f} "
                  f"batch_up {1e3*(t2-t1):.0f} tok {1e3*(t3-t2):.0f} "
                  f"dispatch {1e3*(t4-t3):.0f} ms", file=sys.stderr)
        return state, cache, (np.asarray(a_t) if sync else a_t), logits

    # ---- W8A8 sampling policy (fused DAgger, r5) --------------------- #
    def sampling_quant_available(self) -> bool:
        """int8 sampling needs a DENSE bf16 tree to quantize (eval modes
        already hold quantized params) and no mesh plan (the quantized
        copy has no sharding specs on the multichip path)."""
        from ..models.quant import is_quantized
        return self.plan is None and not is_quantized(self.params)

    def sampling_params(self):
        """W8A8 int8 copy of the CURRENT params for the no-grad DAgger
        sampling rollout. Re-quantized lazily when self.params is
        replaced (the optimizer step builds a new tree), so it tracks
        training at accum-boundary granularity — "sample from the
        current policy" is preserved up to the int8 grid, the same
        approximation the W8A8 eval headline runs under."""
        if self._samp_src is not self.params:
            self._samp_q = self._quant_sampling_fn(self.params)
            self._samp_src = self.params
        return self._samp_q

    def eval_step_q(self, state, pano_inputs, batch, reset_mask, cur_ids,
                    cand_ids, active_mask, a_t_override=None,
                    do_sample: bool = False, temperature: float = 1.0,
                    sync: bool = True):
        """eval_step against the int8 sampling policy."""
        pano_dev = self._pano_dev_inputs(pano_inputs)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        self.llm_token_units += float(
            np.asarray(batch["attention_mask"]).sum()) if \
            "attention_mask" in batch else 0.0
        if a_t_override is None:
            a_t_override = np.full(len(cur_ids), -1, np.int32)
        state, a_t, logits = self._eval_step_q_fn(
            self.sampling_params(), state, pano_dev, dev,
            jnp.asarray(reset_mask), jnp.asarray(cur_ids),
            jnp.asarray(cand_ids), jnp.asarray(active_mask),
            jnp.asarray(a_t_override, jnp.int32), self._next_rng(),
            jnp.float32(temperature), do_sample=do_sample)
        return state, (np.asarray(a_t) if sync else a_t), logits

    def eval_step_cached_q(self, state, cache, pano_inputs, batch,
                           reset_mask, cur_ids, cand_ids, active_mask,
                           a_t_override=None, do_sample: bool = False,
                           temperature: float = 1.0, sync: bool = True):
        """eval_step_cached against the int8 sampling policy (prefills
        must use prefill_q so the cached K/V comes from the same
        policy)."""
        pano_dev = self._pano_dev_inputs(pano_inputs)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        act = np.asarray(active_mask)
        self.llm_token_units += float(
            (np.asarray(batch["app_mask"]) * act[:, None]).sum()
            + (np.asarray(batch["suf_mask"]) * act[:, None]).sum())
        if a_t_override is None:
            a_t_override = np.full(len(cur_ids), -1, np.int32)
        state, cache, a_t, logits = self._eval_step_cached_q_fn(
            self.sampling_params(), state, cache, pano_dev, dev,
            jnp.asarray(reset_mask), jnp.asarray(cur_ids),
            jnp.asarray(cand_ids), jnp.asarray(active_mask),
            jnp.asarray(a_t_override, jnp.int32), self._next_rng(),
            jnp.float32(temperature), do_sample=do_sample)
        return state, cache, (np.asarray(a_t) if sync else a_t), logits

    def prefill_q(self, cache, ids, mask, rows, valid):
        return self._prefill_prefix_q_fn(
            self.sampling_params(), cache, jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(rows), jnp.asarray(valid))

    def navigation_from_memory(self, state, batch: Dict[str, np.ndarray],
                               pano_embeds):
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        logits, fuse = self._nav_mem_infer_fn(self.params, state, dev,
                                              pano_embeds)
        return np.asarray(logits), fuse

    def pano_mem_navigation_train(self, state, rng, pano_inputs, batch,
                                  targets, coef: float, sync: bool = True):
        """Device-memory navigation train step (cotangent-split chain).
        Returns (new_state, logits(np), fuse(device), loss).

        sync=False keeps logits and loss as DEVICE arrays so the caller
        can dispatch this step, do unrelated host work (the interleaved
        DAgger pipeline — mp3d_agent.rollout_interleaved), and
        materialize the logits only when the action is actually needed.
        """
        assert self.grad_accum is not None
        pano_dev = self._pano_dev_inputs(pano_inputs)
        pe, pm = self._pano_fwd_fn(self.params, rng, pano_dev)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        self.llm_token_units += 3.0 * _useful_tokens(batch)
        self.grad_accum, state, loss, logits, fuse, gpe = \
            self._nav_mem_train_cot_fn(
                self.params, self.grad_accum, state, dev, pe, pm,
                jnp.asarray(targets), jnp.float32(coef))
        self.grad_accum = self._pano_vjp_fn(self.params, self.grad_accum,
                                            rng, pano_dev, gpe)
        if not sync:
            return state, logits, fuse, loss
        return state, np.asarray(logits), fuse, float(loss)

    def history_append(self, state, fuse_embeds, a_t):
        return self._hist_append_fn(state, fuse_embeds, jnp.asarray(a_t))

    def fuse_embeds_only(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        """Graph/local fusion without the LLM — used by the fused
        teacher-forcing rollout to extract history embeddings."""
        dev = self._put_batch(batch)
        return np.asarray(self._fuse_only_fn(self.params, dev))

    def gen_embeds(self, vp_img_embeds, vp_masks) -> np.ndarray:
        """Device zero-pos/type-0 fusion for generation paths."""
        return np.asarray(self._gen_embeds_fn(self.params,
                                              jnp.asarray(vp_img_embeds),
                                              jnp.asarray(vp_masks)))

    def generate(self, input_ids, attention_mask, inject_positions,
                 inject_embeds, max_new_tokens: int, do_sample: bool = False,
                 temperature: float = 1.0, trie=None) -> np.ndarray:
        out = decode_generate(
            self.params["llm"], self.cfg.llm, jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            inject_positions=jnp.asarray(inject_positions),
            inject_embeds=jnp.asarray(inject_embeds),
            special_token_mask=self._special_mask,
            eos_id=self.tok.eos_id, pad_id=self.tok.pad_id,
            max_new_tokens=max_new_tokens, do_sample=do_sample,
            temperature=temperature, rng=self._next_rng(), trie=trie,
            kv_int8=self.kv_int8)
        return np.asarray(out)

    # ---------------- tokenization helpers (host) ---------------------- #
    def tokenize_with_positions(self, texts, max_cands: Optional[int] = None,
                                max_hist: Optional[int] = None):
        """Tokenize prompts (or [prompt, answer] pairs) and extract
        end-aligned positions of <cand>/<hist>/<cls_1> tokens.

        Returns (TokenBatch, cand_positions [B,C], hist_positions [B,Hh],
        cls_pos [B]). Positions are -1 padded on the LEFT of the slot
        arrays' tail (end-aligned: if left truncation dropped early
        tokens, the surviving tokens map to the LAST embedding slots).
        """
        C = max_cands if max_cands is not None else self.dims.max_cands
        Hh = max_hist if max_hist is not None else self.dims.max_hist
        batch = self.tok(texts)
        ids = batch.input_ids
        b, _ = ids.shape
        cand_pos = np.full((b, C), -1, np.int32)
        hist_pos = np.full((b, Hh), -1, np.int32)
        cls_pos = np.zeros((b,), np.int32)
        for i in range(b):
            cpos = np.where(ids[i] == self.tok.cand_id)[0]
            hpos = np.where(ids[i] == self.tok.hist_id)[0]
            cand_pos[i, : min(len(cpos), C)] = cpos[-C:]
            hist_pos[i, : min(len(hpos), Hh)] = hpos[-Hh:]
            cls = np.where(ids[i] == self.tok.cls_ids[0])[0]
            cls_pos[i] = cls[-1] if len(cls) else ids.shape[1] - 1
        return batch, cand_pos, hist_pos, cls_pos
