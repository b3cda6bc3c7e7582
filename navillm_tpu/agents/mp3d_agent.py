"""MP3D rollout engine: the host-side policy loop.

TPU-native re-design of the reference MP3DAgent (tasks/agents/
mp3d_agent.py:80-1014). The hot loop keeps the reference's semantics —
per-step panorama encode, graph-memory update, global/local fusion,
prompt assembly, LLM navigation step, teacher/sample/argmax action,
per-step loss with detached graph memory, sub-task heads on the final
step — but all ragged Python/tensor assembly becomes fixed-shape numpy
arrays consumed by jitted device calls (NavModelRunner), and gradients
accumulate in a device pytree instead of per-step .backward().

Key structural mappings (reference -> here):
  panorama_feature_variable_object (98-211)  -> panorama_inputs()
  nav_gmap_variable (304-371)                -> nav_gmap_inputs()
  nav_vp_variable (264-301)                  -> nav_vp_inputs()
  fuse-loop dedup (nav_model.py:164-196)     -> local_match_slot array
  torch.randperm candidates (nav_model 214)  -> host RNG cand_order
  teacher_action[_r4r] (373-455)             -> teacher_action()
  make_equiv_action (475-491)                -> make_equiv_action()
  rollout (593-964)                          -> rollout()
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.prefetch import FeaturePrefetcher
from ..models.trie import DenseTrie
from ..utils.profiling import StageTimer
from ..utils.registry import AGENTS
from . import prompts as P
from .graph_map import GraphMap
from .runner import NavModelRunner, RolloutDims

CLS_TOKEN_TEXT = "<cls_1>"


def jnp_bool(x):
    import jax.numpy as jnp
    return jnp.asarray(x, bool)


def get_results(pred_results: Dict[str, dict], detailed_output=False):
    """Flatten per-episode results (reference mp3d_agent.py:54-77)."""
    out = []
    for k, v in pred_results.items():
        ret = {"instr_id": k, "trajectory": v["path"]}
        if "answer" in v:
            ret.update({
                "pred_answer": v.get("generated_sentences", ""),
                "oracle_pred_answer": v.get("oracle_pred_answer", ""),
                "gt_answer": v["answer"],
            })
        if "pred_objid" in v:
            ret.update({"pred_objid": v["pred_objid"],
                        "pred_obj_direction": v["pred_obj_direction"]})
        out.append(ret)
    return out


class MP3DAgent:
    name = "mp3d"

    def __init__(self, args, world, runner: NavModelRunner,
                 dims: Optional[RolloutDims] = None):
        self.args = args
        self.world = world
        self.runner = runner
        self.dims = dims or runner.dims
        self.scanvp_cands: Dict[str, Dict[str, int]] = {}
        self.np_rng = np.random.RandomState(args.seed)
        self.timer = StageTimer()
        self._prefetcher = None
        # Host-side bf16 cast at the upload boundary: the pano encoder's
        # first op on image features is astype(cfg.dtype)
        # (models/pano_encoder.py:152), so rounding on the host is
        # numerically identical — and halves h2d volume for the big
        # [rows, V, D] feature arrays, the dominant link cost on the
        # relay-attached chip. f32 configs (tests) are untouched.
        try:
            import jax.numpy as _jnp
            import ml_dtypes as _mld
            self._feat_dtype = (_mld.bfloat16 if runner.cfg.pano.dtype
                                == _jnp.bfloat16 else None)
        except ImportError:
            self._feat_dtype = None

    # ---------------- prompt schema dispatch (per-task subclasses) ------ #
    def get_prompt(self, task, *a, **kw):
        kind = {"navigation": P.navigation_prompt,
                "summarization": P.summarization_prompt,
                "embodied_qa": P.embodied_qa_prompt,
                "object_grounding": P.object_grounding_prompt}[task]
        return kind(self.name, *a, **kw)

    # ------------------------------------------------------------------- #
    def update_scanvp_cands(self, obs):
        for ob in obs:
            key = "%s_%s" % (ob["scan"], ob["viewpoint"])
            slot = self.scanvp_cands.setdefault(key, {})
            for cand in ob["candidate"]:
                slot[cand["viewpointId"]] = cand["pointId"]

    def dist(self, scan: str, a: str, b: str) -> float:
        return self.world.graph(scan).distance(a, b)

    # ---------------- fixed-shape input assembly ----------------------- #
    def panorama_inputs(self, obs, with_objects: bool = True,
                        twelve_views: bool = False) -> Dict[str, Any]:
        """Candidate views first, then non-candidate views, padded to
        max_views (reference panorama_feature_variable_object)."""
        D = self.args.image_feat_size
        V = self.dims.max_views
        b = len(obs)
        view_img = np.zeros((b, V, D), np.float32)
        loc_fts = np.zeros((b, V, self.args.angle_feat_size + 3), np.float32)
        nav_types = np.zeros((b, V), np.int32)
        view_lens = np.zeros((b,), np.int32)
        cand_vpids: List[List[str]] = []

        has_obj = with_objects and "obj_img_fts" in obs[0]
        O = self.dims.max_objects
        if has_obj:
            Do = self.args.obj_feat_size
            obj_img = np.zeros((b, O, Do), np.float32)
            obj_loc = np.zeros((b, O, self.args.angle_feat_size + 3),
                               np.float32)
            obj_lens = np.zeros((b,), np.int32)
            obj_ids: List[List] = []

        for i, ob in enumerate(obs):
            feats = ob["feature"]          # [36, D + A]
            if twelve_views:
                n = min(36, V)
                view_img[i, :n] = feats[:n, :D]
                loc_fts[i, :n, : self.args.angle_feat_size] = feats[:n, D:]
                loc_fts[i, :n, self.args.angle_feat_size:] = 1.0
                nav_types[i, : min(12, n)] = 1
                view_lens[i] = n
                cand_vpids.append([None] * 36)
            else:
                used = set()
                k = 0
                for cc in ob["candidate"]:
                    if k >= V:
                        break
                    view_img[i, k] = cc["feature"][:D]
                    loc_fts[i, k, : self.args.angle_feat_size] = \
                        cc["feature"][D:]
                    loc_fts[i, k, self.args.angle_feat_size:] = 1.0
                    nav_types[i, k] = 1
                    used.add(cc["pointId"])
                    k += 1
                cand_vpids.append([cc["viewpointId"]
                                   for cc in ob["candidate"]][:k])
                for vi in range(36):
                    if vi in used or k >= V:
                        continue
                    view_img[i, k] = feats[vi, :D]
                    loc_fts[i, k, : self.args.angle_feat_size] = feats[vi, D:]
                    loc_fts[i, k, self.args.angle_feat_size:] = 1.0
                    k += 1
                view_lens[i] = k
            if has_obj:
                n_obj = min(len(ob["obj_img_fts"]), O)
                if n_obj:
                    obj_img[i, :n_obj] = ob["obj_img_fts"][:n_obj]
                    obj_loc[i, :n_obj] = np.concatenate(
                        [ob["obj_ang_fts"][:n_obj],
                         ob["obj_box_fts"][:n_obj]], 1)
                obj_lens[i] = n_obj
                obj_ids.append(list(ob["obj_ids"])[:n_obj])

        if self._feat_dtype is not None:
            view_img = view_img.astype(self._feat_dtype)
            if has_obj:
                obj_img = obj_img.astype(self._feat_dtype)
        if self.runner.plan is None:
            # Upload the big feature arrays ONCE, asynchronously, at
            # assembly time: the sampling eval step, the fused replay's
            # phase-2 concat, and the heads then reuse the SAME device
            # buffer (jnp.asarray at the jit ingress is a no-op on a
            # committed device array), so the bytes cross the relay
            # link once instead of 2-3x, and the transfer overlaps the
            # rest of the host assembly instead of blocking in
            # dispatch. Multi-device plans keep host arrays — dp row
            # padding (_dp_pad_rows) happens at the dispatch boundary.
            import jax as _jax
            view_img = _jax.device_put(view_img)
            if has_obj:
                obj_img = _jax.device_put(obj_img)
        ret = {"view_img_fts": view_img, "loc_fts": loc_fts,
               "nav_types": nav_types, "view_lens": view_lens,
               "cand_vpids": cand_vpids}
        if has_obj:
            ret.update({"obj_img_fts": obj_img, "obj_loc_fts": obj_loc,
                        "obj_lens": obj_lens, "obj_ids": obj_ids})
        return ret

    def nav_gmap_inputs(self, obs, gmaps: List[GraphMap],
                        fill_embeds: bool = True) -> Dict[str, Any]:
        """fill_embeds=False skips the [B, G, H] node-embedding copy (the
        device-memory path gathers embeddings on chip instead)."""
        G = self.dims.max_gmap_nodes
        H = self.runner.cfg.hidden_size
        b = len(obs)
        A = self.args.angle_feat_size
        img = np.zeros((b, G, H), np.float32) if fill_embeds else None
        step_ids = np.zeros((b, G), np.int32)
        pos_fts = np.zeros((b, G, A + 3), np.float32)
        masks = np.zeros((b, G), bool)
        visited = np.zeros((b, G), bool)
        gmap_vpids: List[List[Optional[str]]] = []
        no_vp_left = []
        for i, gmap in enumerate(gmaps):
            vis, unvis = [], []
            for k in gmap.node_positions:
                (vis if gmap.visited(k) else unvis).append(k)
            no_vp_left.append(len(unvis) == 0)
            if self.args.enc_full_graph:
                vpids = [None] + vis + unvis
                vmask = [False] + [True] * len(vis) + [False] * len(unvis)
            else:
                vpids = [None] + unvis
                vmask = [False] * len(vpids)
            vpids, vmask = vpids[:G], vmask[:G]
            gmap_vpids.append(vpids)
            n = len(vpids)
            masks[i, :n] = True
            visited[i, :n] = vmask
            step_ids[i, :n] = [gmap.node_step_ids.get(vp, 0) for vp in vpids]
            if fill_embeds:
                for k, vp in enumerate(vpids):
                    if k > 0 and gmap.has_node_embed(vp):
                        img[i, k] = gmap.get_node_embed(vp)
            pos_fts[i, :n] = gmap.get_pos_fts(obs[i]["viewpoint"], vpids,
                                              obs[i]["heading"],
                                              obs[i]["elevation"], A)
        return {"gmap_img_embeds": img, "gmap_step_ids": step_ids,
                "gmap_pos_fts": pos_fts, "gmap_masks": masks,
                "gmap_visited_masks": visited, "gmap_vpids": gmap_vpids,
                "no_vp_left": no_vp_left}

    def nav_vp_inputs(self, obs, gmaps, pano_embeds, pano_masks, cand_vpids
                      ) -> Dict[str, Any]:
        """[stop] + panorama views, with 14-dim pos features
        (reference nav_vp_variable). pano_embeds may be None (the
        device-memory path prepends the stop row on chip); pano_masks is
        always a host [B, V] bool array."""
        b, V = pano_masks.shape
        H = self.runner.cfg.hidden_size
        A = self.args.angle_feat_size
        if pano_embeds is not None:
            vp_img = np.zeros((b, V + 1, H), np.float32)
            vp_img[:, 1:] = pano_embeds
        else:
            vp_img = None
        masks = np.zeros((b, V + 1), bool)
        masks[:, 0] = True
        masks[:, 1:] = pano_masks
        pos = np.zeros((b, V + 1, 2 * A + 6), np.float32)
        for i, gmap in enumerate(gmaps):
            start = gmap.get_pos_fts(obs[i]["viewpoint"], [gmap.start_vp],
                                     obs[i]["heading"], obs[i]["elevation"], A)
            pos[i, :, : A + 3] = start[0]
            cand = gmap.get_pos_fts(obs[i]["viewpoint"], cand_vpids[i],
                                    obs[i]["heading"], obs[i]["elevation"], A)
            pos[i, 1: len(cand_vpids[i]) + 1, A + 3:] = cand
        return {"vp_img_embeds": vp_img, "vp_pos_fts": pos,
                "pano_masks": masks,
                "vp_cand_vpids": [[None] + list(x) for x in cand_vpids]}

    def local_match_slots(self, gmap_vpids, vp_cand_vpids, gmaps,
                          width: int) -> np.ndarray:
        """[B, width]: gmap slot of local candidate j's vpid if unvisited,
        else -1 (replaces the per-sample fuse loop nav_model.py:164-189).
        `width` must equal vp_img_embeds.shape[1]."""
        b = len(gmap_vpids)
        out = np.full((b, width), -1, np.int32)
        for i in range(b):
            index = {vp: k for k, vp in enumerate(gmap_vpids[i]) if vp}
            for j, vp in enumerate(vp_cand_vpids[i]):
                if j == 0 or vp is None:
                    continue
                if not gmaps[i].visited(vp) and vp in index:
                    out[i, j] = index[vp]
        return out

    def cand_order_and_prompts(self, gmap_inputs, instructions, history,
                               validate=False, rng=None):
        """Random candidate permutation + schema prompts. Returns
        (cand_order [B,C], prompts, cand_nums). `rng` overrides the
        shared np_rng so interleaved rollout streams draw their
        permutations independently of the interleave order."""
        C = self.dims.max_cands
        b = len(instructions)
        rng = rng if rng is not None else self.np_rng
        order = np.full((b, C), -1, np.int32)
        prompts = []
        cand_nums = []
        for i in range(b):
            slots = [k for k, vp in enumerate(gmap_inputs["gmap_vpids"][i])
                     if k > 0 and vp is not None
                     and not gmap_inputs["gmap_visited_masks"][i][k]]
            perm = rng.permutation(slots)[:C]
            order[i, : len(perm)] = perm
            cand_num = len(slots) + 1          # + stop
            cand_nums.append(cand_num)
            prompts.append(self.get_prompt(
                "navigation", instruction=instructions[i],
                hist_num=len(history[i]), cand_num=min(cand_num, C + 1),
                cls_token=CLS_TOKEN_TEXT))
        return order, prompts, cand_nums

    def _cached_prompt_windows(self, slots, prompts, probe_fn, max_prefix):
        """Split each slot's navigation prompt into (append window,
        suffix window) relative to its cached prefix.

        The cacheable boundary: history items insert right after the
        last `<hist>` token (an atomic special token), so for steps
        with history the boundary is simply last-<hist>+1. At refill
        (no history yet) the boundary is the longest common prefix of
        the prompt's token ids and a PROBE prompt (same prompt with one
        more history item) — the insertion point, derived with zero
        assumptions about tokenizer splice behavior. Rows needing a
        (re)prefill get their prefix queued; inactive rows emit empty
        windows and keep their cache untouched."""
        tok = self.runner.tok
        hist_id = tok.hist_id
        app_list, suf_list, prefill = [], [], []
        empty = np.zeros(0, np.int32)
        for i, sl in enumerate(slots):
            if not sl.active:
                app_list.append(empty)
                suf_list.append(empty)
                continue
            ids = np.asarray(tok.encode(prompts[i], add_bos=True), np.int32)
            if len(ids) > tok.max_length:
                # the uncached path would LEFT-truncate here, which
                # invalidates an append-only prefix cache; fail loudly
                # rather than silently diverge from the full forward
                raise RuntimeError(
                    f"navigation prompt ({len(ids)} tokens) exceeds "
                    f"max_length={tok.max_length}; prefix caching cannot "
                    f"reproduce left truncation — disable "
                    f"args.prefix_cache for this dataset")
            hp = np.nonzero(ids == hist_id)[0]
            if len(hp):
                lcp = int(hp[-1]) + 1
            else:
                # probe built lazily: only fresh rows (no history yet)
                # consume one
                pids = np.asarray(tok.encode(probe_fn(i), add_bos=True),
                                  np.int32)
                m = min(len(ids), len(pids))
                ne = ids[:m] != pids[:m]
                lcp = int(np.argmax(ne)) if ne.any() else m
            if getattr(sl, "needs_prefill", False) or sl.cache_ids is None:
                sl.cache_ids = ids[:lcp]
                sl.needs_prefill = False
                prefill.append((i, sl.cache_ids))
                app_list.append(empty)
            else:
                n = len(sl.cache_ids)
                if n > lcp or not np.array_equal(ids[:n], sl.cache_ids):
                    raise RuntimeError(
                        "prefix-cache token mismatch: this step's prompt "
                        "does not extend the cached prefix (tokenizer "
                        "splice instability?) — disable with "
                        "args.prefix_cache=False")
                app_list.append(ids[n:lcp])
                sl.cache_ids = ids[:lcp]
            if len(sl.cache_ids) > max_prefix:
                raise RuntimeError(
                    f"prompt prefix ({len(sl.cache_ids)} tokens) exceeds "
                    f"RolloutDims.max_prefix={max_prefix}; raise it or "
                    f"disable args.prefix_cache")
            suf_list.append(ids[lcp:])
        return app_list, suf_list, prefill

    @staticmethod
    def _window_arrays(app_list, suf_list, cand_id, hist_id, cls_id, C,
                       min_a_w=8, min_s_w=64):
        """Pack ragged windows into bucketed arrays + suffix-relative
        injection positions (k-th <cand> token <-> cand_order[:, k],
        same pairing as tokenize_with_positions). min_a_w/min_s_w let a
        caller hold a width high-water mark (the training sampling path
        does — every new (a_w, s_w) pair compiles a fresh
        eval_step_cached executable, ~20 s on a remote-compile relay)."""
        n = len(app_list)
        a_w = max(min_a_w,
                  -(-max((len(a) for a in app_list), default=1) // 8) * 8)
        s_w = max(min_s_w,
                  -(-max((len(s) for s in suf_list), default=1) // 64) * 64)
        app_ids = np.zeros((n, a_w), np.int32)
        app_mask = np.zeros((n, a_w), bool)
        app_hist_pos = np.full(n, -1, np.int32)
        suf_ids = np.zeros((n, s_w), np.int32)
        suf_mask = np.zeros((n, s_w), bool)
        cand_pos = np.full((n, C), -1, np.int32)
        cls_pos = np.zeros(n, np.int32)
        for i, (a, s) in enumerate(zip(app_list, suf_list)):
            app_ids[i, : len(a)] = a
            app_mask[i, : len(a)] = True
            hp = np.nonzero(a == hist_id)[0]
            if len(hp):
                app_hist_pos[i] = hp[-1]
            suf_ids[i, : len(s)] = s
            suf_mask[i, : len(s)] = True
            cp = np.nonzero(s == cand_id)[0][:C]
            cand_pos[i, : len(cp)] = cp
            cl = np.nonzero(s == cls_id)[0]
            if len(cl):
                cls_pos[i] = cl[0]
        return {"app_ids": app_ids, "app_mask": app_mask,
                "app_hist_pos": app_hist_pos, "suf_ids": suf_ids,
                "suf_mask": suf_mask, "cand_positions": cand_pos,
                "cls_pos": cls_pos}

    def prefill_rows(self, cache, items, width, quant: bool = False):
        """Dispatch bucketed prompt-prefix prefills into `cache`.

        items: list of (row, prefix_token_ids); width = cache batch
        rows. Calls run in fixed-width chunks (bp <= 8) at 64-bucketed
        prefix widths; padding entries point at distinct rows NOT being
        prefilled with valid=False (a no-op rewrite of that row's old
        content — no scatter-order hazards). Shared by the streaming
        evaluator's refill prefills and the fused-DAgger sampling
        rollout's episode-start prefills (quant=True prefills with the
        int8 sampling policy so cached K/V matches the stepping
        policy). Returns the updated cache."""
        bp = min(8, width)
        fill = self.runner.prefill_q if quant else self.runner.prefill
        for c0 in range(0, len(items), bp):
            chunk = items[c0: c0 + bp]
            spare = [r for r in range(width)
                     if r not in {i for i, _ in chunk}]
            p_w = max(64, -(-max(len(p) for _, p in chunk) // 64) * 64)
            ids = np.zeros((bp, p_w), np.int32)
            mask = np.zeros((bp, p_w), bool)
            rows = np.zeros(bp, np.int32)
            valid = np.zeros(bp, bool)
            for j, (r, pref) in enumerate(chunk):
                ids[j, : len(pref)] = pref
                mask[j, : len(pref)] = True
                rows[j] = r
                valid[j] = True
            for j in range(len(chunk), bp):
                rows[j] = spare[j - len(chunk)]
            with self.timer.stage("prefill_dispatch"):
                cache = fill(cache, ids, mask, rows, valid)
        return cache

    def hist_arrays(self, hist_vis):
        Hh = self.dims.max_hist
        H = self.runner.cfg.hidden_size
        b = len(hist_vis)
        out = np.zeros((b, Hh, H), np.float32)
        for i, vis in enumerate(hist_vis):
            tail = vis[-Hh:]
            for k, v in enumerate(tail):
                out[i, k] = v
        return out

    # ---------------- expert policies ---------------------------------- #
    def teacher_action(self, obs, vpids, ended, visited_masks=None,
                       imitation_learning=False, t=None) -> np.ndarray:
        """Merged teacher_action / teacher_action_r4r
        (mp3d_agent.py:373-455): IL on R2R follows the gt path step;
        otherwise greedy expert minimizing d(cur, v) + d(v, goal)."""
        a = np.zeros(len(obs), np.int64)
        for i, ob in enumerate(obs):
            if ended[i]:
                a[i] = self.args.ignoreid
                continue
            is_r2r = "r2r" in ob["instr_id"]
            if imitation_learning and is_r2r:
                assert ob["viewpoint"] == ob["gt_path"][t], \
                    (ob["viewpoint"], ob["gt_path"], t)
                if t == len(ob["gt_path"]) - 1:
                    a[i] = 0
                else:
                    goal = ob["gt_path"][t + 1]
                    for j, vpid in enumerate(vpids[i]):
                        if vpid == goal:
                            a[i] = j
                            break
            elif ob["viewpoint"] == ob["gt_path"][-1]:
                a[i] = 0
            else:
                scan, cur, goal = ob["scan"], ob["viewpoint"], ob["gt_path"][-1]
                min_idx, min_dist = self.args.ignoreid, float("inf")
                for j, vpid in enumerate(vpids[i]):
                    if j == 0 or vpid is None:
                        continue
                    if visited_masks is not None and visited_masks[i][j]:
                        continue
                    d = self.dist(scan, vpid, goal) + self.dist(scan, cur, vpid)
                    if d < min_dist:
                        min_dist, min_idx = d, j
                a[i] = min_idx
        return a

    def teacher_object(self, obs) -> np.ndarray:
        """Target object slot, +1 for 'not exist' offset
        (mp3d_agent.py:458-472)."""
        targets = np.zeros(len(obs), np.int64)
        for i, ob in enumerate(obs):
            targets[i] = self.args.ignoreid
            if len(ob["obj_ids"]) and ob["viewpoint"] in ob["gt_end_vps"]:
                for j, obj_id in enumerate(ob["obj_ids"]):
                    if str(obj_id) == str(ob["gt_obj_id"]):
                        targets[i] = j + 1
                        break
        return targets

    def make_equiv_action(self, a_t_vpids, gmaps, obs, traj, envs):
        """Append graph path + teleport the sim (mp3d_agent.py:475-491)."""
        for i, ob in enumerate(obs):
            action = a_t_vpids[i]
            if action is None:
                continue
            traj[i]["path"].append(gmaps[i].graph.path(ob["viewpoint"],
                                                       action))
            if len(traj[i]["path"][-1]) == 1:
                prev_vp = traj[i]["path"][-2][-1]
            else:
                prev_vp = traj[i]["path"][-1][-2]
            viewidx = self.scanvp_cands["%s_%s" % (ob["scan"], prev_vp)][action]
            heading = (viewidx % 12) * math.radians(30)
            elevation = (viewidx // 12 - 1) * math.radians(30)
            envs[i].new_episode(0, ob["scan"], action, heading, elevation)

    # ---------------- train / validate entry points -------------------- #
    def train(self, name, batch, args, config, dataset, step=0,
              metrics=None, **kwargs):
        stage_cfg = config.Pretrain if args.stage == "pretrain" else config.Multi
        loss_coef = stage_cfg.LOSS_COEF.get(name, 1.0) \
            if "LOSS_COEF" in stage_cfg else 1.0
        if args.stage == "pretrain" or step % 2 == 0:
            train_ml = loss_coef * args.teacher_forcing_coef
            if getattr(args, "fused_teacher", False):
                from .fused_teacher import rollout_teacher_fused
                loss, _ = rollout_teacher_fused(self, args, name,
                                                config.Optim, batch,
                                                dataset=dataset,
                                                train_ml=train_ml, **kwargs)
            else:
                loss, _ = self.rollout(args, name, config.Optim, batch,
                                       dataset=dataset, feedback="teacher",
                                       train_ml=train_ml,
                                       metrics=metrics, **kwargs)
        else:
            if getattr(args, "fused_dagger", False):
                # no-grad sampling rollout + fused whole-trajectory
                # loss pass (fused_teacher.rollout_dagger_fused) — the
                # split that breaks the per-step path's fwd+bwd-per-
                # step cost floor (VERDICT r3 #2)
                from .fused_teacher import rollout_dagger_fused
                kwargs.pop("metrics", None)
                loss, _ = rollout_dagger_fused(
                    self, args, name, config.Optim, batch, dataset=dataset,
                    train_ml=loss_coef, **kwargs)
                return loss * args.gradient_accumulation_step
            # dagger_streams=1 is the honest serial baseline: take the
            # plain rollout path rather than silently coercing to 2
            n_streams = max(1, int(getattr(args, "dagger_streams", 2)))
            pipeline = (getattr(args, "dagger_pipeline", True)
                        and getattr(self.runner, "device_memory", True)
                        and n_streams >= 2
                        and len(batch["observations"]) >= 4)
            if pipeline:
                loss, _ = self.rollout_interleaved(
                    args, name, config.Optim,
                    _split_batch_dict(batch, n_streams),
                    dataset=dataset, feedback="sample",
                    train_ml=loss_coef, metrics=metrics, **kwargs)
            else:
                loss, _ = self.rollout(args, name, config.Optim, batch,
                                       dataset=dataset, feedback="sample",
                                       train_ml=loss_coef, metrics=metrics,
                                       **kwargs)
        return loss * args.gradient_accumulation_step

    def validate(self, name, args, config, loader, dataset=None, **kwargs):
        results = {}
        trie = None
        if name in ("EQA",):
            trie_seqs = []
            for word in dataset.answer_vocab:
                ids = self.runner.tok.encode(word, add_bos=True)
                trie_seqs.append(ids)
            trie = DenseTrie(trie_seqs, eos_id=self.runner.tok.eos_id)
        looped = False
        for batch in loader:
            _, traj = self.rollout(
                args, name, config.Optim, batch, dataset=dataset,
                feedback="sample" if args.do_sample else "argmax",
                train_ml=None, validate=True, trie=trie, **kwargs)
            for s in traj:
                if s["instr_id"] in results:
                    looped = True
                else:
                    results[s["instr_id"]] = s
            if name in ("EQA",):
                _, oracle_traj = self.rollout(
                    args, name, config.Optim, batch, dataset=dataset,
                    feedback="teacher", train_ml=1, validate=True,
                    trie=trie, **kwargs)
                for s in oracle_traj:
                    results[s["instr_id"]]["oracle_pred_answer"] = \
                        s.get("generated_sentences", "")
            if looped:
                break
        return get_results(results)


    # ---------------- continuous-refill streaming evaluation ----------- #
    def validate_streaming(self, name, args, config, loader, dataset=None,
                           **kwargs):
        """Slot-refill evaluation: N episode slots step together; a slot
        whose episode ends is refilled with the next sample immediately
        (SURVEY.md §7.2.7 — removes the 'batch ends when all episodes
        end' straggler bubble of the reference rollout). Policy
        semantics per step are identical to rollout(feedback=argmax).

        EQA runs fully streamed too: trie-constrained generation fires
        per finishing slot (batched like the OG queue), and the oracle
        second pass (reference mp3d_agent.py:576-584) re-enqueues the
        finished sample into the SAME slot with teacher actions forced
        via a_t_override. Test-mode summarization rides the same
        generation queue.
        """
        trie = None
        if name in ("EQA",):
            trie_seqs = [self.runner.tok.encode(w, add_bos=True)
                         for w in dataset.answer_vocab]
            trie = DenseTrie(trie_seqs, eos_id=self.runner.tok.eos_id)

        def needs_generation(sl):
            if sl.data_type == "eqa":
                return True
            # parity with the batched rollout's feedback gate
            # (mp3d_agent.py:1155): summarization only under
            # teacher/argmax, never under sampling
            return (sl.data_type in ("r2r", "soon", "reverie", "r2r_aug",
                                     "reverie_aug")
                    and args.enable_summarize and args.mode == "test"
                    and not args.do_sample)

        eqa_oracle = name in ("EQA",)
        feedback = "sample" if args.do_sample else "argmax"
        max_action_len = config.Optim.val_max_action_len[name]
        assert max_action_len <= self.dims.max_hist, (
            f"max_action_len {max_action_len} exceeds history capacity "
            f"{self.dims.max_hist}: hist_append would overwrite the last "
            f"slot; raise RolloutDims.max_hist")
        num_slots = max(args.val_batch_size, 1)

        def sample_iter():
            for batch in loader:
                for i in range(batch["batch_size"]):
                    yield {k: batch[k][i] for k in
                           ("observations", "env", "item", "data_type",
                            "instr_id")}

        samples = sample_iter()
        results: Dict[str, dict] = {}
        og_queue: List[dict] = []
        gen_queue: List[dict] = []

        class Slot:
            __slots__ = ("ob", "env", "item", "data_type", "gmap", "traj",
                         "history", "hist_vis", "t", "active", "instruction",
                         "oracle", "cache_ids", "needs_prefill")

        def _init_episode(slot):
            slot.gmap = GraphMap(slot.ob["viewpoint"])
            slot.gmap.update_graph(slot.ob)
            slot.history = []
            slot.hist_vis = []
            slot.t = 0
            slot.active = True
            slot.instruction = slot.ob["instruction"]
            slot.cache_ids = None
            slot.needs_prefill = True
            self.update_scanvp_cands([slot.ob])

        def fill(slot) -> bool:
            try:
                s = next(samples)
            except StopIteration:
                slot.active = False
                return False
            slot.ob = s["observations"]
            slot.env = s["env"]
            slot.item = s["item"]
            slot.data_type = s["data_type"]
            slot.traj = {"instr_id": s["instr_id"],
                         "path": [[slot.ob["viewpoint"]]], "details": {}}
            slot.oracle = False
            _init_episode(slot)
            return True

        def restart_as_oracle(slot):
            """Re-run the SAME sample with teacher actions (EQA oracle
            pass, reference mp3d_agent.py:576-584): fresh episode, fresh
            graph memory; the generated answer lands in the existing
            results entry as oracle_pred_answer."""
            item = slot.item
            slot.env.new_episodes([item["scan"]], [item["path"][0]],
                                  [item.get("heading") or 0.0])
            slot.ob = dataset.get_obs(items=[item], env=slot.env,
                                      data_type=slot.data_type)[0]
            slot.traj = {"instr_id": slot.traj["instr_id"],
                         "path": [[slot.ob["viewpoint"]]], "details": {}}
            slot.oracle = True
            _init_episode(slot)

        use_mem = getattr(self.runner, "device_memory", True)
        # prompt-prefix KV caching: per step the device forwards only
        # the new history tokens + the candidates section instead of
        # the whole prompt (the instruction+history prefix is
        # append-only per episode). Auto-off when the cache would not
        # fit next to the weights (7B eval-only on 16 GB).
        kv_int8 = getattr(args, "kv_int8", False)
        _n_streams = max(1, int(getattr(args, "eval_streams", 0) or 2))
        use_cache = use_mem and getattr(args, "prefix_cache", False) and \
            self.runner.prefix_cache_enabled(num_slots,
                                             self.dims.max_prefix,
                                             n_caches=_n_streams,
                                             kv_int8=kv_int8)
        # Slot groups pipeline the memory path: while the device runs
        # group A's fused step (dispatch is async, only a_t is ever
        # downloaded), the host retires group B's previous actions
        # (env step, get_obs, refill) and assembles + dispatches B's next
        # step. In steady state the chip is never idle waiting for host
        # work and the host never waits except to materialize a finished
        # step's a_t. The host path syncs on full logits, so it stays
        # single-stream. Default 2 groups; on links where the per-step
        # a_t download latency exceeds the device step (tunneled/relay
        # chips measured at a ~40 ms d2h floor), deeper pipelines keep
        # the chip busy — sweepable via args.eval_streams.
        n_streams = _n_streams if use_mem else 1

        from concurrent.futures import ThreadPoolExecutor
        reader = (ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="a_t_reader")
                  if use_mem else None)

        class Stream:
            __slots__ = ("slots", "mem_state", "reset_rows", "pending",
                         "pano_inputs", "gmap_in", "nav_batch", "cur_ids",
                         "cand_ids", "real_mask", "a_t_override", "a_t",
                         "a_t_future", "fuse_embeds", "cache",
                         "prefill_items")

        streams: List[Stream] = []
        for _ in range(n_streams):
            st = Stream()
            st.slots = []
            for _ in range(num_slots):
                sl = Slot()
                if fill(sl):
                    st.slots.append(sl)
            if not st.slots:
                break
            # datasets smaller than the slot count shrink the (fixed)
            # width; a second stream only forms if samples remain
            st.mem_state = (self.runner.memory_init(len(st.slots))
                            if use_mem else None)
            st.cache = (self.runner.prefix_cache_init(
                len(st.slots), self.dims.max_prefix, kv_int8=kv_int8)
                if use_cache else None)
            st.prefill_items = []
            # slots refilled last iteration; their device memory is
            # zeroed at the start of the fused step
            st.reset_rows = np.zeros(len(st.slots), bool)
            st.pending = False
            streams.append(st)
        if not streams:
            return []
        flush_width = len(streams[0].slots)
        if self._prefetcher is None and dataset is not None \
                and getattr(dataset, "feat_db", None) is not None:
            self._prefetcher = FeaturePrefetcher(dataset.feat_db)

        def flush_og(force=False):
            # loop: two streams can enqueue up to 2*flush_width snapshots
            # per iteration, and force-flush must fully drain the queue
            while og_queue and (force or len(og_queue) >= flush_width):
                batch = og_queue[: flush_width]
                del og_queue[: len(batch)]
                pad = batch + [batch[-1]] * (flush_width - len(batch))
                self._streaming_og(args, pad, n_real=len(batch))

        def flush_gen(force=False):
            while gen_queue and (force or len(gen_queue) >= flush_width):
                batch = gen_queue[: flush_width]
                del gen_queue[: len(batch)]
                pad = batch + [batch[-1]] * (flush_width - len(batch))
                self._streaming_generation(args, pad, n_real=len(batch),
                                           trie=trie, results=results)

        def _pre(st: Stream) -> bool:
            """Host assembly of st's next step inputs. False once the
            stream has no active slots (dataset drained)."""
            if not any(sl.active for sl in st.slots):
                return False
            # FIXED slot->row binding: every slot occupies its batch row
            # each iteration (inactive rows are stale and ignored), so
            # device shapes and the memory buffers never shuffle
            active = st.slots
            n = len(active)
            st.real_mask = np.array([sl.active for sl in active])
            obs = [sl.ob for sl in active]
            gmaps = [sl.gmap for sl in active]
            if self._prefetcher is not None:
                self._prefetcher.prefetch_candidates(
                    [sl.ob for sl in active if sl.active])
            for sl in active:
                if sl.active:
                    sl.gmap.node_step_ids[sl.ob["viewpoint"]] = sl.t + 1

            with self.timer.stage("pano_assemble"):
                pano_inputs = self.panorama_inputs(obs)
                host_pano_masks = (
                    np.arange(pano_inputs["view_img_fts"].shape[1])[None, :]
                    < pano_inputs["view_lens"][:, None])

            if use_mem:
                # bookkeeping ids for the on-chip memory update (the
                # update itself runs inside the fused eval step)
                M = st.mem_state["mem_sum"].shape[1]
                st.cur_ids = np.full(n, -1, np.int32)
                st.cand_ids = np.full(
                    (n, pano_inputs["view_img_fts"].shape[1]), -1, np.int32)
                for i, sl in enumerate(active):
                    if not sl.active:
                        continue
                    gidx = sl.gmap.graph.index
                    cid = gidx.get(sl.ob["viewpoint"], -1)
                    st.cur_ids[i] = cid if cid < M else -1
                    for j, cvp in enumerate(pano_inputs["cand_vpids"][i]):
                        if not sl.gmap.visited(cvp):
                            nid = gidx.get(cvp, -1)
                            if 0 <= nid < M:
                                st.cand_ids[i, j] = nid
                pano_embeds_np = None
            else:
                with self.timer.stage("pano_device"):
                    pano_out = self.runner.panorama(pano_inputs,
                                                    deterministic=True)
                pano_embeds_np = pano_out["pano_embeds"]
                host_pano_masks = pano_out["pano_masks"]
                denom = np.maximum(host_pano_masks.sum(1, keepdims=True), 1)
                avg_pano = (pano_embeds_np * host_pano_masks[..., None]) \
                    .sum(1) / denom
                for i, sl in enumerate(active):
                    if not sl.active:
                        continue
                    sl.gmap.update_node_embed(sl.ob["viewpoint"],
                                              avg_pano[i], rewrite=True)
                    for j, cvp in enumerate(pano_inputs["cand_vpids"][i]):
                        if not sl.gmap.visited(cvp):
                            sl.gmap.update_node_embed(cvp, pano_embeds_np[i, j])

            with self.timer.stage("nav_assemble"):
                with self.timer.stage("na_gmap"):
                    gmap_in = self.nav_gmap_inputs(obs, gmaps,
                                                   fill_embeds=not use_mem)
                with self.timer.stage("na_vp"):
                    vp_in = self.nav_vp_inputs(obs, gmaps, pano_embeds_np,
                                               host_pano_masks,
                                               pano_inputs["cand_vpids"])
                    match = self.local_match_slots(
                        gmap_in["gmap_vpids"], vp_in["vp_cand_vpids"], gmaps,
                        width=host_pano_masks.shape[1] + 1)
                with self.timer.stage("na_prompts"):
                    order, prompts, cand_nums = self.cand_order_and_prompts(
                        gmap_in, [sl.instruction for sl in active],
                        [sl.history for sl in active], validate=True)
                with self.timer.stage("na_tok"):
                    if use_cache:
                        C = self.dims.max_cands

                        def probe_fn(i):
                            return self.get_prompt(
                                "navigation",
                                instruction=active[i].instruction,
                                hist_num=len(active[i].history) + 1,
                                cand_num=min(cand_nums[i], C + 1),
                                cls_token=CLS_TOKEN_TEXT)

                        app_l, suf_l, st.prefill_items = \
                            self._cached_prompt_windows(
                                active, prompts, probe_fn,
                                self.dims.max_prefix)
                        tok = self.runner.tok
                        win = self._window_arrays(
                            app_l, suf_l, tok.cand_id, tok.hist_id,
                            tok.cls_ids[0], C)
                    else:
                        tok_batch, cand_pos, hist_pos, cls_pos = \
                            self.runner.tokenize_with_positions(prompts)
            nav_batch = {
                "gmap_step_ids": gmap_in["gmap_step_ids"],
                "gmap_pos_fts": gmap_in["gmap_pos_fts"],
                "gmap_masks": gmap_in["gmap_masks"],
                "gmap_visited_masks": gmap_in["gmap_visited_masks"],
                "vp_pos_fts": vp_in["vp_pos_fts"],
                "pano_masks": vp_in["pano_masks"],
                "local_match_slot": match,
                "cand_order": order,
            }
            if use_cache:
                nav_batch.update(win)
            else:
                nav_batch.update({
                    "cand_positions": cand_pos,
                    "hist_positions": hist_pos,
                    "input_ids": tok_batch.input_ids,
                    "attention_mask": tok_batch.attention_mask,
                    "cls_pos": cls_pos,
                })
            # oracle slots follow the expert policy: teacher actions are
            # host-computable (shortest-path argmin, no model needed)
            st.a_t_override = np.full(n, -1, np.int32)
            for i, sl in enumerate(active):
                if sl.active and getattr(sl, "oracle", False):
                    tgt = self.teacher_action(
                        [sl.ob], [gmap_in["gmap_vpids"][i]],
                        np.zeros(1, bool),
                        visited_masks=gmap_in["gmap_visited_masks"][i:i + 1],
                        imitation_learning=True, t=sl.t)[0]
                    st.a_t_override[i] = max(int(tgt), 0)

            if use_mem:
                M = st.mem_state["mem_sum"].shape[1]
                slot_ids = np.full(gmap_in["gmap_masks"].shape, -1, np.int32)
                for i, sl in enumerate(active):
                    gidx = sl.gmap.graph.index
                    for k, vp in enumerate(gmap_in["gmap_vpids"][i]):
                        if k > 0 and vp is not None:
                            nid = gidx.get(vp, -1)
                            if 0 <= nid < M:
                                slot_ids[i, k] = nid
                nav_batch["slot_ids"] = slot_ids
            else:
                nav_batch["gmap_img_embeds"] = gmap_in["gmap_img_embeds"]
                nav_batch["vp_img_embeds"] = vp_in["vp_img_embeds"]
                nav_batch["hist_embeds"] = self.hist_arrays(
                    [sl.hist_vis for sl in active])
            st.pano_inputs = pano_inputs
            st.gmap_in = gmap_in
            st.nav_batch = nav_batch
            return True

        def _flush_prefill(st: Stream):
            """Prefill queued refilled rows BEFORE the eval step (device
            executes in dispatch order, so the step sees fresh K/V)."""
            items = st.prefill_items
            st.prefill_items = []
            if items:
                st.cache = self.prefill_rows(st.cache, items,
                                             len(st.slots))

        def _dispatch(st: Stream):
            if use_cache:
                _flush_prefill(st)
                with self.timer.stage("nav_dispatch"):
                    st.mem_state, st.cache, st.a_t, _ = \
                        self.runner.eval_step_cached(
                            st.mem_state, st.cache, st.pano_inputs,
                            st.nav_batch, st.reset_rows, st.cur_ids,
                            st.cand_ids, st.real_mask, st.a_t_override,
                            do_sample=(feedback == "sample"),
                            temperature=getattr(args, "temperature", 1.0),
                            sync=False)
                st.fuse_embeds = None
            elif use_mem:
                # ONE device call: reset refills -> pano -> mem update ->
                # nav forward -> action select -> hist append. Async —
                # a_t stays a device array until _post materializes it.
                with self.timer.stage("nav_dispatch"):
                    st.mem_state, st.a_t, _ = self.runner.eval_step(
                        st.mem_state, st.pano_inputs, st.nav_batch,
                        st.reset_rows, st.cur_ids, st.cand_ids,
                        st.real_mask, st.a_t_override,
                        do_sample=(feedback == "sample"),
                        temperature=getattr(args, "temperature", 1.0),
                        sync=False)
                st.fuse_embeds = None
            if use_mem:
                # start the a_t device->host copy NOW: the transfer
                # begins the moment the step finishes on device, so by
                # the time _post materializes it (after the other
                # streams' host work) the d2h latency — ~40 ms on
                # tunneled chips, larger than the device step itself —
                # has already been paid off the critical path.
                try:
                    st.a_t.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                # ALSO materialize on a reader thread: if the runtime's
                # async copy is a no-op (relay backends), np.asarray in
                # _post would serialize the full d2h latency into the
                # single host thread, once per group-step. np.asarray
                # releases the GIL during the transfer, so the reader
                # overlaps the other streams' host work either way.
                st.a_t_future = (reader.submit(np.asarray, st.a_t)
                                 if reader is not None else None)
            else:
                with self.timer.stage("nav_device"):
                    logits, st.fuse_embeds, _ = \
                        self.runner.navigation(st.nav_batch)
                if feedback == "sample":
                    probs = _softmax(logits / max(args.temperature, 1e-6))
                    a_t = np.array([self.np_rng.choice(
                        len(p), p=(p / p.sum()).astype(np.float64))
                        for p in probs.astype(np.float64)])
                else:
                    a_t = logits.argmax(1)
                st.a_t = np.where(st.a_t_override >= 0, st.a_t_override, a_t)
            st.pending = True

        def _post(st: Stream):
            """Retire st's in-flight step: wait only for a_t, then run
            the per-slot host work (stop handling, refill, env step)."""
            st.pending = False
            with self.timer.stage("nav_sync"):
                fut = getattr(st, "a_t_future", None)
                a_t = fut.result() if fut is not None else np.asarray(st.a_t)
                st.a_t_future = None
            gmap_in = st.gmap_in
            nav_vpids = gmap_in["gmap_vpids"]
            st.reset_rows = np.zeros(len(st.slots), bool)
            for i, sl in enumerate(st.slots):
                if not sl.active:
                    continue
                sl.history.append("<hist>")
                if not use_mem:
                    sl.hist_vis.append(st.fuse_embeds[i, a_t[i]])
                sl.t += 1
                stop = (a_t[i] == 0) or gmap_in["no_vp_left"][i] \
                    or sl.t >= max_action_len
                if stop:
                    need_og = sl.data_type in ("soon", "reverie") \
                        and args.enable_og and not sl.oracle
                    need_gen = needs_generation(sl)
                    if need_og or need_gen:
                        if use_mem:
                            buf = np.asarray(st.mem_state["hist_buf"][i])
                            cnt = int(np.asarray(st.mem_state["hist_cnt"][i]))
                            hist_vis = [buf[k] for k in
                                        range(min(cnt, buf.shape[0]))]
                        else:
                            hist_vis = list(sl.hist_vis)
                        snap = {"ob": sl.ob, "history": list(sl.history),
                                "hist_vis": hist_vis,
                                "instruction": sl.instruction,
                                "traj": sl.traj, "oracle": sl.oracle,
                                "data_type": sl.data_type}
                        if need_og:
                            og_queue.append(snap)
                        if need_gen:
                            gen_queue.append(snap)
                    if not sl.oracle:
                        results[sl.traj["instr_id"]] = sl.traj
                        if eqa_oracle:
                            restart_as_oracle(sl)
                        else:
                            fill(sl)
                    else:
                        fill(sl)
                    st.reset_rows[i] = True
                else:
                    action = nav_vpids[i][a_t[i]]
                    with self.timer.stage("env_step"):
                        self.make_equiv_action([action], [sl.gmap], [sl.ob],
                                               [sl.traj], [sl.env])
                    with self.timer.stage("get_obs"):
                        sl.ob = dataset.get_obs(items=[sl.item], env=sl.env,
                                                data_type=sl.data_type)[0]
                    self.update_scanvp_cands([sl.ob])
                    sl.gmap.update_graph(sl.ob)
            # (memory of refilled slots is zeroed inside the NEXT fused
            # eval step via st.reset_rows — no extra device call)

        # prime the pipeline: each stream's first step is dispatched
        # before any result is awaited
        try:
            for st in streams:
                if _pre(st):
                    _dispatch(st)
            while True:
                progressed = False
                for st in streams:
                    if not st.pending:
                        continue
                    progressed = True
                    _post(st)
                    if _pre(st):
                        _dispatch(st)
                if not progressed:
                    break
                flush_og()
                flush_gen()
            flush_og(force=True)
            flush_gen(force=True)
        finally:
            if reader is not None:
                reader.shutdown(wait=True)
        return get_results(results)

    def _streaming_generation(self, args, snaps, n_real, trie, results):
        """Batched generation (EQA answers / test-mode summarization) for
        finished streaming slots — the per-slot analogue of the batched
        final-step head (_generation_step eval branch). Oracle snapshots
        write oracle_pred_answer into the existing results entry
        (reference mp3d_agent.py:576-584)."""
        obs = [sn["ob"] for sn in snaps]
        pano_in = self.panorama_inputs(obs, with_objects=False,
                                       twelve_views=True)
        gen_rng = self.runner._next_rng()
        b = len(snaps)
        host_masks = (np.arange(pano_in["view_img_fts"].shape[1])[None, :]
                      < pano_in["view_lens"][:, None])
        nav_mask = (pano_in["nav_types"] == 1) & host_masks
        cand_counts = nav_mask.sum(1)
        C = int(max(cand_counts.max(), 1))
        is_eqa = snaps[0]["data_type"] == "eqa"
        mode = "embodied_qa" if is_eqa else "summarization"
        prompts = [self.get_prompt(
            mode, instruction=sn["instruction"],
            hist_num=len(sn["history"]), cand_num=int(cand_counts[i]))
            for i, sn in enumerate(snaps)]
        tok_batch, cand_pos, hist_pos, _ = \
            self.runner.tokenize_with_positions(prompts, max_cands=C)
        pano_out = self.runner.panorama(pano_in, deterministic=True,
                                        rng=gen_rng)
        emb = self.runner.gen_embeds(pano_out["pano_embeds"], nav_mask)
        inj_pos = np.concatenate([cand_pos, hist_pos], 1)
        inj_emb = np.concatenate(
            [emb[:, : cand_pos.shape[1]],
             self.hist_arrays([sn["hist_vis"] for sn in snaps])], 1)
        gen_ids = self.runner.generate(
            tok_batch.input_ids, tok_batch.attention_mask, inj_pos, inj_emb,
            max_new_tokens=50, do_sample=False,
            trie=trie if is_eqa else None)
        from ..models.decoding import decode_to_text
        sentences = decode_to_text(self.runner.tok, gen_ids)
        for i in range(n_real):
            sn = snaps[i]
            if sn["oracle"]:
                entry = results.get(sn["traj"]["instr_id"])
                if entry is not None:
                    entry["oracle_pred_answer"] = sentences[i]
            else:
                sn["traj"]["generated_sentences"] = sentences[i]
                sn["traj"]["answer"] = sn["ob"].get("answer", "") if is_eqa \
                    else sn["instruction"]

    def _streaming_og(self, args, snaps, n_real):
        """Batched object-grounding for finished streaming slots."""
        obs = [sn["ob"] for sn in snaps]
        pano_in = self.panorama_inputs(obs)
        pano_out = self.runner.panorama(pano_in, deterministic=True)
        b = len(snaps)
        H = self.runner.cfg.hidden_size
        O = self.dims.max_objects
        if "obj_embeds" in pano_out:
            obj_embeds = pano_out["obj_embeds"]
            obj_masks = pano_out["obj_masks"]
            obj_loc = pano_out["obj_loc_fts"]
        else:
            obj_embeds = np.zeros((b, O, H), np.float32)
            obj_masks = np.zeros((b, O), bool)
            obj_loc = np.zeros((b, O, self.args.angle_feat_size + 3),
                               np.float32)
        prompts = [self.get_prompt(
            "object_grounding", instruction=sn["instruction"],
            hist_num=len(sn["history"]),
            cand_num=int(obj_masks[i].sum()) + 1, cls_token=CLS_TOKEN_TEXT)
            for i, sn in enumerate(snaps)]
        tok_batch, cand_pos, hist_pos, cls_pos = \
            self.runner.tokenize_with_positions(prompts, max_cands=O)
        og_batch = {
            "obj_embeds": obj_embeds, "obj_loc_fts": obj_loc,
            "obj_masks": obj_masks, "input_ids": tok_batch.input_ids,
            "attention_mask": tok_batch.attention_mask,
            "cand_positions": cand_pos, "hist_positions": hist_pos,
            "hist_embeds": self.hist_arrays(
                [sn["hist_vis"] for sn in snaps]),
            "cls_pos": cls_pos,
        }
        obj_logits, _ = self.runner.object_grounding(og_batch)
        for i in range(n_real):
            ob = snaps[i]["ob"]
            traj = snaps[i]["traj"]
            objids = ob["obj_ids"]
            if len(objids):
                best = int(obj_logits[i, 1: len(objids) + 1].argmax())
                traj["pred_objid"] = objids[best]
                dirs = ob.get("obj_directions")
                traj["pred_obj_direction"] = dirs[best] if dirs else None
            else:
                traj["pred_objid"] = None
                traj["pred_obj_direction"] = None

    # ---------------- the rollout hot loop ----------------------------- #
    def rollout(self, args, name, optim_cfg, batch_dict, dataset, feedback,
                train_ml, validate=False, trie=None, metrics=None, **kwargs):
        """Drain `_rollout_gen` to completion (the single-stream path;
        semantics identical to the pre-generator loop). The generator's
        yield points exist for `rollout_interleaved`."""
        gen = self._rollout_gen(args, name, optim_cfg, batch_dict, dataset,
                                feedback, train_ml, validate=validate,
                                trie=trie, metrics=metrics, **kwargs)
        while True:
            try:
                next(gen)
            except StopIteration as e:
                return e.value

    def rollout_interleaved(self, args, name, optim_cfg, halves, dataset,
                            feedback, train_ml, **kwargs):
        """Double-buffered DAgger training rollout: the batch is split
        into independent halves, each run as a `_rollout_gen` stream,
        advanced in lockstep. Each stream's device step (fwd + bwd +
        pano vjp) is dispatched sync-free; while it executes, the OTHER
        stream runs its host work (action sampling, env stepping,
        observation assembly, prompt tokenization) — the same
        host-under-device pipelining `validate_streaming` uses for
        eval, applied to the sample-feedback training half (VERDICT r2
        #3b; reference mp3d_agent.py:593-757 is the serial loop being
        beaten). Gradient STRUCTURE is preserved: every stream's loss
        terms divide by the FULL batch size (loss_denom) and device-
        side grad accumulation is additive, so grads exactly equal
        draining the same streams sequentially (up to fp reordering —
        tests/test_dagger_pipeline.py). Versus the UNSPLIT batch,
        per-stream rngs draw different candidate-order permutations
        (data augmentation), so individual grads differ within
        augmentation jitter while normalization and expectation
        match."""
        denom = sum(len(h["observations"]) for h in halves)
        stream_rngs = kwargs.pop("stream_rngs", None)
        if stream_rngs is None:
            # per-stream rng (action sampling + candidate-order
            # permutation): draws must not depend on the interleave
            # order; seeds chain off the shared np_rng so runs stay
            # reproducible end-to-end
            stream_rngs = [
                np.random.RandomState(int(self.np_rng.randint(0, 2 ** 31 - 1)))
                for _ in halves]
        gens = []
        for h, srng in zip(halves, stream_rngs):
            gens.append(self._rollout_gen(
                args, name, optim_cfg, h, dataset, feedback, train_ml,
                loss_denom=denom, np_rng=srng, **kwargs))
        results: List[Optional[tuple]] = [None] * len(gens)
        live = list(range(len(gens)))
        while live:
            for gi in list(live):
                try:
                    next(gens[gi])
                except StopIteration as e:
                    results[gi] = e.value
                    live.remove(gi)
        loss = sum(r[0] for r in results)
        traj = [t for r in results for t in r[1]]
        return loss, traj

    def _rollout_gen(self, args, name, optim_cfg, batch_dict, dataset,
                     feedback, train_ml, validate=False, trie=None,
                     metrics=None, loss_denom=None, np_rng=None, **kwargs):
        obs = [o for o in batch_dict["observations"]]
        envs = batch_dict["env"]
        items = batch_dict["item"]
        data_type = batch_dict["data_type"]
        batch_size = len(obs)
        training = train_ml is not None and not validate
        # loss_den: interleaved half-batches divide every loss term by
        # the FULL batch size so summed grads match the unsplit batch
        loss_den = loss_denom if loss_denom is not None else batch_size
        rng_local = np_rng if np_rng is not None else self.np_rng

        max_action_len = optim_cfg.val_max_action_len[name] if validate \
            else optim_cfg.train_max_action_len[name]
        assert max_action_len <= self.dims.max_hist, (
            f"max_action_len {max_action_len} exceeds history capacity "
            f"{self.dims.max_hist}: hist_append would overwrite the last "
            f"slot; raise RolloutDims.max_hist")

        self.update_scanvp_cands(obs)
        if self._prefetcher is None and dataset is not None \
                and getattr(dataset, "feat_db", None) is not None:
            self._prefetcher = FeaturePrefetcher(dataset.feat_db)
        gmaps = [GraphMap(ob["viewpoint"]) for ob in obs]
        for i, ob in enumerate(obs):
            gmaps[i].update_graph(ob)

        traj = [{"instr_id": ob["instr_id"], "path": [[ob["viewpoint"]]],
                 "details": {}} for ob in obs]
        ended = np.zeros(batch_size, bool)
        just_ended = np.zeros(batch_size, bool)
        instructions = [ob["instruction"] for ob in obs]
        history = [[] for _ in range(batch_size)]
        hist_vis: List[List[np.ndarray]] = [[] for _ in range(batch_size)]
        ml_loss = 0.0
        flag = False
        # training with on-chip memory: one fused jit per step
        use_mem_train = training and getattr(self.runner, "device_memory",
                                             True)
        mem_state = self.runner.memory_init(batch_size) if use_mem_train \
            else None

        for t in range(max_action_len):
            if ended.all() or t == max_action_len - 1:
                flag = True
            for i, gmap in enumerate(gmaps):
                if not ended[i]:
                    gmap.node_step_ids[obs[i]["viewpoint"]] = t + 1

            # overlap: fetch candidate viewpoints\' features while the
            # device runs this step (SURVEY.md §7.1 prefetch mapping)
            if self._prefetcher is not None:
                self._prefetcher.prefetch_candidates(obs)

            # -- panorama encode + graph memory update --
            # training recomputes the panorama INSIDE the loss jit with
            # this same rng so its parameters receive gradients (the
            # host copy here only feeds the detached graph memory)
            step_rng = self.runner._next_rng()
            with self.timer.stage("pano_assemble"):
                pano_inputs = self.panorama_inputs(obs)
            if use_mem_train:
                # memory updates happen inside the fused train jit; here
                # only the integer bookkeeping is prepared
                pano_embeds = None
                pano_masks = (
                    np.arange(pano_inputs["view_img_fts"].shape[1])[None, :]
                    < pano_inputs["view_lens"][:, None])
                M = mem_state["mem_sum"].shape[1]
                cur_ids = np.full(batch_size, -1, np.int32)
                cand_ids = np.full(
                    (batch_size, pano_inputs["view_img_fts"].shape[1]), -1,
                    np.int32)
                for i, gmap in enumerate(gmaps):
                    if ended[i]:
                        continue
                    gidx = gmap.graph.index
                    cid = gidx.get(obs[i]["viewpoint"], -1)
                    cur_ids[i] = cid if cid < M else -1
                    for j, cvp in enumerate(pano_inputs["cand_vpids"][i]):
                        if not gmap.visited(cvp):
                            nid = gidx.get(cvp, -1)
                            if 0 <= nid < M:
                                cand_ids[i, j] = nid
            else:
                with self.timer.stage("pano_device"):
                    pano_out = self.runner.panorama(
                        pano_inputs, deterministic=not training,
                        rng=step_rng)
                pano_embeds = pano_out["pano_embeds"]     # [B, V, H] numpy
                pano_masks = pano_out["pano_masks"]
                denom = np.maximum(pano_masks.sum(1, keepdims=True), 1)
                avg_pano = (pano_embeds * pano_masks[..., None]).sum(1) / denom
                for i, gmap in enumerate(gmaps):
                    if ended[i]:
                        continue
                    gmap.update_node_embed(obs[i]["viewpoint"], avg_pano[i],
                                           rewrite=True)
                    for j, cvp in enumerate(pano_inputs["cand_vpids"][i]):
                        if not gmap.visited(cvp):
                            gmap.update_node_embed(cvp, pano_embeds[i, j])

            # -- assemble navigation batch --
            with self.timer.stage("nav_assemble"):
                gmap_in = self.nav_gmap_inputs(obs, gmaps,
                                               fill_embeds=not use_mem_train)
            with self.timer.stage("nav_assemble"):
                vp_in = self.nav_vp_inputs(obs, gmaps, pano_embeds,
                                           pano_masks,
                                           pano_inputs["cand_vpids"])
                match = self.local_match_slots(
                    gmap_in["gmap_vpids"], vp_in["vp_cand_vpids"], gmaps,
                    width=pano_masks.shape[1] + 1)
                order, prompts, cand_nums = self.cand_order_and_prompts(
                    gmap_in, instructions, history, validate, rng=rng_local)
                tok_batch, cand_pos, hist_pos, cls_pos = \
                    self.runner.tokenize_with_positions(prompts)
            nav_batch = {
                "gmap_step_ids": gmap_in["gmap_step_ids"],
                "gmap_pos_fts": gmap_in["gmap_pos_fts"],
                "gmap_masks": gmap_in["gmap_masks"],
                "gmap_visited_masks": gmap_in["gmap_visited_masks"],
                "vp_pos_fts": vp_in["vp_pos_fts"],
                "pano_masks": vp_in["pano_masks"],
                "local_match_slot": match,
                "cand_order": order,
                "cand_positions": cand_pos,
                "hist_positions": hist_pos,
                "input_ids": tok_batch.input_ids,
                "attention_mask": tok_batch.attention_mask,
                "cls_pos": cls_pos,
            }
            if not use_mem_train:
                nav_batch["gmap_img_embeds"] = gmap_in["gmap_img_embeds"]
                nav_batch["vp_img_embeds"] = vp_in["vp_img_embeds"]
                nav_batch["hist_embeds"] = self.hist_arrays(hist_vis)

            nav_vpids = gmap_in["gmap_vpids"]
            nav_targets = None
            if train_ml is not None:
                nav_targets = self.teacher_action(
                    obs, nav_vpids, ended,
                    visited_masks=gmap_in["gmap_visited_masks"],
                    imitation_learning=(feedback == "teacher"), t=t)
            coef = (train_ml or 0.0) / loss_den / \
                args.gradient_accumulation_step
            if use_mem_train:
                nav_batch["cur_ids"] = cur_ids
                nav_batch["cand_ids"] = cand_ids
                M = mem_state["mem_sum"].shape[1]
                slot_ids = np.full(gmap_in["gmap_masks"].shape, -1,
                                   np.int32)
                for i, gmap in enumerate(gmaps):
                    gidx = gmap.graph.index
                    for k, vp in enumerate(gmap_in["gmap_vpids"][i]):
                        if k > 0 and vp is not None:
                            nid = gidx.get(vp, -1)
                            if 0 <= nid < M:
                                slot_ids[i, k] = nid
                nav_batch["slot_ids"] = slot_ids
                with self.timer.stage("nav_dispatch"):
                    mem_state, logits, fuse_dev, step_loss = \
                        self.runner.pano_mem_navigation_train(
                            mem_state, step_rng, pano_inputs, nav_batch,
                            nav_targets, coef, sync=False)
                fuse_embeds = None
                # pipeline point: the step (fwd + bwd + pano vjp) is
                # dispatched; a peer stream's host work runs here while
                # the device executes (rollout_interleaved)
                yield
                with self.timer.stage("nav_sync"):
                    logits = np.asarray(logits)
            elif training:
                with self.timer.stage("nav_device"):
                    del nav_batch["vp_img_embeds"]
                    logits, fuse_embeds, _, _, step_loss = \
                        self.runner.pano_navigation_train(
                            pano_inputs, step_rng, nav_batch, nav_targets,
                            coef)
            else:
                with self.timer.stage("nav_device"):
                    logits, fuse_embeds, step_loss = self.runner.navigation(
                        nav_batch, targets=nav_targets, coef=coef,
                        train=training)
            ml_loss += step_loss

            # -- action selection --
            if feedback == "teacher":
                a_t = nav_targets.copy()
            elif feedback == "sample":
                a_t = np.zeros(batch_size, np.int64)
                probs = _softmax(logits / max(args.temperature, 1e-6))
                for i in range(batch_size):
                    p = probs[i].astype(np.float64)
                    a_t[i] = rng_local.choice(len(p), p=p / p.sum())
            elif feedback == "argmax":
                a_t = logits.argmax(1)
            else:
                raise NotImplementedError(feedback)

            if use_mem_train:
                mem_state = self.runner.history_append(
                    mem_state, fuse_dev, a_t.astype(np.int64))
                for i in range(batch_size):
                    if a_t[i] != self.args.ignoreid:
                        history[i].append("<hist>")
            else:
                for i in range(batch_size):
                    if a_t[i] == self.args.ignoreid:
                        continue
                    history[i].append("<hist>")
                    hist_vis[i].append(fuse_embeds[i, a_t[i]])

            if not validate:
                assert feedback in ("teacher", "sample")
                a_t_stop = [ob["viewpoint"] == ob["gt_path"][-1] for ob in obs]
            else:
                a_t_stop = (a_t == 0)

            # -- sub-task heads on the final step --
            if use_mem_train and flag:
                # materialize history embeds for the generation/OG heads
                buf = np.asarray(mem_state["hist_buf"])
                cnt = np.asarray(mem_state["hist_cnt"])
                hist_vis = [[buf[i, k] for k in
                             range(min(int(cnt[i]), buf.shape[1]))]
                            for i in range(batch_size)]
            if data_type[0] in ("soon", "reverie") and args.enable_og and flag:
                ml_loss += self._object_grounding_step(
                    args, obs, gmaps, gmap_in, instructions, history,
                    hist_vis, pano_inputs, traj, batch_size,
                    validate=validate, training=training, loss_denom=loss_den)

            enable_fgr2r = (feedback == "teacher" and not flag
                            and not a_t_stop[0] and data_type[0] == "r2r"
                            and not validate and "fg_instruction" in obs[0]
                            and args.enable_fgr2r)
            if enable_fgr2r:
                ml_loss += self._generation_step(
                    args, obs, gmaps, history=[[] for _ in obs],
                    hist_vis=[[] for _ in obs],
                    instructions=["where are we going with direction ({}) ?"
                                  .format(int(idx)) for idx in nav_targets],
                    answers=[ob["fg_instruction"][ob["fg_view"][t]]
                             for ob in obs],
                    mode="embodied_qa", task="r2r", validate=validate,
                    training=training, traj=traj, trie=None,
                    loss_denom=loss_den)

            if data_type[0] == "eqa":
                enable_summarize = flag
            elif data_type[0] in ("r2r", "soon", "reverie", "r2r_aug",
                                  "reverie_aug"):
                enable_summarize = (feedback in ("teacher", "argmax") and flag
                                    and args.enable_summarize
                                    and (not validate or args.mode == "test"))
            else:
                enable_summarize = False
            if enable_summarize:
                mode = "embodied_qa" if data_type[0] == "eqa" else \
                    "summarization"
                answers = [ob.get("answer", "") if data_type[0] == "eqa"
                           else ob["instruction"] for ob in obs]
                ml_loss += self._generation_step(
                    args, obs, gmaps, history=history, hist_vis=hist_vis,
                    instructions=instructions, answers=answers, mode=mode,
                    task=self.name, validate=validate, training=training,
                    traj=traj, trie=trie, loss_denom=loss_den)

            # -- environment action --
            cpu_a_t: List[Optional[str]] = []
            for i in range(batch_size):
                if a_t_stop[i] or ended[i] or gmap_in["no_vp_left"][i] \
                        or t == max_action_len - 1:
                    cpu_a_t.append(None)
                    just_ended[i] = True
                else:
                    cpu_a_t.append(nav_vpids[i][a_t[i]])
            with self.timer.stage("env_step"):
                self.make_equiv_action(cpu_a_t, gmaps, obs, traj, envs)

            with self.timer.stage("get_obs"):
                new_obs = []
                for i in range(batch_size):
                    new_obs.append(dataset.get_obs(items=[items[i]],
                                                   env=envs[i],
                                                   data_type=data_type[i])[0])
                obs = new_obs
            self.update_scanvp_cands(obs)
            for i, ob in enumerate(obs):
                if not ended[i]:
                    gmaps[i].update_graph(ob)
            ended = np.logical_or(ended,
                                  np.array([x is None for x in cpu_a_t]))
            if flag:
                break

        return ml_loss, traj

    # ---------------- sub-task heads ----------------------------------- #
    def _object_grounding_step(self, args, obs, gmaps, gmap_in, instructions,
                               history, hist_vis, pano_inputs, traj,
                               batch_size, validate, training,
                               loss_denom=None):
        pano_in = self.panorama_inputs(obs)
        og_rng = self.runner._next_rng()
        H = self.runner.cfg.hidden_size
        O = self.dims.max_objects
        has_obj = "obj_img_fts" in pano_in and self.runner.cfg.pano.use_obj
        if has_obj:
            obj_masks = (np.arange(O)[None, :]
                         < pano_in["obj_lens"][:, None])
            obj_loc = pano_in["obj_loc_fts"]
            obj_embeds = None      # training: in-jit; eval: computed below
        else:
            obj_embeds = np.zeros((batch_size, O, H), np.float32)
            obj_masks = np.zeros((batch_size, O), bool)
            obj_loc = np.zeros((batch_size, O,
                                self.args.angle_feat_size + 3), np.float32)
        prompts = []
        for i in range(batch_size):
            cand_num = int(obj_masks[i].sum()) + 1
            prompts.append(self.get_prompt(
                "object_grounding", instruction=instructions[i],
                hist_num=len(history[i]), cand_num=cand_num,
                cls_token=CLS_TOKEN_TEXT))
        tok_batch, cand_pos, hist_pos, cls_pos = \
            self.runner.tokenize_with_positions(prompts,
                                                max_cands=O)
        og_batch = {
            "obj_embeds": obj_embeds, "obj_loc_fts": obj_loc,
            "obj_masks": obj_masks, "input_ids": tok_batch.input_ids,
            "attention_mask": tok_batch.attention_mask,
            "cand_positions": cand_pos, "hist_positions": hist_pos,
            "hist_embeds": self.hist_arrays(hist_vis), "cls_pos": cls_pos,
        }
        loss = 0.0
        if training:
            targets = self.teacher_object(obs)
            coef = args.obj_loss_coef / (loss_denom or batch_size) / \
                args.gradient_accumulation_step
            if has_obj:
                del og_batch["obj_embeds"]
                obj_logits, loss = self.runner.pano_og_train(
                    pano_in, og_rng, og_batch, targets, coef)
            else:
                obj_logits, loss = self.runner.object_grounding(
                    og_batch, targets=targets, coef=coef, train=True)
        else:
            if has_obj:
                pano_out = self.runner.panorama(pano_in, deterministic=True,
                                                rng=og_rng)
                og_batch["obj_embeds"] = pano_out["obj_embeds"]
            obj_logits, _ = self.runner.object_grounding(og_batch)
        for i in range(batch_size):
            objids = obs[i]["obj_ids"]
            if len(objids):
                best = int(obj_logits[i, 1: len(objids) + 1].argmax())
                traj[i]["pred_objid"] = objids[best]
                dirs = obs[i].get("obj_directions")
                traj[i]["pred_obj_direction"] = dirs[best] if dirs else None
            else:
                traj[i]["pred_objid"] = None
                traj[i]["pred_obj_direction"] = None
        return loss

    def _generation_step(self, args, obs, gmaps, history, hist_vis,
                         instructions, answers, mode, task, validate,
                         training, traj, trie, loss_denom=None):
        """Summarization / embodied-QA generation head: 12-view panorama
        + teacher-forced loss (train) or constrained decode (eval)."""
        pano_in = self.panorama_inputs(obs, with_objects=False,
                                       twelve_views=True)
        gen_rng = self.runner._next_rng()
        b = len(obs)
        host_masks = (np.arange(pano_in["view_img_fts"].shape[1])[None, :]
                      < pano_in["view_lens"][:, None])
        # nav-type==1 views are a contiguous prefix: 12 horizon views
        nav_mask = (pano_in["nav_types"] == 1) & host_masks
        cand_counts = nav_mask.sum(1)
        C = int(cand_counts.max())
        prompts = [self.get_prompt(mode, instruction=instructions[i],
                                   hist_num=len(history[i]),
                                   cand_num=int(cand_counts[i]))
                   for i in range(b)]
        if training:
            texts = [[p, a + self.runner.tok.eos_token]
                     for p, a in zip(prompts, answers)]
        else:
            texts = prompts
        tok_batch, cand_pos, hist_pos, _ = \
            self.runner.tokenize_with_positions(texts, max_cands=max(C, 1))
        gen_batch = {
            "input_ids": tok_batch.input_ids,
            "attention_mask": tok_batch.attention_mask,
            "vp_img_embeds": None,   # training: recomputed in-jit; eval: set below
            "vp_masks": nav_mask,
            "cand_positions": cand_pos,
            "hist_positions": hist_pos,
            "hist_embeds": self.hist_arrays(hist_vis),
        }
        if training:
            labels = tok_batch.input_ids.astype(np.int64).copy()
            labels[tok_batch.token_type_ids == 0] = self.args.ignoreid
            gen_batch["labels"] = labels
            del gen_batch["vp_img_embeds"]
            coef = args.gen_loss_coef / (loss_denom or b) / \
                args.gradient_accumulation_step
            return self.runner.pano_generation_train(pano_in, gen_rng,
                                                     gen_batch, coef)
        # eval: constrained / free decode
        pano_out = self.runner.panorama(pano_in, deterministic=True,
                                        rng=gen_rng)
        pano_embeds = pano_out["pano_embeds"]
        gen_batch["vp_img_embeds"] = pano_embeds
        emb = self.runner.gen_embeds(pano_embeds, nav_mask)
        inj_pos = np.concatenate([cand_pos, hist_pos], 1)
        inj_emb = np.concatenate([emb[:, : cand_pos.shape[1]],
                                  self.hist_arrays(hist_vis)], 1)
        gen_ids = self.runner.generate(
            tok_batch.input_ids, tok_batch.attention_mask, inj_pos, inj_emb,
            max_new_tokens=50, do_sample=False, trie=trie)
        from ..models.decoding import decode_to_text
        sentences = decode_to_text(self.runner.tok, gen_ids)
        for i in range(b):
            traj[i]["generated_sentences"] = sentences[i]
            traj[i]["answer"] = answers[i]
        return 0.0


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _split_batch_dict(batch_dict: dict, n_streams: int = 2) -> List[dict]:
    """Split a loader batch into `n_streams` contiguous sub-batches for
    the interleaved DAgger pipeline. Per-sample list/array entries are
    sliced; scalars are copied; 'batch_size' is recomputed."""
    n = len(batch_dict["observations"])
    n_streams = max(1, min(n_streams, n))

    def cut(sl: slice) -> dict:
        out = {}
        for k, v in batch_dict.items():
            if k == "batch_size":
                continue
            if isinstance(v, (list, tuple, np.ndarray)) and len(v) == n:
                out[k] = v[sl]
            else:
                out[k] = v
        out["batch_size"] = len(out["observations"])
        return out

    bounds = [round(i * n / n_streams) for i in range(n_streams + 1)]
    return [cut(slice(bounds[i], bounds[i + 1])) for i in range(n_streams)
            if bounds[i] < bounds[i + 1]]


@AGENTS.register("r2r")
class R2RAgent(MP3DAgent):
    pass


@AGENTS.register("r2r_aug")
class R2RAugAgent(MP3DAgent):
    pass


@AGENTS.register("cvdn")
class CVDNAgent(MP3DAgent):
    pass


@AGENTS.register("reverie")
class REVERIEAgent(MP3DAgent):
    pass


@AGENTS.register("reverie_aug")
class REVERIEAgent_Aug(MP3DAgent):
    pass


@AGENTS.register("soon")
class SOONAgent(MP3DAgent):
    pass


@AGENTS.register("eqa")
class EQAAgent(MP3DAgent):
    pass
