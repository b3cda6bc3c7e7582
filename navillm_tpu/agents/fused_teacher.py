"""Fused whole-trajectory training: one LLM grad chain per trajectory.

The reference runs one Vicuna forward + backward per rollout step
(mp3d_agent.py:593-757). Both training halves can instead run a single
fused loss pass over the whole trajectory (SURVEY.md §7.1 "big win"):

TEACHER half (`rollout_teacher_fused`): under teacher forcing the
entire trajectory is known before any model call — actions follow the
expert policy, and the history embeddings fed to the LLM are the
*pre-LLM* graph-fusion embeddings (nav_model.py:214 feeds fuse_embeds,
which never depend on the LLM). Phase 1 is pure host simulation.

DAGGER half (`rollout_dagger_fused`): actions come from the policy, so
phase 1 runs a NO-GRAD sampling rollout (deterministic panorama + LLM
inference forward per step — 1 forward-unit/step instead of the
per-step path's fwd+bwd ~3 units), recording the same per-step
snapshots. Nothing in that rollout is differentiated; the gradient
then comes from the SAME fused whole-trajectory loss pass as the
teacher half, with targets = the expert action at each visited state
(teacher_action, imitation_learning=False) and the prompt/candidate
permutations REUSED from the sampling pass — exactly the pairing the
reference's per-step path uses (one permutation serves both the
sampled action and the loss at each step, mp3d_agent.py:738-778).
Given the trajectory, gradient structure is identical to the per-step
path (tests/test_fused_dagger.py); the only behavioral difference is
that actions are sampled from the dropout-FREE policy rather than the
dropout-noised one (DAgger needs "sample from the current policy",
not a specific noise instance; documented in docs/PERFORMANCE.md).

Shared fused loss pass (`_fused_trajectory_train`):
  2. device: ONE batched panorama call over all (episode, step) rows;
  3. host: replay graph-memory updates from the panorama outputs,
     assemble per-row navigation arrays;
  4. device: one fusion-only call -> history embeddings per row;
  5. device: navigation LLM loss+grad calls over all rows in fixed
     [args.fused_rows_per_call, L] chunks (loss = sum CE * train_ml /
     loss_den / grad_accum, identical to the per-step path's
     accumulated per-step backwards; chunking bounds the activation
     footprint next to AdamW state on 16 GB and keeps executables at a
     stable shape for any trajectory length);
  6. sub-task heads (FGR2R rows batched; OG / EQA-generation at final
     step) as flat batched calls.

All grad calls dispatch WITHOUT host syncs (device-scalar losses,
no output downloads) so the chain overlaps the next batch's host
phase 1 — train_loop materializes losses one step later.

Gradient structure matches the per-step path exactly: graph memory and
history embeddings are detached in both (verified by
tests/test_fused_teacher.py / test_fused_dagger.py equivalence checks).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import os
import sys

import numpy as np


def rollout_teacher_fused(agent, args, name, optim_cfg, batch_dict, dataset,
                          train_ml, **kwargs):
    """Drop-in replacement for rollout(feedback='teacher', training)."""
    from .graph_map import GraphMap

    obs = [o for o in batch_dict["observations"]]
    envs = batch_dict["env"]
    items = batch_dict["item"]
    data_type = batch_dict["data_type"]
    B = len(obs)
    max_action_len = optim_cfg.train_max_action_len[name]

    agent.update_scanvp_cands(obs)
    if agent._prefetcher is None and dataset is not None \
            and getattr(dataset, "feat_db", None) is not None:
        from ..data.prefetch import FeaturePrefetcher
        agent._prefetcher = FeaturePrefetcher(dataset.feat_db)
    gmaps = [GraphMap(ob["viewpoint"]) for ob in obs]
    for i, ob in enumerate(obs):
        gmaps[i].update_graph(ob)
    traj = [{"instr_id": ob["instr_id"], "path": [[ob["viewpoint"]]],
             "details": {}} for ob in obs]
    instructions = [ob["instruction"] for ob in obs]

    # ---------------- phase 1: host trajectory simulation ----------------
    # per-step snapshots (structure only — nothing pano-dependent)
    steps: List[Dict[str, Any]] = []
    ended = np.zeros(B, bool)
    fgr2r_steps: List[Dict[str, Any]] = []
    t = 0
    while t < max_action_len:
        flag = bool(ended.all() or t == max_action_len - 1)
        for i, gmap in enumerate(gmaps):
            if not ended[i]:
                gmap.node_step_ids[obs[i]["viewpoint"]] = t + 1

        if agent._prefetcher is not None:
            agent._prefetcher.prefetch_candidates(obs)
        with agent.timer.stage("pano_assemble"):
            pano_inputs = agent.panorama_inputs(obs)
        with agent.timer.stage("nav_assemble"):
            gmap_in = agent.nav_gmap_inputs(obs, gmaps)

        nav_targets = agent.teacher_action(
            obs, gmap_in["gmap_vpids"], ended,
            visited_masks=gmap_in["gmap_visited_masks"],
            imitation_learning=True, t=t)

        step = {
            "t": t, "flag": flag, "obs": list(obs), "ended": ended.copy(),
            "pano_inputs": pano_inputs, "gmap_in": gmap_in,
            "targets": nav_targets,
            # node lists needed to rebuild gmap_img_embeds in phase 3
            "gmap_vpids": gmap_in["gmap_vpids"],
        }
        steps.append(step)

        a_t_stop = [ob["viewpoint"] == ob["gt_path"][-1] for ob in obs]

        if (args.enable_fgr2r and data_type[0] == "r2r" and not flag
                and not a_t_stop[0] and "fg_instruction" in obs[0]):
            fgr2r_steps.append({
                "obs": list(obs), "t": t, "targets": nav_targets.copy()})

        # env action (teacher)
        cpu_a_t: List[Optional[str]] = []
        for i in range(B):
            if a_t_stop[i] or ended[i] or gmap_in["no_vp_left"][i] \
                    or t == max_action_len - 1:
                cpu_a_t.append(None)
            else:
                cpu_a_t.append(gmap_in["gmap_vpids"][i][nav_targets[i]])
        with agent.timer.stage("env_step"):
            agent.make_equiv_action(cpu_a_t, gmaps, obs, traj, envs)
        with agent.timer.stage("get_obs"):
            obs = [dataset.get_obs(items=[items[i]], env=envs[i],
                                   data_type=data_type[i])[0]
                   for i in range(B)]
        agent.update_scanvp_cands(obs)
        for i, ob in enumerate(obs):
            if not ended[i]:
                gmaps[i].update_graph(ob)
        ended = np.logical_or(ended, np.array([x is None for x in cpu_a_t]))
        t += 1
        if flag:
            break

    return _fused_trajectory_train(
        agent, args, steps=steps, gmaps=gmaps, traj=traj,
        instructions=instructions, data_type=data_type, B=B,
        train_ml=train_ml, loss_den=B, feedback="teacher",
        fgr2r_steps=fgr2r_steps, t_pad=max_action_len)


def rollout_dagger_fused(agent, args, name, optim_cfg, batch_dict, dataset,
                         train_ml, forced_actions=None, loss_denom=None,
                         np_rng=None, **kwargs):
    """Drop-in replacement for rollout(feedback='sample', training).

    Phase 1': a NO-GRAD sampling rollout (the split the per-step path's
    "FLOP floor" argument ignored — VERDICT r3 #2): per step, the
    deterministic panorama + LLM inference forward produce policy
    logits, the action is sampled host-side with the same
    softmax/temperature/rng code as the per-step path
    (mp3d_agent._rollout_gen), and the same per-step snapshots as the
    teacher phase 1 are recorded — PLUS the sampled action, the
    candidate permutation, and the prompt strings, which the fused loss
    pass reuses verbatim so loss semantics match the per-step path's
    one-permutation-per-step pairing.

    forced_actions ([T][B] int arrays): replay injection for the
    gradient-parity test — bypasses sampling so the fused pass can be
    compared against a per-step run on the identical trajectory.

    PIPELINED SLOT GROUPS (r5): the r4 form ran the whole batch's
    sampling as ONE sequential loop whose per-step a_t materialization
    blocked the host — the device idled through every step's ~230 ms
    of host assembly/sim work (the r4 stage profile's dagger_sample
    1.2 s/call). The batch is now split into `args.dagger_streams`
    groups (default 2) driven round-robin as generators: while group
    A's fused step runs on device, the scheduler executes group B's
    host work. Same trick validate_streaming uses; per-step semantics
    are untouched (groups are disjoint episodes; the fused loss pass
    runs per group with the batch-level loss denominator, so the total
    loss/gradient is the same sum over episodes).
    """
    from .graph_map import GraphMap

    obs_all = [o for o in batch_dict["observations"]]
    B = len(obs_all)
    loss_den = loss_denom if loss_denom is not None else B
    rng_local = np_rng if np_rng is not None else agent.np_rng
    max_action_len = optim_cfg.train_max_action_len[name]
    use_mem = getattr(agent.runner, "device_memory", True)

    agent.update_scanvp_cands(obs_all)
    if agent._prefetcher is None and dataset is not None \
            and getattr(dataset, "feat_db", None) is not None:
        from ..data.prefetch import FeaturePrefetcher
        agent._prefetcher = FeaturePrefetcher(dataset.feat_db)

    # the host fallback syncs on full logits inside the step, so it
    # gains nothing from pipelining; small batches keep one group
    n_groups = int(getattr(args, "dagger_streams", 0) or 2)
    if not use_mem:
        n_groups = 1
    while n_groups > 1 and (B % n_groups != 0 or B // n_groups < 2):
        n_groups -= 1

    # prefix-cache budget check at the BATCH level (the groups' caches
    # coexist; training holds params + grad accum + two Adam moments
    # next to them — ~4x params as the coarse stand-in)
    use_cache = use_mem and bool(getattr(args, "dagger_prefix_cache", True))
    if use_cache:
        import jax
        import jax.numpy as _jnp
        _c = agent.runner.cfg.llm
        _pbytes = int(sum(x.size * x.dtype.itemsize
                          for x in jax.tree.leaves(agent.runner.params)))
        _cbytes = int(2 * _c.num_layers * B * agent.dims.max_prefix
                      * _c.num_kv_heads * _c.head_dim
                      * _jnp.dtype(_c.dtype).itemsize)
        use_cache = _cbytes + 4 * _pbytes < 12e9

    reader = getattr(agent, "_a_t_reader", None)
    if reader is None and use_mem:
        from concurrent.futures import ThreadPoolExecutor
        reader = ThreadPoolExecutor(max_workers=1,
                                    thread_name_prefix="dagger_a_t")
        agent._a_t_reader = reader

    Bg = B // n_groups
    groups = []
    for g in range(n_groups):
        sl = slice(g * Bg, (g + 1) * Bg)
        obs = obs_all[sl]
        gmaps = [GraphMap(ob["viewpoint"]) for ob in obs]
        for i, ob in enumerate(obs):
            gmaps[i].update_graph(ob)
        groups.append({
            "obs": obs,
            "envs": batch_dict["env"][sl],
            "items": batch_dict["item"][sl],
            "data_type": batch_dict["data_type"][sl],
            "gmaps": gmaps,
            "traj": [{"instr_id": ob["instr_id"],
                      "path": [[ob["viewpoint"]]], "details": {}}
                     for ob in obs],
            "instructions": [ob["instruction"] for ob in obs],
            "steps": [],
            "forced": ([np.asarray(fa)[sl] for fa in forced_actions]
                       if forced_actions is not None else None),
        })

    gens = [_dagger_sample_group(agent, args, grp, dataset, rng_local,
                                 max_action_len, use_cache, reader)
            for grp in groups]
    live = list(gens)
    while live:
        for gen in list(live):
            try:
                next(gen)
            except StopIteration:
                live.remove(gen)

    # fused whole-trajectory loss pass per group (phases 2-6). The
    # denominator stays the BATCH size, so sum-over-groups equals the
    # single-group loss; grad chunks are fixed-width either way.
    ml_loss = 0.0
    traj = []
    for grp in groups:
        loss_g, traj_g = _fused_trajectory_train(
            agent, args, steps=grp["steps"], gmaps=grp["gmaps"],
            traj=grp["traj"], instructions=grp["instructions"],
            data_type=grp["data_type"], B=len(grp["obs"]),
            train_ml=train_ml, loss_den=loss_den, feedback="sample",
            fgr2r_steps=[], t_pad=max_action_len)
        ml_loss = ml_loss + loss_g
        traj.extend(traj_g)
    return ml_loss, traj


def _dagger_sample_group(agent, args, grp, dataset, rng_local,
                         max_action_len, use_cache, reader):
    """Phase 1' sampling rollout for ONE slot group, as a GENERATOR.

    Yields exactly once per step, between dispatching the fused eval
    step (async, sync=False) and materializing its a_t — so the
    round-robin scheduler in rollout_dagger_fused can run the OTHER
    groups' host work (env step, get_obs, prompt assembly) while this
    group's step executes on device. Per-step semantics are identical
    to the r4 single-group loop: the scheduler only changes WHEN host
    work happens, never what it computes. Results land in grp["steps"]
    / grp["traj"] / grp["gmaps"] for the fused loss pass."""
    from .mp3d_agent import _softmax

    obs = grp["obs"]
    envs = grp["envs"]
    items = grp["items"]
    data_type = grp["data_type"]
    gmaps = grp["gmaps"]
    traj = grp["traj"]
    instructions = grp["instructions"]
    forced_actions = grp["forced"]
    B = len(obs)
    history: List[List[str]] = [[] for _ in range(B)]
    # policy-side history embeds (host fallback path only); the loss
    # pass recomputes its own dropout-noised history in phase 4
    hist_vis_eval: List[List[np.ndarray]] = [[] for _ in range(B)]

    # device-resident sampling: the SAME one-call fused eval step the
    # streaming evaluator uses (agents/device_memory.eval_step — pano +
    # memory update + nav forward + on-device categorical sampling +
    # hist append in one executable). Per-step host<->device traffic is
    # pano features up, a_t [B] down; the host-arrays fallback below
    # uploads graph/vp/history embeds every step, which dominated
    # wall-clock on the tunneled chip.
    use_mem = getattr(agent.runner, "device_memory", True)
    mem_state = agent.runner.memory_init(B) if use_mem else None
    # W8A8 sampling policy (r5): the no-grad rollout's policy forwards
    # run int8xint8 on the MXU (~2x the bf16 rate) against a lazily
    # re-quantized copy of the current params. Gradients are untouched
    # — the fused loss pass recomputes in bf16 from the trajectory; the
    # only change is the exploration distribution, the same int8 grid
    # the W8A8 eval headline samples/argmaxes from (accuracy contract:
    # tests/test_quant.py trajectory agreement). Off under forced
    # actions only via args (tests exercise both).
    use_q = use_mem and bool(getattr(args, "dagger_sample_quant", True)) \
        and agent.runner.sampling_quant_available()

    # Prefix-cached sampling (r4): the sampling rollout pays one full-
    # prompt forward PER STEP on the uncached path even though the
    # instruction+history prefix is append-only — exactly the workload
    # the streaming evaluator's prompt-prefix KV cache removes
    # (device_memory.eval_step_cached: prefill once, then per step
    # forward only the new-history append + candidates suffix). Reuses
    # the same _cached_prompt_windows/_window_arrays/prefill_rows host
    # machinery; trajectory-identical math (chunk-parity + streaming
    # A/B tests pin the cached step).
    from .mp3d_agent import CLS_TOKEN_TEXT
    C = agent.dims.max_cands
    # FIXED cache width + persistent buffer POOL: cache_P enters the
    # eval_step_cached/prefill executable shapes, so a per-batch
    # right-sized P would recompile them for every new batch-max
    # prefix length; and reallocating ~0.8 GB per DAgger batch churned
    # the HBM allocator (dispatch stalls measured in the phase-2/5
    # uploads that follow). Buffers keyed (B, P) live in a pool on the
    # agent (one per slot group) and are re-prefilled each batch (stale
    # K/V beyond plen is invisible behind prefix_mask).
    cache = None
    cache_P = agent.dims.max_prefix
    if use_cache:
        pool = getattr(agent, "_dagger_cache_pool", [])
        agent._dagger_cache_pool = pool
        for pi, (bb, pp, _buf) in enumerate(pool):
            if bb == B and pp == cache_P:
                cache = pool.pop(pi)[2]   # ownership moves to this loop
                break
        if cache is None:
            cache = agent.runner.prefix_cache_init(B, cache_P)

    class _Row:
        __slots__ = ("active", "cache_ids", "needs_prefill")

    rows_state = None
    if use_cache:
        rows_state = []
        for _ in range(B):
            r = _Row()
            r.active, r.cache_ids, r.needs_prefill = True, None, True
            rows_state.append(r)

    steps: List[Dict[str, Any]] = grp["steps"]
    ended = np.zeros(B, bool)
    t = 0
    while t < max_action_len:
        flag = bool(ended.all() or t == max_action_len - 1)
        for i, gmap in enumerate(gmaps):
            if not ended[i]:
                gmap.node_step_ids[obs[i]["viewpoint"]] = t + 1
        if agent._prefetcher is not None:
            agent._prefetcher.prefetch_candidates(obs)
        with agent.timer.stage("pano_assemble"):
            pano_inputs = agent.panorama_inputs(obs)

        if use_mem:
            pano_embeds = None
            pano_masks = (
                np.arange(pano_inputs["view_img_fts"].shape[1])[None, :]
                < pano_inputs["view_lens"][:, None])
            M = mem_state["mem_sum"].shape[1]
            cur_ids = np.full(B, -1, np.int32)
            cand_ids = np.full(
                (B, pano_inputs["view_img_fts"].shape[1]), -1, np.int32)
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
            # host fallback: no-grad deterministic panorama feeds the
            # host graph-embedding store
            with agent.timer.stage("pano_device"):
                pano_out = agent.runner.panorama(pano_inputs,
                                                 deterministic=True)
            pano_embeds = pano_out["pano_embeds"]
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

        with agent.timer.stage("nav_assemble"):
            gmap_in = agent.nav_gmap_inputs(obs, gmaps,
                                            fill_embeds=not use_mem)
            if use_mem:
                # phase 3 of the fused pass fills this snapshot buffer
                # from the replayed (dropout-noised) panorama embeds;
                # on the host path it starts as the eval embeds and is
                # overwritten the same way
                gmap_in["gmap_img_embeds"] = np.zeros(
                    (B, agent.dims.max_gmap_nodes,
                     agent.runner.cfg.hidden_size), np.float32)
            vp_in = agent.nav_vp_inputs(obs, gmaps, pano_embeds, pano_masks,
                                        pano_inputs["cand_vpids"])
            match = agent.local_match_slots(
                gmap_in["gmap_vpids"], vp_in["vp_cand_vpids"], gmaps,
                width=pano_masks.shape[1] + 1)
            order, prompts, cand_nums = agent.cand_order_and_prompts(
                gmap_in, instructions, history, validate=False,
                rng=rng_local)
            win = prefill_items = None
            if use_cache:
                for i in range(B):
                    rows_state[i].active = not ended[i]

                def probe_fn(i):
                    return agent.get_prompt(
                        "navigation", instruction=instructions[i],
                        hist_num=len(history[i]) + 1,
                        cand_num=min(cand_nums[i], C + 1),
                        cls_token=CLS_TOKEN_TEXT)

                try:
                    app_l, suf_l, prefill_items = \
                        agent._cached_prompt_windows(
                            rows_state, prompts, probe_fn, cache_P)
                except RuntimeError:
                    # a prompt outgrew the cache budget mid-batch: the
                    # graph memory is cache-independent, so the rest of
                    # the batch falls back to the full-prompt step.
                    # Hand the (untouched-beyond-plen) buffer straight
                    # back so later batches reuse it instead of
                    # re-allocating ~0.8 GB per batch (advisor r4)
                    use_cache = False
                    agent._dagger_cache_pool.append((B, cache_P, cache))
                    cache = None
                else:
                    tok = agent.runner.tok
                    # width HWM + one-bucket overshoot (r5): prompts
                    # lengthen as the policy trains, and every new
                    # (a_w, s_w) pair recompiles eval_step_cached
                    # (~20 s remote) — measured as a 3.0 vs 7.3 eps/s
                    # first timed bench window. Monotone widths trade a
                    # sliver of masked attention FLOPs for one stable
                    # executable. Sampling-path only: streaming eval
                    # keeps its tight tuned widths.
                    a_need = max(8, -(-max((len(a) for a in app_l),
                                           default=1) // 8) * 8)
                    s_need = max(64, -(-max((len(s) for s in suf_l),
                                            default=1) // 64) * 64)
                    aw = getattr(agent, "_samp_aw_hwm", 0)
                    sw = getattr(agent, "_samp_sw_hwm", 0)
                    if a_need > aw or s_need > sw:
                        aw = max(aw, a_need + 8)
                        sw = max(sw, s_need + 64)
                        agent._samp_aw_hwm, agent._samp_sw_hwm = aw, sw
                        if os.environ.get("NAVILLM_DEBUG_SHAPES"):
                            print(f"[fused] sample window hwm bump -> "
                                  f"a_w={aw} s_w={sw}", file=sys.stderr)
                    win = agent._window_arrays(
                        app_l, suf_l, tok.cand_id, tok.hist_id,
                        tok.cls_ids[0], C, min_a_w=aw, min_s_w=sw)
            if not use_cache:
                tok_batch, cand_pos, hist_pos, cls_pos = \
                    agent.runner.tokenize_with_positions(prompts)
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

        nav_targets = agent.teacher_action(
            obs, gmap_in["gmap_vpids"], ended,
            visited_masks=gmap_in["gmap_visited_masks"],
            imitation_learning=False, t=t)

        if use_mem:
            M = mem_state["mem_sum"].shape[1]
            slot_ids = np.full(gmap_in["gmap_masks"].shape, -1, np.int32)
            for i, gmap in enumerate(gmaps):
                gidx = gmap.graph.index
                for k, vp in enumerate(gmap_in["gmap_vpids"][i]):
                    if k > 0 and vp is not None:
                        nid = gidx.get(vp, -1)
                        if 0 <= nid < M:
                            slot_ids[i, k] = nid
            nav_batch["slot_ids"] = slot_ids
            override = np.full(B, -1, np.int32)
            if forced_actions is not None:
                override = np.asarray(forced_actions[t], np.int32)
            if use_cache and prefill_items:
                cache = agent.prefill_rows(cache, prefill_items, B,
                                           quant=use_q)
            with agent.timer.stage("dagger_sample"):
                # on-device categorical sampling (same temperature-
                # softmax distribution as the host path; the draw uses
                # the runner's jax rng stream instead of np_rng).
                # ASYNC dispatch: a_t stays a device array; the yield
                # below lets the scheduler run the other groups' host
                # work while this step executes.
                step_cached = (agent.runner.eval_step_cached_q if use_q
                               else agent.runner.eval_step_cached)
                step_plain = (agent.runner.eval_step_q if use_q
                              else agent.runner.eval_step)
                if use_cache:
                    mem_state, cache, a_t, _ = step_cached(
                        mem_state, cache, pano_inputs, nav_batch,
                        reset_mask=np.zeros(B, bool), cur_ids=cur_ids,
                        cand_ids=cand_ids, active_mask=~ended,
                        a_t_override=override,
                        do_sample=forced_actions is None,
                        temperature=max(args.temperature, 1e-6),
                        sync=False)
                else:
                    mem_state, a_t, _ = step_plain(
                        mem_state, pano_inputs, nav_batch,
                        reset_mask=np.zeros(B, bool), cur_ids=cur_ids,
                        cand_ids=cand_ids, active_mask=~ended,
                        a_t_override=override,
                        do_sample=forced_actions is None,
                        temperature=max(args.temperature, 1e-6),
                        sync=False)
            # start the d2h copy at dispatch AND materialize on the
            # reader thread (same rationale as validate_streaming's
            # _dispatch: relay backends may no-op the async copy, and
            # np.asarray releases the GIL during the transfer)
            try:
                a_t.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            fut = reader.submit(np.asarray, a_t) if reader is not None \
                else None
            yield
            with agent.timer.stage("dagger_sync"):
                a_t = fut.result() if fut is not None else np.asarray(a_t)
            a_t = a_t.astype(np.int64)
        else:
            nav_batch["gmap_img_embeds"] = gmap_in["gmap_img_embeds"]
            nav_batch["vp_img_embeds"] = vp_in["vp_img_embeds"]
            nav_batch["hist_embeds"] = agent.hist_arrays(hist_vis_eval)
            with agent.timer.stage("dagger_sample"):
                logits, fuse_embeds, _ = agent.runner.navigation(
                    nav_batch, train=False)
            if forced_actions is not None:
                a_t = np.asarray(forced_actions[t], np.int64)
            else:
                # same sampling code as the per-step path (temperature
                # softmax + host rng.choice)
                a_t = np.zeros(B, np.int64)
                probs = _softmax(logits / max(args.temperature, 1e-6))
                for i in range(B):
                    p = probs[i].astype(np.float64)
                    a_t[i] = rng_local.choice(len(p), p=p / p.sum())

        steps.append({
            "t": t, "flag": flag, "obs": list(obs), "ended": ended.copy(),
            "pano_inputs": pano_inputs, "gmap_in": gmap_in,
            "targets": nav_targets, "gmap_vpids": gmap_in["gmap_vpids"],
            "actions": a_t.copy(), "order": order, "prompts": prompts,
            # phase-3 host-work reuse (r5): on the device-memory path
            # vp_in carries no embedding values (pano_embeds=None) and
            # match was computed against the visited state AT THIS STEP
            # — exactly what phase 3 would rebuild from the snapshot.
            # The host fallback's vp_in holds eval-pass embeds, which
            # phase 3 must NOT reuse (it needs the dropout-noised ones).
            "vp_in": vp_in if use_mem else None,
            "match": match if use_mem else None,
        })

        # history bookkeeping exactly as the per-step path
        # (mp3d_agent.py:1386-1397 / reference mp3d_agent.py:774-778):
        # append for every row whose action isn't ignoreid, ended or not
        for i in range(B):
            if a_t[i] != args.ignoreid:
                history[i].append("<hist>")
                if not use_mem:
                    hist_vis_eval[i].append(fuse_embeds[i, a_t[i]])

        a_t_stop = [ob["viewpoint"] == ob["gt_path"][-1] for ob in obs]
        cpu_a_t: List[Optional[str]] = []
        for i in range(B):
            if a_t_stop[i] or ended[i] or gmap_in["no_vp_left"][i] \
                    or t == max_action_len - 1:
                cpu_a_t.append(None)
            else:
                cpu_a_t.append(gmap_in["gmap_vpids"][i][a_t[i]])
        with agent.timer.stage("env_step"):
            agent.make_equiv_action(cpu_a_t, gmaps, obs, traj, envs)
        with agent.timer.stage("get_obs"):
            obs = [dataset.get_obs(items=[items[i]], env=envs[i],
                                   data_type=data_type[i])[0]
                   for i in range(B)]
        agent.update_scanvp_cands(obs)
        for i, ob in enumerate(obs):
            if not ended[i]:
                gmaps[i].update_graph(ob)
        ended = np.logical_or(ended, np.array([x is None for x in cpu_a_t]))
        t += 1
        if flag:
            break

    if cache is not None:
        # hand the buffer back for the next DAgger batch's matching
        # group (same B/P -> zero reallocation, zero recompiles)
        agent._dagger_cache_pool.append((B, cache_P, cache))


_PHASE2_CONCAT = None


def _phase2_concat_jit(tree):
    """One-dispatch device concat for phase 2: {key: [Tp parts]} ->
    {key: [Tp*B, ...]}. Compiled once per pytree signature (the zeros
    padding keeps it constant across batches)."""
    global _PHASE2_CONCAT
    if _PHASE2_CONCAT is None:
        import jax
        import jax.numpy as jnp
        _PHASE2_CONCAT = jax.jit(
            lambda t: {k: jnp.concatenate(v, 0) for k, v in t.items()})
    return _PHASE2_CONCAT(tree)


def _fused_trajectory_train(agent, args, *, steps, gmaps, traj, instructions,
                            data_type, B, train_ml, loss_den, feedback,
                            fgr2r_steps, t_pad=None):
    """Phases 2-6: the fused whole-trajectory loss pass (see module
    docstring). `steps` carries the phase-1 snapshots; for
    feedback='sample' each step additionally holds the sampled
    'actions', the candidate 'order', and the 'prompts' to reuse."""
    import jax.numpy as jnp
    T = len(steps)

    # ---------------- phase 2: one batched panorama call -----------------
    import jax

    # feature arrays arrive as committed DEVICE buffers (uploaded once
    # at assembly time, panorama_inputs) — concatenate on device
    # (np.concatenate would silently download them), PADDED to the
    # fixed T_pad*B row count so every downstream gather executable
    # sees one stable input shape: a shape that tracked the per-batch T
    # or n_live would recompile nearly every batch, minutes each on the
    # remote-compile relay.
    #
    # ONE dispatch for the whole phase (r5): the old per-key eager
    # concat+zeros issued ~14 relay round trips per batch — measured
    # 890 ms/batch on a degraded-link session. Padding with (Tp-T)
    # repeats of a FIXED per-key [B, ...] zeros buffer makes the jitted
    # concat's pytree signature constant (Tp parts per key, every
    # batch), so the whole dict concatenates in one jit call that
    # compiles once per (key-set, Tp, B) and dispatches once per batch.
    def cat_np(key):
        return np.concatenate([s["pano_inputs"][key] for s in steps], 0)

    with agent.timer.stage("phase2_host"):
        keys = ["view_img_fts", "loc_fts", "nav_types", "view_lens"]
        if "obj_img_fts" in steps[0]["pano_inputs"]:
            keys += ["obj_img_fts", "obj_loc_fts", "obj_lens"]
        dev_keys = [k for k in keys
                    if isinstance(steps[0]["pano_inputs"][k], jax.Array)]
        pano_cat = {k: cat_np(k) for k in keys if k not in dev_keys}
        if dev_keys:
            Tp = max(t_pad or T, T)
            zcache = getattr(agent, "_phase2_zeros", None)
            if zcache is None:
                zcache = agent._phase2_zeros = {}
            tree = {}
            for k in dev_keys:
                parts = [s["pano_inputs"][k] for s in steps]
                if Tp > T:
                    sig = (k, parts[0].shape, str(parts[0].dtype))
                    z = zcache.get(sig)
                    if z is None:
                        z = zcache[sig] = jnp.zeros(parts[0].shape,
                                                    parts[0].dtype)
                    parts = parts + [z] * (Tp - T)
                tree[k] = parts
            pano_cat.update(_phase2_concat_jit(tree))
    # The live rows are processed in fixed-width CHUNKS: the whole-
    # trajectory grad call at T*B ~ 80 rows x 512 tokens plus AdamW
    # state is marginal on a 16 GB chip, and chunking also makes every
    # executable a stable [chunk, L] shape regardless of trajectory
    # length (fewer compiles). The last chunk pads by repeating the LAST
    # real row with ignoreid targets — loss-invariant (sum-with-ignore).
    # Each chunk gets its OWN rng, used identically by the phase-2
    # panorama below and the phase-5 loss jit that recomputes it (so
    # pano values match and its params get gradients).
    #
    # ROW COMPACTION: a (t, i) row where episode i already ended
    # contributes NOTHING — its target is ignoreid (zero loss, zero
    # grads) and phase 3 skips its node updates — yet it used to pay a
    # full panorama + LLM fwd/bwd. Variable episode lengths make this a
    # 20-50% row reduction at zero numerical cost, so both the phase-2
    # pano chunks and the phase-5 grad chunks run over live rows only
    # (identical compact ordering keeps the per-chunk rng alignment).
    #
    # EXCEPTION (sample feedback only): under sample feedback the
    # per-step path keeps appending history embeds for rows whose
    # episode already ended (reference mp3d_agent.py:774-778 appends
    # for every a_t != -100, and sampled actions never are), and those
    # embeds feed the final-step OG / EQA heads. When such a head will
    # run, dead rows' fuse outputs are therefore real inputs and
    # compaction is disabled for exact per-step parity; without a final
    # head the dead appends are never read and compaction is sound.
    heads_on = (data_type[0] in ("soon", "reverie") and args.enable_og) \
        or data_type[0] == "eqa"
    compact = feedback == "teacher" or not heads_on
    rows_total = T * B
    if compact:
        row_live = np.concatenate([~s["ended"] for s in steps])   # [T*B]
    else:
        row_live = np.ones(rows_total, bool)
    live_idx = np.nonzero(row_live)[0]
    n_live = len(live_idx)
    # flat (t*B+i) -> compact position; -1 for dead rows
    compact_of = np.full(rows_total, -1, np.int64)
    compact_of[live_idx] = np.arange(n_live)
    chunk = int(getattr(args, "fused_rows_per_call", 0) or 0)
    if chunk <= 0:
        chunk = n_live
    bounds = list(range(0, n_live, chunk))

    def chunk_idx(c0):
        """Chunk row indices INTO THE COMPACT ordering, padded by
        repeating the last live row."""
        idx = np.arange(c0, c0 + chunk)
        n_real = min(chunk, n_live - c0)
        return np.minimum(idx, n_live - 1), n_real

    # live-row compaction: host members compact HERE (free np slicing);
    # DEVICE members stay at the fixed T_pad*B rows and compact inside
    # each fixed-width chunk gather below (live_idx[idx]) — the same
    # rows, but the gather executable's input shape never varies
    pano_cat = {k: (v if isinstance(v, jax.Array) else v[live_idx])
                for k, v in pano_cat.items()}

    def chunk_feats(idx):
        """Per-chunk pano inputs: np members slice on host in the
        COMPACT ordering; device members gather the equivalent GLOBAL
        rows (live_idx[idx]) out of the fixed-shape device buffer."""
        g = live_idx[idx]
        return {k: (v[g] if isinstance(v, jax.Array) else v[idx])
                for k, v in pano_cat.items()}
    # DEVICE-RESIDENT REPLAY (r4): no host logic below branches on an
    # embedding VALUE — the host only does index bookkeeping — so on
    # the device-memory path the pano embeds stay in HBM, the memory
    # replay + fusion + history run as ONE scanned executable
    # (runner.replay_fuse_scan, composing the same memory_update /
    # assemble_from_memory / hist_append the streaming evaluator uses),
    # and phase 5 gathers its gmap/hist rows on chip. The host-replay
    # form downloaded ~[T*B,V,H] pano + [n,G,H] fuse embeds and
    # re-uploaded them as gmap/hist arrays every batch (~200 MB) —
    # pure marshaling that dominated wall-clock on relay-attached
    # chips (~14 MB/s d2h measured). use_mem=False keeps the host
    # form (numerically identical; covered by the fallback tests).
    use_dev = getattr(agent.runner, "device_memory", True)
    H = agent.runner.cfg.hidden_size
    V = steps[0]["pano_inputs"]["view_img_fts"].shape[1]
    pano_rngs = {}
    pe_chunks = []                     # device path: (jax array, n_real)
    pe_parts, pm_parts = [], []        # host path: np downloads
    with agent.timer.stage("pano_device"):
        for c0 in bounds:
            idx, n_real = chunk_idx(c0)
            pano_rngs[c0] = agent.runner._next_rng()
            if use_dev:
                out = agent.runner.panorama_dev_dict(
                    chunk_feats(idx),
                    deterministic=False, rng=pano_rngs[c0])
                pe_chunks.append((out["pano_embeds"], n_real))
            else:
                out = agent.runner.panorama(
                    chunk_feats(idx),
                    deterministic=False, rng=pano_rngs[c0])
                pe_parts.append(out["pano_embeds"][:n_real])
                pm_parts.append(out["pano_masks"][:n_real])
    if use_dev:
        pano_embeds_all = None
        # masks are index data: arange < view_lens, no download needed.
        # Rows dropped by compaction read all-False (the host form's
        # scatter leaves them zero); with compaction off, ended rows
        # keep their real masks exactly as the host form does.
        pano_masks_all = np.zeros((T, B, V), bool)
        for st_idx, step in enumerate(steps):
            pano_masks_all[st_idx] = (
                np.arange(V)[None, :]
                < step["pano_inputs"]["view_lens"][:, None])
            dead = ~row_live[st_idx * B: (st_idx + 1) * B]
            pano_masks_all[st_idx][dead] = False
    else:
        pe_live = np.concatenate(pe_parts, 0)
        pm_live = np.concatenate(pm_parts, 0)
        # scatter back to the [T, B] grid; dead rows are zeros with all-
        # False masks (their values feed nothing: phase 3 skips ended
        # rows, their fuse outputs are never read, their loss rows are
        # dropped)
        pano_embeds_flat = np.zeros((rows_total,) + pe_live.shape[1:],
                                    pe_live.dtype)
        pano_embeds_flat[live_idx] = pe_live
        pano_masks_flat = np.zeros((rows_total,) + pm_live.shape[1:], bool)
        pano_masks_flat[live_idx] = pm_live
        pano_embeds_all = pano_embeds_flat.reshape(
            T, B, *pano_embeds_flat.shape[1:])
        pano_masks_all = pano_masks_flat.reshape(T, B, -1)

    # ------------- phase 3: replay memory + assemble rows ----------------
    # host path: rebuild node embeddings step by step from the batched
    # pano outputs. device path: build the INDEX arrays (current node,
    # candidate nodes, gmap-slot node ids) that drive the on-chip replay.
    if not use_dev:
        for i, g in enumerate(gmaps):
            g._embed_sum.clear()
            g._embed_cnt.clear()
    T_pad = max(t_pad or T, T) if use_dev else T
    # gmap arrays are allocated at dims.max_gmap_nodes (160, the 30-step
    # CVDN bound); this batch only ever fills max-graph-size slots, so
    # trim to a bucketed effective width — smaller fuse/grad executables
    # AND a smaller scanned-replay emission (few shape buckets)
    G_full = agent.dims.max_gmap_nodes
    n_max = max((len(s["gmap_vpids"][i]) for s in steps for i in range(B)),
                default=1)
    # bucket of 16 (not 8): every G_eff value compiles a fresh scanned-
    # replay AND grad-chunk executable (~seconds each on a 1-core
    # host); coarser buckets trade a sliver of fuse compute for far
    # fewer mid-epoch compiles as trajectories grow the graph.
    # HIGH-WATER MARK on top (r5): G grows with trajectory length, so
    # mid-epoch batches kept crossing bucket boundaries and recompiling
    # anyway; holding the process-lifetime max makes the shape monotone
    # — after warmup every batch reuses one executable, at the cost of
    # a sliver of fuse compute on small batches
    G_eff = min(G_full, max(16, -(-n_max // 16) * 16))
    hwm = getattr(agent, "_g_eff_hwm", 0)
    if G_eff > hwm:
        # BUMP MARGIN (r5): trajectories keep growing the graph for a
        # few optimizer steps after warmup, so a bare HWM still paid
        # one full replay+grad recompile (~25 s on the remote-compile
        # relay) right after the warmup window — measured as a 2.7 vs
        # 6.4 eps/s first timed window. Overshoot each bump by one
        # bucket so near-term growth lands inside the compiled shape.
        G_eff = min(G_full, G_eff + 16)
        if os.environ.get("NAVILLM_DEBUG_SHAPES"):
            print(f"[fused] G_eff hwm bump {hwm} -> {G_eff} "
                  f"(n_max={n_max})", file=sys.stderr)
    agent._g_eff_hwm = G_eff = max(G_eff, hwm)
    if use_dev:
        from .runner import MEM_CAPACITY as M
        assert T_pad <= agent.dims.max_hist, (
            f"max_action_len {T_pad} > max_hist {agent.dims.max_hist}: "
            f"the device history buffer would overwrite its last slot")
        cur_ids_g = np.full((T_pad, B), -1, np.int32)
        cand_ids_g = np.full((T_pad, B, V), -1, np.int32)
        slot_ids_g = np.full((T_pad, B, G_eff), -1, np.int32)
    with agent.timer.stage("nav_assemble"):
        for st_idx, step in enumerate(steps):
            sobs = step["obs"]
            if use_dev:
                pe = None
                pm = pano_masks_all[st_idx]
                for i in range(B):
                    if step["ended"][i]:
                        continue
                    gidx = gmaps[i].graph.index
                    cid = gidx.get(sobs[i]["viewpoint"], -1)
                    cur_ids_g[st_idx, i] = cid if cid < M else -1
                    vps = step["gmap_vpids"][i]
                    for j, cvp in enumerate(
                            step["pano_inputs"]["cand_vpids"][i]):
                        # visited status AT THIS STEP from the snapshot
                        # mask (same rule as the host replay below)
                        if cvp in vps:
                            k = vps.index(cvp)
                            if step["gmap_in"]["gmap_visited_masks"][i][k]:
                                continue
                        nid = gidx.get(cvp, -1)
                        if 0 <= nid < M:
                            cand_ids_g[st_idx, i, j] = nid
                for i in range(B):
                    gidx = gmaps[i].graph.index
                    for k, vp in enumerate(step["gmap_vpids"][i]):
                        if k > 0 and vp is not None:
                            nid = gidx.get(vp, -1)
                            if 0 <= nid < M:
                                slot_ids_g[st_idx, i, k] = nid
            else:
                pe = pano_embeds_all[st_idx]
                pm = pano_masks_all[st_idx]
                denom = np.maximum(pm.sum(1, keepdims=True), 1)
                avg = (pe * pm[..., None]).sum(1) / denom
                for i in range(B):
                    if step["ended"][i]:
                        continue
                    gmaps[i].update_node_embed(sobs[i]["viewpoint"], avg[i],
                                               rewrite=True)
                    for j, cvp in enumerate(
                            step["pano_inputs"]["cand_vpids"][i]):
                        # visited status AT THIS STEP was captured in the
                        # snapshot's visited mask via vpid ordering; a node
                        # is embedding-updated unless already visited then
                        vps = step["gmap_vpids"][i]
                        if cvp in vps:
                            k = vps.index(cvp)
                            if step["gmap_in"]["gmap_visited_masks"][i][k]:
                                continue
                        gmaps[i].update_node_embed(cvp, pe[i, j])
                # fill node embeds into this step's gmap arrays
                gin = step["gmap_in"]
                for i in range(B):
                    for k, vp in enumerate(step["gmap_vpids"][i]):
                        if k > 0 and vp is not None and \
                                gmaps[i].has_node_embed(vp):
                            gin["gmap_img_embeds"][i, k] = \
                                gmaps[i].get_node_embed(vp)
            if step.get("vp_in") is not None:
                # sample-path snapshot already holds value-free vp_in +
                # a match computed against this step's visited state
                continue
            vp_in = agent.nav_vp_inputs(sobs, gmaps, pe, pm,
                                        step["pano_inputs"]["cand_vpids"])
            match = agent.local_match_slots(
                step["gmap_vpids"], vp_in["vp_cand_vpids"], gmaps,
                width=vp_in["pano_masks"].shape[1])
            # NOTE: local_match_slots checks CURRENT visited state; use the
            # snapshot mask instead
            for i in range(B):
                vps = step["gmap_vpids"][i]
                idx = {vp: k for k, vp in enumerate(vps) if vp}
                row = np.full(match.shape[1], -1, np.int32)
                for j, vp in enumerate(vp_in["vp_cand_vpids"][i]):
                    if j == 0 or vp is None or vp not in idx:
                        continue
                    k = idx[vp]
                    if not step["gmap_in"]["gmap_visited_masks"][i][k]:
                        row[j] = k
                match[i] = row
            step["vp_in"] = vp_in
            step["match"] = match

    # ------------- phase 4: fusion for history embeddings ----------------
    def cat_steps(getter):
        return np.concatenate([getter(s) for s in steps], 0)

    # fusion/nav inputs shared by phases 4 and 5, G trimmed to G_eff
    with agent.timer.stage("phase4_host"):
        fuse_host = {
            "gmap_step_ids": cat_steps(
                lambda s: s["gmap_in"]["gmap_step_ids"][:, :G_eff]),
            "gmap_pos_fts": cat_steps(
                lambda s: s["gmap_in"]["gmap_pos_fts"][:, :G_eff]),
            "gmap_masks": cat_steps(
                lambda s: s["gmap_in"]["gmap_masks"][:, :G_eff]),
            "gmap_visited_masks": cat_steps(
                lambda s: s["gmap_in"]["gmap_visited_masks"][:, :G_eff]),
            "vp_pos_fts": cat_steps(lambda s: s["vp_in"]["vp_pos_fts"]),
            "pano_masks": cat_steps(lambda s: s["vp_in"]["pano_masks"]),
            "local_match_slot": cat_steps(lambda s: s["match"]),
        }
        Hh = agent.dims.max_hist
        hist_counts = np.zeros((T, B), np.int32)
        if use_dev:
            # history bookkeeping is host ARITHMETIC (counts + append
            # actions); the appended VALUES stay on device in the scan
            acts_g = np.full((T_pad, B), -1, np.int32)
            cnt = np.zeros(B, np.int32)
            for st_idx, step in enumerate(steps):
                hist_counts[st_idx] = cnt
                acts = step["actions"] if feedback == "sample" \
                    else step["targets"]
                for i in range(B):
                    a = int(acts[i])
                    if a != args.ignoreid \
                            and compact_of[st_idx * B + i] >= 0:
                        acts_g[st_idx, i] = a
                        cnt[i] += 1
            # FULL fixed-width chunks scattered one at a time inside
            # replay_fuse_scan (one executable per chunk width,
            # regardless of chunk COUNT); padded rows scatter into the
            # grid's trash row
            rows_full = np.full(len(pe_chunks) * chunk, T_pad * B,
                                np.int64)
            rows_full[:n_live] = live_idx
            # per-step fusion inputs stacked [T_pad, B, ...] for the scan
            def stack_pad(flat, fill=0):
                a = flat.reshape((T, B) + flat.shape[1:])
                if T_pad == T:
                    return a
                pad = np.full((T_pad - T, B) + flat.shape[1:], fill,
                              a.dtype)
                return np.concatenate([a, pad], 0)
            fuse_sts = {k: stack_pad(v) for k, v in fuse_host.items()}
            pm_grid = np.zeros((T_pad, B, V), bool)
            pm_grid[:T] = pano_masks_all
    if use_dev:
        with agent.timer.stage("fuse_device"):
            gmap_flat, hist_flat, mem_final = agent.runner.replay_fuse_scan(
                [pe for pe, _ in pe_chunks], rows_full, T_pad, pm_grid,
                cur_ids_g, cand_ids_g, slot_ids_g, fuse_sts, acts_g)
        hist_embeds_live = None
        hist_store = None
        final_cnt = cnt
    else:
        fuse_batch = dict(fuse_host)
        fuse_batch["gmap_img_embeds"] = cat_steps(
            lambda s: s["gmap_in"]["gmap_img_embeds"][:, :G_eff])
        fuse_batch["vp_img_embeds"] = cat_steps(
            lambda s: s["vp_in"]["vp_img_embeds"])
        # fusion runs over LIVE rows only (a history append at (t, i)
        # requires target != ignoreid, which implies the row is live).
        # Rows pad up to a multiple of the grad-chunk width by repeating
        # the last live row: n_live varies almost arbitrarily per batch,
        # and an unpadded call would compile a fresh executable per new
        # count (the same reason phases 2/5 run fixed-width chunks).
        n_fuse = -(-n_live // chunk) * chunk
        fuse_sel = np.minimum(np.arange(n_fuse), n_live - 1)
        fuse_batch = {k: v[live_idx][fuse_sel]
                      for k, v in fuse_batch.items()}
        with agent.timer.stage("fuse_device"):
            fuse_live = agent.runner.fuse_embeds_only(fuse_batch)[:n_live]

        # history: hist_vis[t] for episode i = fuse row of (t', i), slot
        # act_{t'}, for t' < t (appended for every non-ignored step —
        # matching rollout's history loop over a_t != ignoreid; under
        # sample feedback act is the SAMPLED action)
        hist_embeds_live = np.zeros((n_live, Hh, H), np.float32)
        hist_store = [[] for _ in range(B)]
        for st_idx, step in enumerate(steps):
            for i in range(B):
                hist_counts[st_idx, i] = len(hist_store[i])
                row = compact_of[st_idx * B + i]
                if row < 0:
                    continue
                tail = hist_store[i][-Hh:]
                for k, v in enumerate(tail):
                    hist_embeds_live[row, k] = v
            acts = step["actions"] if feedback == "sample" \
                else step["targets"]
            for i in range(B):
                a = acts[i]
                row = compact_of[st_idx * B + i]
                if a != args.ignoreid and row >= 0:
                    hist_store[i].append(fuse_live[row, a])

    # ------------- phase 5: one navigation LLM loss+grad call ------------
    # prompts/targets/hist rows are built for LIVE rows only (compact
    # ordering, matching the phase-2 pano chunks and their rngs).
    # Teacher: candidate permutations + prompts are drawn here (phase 1
    # made no model call). Sample: they are REUSED from the sampling
    # pass — the per-step path pairs one permutation with both the
    # sampled action and the loss, and so do we.
    with agent.timer.stage("phase5_host"):
        prompts = []
        orders = []
        C = agent.dims.max_cands
        from .mp3d_agent import CLS_TOKEN_TEXT
        for st_idx, step in enumerate(steps):
            for i in range(B):
                if compact_of[st_idx * B + i] < 0:
                    continue
                if feedback == "sample":
                    orders.append(np.asarray(step["order"][i], np.int32))
                    prompts.append(step["prompts"][i])
                    continue
                slots = [k for k, vp in enumerate(step["gmap_vpids"][i])
                         if k > 0 and vp is not None
                         and not step["gmap_in"]["gmap_visited_masks"][i][k]]
                perm = agent.np_rng.permutation(slots)[:C]
                row = np.full(C, -1, np.int32)
                row[: len(perm)] = perm
                orders.append(row)
                prompts.append(agent.get_prompt(
                    "navigation", instruction=instructions[i],
                    hist_num=int(hist_counts[st_idx, i]),
                    cand_num=min(len(slots) + 1, C + 1),
                    cls_token=CLS_TOKEN_TEXT))
        tok_batch, cand_pos, hist_pos, cls_pos = \
            agent.runner.tokenize_with_positions(prompts)
        # live-compacted host nav inputs; gmap_img_embeds / hist_embeds
        # are DEVICE gathers on the memory path (added per chunk below)
        nav_batch = {k: v[live_idx] for k, v in fuse_host.items()}
        nav_batch.update({
            "cand_order": np.stack(orders),
            "cand_positions": cand_pos,
            "hist_positions": hist_pos,
            "input_ids": tok_batch.input_ids,
            "attention_mask": tok_batch.attention_mask,
            "cls_pos": cls_pos,
        })
        if not use_dev:
            nav_batch["gmap_img_embeds"] = \
                fuse_batch["gmap_img_embeds"][:n_live]
            nav_batch["hist_embeds"] = hist_embeds_live
        targets = np.concatenate([s["targets"] for s in steps],
                                 0)[live_idx]
    coef = train_ml / loss_den / args.gradient_accumulation_step
    ml_loss = 0.0
    with agent.timer.stage("nav_device"):
        # async dispatch per chunk: no outputs downloaded, loss stays a
        # device scalar — train_loop materializes it one step later, so
        # the grad chain overlaps the NEXT batch's host trajectory phase
        for c0 in bounds:
            idx, n_real = chunk_idx(c0)
            real = np.arange(c0, c0 + chunk) < n_live
            part_tgt = np.where(real, targets[idx], args.ignoreid) \
                .astype(targets.dtype)
            chunk_batch = {k: v[idx] for k, v in nav_batch.items()}
            if use_dev:
                rows = jnp.asarray(live_idx[idx])
                chunk_batch["gmap_img_embeds"] = \
                    jnp.take(gmap_flat, rows, axis=0)
                chunk_batch["hist_embeds"] = \
                    jnp.take(hist_flat, rows, axis=0)
            _, _, _, _, loss_c = agent.runner.pano_navigation_train(
                chunk_feats(idx), pano_rngs[c0],
                chunk_batch, part_tgt, coef, need_outputs=False)
            ml_loss = ml_loss + loss_c

    # ------------- sub-task heads ----------------------------------------
    final = steps[-1]
    # derive the head gates ONCE and use them both to download the
    # history buffer and to run the heads below — they cannot drift
    # into a None-indexing crash if one condition is later loosened
    # (advisor r4)
    run_og = data_type[0] in ("soon", "reverie") and args.enable_og
    run_gen = data_type[0] == "eqa" or (
        feedback == "teacher" and args.enable_summarize
        and data_type[0] in ("r2r", "soon", "reverie", "r2r_aug",
                             "reverie_aug"))
    if use_dev:
        history_final = [["<hist>"] * int(final_cnt[i]) for i in range(B)]
        hist_vis_final = None
        if run_og or run_gen:
            # the heads consume history VALUES — one small download of
            # the final device history buffer (the only embed download
            # left on this path, and only when a head actually runs)
            hb = np.asarray(mem_final["hist_buf"])
            hist_vis_final = [
                [hb[i, k] for k in range(min(int(final_cnt[i]),
                                             hb.shape[1]))]
                for i in range(B)]
    else:
        history_final = [["<hist>"] * int(len(hist_store[i]))
                         for i in range(B)]
        hist_vis_final = hist_store
    if run_og:
        ml_loss += agent._object_grounding_step(
            args, final["obs"], gmaps, final["gmap_in"], instructions,
            history_final, hist_vis_final, final["pano_inputs"], traj, B,
            validate=False, training=True, loss_denom=loss_den)

    for fg in fgr2r_steps:
        ml_loss += agent._generation_step(
            args, fg["obs"], gmaps, history=[[] for _ in range(B)],
            hist_vis=[[] for _ in range(B)],
            instructions=["where are we going with direction ({}) ?"
                          .format(int(idx)) for idx in fg["targets"]],
            answers=[ob["fg_instruction"][ob["fg_view"][fg["t"]]]
                     for ob in fg["obs"]],
            mode="embodied_qa", task="r2r", validate=False, training=True,
            traj=traj, trie=None, loss_denom=loss_den)

    # summarization gate mirrors the per-step path: EQA answers at the
    # final step under ANY feedback; instruction summarization only
    # under teacher/argmax (mp3d_agent._rollout_gen enable_summarize)
    if run_gen:
        mode = "embodied_qa" if data_type[0] == "eqa" else "summarization"
        answers = [ob.get("answer", "") if data_type[0] == "eqa"
                   else ob["instruction"] for ob in final["obs"]]
        ml_loss += agent._generation_step(
            args, final["obs"], gmaps, history=history_final,
            hist_vis=hist_vis_final, instructions=instructions,
            answers=answers, mode=mode, task=agent.name, validate=False,
            training=True, traj=traj, trie=None, loss_denom=loss_den)

    return ml_loss, traj
