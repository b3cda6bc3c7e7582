"""Training driver: multi-task epochs, eval, checkpoint retention.

Port of the reference driver semantics (train.py:33-294):
  - train_one_epoch: MetaLoader-sampled task batches, per-task loss
    meters, optimizer step + clip(40) every gradient_accumulation_step
    batches (train.py:86-89) — here grads live in the runner's device
    accumulator and the optax chain applies clip + AdamW;
  - val_one_epoch: per-task agent.validate -> all-gather -> rank-0
    eval_metrics + optional prediction JSON dumps (train.py:118-173);
  - calc_overall_score: task-weighted SPL model selection
    (train.py:184-204, same normalizers);
  - best-score checkpoint retention with max_saved_checkpoints
    (train.py:253-289), pretrain-stage periodic saves, latest-state
    saves for auto-resume.
"""
from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import optax

from ..agents import load_agent
from ..agents.runner import NavModelRunner, RolloutDims
from ..data.feature_db import (create_feature_db, create_object_feature_db)
from ..data.loaders import MetaLoader, create_dataloaders
from ..models import llama as L
from ..models import nav_model as NM
from ..models.pano_encoder import PanoConfig
from ..models.tokenization import NavTokenizer
from ..parallel.dist import all_gather_objects, merge_dist_results
from ..sim.env import WorldModel
from .checkpoints import (checkpoint_exists, load_checkpoint, save_checkpoint)
from .optim import make_optimizer

TASK_REGISTRY_NAME = {"R2R": "r2r", "REVERIE": "reverie", "CVDN": "cvdn",
                      "SOON": "soon", "EQA": "eqa", "ScanQA": "scanqa",
                      "LLaVA": "llava", "R2R_AUG": "r2r_aug",
                      "REVERIE_AUG": "reverie_aug"}


class Metrics:
    """Running averager (reference train.py:17-30)."""

    def __init__(self):
        self.num = 0
        self.total = 0.0

    def accumulate(self, x):
        self.num += 1
        self.total += float(x)

    @property
    def average(self):
        return self.total / self.num if self.num else 0.0


def build_mesh_plan(args, logger=None):
    """(data, model) mesh over all visible devices; None single-device."""
    n = len(jax.devices())
    if n <= 1 and args.tp_size <= 1:
        return None
    from ..parallel.mesh import make_mesh
    plan = make_mesh(dp_size=args.dp_size, tp_size=args.tp_size)
    if logger is not None:
        logger.info("mesh: dp=%d tp=%d over %d devices"
                    % (plan.dp_size, plan.tp_size, n))
    return plan


def build_runner(args, cfg, logger=None, mesh_plan=None) -> NavModelRunner:
    """Tokenizer + LLM (+converted weights) + pano/heads params."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    quantize = getattr(args, "quantize_llm", False)
    if quantize and args.mode != "test":
        raise ValueError("--quantize_llm is eval-only: int8 weights are "
                         "not differentiable (models/quant.py)")
    act_int8 = getattr(args, "act_int8", False)
    if act_int8 and not quantize:
        raise ValueError("--act_int8 needs --quantize_llm: the int8x"
                         "int8 MXU path requires int8 weights "
                         "(models/llama.py:_mm)")
    if args.pretrained_model_name_or_path:
        tok = NavTokenizer.from_pretrained(args.pretrained_model_name_or_path)
        if args.from_scratch or args.resume_from_checkpoint:
            # build architecture only; weights come from the checkpoint
            from transformers import AutoConfig
            from ..models.convert import config_from_hf
            hf_cfg = AutoConfig.from_pretrained(
                args.pretrained_model_name_or_path)
            llm_cfg = config_from_hf(hf_cfg, vocab_size=tok.vocab_size,
                                     dtype=dtype)
            llm_params = None
        else:
            from ..models.convert import load_vicuna
            llm_cfg, llm_params = load_vicuna(
                args.pretrained_model_name_or_path, tok.vocab_size,
                dtype=dtype, quantize=quantize,
                quant_bits=getattr(args, "quant_bits", 8))
    else:
        tok = NavTokenizer()
        llm_cfg = L.LlamaConfig.tiny(vocab_size=tok.vocab_size)
        llm_params = None
    if act_int8:
        import dataclasses
        llm_cfg = dataclasses.replace(llm_cfg, act_int8=True)

    pano_cfg = PanoConfig(
        image_feat_size=args.image_feat_size,
        obj_feat_size=args.obj_feat_size,
        angle_feat_size=args.angle_feat_size,
        num_pano_layers=args.num_pano_layers,
        output_size=llm_cfg.hidden_size,
        use_obj=args.enable_og,
        fuse_obj=args.fuse_obj,
        dtype=dtype,
    ) if args.pretrained_model_name_or_path else PanoConfig.tiny(
        output_size=llm_cfg.hidden_size, use_obj=args.enable_og)

    nav_cfg = NM.NavModelConfig(llm=llm_cfg, pano=pano_cfg,
                                angle_feat_size=args.angle_feat_size)
    params = NM.init_nav_params(jax.random.PRNGKey(args.seed), nav_cfg)
    if llm_params is not None:
        params["llm"] = llm_params
    if logger is not None:
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        logger.info("model initialized with %.2f M parameters" % (n / 1e6))
    return NavModelRunner(nav_cfg, params, tok,
                          feat_dropout=args.feat_dropout,
                          ignore_id=args.ignoreid, seed=args.seed,
                          mesh_plan=mesh_plan,
                          kv_int8=getattr(args, "kv_int8", False))


def build_world_and_data(args, cfg, training: bool, stage: str, world=None,
                         feat_dbs=None, obj_feat_dbs=None, logger=None,
                         test_datasets=None):
    if feat_dbs is None and "feature_database" in cfg.get("Feature", {}):
        feat_dbs = create_feature_db(cfg.Feature.feature_database,
                                     cfg.Feature.image_feat_size,
                                     args.data_dir)
    if obj_feat_dbs is None and "object_database" in cfg.get("Feature", {}):
        obj_feat_dbs = create_object_feature_db(cfg.Feature.object_database,
                                                cfg.Feature.obj_feat_size,
                                                args.data_dir)
    world = world or WorldModel(str(Path(args.data_dir) / "connectivity"))
    loaders, datasets = create_dataloaders(
        args, cfg, training=training, world=world, feat_dbs=feat_dbs,
        obj_feat_dbs=obj_feat_dbs, stage=stage, logger=logger,
        test_datasets=test_datasets)
    return world, loaders, datasets, feat_dbs, obj_feat_dbs


def build_agents(args, sources, world, runner) -> Dict[str, Any]:
    return {src: load_agent(TASK_REGISTRY_NAME[src], args, world, runner)
            for src in sources}


def make_opt_step(tx, params=None, opt_state=None):
    # donation: params + opt state update in place — without it the
    # optimizer step transiently double-buffers ~3x the param bytes,
    # which is the margin between fitting and OOM for the 1.3B-proxy
    # fused-teacher recipe on a 16 GB chip
    #
    # Passing example (params, opt_state) pins out_shardings to their
    # current placements. With a ZeRO-1 opt state
    # (parallel/mesh.py:zero1_shard_opt_state) this is load-bearing:
    # it forces GSPMD to keep the moments dp-SHARDED and the params
    # dp-REPLICATED — each device computes its update shard, then the
    # applied updates all-gather — instead of letting sharding
    # propagation gather the moments (losing the memory win) or shard
    # the params (breaking every downstream train/eval fn's layout).
    kwargs = {}
    if params is not None:
        kwargs["out_shardings"] = (
            jax.tree.map(lambda x: x.sharding, params),
            jax.tree.map(lambda x: x.sharding, opt_state))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2), **kwargs)
    def opt_step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state
    return opt_step


def train_one_epoch(args, cfg, runner, tx, opt_state, opt_step, meta_loader,
                    agents, datasets, epoch, logger, num_batches):
    stage_cfg = cfg.Pretrain if args.stage == "pretrain" else cfg.Multi
    loss_metric = Metrics()
    loss_stats = {k: Metrics() for k in stage_cfg.SOURCE}

    runner.zero_grads()
    # One-step-lag loss materialization: agent.train may return the loss
    # as a DEVICE scalar (fused-teacher / generation paths dispatch their
    # grad chains without any host sync). Deferring float() by one step
    # lets the device chew batch N's fwd/bwd while the host simulates and
    # assembles batch N+1 — the training-side analogue of the two-group
    # eval pipeline.
    pending = None

    def drain(pending):
        if pending is not None:
            pname, ploss = pending
            ploss = float(ploss)
            loss_metric.accumulate(ploss)
            loss_stats[pname].accumulate(ploss)

    for step, (name, batch) in enumerate(meta_loader):
        agent = agents[name]
        loss = agent.train(name, batch, args, cfg, dataset=datasets.get(name),
                           step=step)
        drain(pending)
        pending = (name, loss)

        if (step + 1) % args.gradient_accumulation_step == 0:
            grads = runner.take_grads()
            runner.params, opt_state = opt_step(runner.params, opt_state,
                                                grads)
            runner.zero_grads()

        if logger is not None and args.rank == 0 and (step + 1) % 100 == 0:
            logger.info("epoch %d step %d/%d [%s] loss=%.4f"
                        % (epoch, step + 1, num_batches, name,
                           loss_metric.average))

        if step == num_batches - 1:
            drain(pending)
            pending = None
            if logger is not None:
                msg = "***** train [%d] epoch *****\nLoss: %.4f\n" \
                    % (epoch, loss_metric.average)
                for task in stage_cfg.SOURCE:
                    msg += "%s: %.4f\n" % (task, loss_stats[task].average)
                logger.info(msg)
            break
    drain(pending)
    return opt_state, loss_metric.average


def val_one_epoch(args, cfg, runner, val_loaders, agents, datasets, epoch,
                  logger) -> Dict[str, Dict[str, float]]:
    task_results: Dict[str, Dict[str, float]] = {}
    for name, (loader, _ratio) in val_loaders.items():
        if logger is not None:
            logger.info("***** validate %s split on %s task *****"
                        % (args.validation_split, name))
        agent = agents[name]
        # streaming handles every task now: EQA (trie generation +
        # oracle re-enqueue) and test-mode summarization ride the
        # per-slot generation queue
        use_streaming = getattr(args, "streaming_eval", False) and \
            hasattr(agent, "validate_streaming")
        validate = agent.validate_streaming if use_streaming \
            else agent.validate
        preds = validate(name, args, cfg, loader, dataset=datasets[name])
        all_preds = merge_dist_results(all_gather_objects(preds))
        if args.rank == 0 and not args.validation_split.startswith("test"):
            score_summary, item_metrics = datasets[name].eval_metrics(
                all_preds, logger=logger, name=name)
            task_results[name] = score_summary
            if logger is not None:
                logger.info("[Eval] dataset=[%s] %s" % (name, {
                    k: round(float(v), 2) for k, v in score_summary.items()}))
            if args.save_pred_results:
                datasets[name].save_json(
                    all_preds,
                    os.path.join(args.output_dir,
                                 f"{name}_{args.validation_split}.json"),
                    item_metrics=item_metrics if args.save_detail_results
                    else None)
    return task_results


def calc_overall_score(results, cfg) -> float:
    """Normalized-SPL sum over R2R/REVERIE/SOON (train.py:184-204)."""
    score = 0.0
    for task in results:
        if task not in cfg.Multi.SOURCE:
            continue
        if task == "R2R":
            score += results[task]["spl"] / 60
        elif task == "REVERIE":
            score += results[task]["spl"] / 36.63
        elif task == "SOON":
            score += results[task]["spl"] / 26.58
        elif task in ("CVDN", "EQA", "ScanQA", "LLaVA"):
            pass
        else:
            raise NotImplementedError(task)
    return score


def run_training(args, cfg, logger=None, world=None, feat_dbs=None,
                 obj_feat_dbs=None, runner=None):
    """Full main() flow (reference train.py:207-294). Injectable world /
    feature DBs / runner keep it testable hermetically."""
    # multi-host: jax discovers the topology; replaces the reference's
    # torchrun/SLURM env sniffing (tools/distributed.py:38-102)
    if args.world_size == 1 and jax.process_count() > 1:
        args.rank = jax.process_index()
        args.world_size = jax.process_count()
    np.random.seed(args.seed + args.rank)

    world, train_loaders, train_datasets, feat_dbs, obj_feat_dbs = \
        build_world_and_data(args, cfg, training=True, stage=args.stage,
                             world=world, feat_dbs=feat_dbs,
                             obj_feat_dbs=obj_feat_dbs, logger=logger)
    _, val_loaders, val_datasets, _, _ = build_world_and_data(
        args, cfg, training=False, stage="multi", world=world,
        feat_dbs=feat_dbs, obj_feat_dbs=obj_feat_dbs, logger=logger,
        test_datasets=args.test_datasets)

    mesh_plan = build_mesh_plan(args, logger) if runner is None else None
    runner = runner or build_runner(args, cfg, logger, mesh_plan=mesh_plan)
    train_agents = build_agents(args, train_loaders.keys(), world, runner)
    val_agents = build_agents(args, val_loaders.keys(), world, runner)

    num_batches = args.num_steps_per_epoch if args.num_steps_per_epoch > 0 \
        else max(len(l) for l, _ in train_loaders.values())
    tx = make_optimizer(lr=args.lr,
                        num_warmup_steps=max(
                            args.num_warmup_steps //
                            max(args.gradient_accumulation_step, 1), 0),
                        grad_clip_norm=args.grad_clip_norm,
                        moments_8bit=getattr(args, "adam_8bit", False))
    opt_state = tx.init(runner.params)
    zero1 = mesh_plan is not None and mesh_plan.dp_size > 1 and \
        getattr(args, "zero1", True)

    resume_from_epoch = 0
    if args.resume_from_checkpoint and \
            checkpoint_exists(args.resume_from_checkpoint):
        runner.params, opt_state, resume_from_epoch = load_checkpoint(
            args.resume_from_checkpoint, runner.params, opt_state, logger)

    if zero1:
        # applied AFTER a resume so the restored moments (placed like
        # the live tx.init tree, checkpoints._restore_into) land
        # directly in their dp-sharded layout
        from ..parallel.mesh import zero1_shard_opt_state
        opt_state = zero1_shard_opt_state(opt_state, mesh_plan)
        opt_step = make_opt_step(tx, runner.params, opt_state)
        if logger is not None and args.rank == 0:
            logger.info("ZeRO-1: optimizer moments sharded %d-way over "
                        "the data axis" % mesh_plan.dp_size)
    else:
        opt_step = make_opt_step(tx)

    if args.mode == "test":
        return val_one_epoch(args, cfg, runner, val_loaders, val_agents,
                             val_datasets, resume_from_epoch, logger)

    meta_loader = MetaLoader(train_loaders, seed=args.seed,
                             off_batch_task=args.off_batch_task,
                             rank=args.rank)
    best_results, best_score = None, None
    history_scores = []
    for epoch in range(resume_from_epoch, args.num_epochs):
        opt_state, _ = train_one_epoch(
            args, cfg, runner, tx, opt_state, opt_step, meta_loader,
            train_agents, train_datasets, epoch, logger, num_batches)
        results = val_one_epoch(args, cfg, runner, val_loaders, val_agents,
                                val_datasets, epoch, logger)
        if args.rank == 0:
            score = calc_overall_score(results, cfg)
            history_scores.append(score)
            should_save = False
            if best_results is None or score > best_score:
                best_results, best_score = results, score
                should_save = args.max_saved_checkpoints > 0
            if logger is not None:
                logger.info("Current Score: %s | Best Score: %s"
                            % (score, best_score))
            if args.stage == "multi" and should_save:
                if len(history_scores) > args.max_saved_checkpoints:
                    ranked = sorted(enumerate(history_scores),
                                    key=lambda x: x[1], reverse=True)
                    remove_epoch = ranked[args.max_saved_checkpoints][0]
                    for suffix in (".npz", ".json"):
                        p = Path(args.output_dir) / \
                            f"epoch_{remove_epoch}{suffix}"
                        if p.exists():
                            p.unlink()
                save_checkpoint(Path(args.output_dir) / f"epoch_{epoch}",
                                runner.params)
            elif args.stage == "pretrain" and \
                    (epoch + 1) % args.save_ckpt_per_epochs == 0:
                save_checkpoint(Path(args.output_dir) / f"pretrain_{epoch}",
                                runner.params)
        if args.save_latest_states:
            save_checkpoint(Path(args.output_dir) / "latest", runner.params,
                            opt_state, epoch)
    return best_results
