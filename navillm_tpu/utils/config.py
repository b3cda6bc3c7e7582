"""Two-level config system: CLI flags + YAML experiment config.

Mirrors the semantics of the reference's argparse + EasyDict YAML merge
(reference: tools/parser.py:22-156, configs/multi.yaml), with the same
stage SOURCE/Ratio/LOSS_COEF mixture structure, per-task action-length
tables, and auto-resume probing — but as a small self-contained module
(no easydict dependency).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


class ConfigDict(dict):
    """Recursive attribute-access dict (drop-in for EasyDict)."""

    def __init__(self, d: Optional[Dict] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def update(self, other=None, **kwargs):  # keep ConfigDict wrapping
        merged = dict(other or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = self._wrap(v)


def load_yaml_config(path: str | Path) -> ConfigDict:
    with open(path) as f:
        return ConfigDict(yaml.safe_load(f))


@dataclasses.dataclass
class TrainArgs:
    """All run flags (reference: tools/parser.py flag-for-flag, minus torch-isms)."""

    # paths
    data_dir: str = "data"
    cfg_file: Optional[str] = None
    pretrained_model_name_or_path: Optional[str] = None
    output_dir: str = "output"

    # run mode
    mode: str = "train"              # train | test
    stage: str = "multi"             # pretrain | multi
    debug: bool = False
    seed: int = 0

    # schedule
    num_epochs: int = 30
    num_steps_per_epoch: int = -1
    batch_size: int = 1
    val_batch_size: int = 2
    lr: float = 1e-5
    feat_dropout: float = 0.4
    num_warmup_steps: int = 0
    gradient_accumulation_step: int = 2
    precision: str = "bf16"          # bf16 | fp32
    workers: int = 0
    grad_clip_norm: float = 40.0

    # checkpointing
    resume_from_checkpoint: Optional[str] = None
    from_scratch: bool = False
    max_saved_checkpoints: int = 0
    save_ckpt_per_epochs: int = 10
    save_latest_states: bool = False
    save_pred_results: bool = False
    save_detail_results: bool = False

    # tasks
    ignoreid: int = -100
    enable_og: bool = False
    enable_summarize: bool = False
    enable_fgr2r: bool = False
    gen_loss_coef: float = 1.0
    obj_loss_coef: float = 1.0
    teacher_forcing_coef: float = 1.0
    fuse_obj: bool = False
    multi_endpoints: int = 1
    path_type: str = "trusted_path"
    max_datapoints: Optional[int] = None
    off_batch_task: bool = False

    # evaluation
    test_datasets: Optional[List[str]] = None
    validation_split: str = "val_unseen"
    do_sample: bool = False
    temperature: float = 1.0
    # continuous slot-refill evaluation (TPU-native; SURVEY.md §7.2.7) —
    # disable to exactly reproduce the reference's batched eval loop
    streaming_eval: bool = True
    # prompt-prefix KV caching inside streaming eval: per step the LLM
    # forwards only the new history tokens + candidates section
    # (trajectory-identical to the full forward; auto-off when the
    # cache wouldn't fit next to the weights). OPT-IN: it pays when the
    # instruction/dialog prefix dominates the prompt (long CVDN
    # dialogs, subword tokenizers); on the byte-tokenizer synthetic
    # bench the candidates suffix is ~70% of tokens and the measured
    # A/B was neutral (12.9 vs 13.2 eps/s) — see docs/PERFORMANCE.md.
    prefix_cache: bool = False
    # streaming-eval slot-group (pipeline) count. 2 keeps the chip busy
    # when the host round trip is cheap; on tunneled/relay chips the
    # per-step a_t download latency (~40 ms floor measured) exceeds the
    # device step, and deeper pipelines (3-4 smaller groups) hide it.
    eval_streams: int = 2
    # int8 weight-only LLM storage for EVAL runs (models/quant.py):
    # loads the checkpoint host-side, quantizes per output channel, and
    # uploads only the ~6.8 GB int8 tree — the 7B-on-16GB deployment
    # path. Rejected for training modes (int8 is not differentiable).
    quantize_llm: bool = False
    # bit width for --quantize_llm: 8 (per-output-channel int8, the
    # accuracy headline) or 4 (group-wise int4 layer matmuls, ~3.3 GB
    # at 7B — the capacity lever; embed/lm_head stay int8). See
    # models/quant.py.
    quant_bits: int = 8
    # W8A8 on top of --quantize_llm: dynamic per-token int8 activation
    # quantization so matmuls run int8xint8 natively on the MXU (~1.5x
    # bf16 compute rate on v5e). Slightly lossier than weight-only;
    # opt-in for compute-bound eval (large-batch prefill).
    act_int8: bool = False
    # int8 storage for the streaming-eval prompt-prefix KV cache
    # (per-token-per-head fp32 scales, models/llama.py:kv_quantize):
    # halves the cache's HBM residency — the slot-count ceiling at 7B
    # on 16 GB — at a small attention-precision cost. Opt-in for eval.
    kv_int8: bool = False
    # 8-bit Adam moments (training/optim.py:scale_by_adam_q8): m/v as
    # blockwise int8/uint8 codes in the param shape + group-256 fp32
    # scales, fp32 update math. Moments 13.5 GB -> ~6.9 GB at 7B
    # (before ZeRO-1 / tp splits) — makes the tp=2 x dp=4 v5e-8
    # training plan fit comfortably. Opt-in: tiny update-noise cost.
    adam_8bit: bool = False
    # ZeRO-1: shard the Adam moments over the data axis when dp>1
    # (parallel/mesh.py:zero1_shard_opt_state). Loss-equal to plain
    # DDP; moments are 2x the param bytes, so at 7B this is what makes
    # the training state fit a v5e-8. On by default; --no... set False
    # to keep fully-replicated optimizer state.
    zero1: bool = True
    # fused whole-trajectory teacher-forcing training (one LLM call per
    # trajectory instead of per step; same gradients — SURVEY.md §7.1)
    fused_teacher: bool = True
    # double-buffered DAgger (sample-feedback) training: split each
    # batch into interleaved streams so one stream's host work (env
    # stepping, prompt assembly) hides under another's device step;
    # same loss normalization / gradient structure as the unsplit
    # batch (mp3d_agent.rollout_interleaved)
    dagger_pipeline: bool = True
    # number of interleaved DAgger streams (>=2). More streams hide
    # host work at finer grain but shrink each device call's batch.
    # fused-DAgger sampling slot groups (and interleaved-path streams):
    # the pre-single-upload r5 sweep at b=48 had 6 groups winning (the
    # per-step f32 feature upload + dispatch latency dominated, and
    # deeper pipelines hid it); AFTER the single-upload bf16 feature
    # path the sweep inverted — same-day medians 2 -> 7.31 eps/s
    # (8.7x) vs 3 -> 5.64 vs 6 -> 5.64: with uploads off the critical
    # path, the bigger per-call sampling batch (Bg=24) wins on MXU
    # efficiency. bench_all races 2 vs 6 so a degraded-link session
    # (where latency-hiding matters again) still records its best.
    dagger_streams: int = 2
    # fused DAgger: run the no-grad sampling rollout's policy forwards
    # against a W8A8 int8 copy of the current params (re-quantized each
    # optimizer step). Gradients are untouched (the fused loss pass is
    # bf16); only the exploration distribution shifts — the same int8
    # grid the W8A8 eval headline decodes from. MEASURED a regression
    # at 1.3B-proxy scale (r5: calnorm 5.4 vs 7.1 — the per-token
    # activation-quantize VPU work exceeds the MXU gain at these
    # window sizes, the kv8 lesson again), so OFF by default; the
    # machinery is tested (tests/test_fused_dagger.py) and remains a
    # lever for weight-bound scales.
    dagger_sample_quant: bool = False
    # fused whole-trajectory DAgger training: a NO-GRAD sampling
    # rollout picks the trajectory, then one fused loss fwd+bwd pass
    # computes the gradient with the per-step path's exact gradient
    # structure (agents/fused_teacher.rollout_dagger_fused). Replaces
    # the per-step fwd+bwd loop (and the interleaved pipeline) for the
    # sample-feedback half when enabled.
    fused_dagger: bool = True
    # prefix-cached DAgger sampling: the no-grad sampling rollout rides
    # the streaming evaluator's prompt-prefix KV cache (prefill once
    # per episode, per step forward only the new-history append +
    # candidates suffix) instead of re-forwarding the whole prompt
    # every step. Budget-gated at batch start (the cache must fit next
    # to params + grad accum + Adam moments) and falls back to the
    # full-prompt step if a prompt outgrows the cache.
    dagger_prefix_cache: bool = True
    # fixed row-chunk width for the fused-teacher grad calls: bounds the
    # per-call activation footprint (a whole trajectory batch at
    # T*B ~ 80 rows x 512 tokens + AdamW state is marginal on 16 GB)
    # and keeps executables at a stable [chunk, L] shape regardless of
    # trajectory length. 0 = single call over all T*B rows.
    fused_rows_per_call: int = 48

    # parallelism (TPU-native; replaces the reference's NCCL flags)
    dp_size: int = -1                # -1: all devices on the data axis
    tp_size: int = 1                 # tensor-parallel axis for the LLM
    rank: int = 0                    # process index (multi-host)
    world_size: int = 1

    # copied from YAML Feature/Model sections at load time (parser.py:128-135)
    image_feat_size: int = 1024
    obj_feat_size: int = 768
    angle_feat_size: int = 4
    enc_full_graph: bool = True
    expert_policy: str = "spl"
    num_pano_layers: int = 2

    def sync_from_config(self, cfg: ConfigDict) -> "TrainArgs":
        """Copy select YAML fields onto args (reference parser.py:128-135)."""
        feat = cfg.get("Feature", {})
        model = cfg.get("Model", {})
        self.image_feat_size = feat.get("image_feat_size", self.image_feat_size)
        self.obj_feat_size = feat.get("obj_feat_size", self.obj_feat_size)
        self.angle_feat_size = feat.get("angle_feat_size", self.angle_feat_size)
        self.enc_full_graph = model.get("enc_full_graph", self.enc_full_graph)
        self.expert_policy = model.get("expert_policy", self.expert_policy)
        self.num_pano_layers = model.get("num_pano_layers", self.num_pano_layers)
        return self


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NaviLLM-TPU trainer")
    for f in dataclasses.fields(TrainArgs):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            # BooleanOptionalAction: --flag / --no-flag (needed for
            # default-True flags like --streaming_eval)
            p.add_argument(name, action=argparse.BooleanOptionalAction,
                           default=f.default)
        elif f.name == "test_datasets":
            p.add_argument(name, type=str, nargs="+", default=None)
        else:
            typ = {int: int, float: float}.get(type(f.default), str)
            p.add_argument(name, type=typ, default=f.default)
    return p


def read_args(argv: Optional[List[str]] = None):
    """Parse flags, load YAML config, sync fields, probe auto-resume.

    Returns (args: TrainArgs, cfg: ConfigDict).
    """
    ns = build_arg_parser().parse_args(argv)
    args = TrainArgs(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(TrainArgs)})
    if args.cfg_file is None:
        raise SystemExit("--cfg_file is required")
    cfg = load_yaml_config(args.cfg_file)
    args.sync_from_config(cfg)
    os.makedirs(args.output_dir, exist_ok=True)
    # auto-resume (reference parser.py:151-154; the reference probes a
    # filename it never writes — we probe what we actually write)
    latest = Path(args.output_dir) / "latest"
    if latest.exists():
        args.resume_from_checkpoint = str(latest)
    return args, cfg
