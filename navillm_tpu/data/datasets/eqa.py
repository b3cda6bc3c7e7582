"""EQA (MP3D-EQA) dataset (reference tasks/datasets/eqa.py)."""
from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

from ...utils.registry import DATASETS
from .. import metrics as M
from .mp3d_base import MP3DDatasetBase, get_anno_file_path


@DATASETS.register("eqa")
class EQADataset(MP3DDatasetBase):
    """Closed-vocab embodied QA: obs carries question/answer text; EM +
    oracle-EM metrics alongside nav metrics (reference eqa.py)."""

    def __init__(self, args, config, training=False, logger=None,
                 source=None, world=None):
        super().__init__(args, config, training, logger, source, world)
        from .mp3d_base import dataset_section
        section = dataset_section(config, source)
        filename = get_anno_file_path(args.data_dir, section.DIR,
                                      section.ANSWER_VOCAB)
        with open(filename) as f:
            self.answer_vocab = json.load(f)

    def load_data(self, anno_file, max_instr_len=200, debug=False):
        with open(str(anno_file)) as f:
            data = json.load(f)
        new_data = []
        for i, item in enumerate(data):
            new_item = dict(item)
            new_item["raw_idx"] = item["sample_idx"]
            new_item["instr_id"] = "eqa_{}_{}".format(item["sample_idx"], i)
            new_item["path_id"] = item["sample_idx"]
            new_item["data_type"] = "eqa"
            new_item["heading"] = 0.0
            new_data.append(new_item)
        if debug:
            new_data = new_data[:20]
        gt_trajs = {x["instr_id"]: (x["scan"], x["path"])
                    for x in new_data if len(x["path"]) > 1}
        return new_data, gt_trajs

    def get_obs(self, items, env, data_type=None):
        """Question/answer text replaces the instruction (eqa.py:74-112)."""
        obs = super().get_obs(items, env, data_type)
        for ob, item in zip(obs, items):
            ob["instruction"] = item["question"]["question_text"]
            ob["answer"] = item["question"]["answer_text"]
        return obs

    def eval_metrics(self, preds, logger, name):
        if logger is not None:
            logger.info("eval %d predictions" % len(preds))
        per_item = []
        metrics = defaultdict(list)
        all_gt_ans = {}
        for item in preds:
            instr_id = item["instr_id"]
            all_gt_ans[instr_id] = [item["gt_answer"]]
            scan, gt_traj = self.gt_trajs[instr_id]
            scores = M.eval_r2r_item(self.dist_fn(scan), item["trajectory"],
                                     gt_traj)
            per_item.append(scores)
            for k, v in scores.items():
                metrics[k].append(v)
            metrics["instr_id"].append(instr_id)
        avg = M.aggregate_r2r(per_item)
        n_correct = sum(1 for p in preds
                        if p["pred_answer"] in all_gt_ans[p["instr_id"]])
        avg["exact_match"] = n_correct / len(preds) * 100
        n_oracle = sum(1 for p in preds
                       if p["oracle_pred_answer"] in all_gt_ans[p["instr_id"]])
        avg["oracle_exact_match"] = n_oracle / len(preds) * 100
        return avg, metrics
