"""R2R dataset (reference tasks/datasets/r2r.py)."""
from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

from ...utils.registry import DATASETS
from .. import metrics as M
from .mp3d_base import MP3DDatasetBase


@DATASETS.register("r2r")
class R2RDataset(MP3DDatasetBase):
    """Splits multi-instruction items; parses FGR2R fine-grained chunks;
    SR/SPL/OSR/nav-error eval (reference r2r.py:10-144)."""

    def load_data(self, anno_file, max_instr_len=200, debug=False):
        with open(str(anno_file)) as f:
            data = json.load(f)
        new_data = []
        sample_index = 0
        for i, item in enumerate(data):
            for j, instr in enumerate(item["instructions"]):
                new_item = dict(item)
                new_item["raw_idx"] = i
                new_item["sample_idx"] = sample_index
                new_item["instr_id"] = "r2r_{}_{}".format(item["path_id"], j)
                new_item["instruction"] = instr
                del new_item["instructions"]
                if "instr_encodings" in new_item:
                    new_item["instr_encoding"] = \
                        item["instr_encodings"][j][:max_instr_len]
                    del new_item["instr_encodings"]
                # FGR2R fine-grained chunks (r2r.py:37-48): `new_instructions`
                # is a python-literal string of per-step sub-instructions;
                # chunk_view maps steps to view index ranges.
                if "new_instructions" in new_item and \
                        len(eval(item["new_instructions"])) > j:
                    fg = eval(item["new_instructions"])[j]
                    new_item["fg_instruction"] = [" ".join(x) for x in fg]
                    del new_item["new_instructions"]
                    fg_view = []
                    for idx, span in enumerate(item["chunk_view"][j]):
                        fg_view += [idx] * (span[1] - span[0])
                    new_item["fg_view"] = fg_view
                    del new_item["chunk_view"]
                new_item["data_type"] = "r2r"
                new_data.append(new_item)
                sample_index += 1
        if debug:
            new_data = new_data[:20]
        gt_trajs = {x["instr_id"]: (x["scan"], x["path"])
                    for x in new_data if len(x["path"]) > 1}
        return new_data, gt_trajs

    def eval_metrics(self, preds, logger, name):
        if logger is not None:
            logger.info("eval %d predictions" % len(preds))
        per_item = []
        metrics = defaultdict(list)
        for item in preds:
            instr_id = item["instr_id"]
            scan, gt_traj = self.gt_trajs[instr_id]
            scores = M.eval_r2r_item(self.dist_fn(scan), item["trajectory"],
                                     gt_traj)
            per_item.append(scores)
            for k, v in scores.items():
                metrics[k].append(v)
            metrics["instr_id"].append(instr_id)
        return M.aggregate_r2r(per_item), metrics

    def save_json(self, results, path, item_metrics=None):
        """Leaderboard format (r2r.py:133-144)."""
        if item_metrics is not None:
            for k in item_metrics:
                for item, v in zip(results, item_metrics[k]):
                    item[k] = v
        for item in results:
            item["instr_id"] = "_".join(item["instr_id"].split("_")[1:])
            item["trajectory"] = [[y, 0, 0] for x in item["trajectory"]
                                  for y in x]
        with open(path, "w") as f:
            json.dump(results, f)
