"""LLaVA instruction-tuning dataset (reference tasks/datasets/llava.py)."""
from __future__ import annotations

import copy
import json
import os
from collections import defaultdict

import numpy as np

from ...utils.registry import DATASETS


@DATASETS.register("llava")
class LLaVADataset:
    """LLaVA-detail-23k single-turn QA over COCO image features."""

    def __init__(self, args, config, training=False, logger=None,
                 source=None, world=None):
        self.config = config
        self.training = training
        self.logger = logger
        self.source = source
        self.split = "train" if training else args.validation_split
        self.batch_size = args.batch_size
        self.feat_db = None
        self.obj_feat_db = None
        self.max_datapoints = args.max_datapoints
        self._load_data(config, args.data_dir)

    def init_feat_db(self, feat_db, obj_feat_db=None):
        self.feat_db = feat_db
        self.obj_feat_db = obj_feat_db

    def _load_data(self, config, data_dir):
        from .mp3d_base import dataset_section
        section = dataset_section(config, self.source)
        path = os.path.join(str(data_dir), section.DIR,
                            section.SPLIT[self.split])
        with open(path) as f:
            data = json.load(f)
        self.alldata = []
        for item in data:
            conversations = item["conversations"]
            assert len(conversations) == 2, \
                "The round of conversation must be 2."
            for i in range(0, len(conversations) - 1, 2):
                assert conversations[i]["from"] == "human"
                assert conversations[i + 1]["from"] == "gpt"
                self.alldata.append({
                    "id": item["id"],
                    "turn_id": i // 2,
                    "image_id": item["image"].split(".")[0],
                    "question": conversations[i]["value"]
                        .replace("<image>", "").strip(),
                    "answers": [conversations[i + 1]["value"]],
                })
        if self.max_datapoints:
            self.alldata = self.alldata[: self.max_datapoints]
        if self.logger is not None:
            self.logger.info(
                f"There are totally {len(self.alldata)} datapoints loaded.")

    def __len__(self):
        return len(self.alldata)

    def __getitem__(self, index):
        item = copy.deepcopy(self.alldata[index])
        features = self.feat_db.get_image_feature(item["image_id"])
        features = np.stack(features)[None]     # [1, D] single frame
        return {
            "id": item["id"],
            "image_id": item["image_id"],
            "question": item["question"],
            "answers": item["answers"],
            "data_type": "llava",
            "features": features,
        }

    @staticmethod
    def collate_batch(batch_list, _unused=False):
        data_dict = defaultdict(list)
        for sample in batch_list:
            for k, v in sample.items():
                data_dict[k].append(v)
        ret = dict(data_dict)
        ret["batch_size"] = len(batch_list)
        return ret

    def eval_metrics(self, preds, logger, name):
        return {}, {}

    def save_json(self, results, path, item_metrics=None):
        with open(path, "w") as f:
            json.dump(results, f)
