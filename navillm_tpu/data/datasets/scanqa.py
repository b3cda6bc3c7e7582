"""ScanQA 3D-QA dataset (reference tasks/datasets/scanqa.py)."""
from __future__ import annotations

import copy
import json
import os
import random

import numpy as np

from ...utils.registry import DATASETS
from .llava import LLaVADataset


@DATASETS.register("scanqa")
class ScanQADataset(LLaVADataset):
    """Reformatted ScanQA: <=36 sampled ScanNet frames per question;
    BLEU/ROUGE/CIDEr/METEOR/EM eval (reference scanqa.py)."""

    def _load_data(self, config, data_dir):
        from .mp3d_base import dataset_section
        section = dataset_section(config, self.source)
        if str(section.DIR).startswith("/"):
            path = os.path.join(section.DIR, section.SPLIT[self.split])
        else:
            path = os.path.join(str(data_dir), section.DIR,
                                section.SPLIT[self.split])
        self.alldata = []
        with open(path) as f:
            data = json.load(f)
        for item in data:
            for ann in item["annotation"]:
                self.alldata.append({
                    "question_id": ann["question_id"],
                    "question": ann["question"],
                    "answers": [a.lower() for a in ann["answers"]],
                    "image_info": item["image_info"],
                    "scene_id": item["scene_id"],
                })
        if self.max_datapoints:
            self.alldata = self.alldata[: self.max_datapoints]
        if self.logger is not None:
            self.logger.info(
                f"There are totally {len(self.alldata)} datapoints loaded.")

    def __getitem__(self, index):
        item = copy.deepcopy(self.alldata[index])
        sampled = random.sample(item["image_info"],
                                min(36, len(item["image_info"])))
        features = np.stack([
            self.feat_db.get_image_feature(item["scene_id"], d["image_id"])
            for d in sampled])
        return {
            "scene_id": item["scene_id"],
            "question_id": item["question_id"],
            "question": item["question"],
            "answers": item["answers"],
            "features": features,
            "data_type": "scan_qa",
        }

    def eval_metrics(self, preds, logger, name):
        ret = {}
        if self.split == "test":
            return ret, {}
        refs = {item["question_id"]: item["answers"] for item in self.alldata}
        gen = {item["question_id"]: item["generated_sentences"]
               for item in preds}
        from ...eval.captioning import Bleu, Cider, Meteor, Rouge
        score, _ = Bleu().compute_score(refs, gen)
        for i, s in enumerate(score):
            ret[f"bleu-{i+1}"] = s * 100
        score, _ = Rouge().compute_score(refs, gen)
        ret["rouge"] = score * 100
        score, _ = Cider().compute_score(refs, gen)
        ret["cider"] = score * 100
        meteor = Meteor()
        if meteor.available():
            score, _ = meteor.compute_score(refs, gen)
            ret["meteor"] = score * 100

        metrics = {"exact_match": []}
        n_correct = 0
        for pred in preds:
            hit = pred["generated_sentences"][0] in refs[pred["question_id"]]
            n_correct += int(hit)
            metrics["exact_match"].append(float(hit))
        ret["exact_match"] = n_correct / len(preds) * 100
        return ret, metrics

    def save_json(self, results, path, item_metrics=None):
        """Leaderboard format (scanqa.py:100-107)."""
        for item in results:
            item["answer_top10"] = item["generated_sentences"]
            item["pred_bbox"] = []
            del item["generated_sentences"]
        with open(path, "w") as f:
            json.dump(results, f)
