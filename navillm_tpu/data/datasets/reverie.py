"""REVERIE dataset (reference tasks/datasets/reverie.py)."""
from __future__ import annotations

import copy
import json
from collections import defaultdict

import numpy as np

from ...utils.registry import DATASETS
from .. import metrics as M
from .mp3d_base import MP3DDatasetBase


@DATASETS.register("reverie")
class REVERIEDataset(MP3DDatasetBase):
    """obj2vps visibility map, multi-endpoint resampling, RGS/RGSPL
    object-grounding metrics (reference reverie.py)."""

    def __init__(self, args, config, training=False, logger=None,
                 source=None, world=None):
        self._obj2vps_loaded = False
        super().__init__(args, config, training, logger, source, world)
        self.multi_startpoints = False
        self.multi_endpoints = args.multi_endpoints

    def _load_annotations(self, config, data_dir):
        from .mp3d_base import dataset_section, get_anno_file_path
        src = self.source
        section = dataset_section(config, src)
        # bbox file lives under the base REVERIE section for aug too
        try:
            base = dataset_section(config, "REVERIE")
        except KeyError:
            base = section
        bbox_file = get_anno_file_path(data_dir, base.DIR, base.bbox_file)
        self.load_obj2vps(bbox_file)
        anno_file = get_anno_file_path(data_dir, section.DIR,
                                       section.SPLIT[self.split])
        self.alldata, self.gt_trajs = self.load_data(anno_file=anno_file,
                                                     debug=self.debug)
        self.scans = sorted({x["scan"] for x in self.alldata})

    def load_obj2vps(self, bbox_file):
        """scan_objid -> viewpoints where visible (reverie.py:86-98)."""
        obj2vps = {}
        with open(str(bbox_file)) as f:
            bbox_data = json.load(f)
        for scanvp, value in bbox_data.items():
            # maxsplit=1: MP3D scan ids never contain '_' but synthetic
            # test viewpoint ids may
            scan, vp = scanvp.split("_", 1)
            for objid, objinfo in value.items():
                if objinfo["visible_pos"]:
                    obj2vps.setdefault(scan + "_" + objid, []).append(vp)
        self.obj2vps = obj2vps
        return obj2vps

    def preprocess_item(self, item):
        """Multi-endpoint path resampling during training (reverie.py:22-42)."""
        if self.split != "train" or "end_vps" not in item or \
                not self.multi_endpoints:
            return item
        start_vp = item["path"][0]
        end_vp = item["end_vps"][np.random.randint(len(item["end_vps"]))]
        item = copy.deepcopy(item)
        item["path"] = self.shortest_path(item["scan"], start_vp, end_vp)
        return item

    def load_data(self, anno_file, debug=False):
        with open(str(anno_file)) as f:
            data = json.load(f)
        new_data = []
        sample_index = 0
        for i, item in enumerate(data):
            for j, instr in enumerate(item["instructions"]):
                new_item = dict(item)
                if "objId" in item:
                    new_item["instr_id"] = "%s_%s_%s_%d" % (
                        "reverie", str(item["path_id"]), str(item["objId"]), j)
                else:
                    new_item["path_id"] = item["id"]
                    new_item["instr_id"] = "%s_%s_%d" % ("reverie",
                                                         item["id"], j)
                    new_item["objId"] = None
                new_item["sample_idx"] = sample_index
                new_item["instruction"] = instr
                del new_item["instructions"]
                new_item["data_type"] = "reverie"
                new_item["raw_idx"] = None
                new_item["instr_encoding"] = None
                if item.get("objId") is not None:
                    new_item["end_vps"] = self.obj2vps[
                        "%s_%s" % (item["scan"], item["objId"])]
                new_data.append(new_item)
                sample_index += 1
        if debug:
            new_data = new_data[:20]
        gt_trajs = {x["instr_id"]: (x["scan"], x["path"], x["objId"])
                    for x in new_data if x.get("objId") is not None}
        return new_data, gt_trajs

    def eval_metrics(self, preds, logger, name):
        if logger is not None:
            logger.info("eval %d predictions" % len(preds))
        per_item = []
        metrics = defaultdict(list)
        for item in preds:
            instr_id = item["instr_id"]
            scan, gt_traj, gt_objid = self.gt_trajs[instr_id]
            scores = M.eval_reverie_item(
                self.dist_fn(scan), item["trajectory"],
                item.get("pred_objid"), gt_traj, gt_objid,
                self.obj2vps["%s_%s" % (scan, str(gt_objid))])
            per_item.append(scores)
            for k, v in scores.items():
                metrics[k].append(v)
            metrics["instr_id"].append(instr_id)
        return M.aggregate_reverie(per_item), metrics

    def get_object_info(self, item, state):
        """Per-step object features from the obj DB (reverie.py:170-193)."""
        obj_img_fts, obj_ang_fts, obj_box_fts, obj_ids = \
            self.obj_feat_db.get_object_feature(
                state.scan, state.viewpoint, state.heading, state.elevation,
                self.angle_feat_size, max_objects=self.max_objects)
        gt_end_vps = item.get("end_vps", [])
        gt_obj_id = item["objId"] if state.viewpoint in gt_end_vps else None
        return {
            "obj_img_fts": obj_img_fts,
            "obj_ang_fts": obj_ang_fts,
            "obj_box_fts": obj_box_fts,
            "obj_ids": obj_ids,
            "gt_end_vps": gt_end_vps,
            "gt_obj_id": gt_obj_id,
        }

    def save_json(self, results, path, item_metrics=None):
        if item_metrics is not None:
            for k in item_metrics:
                for item, v in zip(results, item_metrics[k]):
                    item[k] = v
        for item in results:
            item["instr_id"] = "_".join(item["instr_id"].split("_")[1:])
            item["trajectory"] = [[y, 0, 0] for x in item["trajectory"]
                                  for y in x]
            item["predObjId"] = int(item["pred_objid"]) \
                if item.get("pred_objid") is not None else 0
        with open(path, "w") as f:
            json.dump(results, f)
