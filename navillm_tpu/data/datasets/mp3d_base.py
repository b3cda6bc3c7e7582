"""MP3D base dataset: annotations + world graphs + observation assembly.

Re-design of the reference MP3DDataset (tasks/datasets/mp3d_dataset.py):
  - the per-dataset networkx Dijkstra tables (mp3d_dataset.py:122-138)
    and the MatterSim candidate sweep + cache (mp3d_dataset.py:247-324)
    are replaced by a shared WorldModel (C++ ScanGraph all-pairs +
    closed-form candidate tables, navillm_tpu/sim);
  - __getitem__ returns the same dict contract
    {sample_idx, instr_id, observations, env, item, data_type}
    (mp3d_dataset.py:143-167) with a lightweight EpisodeBatch env;
  - get_obs assembles the same observation dict (mp3d_dataset.py:196-245):
    36-view features ⊕ per-base-view angle features, candidate list with
    relative angles and per-candidate features.
"""
from __future__ import annotations

import copy
import json
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ...sim.env import EpisodeBatch, WorldModel
from ...sim.geometry import (NUM_VIEWS, all_point_angle_features,
                             angle_feature)


def dataset_section(config, src):
    """Dataset config section: top-level or nested under `Dataset`
    (the reference nests them, configs/multi.yaml:20)."""
    if src in config:
        return config[src]
    return config["Dataset"][src]


def get_anno_file_path(data_dir, dataset_path, filename) -> Path:
    if str(dataset_path).startswith("/"):
        return Path(dataset_path) / filename
    return Path(data_dir) / dataset_path / filename


class MP3DDatasetBase:
    name = "mp3d"

    def __init__(self, args, config, training: bool = False, logger=None,
                 source: Optional[str] = None,
                 world: Optional[WorldModel] = None):
        self.config = config
        self.angle_feat_size = config.Feature.angle_feat_size \
            if "Feature" in config else args.angle_feat_size
        self.logger = logger
        self.training = training
        self.debug = args.debug
        self.source = source
        self.args = args

        if training:
            self.split = "train"
            self.max_objects = config.Feature.get("max_objects", None) \
                if "Feature" in config else None
            self.multi_endpoints = True
        else:
            self.split = args.validation_split
            self.max_objects = None
            self.multi_endpoints = False

        self.batch_size = args.batch_size
        self.seed = args.seed
        self.feat_db = None
        self.obj_feat_db = None

        self.connectivity_dir = str(Path(args.data_dir) / "connectivity")
        self._load_annotations(config, args.data_dir)

        self.world = world if world is not None else \
            WorldModel(self.connectivity_dir)
        for scan in self.scans:
            self.world.load_scan(scan)

        # precomputed [36, 36, A] angle-feature table (mp3d_envs.py:65-66)
        self.angle_feature = all_point_angle_features(self.angle_feat_size)

        if logger is not None:
            logger.info("[INFO] %s loaded with %d instructions, split: %s"
                        % (type(self).__name__, len(self.alldata), self.split))

    # ---- annotation loading (per-source dispatch, mp3d_dataset.py:76-120) --
    def _load_annotations(self, config, data_dir):
        src = self.source
        section = dataset_section(config, src)
        anno_file = get_anno_file_path(data_dir, section.DIR,
                                       section.SPLIT[self.split])
        self.alldata, self.gt_trajs = self.load_data(anno_file=anno_file,
                                                     debug=self.debug)
        self.scans = sorted({x["scan"] for x in self.alldata})

    def load_data(self, anno_file, debug=False):
        raise NotImplementedError

    def init_feat_db(self, feat_db, obj_feat_db=None):
        self.feat_db = feat_db
        self.obj_feat_db = obj_feat_db

    # ---- shortest-path helpers over the shared world ----
    def distance(self, scan: str, a: str, b: str) -> float:
        return self.world.graph(scan).distance(a, b)

    def shortest_path(self, scan: str, a: str, b: str) -> List[str]:
        return self.world.graph(scan).path(a, b)

    def dist_fn(self, scan: str):
        g = self.world.graph(scan)
        return g.distance

    def get_nearest(self, scan: str, goal: str, path: Sequence[str]) -> str:
        from ..metrics import get_nearest
        return get_nearest(self.dist_fn(scan), goal, path)

    # ---- sampling ----
    def __len__(self):
        return len(self.alldata)

    def preprocess_item(self, item):
        return item

    def __getitem__(self, index):
        item = copy.deepcopy(self.alldata[index])
        item = self.preprocess_item(item)
        env = EpisodeBatch(self.world, 1)
        env.new_episodes([item["scan"]], [item["path"][0]],
                         [item.get("heading") or 0.0])
        observations = self.get_obs(items=[item], env=env,
                                    data_type=item["data_type"])[0]
        return {
            "sample_idx": index,
            "instr_id": item["instr_id"],
            "observations": observations,
            "env": env,
            "item": item,
            "data_type": item["data_type"],
        }

    @staticmethod
    def collate_batch(batch_list, _unused=False):
        """Identity list-collate (mp3d_dataset.py:172-191)."""
        data_dict = defaultdict(list)
        for sample in batch_list:
            for k, v in sample.items():
                data_dict[k].append(v)
        ret = dict(data_dict)
        ret["batch_size"] = len(batch_list)
        return ret

    # ---- observation assembly ----
    def make_candidate(self, feature: np.ndarray, scan: str, viewpoint: str,
                       view_index: int) -> List[Dict[str, Any]]:
        """Candidate dicts with relative angles + per-candidate features
        (mp3d_dataset.py:247-324 semantics from the precomputed table)."""
        base_heading = (view_index % 12) * np.radians(30)
        base_elevation = (view_index // 12 - 1) * np.radians(30)
        out = []
        for c in self.world.candidates(scan, viewpoint):
            heading = c.normalized_heading - base_heading
            elevation = c.normalized_elevation - base_elevation
            ang = angle_feature(heading, elevation, self.angle_feat_size)
            out.append({
                "heading": heading,
                "elevation": elevation,
                "normalized_heading": c.normalized_heading,
                "normalized_elevation": c.normalized_elevation,
                "scanId": scan,
                "viewpointId": c.viewpoint_id,
                "pointId": c.point_id,
                "distance": c.distance,
                "idx": c.index,
                "feature": np.concatenate((feature[c.point_id], ang), -1),
                "position": c.position,
            })
        return out

    def get_object_info(self, item, state):
        raise NotImplementedError

    def get_obs(self, items, env: EpisodeBatch, data_type=None):
        obs = []
        for i, state in enumerate(env.get_states()):
            item = items[i]
            base_view_id = state.view_index
            feature = self.feat_db.get_image_feature(state.scan,
                                                     state.viewpoint)
            candidate = self.make_candidate(feature, state.scan,
                                            state.viewpoint, base_view_id)
            feature = np.concatenate(
                (feature, self.angle_feature[base_view_id]), -1)
            ob = {
                "instr_id": item["instr_id"],
                "scan": state.scan,
                "viewpoint": state.viewpoint,
                "viewIndex": state.view_index,
                "position": tuple(state.position),
                "heading": state.heading,
                "elevation": state.elevation,
                "feature": feature,
                "candidate": candidate,
                "instruction": item.get("instruction"),  # EQA overrides
                "gt_path": item["path"],
                "path_id": item.get("path_id"),
            }
            if "fg_instruction" in item:
                ob["fg_instruction"] = item["fg_instruction"]
                ob["fg_view"] = item["fg_view"]
            if self.obj_feat_db is not None:
                ob.update(self.get_object_info(item, state))
            ob["distance"] = 0
            obs.append(ob)
        return obs

    # ---- evaluation scaffolding ----
    def eval_metrics(self, preds, logger, name):
        raise NotImplementedError

    def save_json(self, results, path, item_metrics=None):
        with open(path, "w") as f:
            json.dump(results, f)
