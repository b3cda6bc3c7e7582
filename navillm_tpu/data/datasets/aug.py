"""Augmented R2R / REVERIE datasets (reference r2r_aug.py, reverie_aug.py).

jsonl annotations carry bert-base-uncased token ids (`instr_encoding`)
instead of text; the reference decodes them back to strings with the HF
tokenizer (r2r_aug.py:27-37). The decoder is injectable: set the class
attribute `decoder` (ids -> str) for hermetic use; the default lazily
loads bert-base-uncased (requires a local HF cache). Plain .json files
fall through to the parent loader (r2r_aug.py:17-18).
"""
from __future__ import annotations

import json
from typing import Callable, List, Optional

from ...utils.registry import DATASETS
from .r2r import R2RDataset
from .reverie import REVERIEDataset

_default_decoder = None


def _bert_decoder():
    global _default_decoder
    if _default_decoder is None:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained("bert-base-uncased")
        _default_decoder = lambda ids: tok.decode(ids,
                                                  skip_special_tokens=True)
    return _default_decoder


def _read_jsonl(anno_file, debug):
    data = []
    with open(str(anno_file)) as f:
        for i, line in enumerate(f):
            if debug and i == 20:
                break
            line = line.strip()
            if line:
                data.append(json.loads(line))
    return data


@DATASETS.register("r2r_aug")
class R2RAugDataset(R2RDataset):
    decoder: Optional[Callable[[List[int]], str]] = None

    def load_data(self, anno_file, max_instr_len=200, debug=False):
        if str(anno_file).endswith(".json"):
            return super().load_data(anno_file, max_instr_len=max_instr_len,
                                     debug=debug)
        decoder = self.decoder or _bert_decoder()
        new_data = []
        for i, item in enumerate(_read_jsonl(anno_file, debug)):
            new_item = dict(item)
            new_item["raw_idx"] = i
            new_item["sample_idx"] = i
            new_item["data_type"] = "r2r_aug"
            new_item["path_id"] = None
            new_item["heading"] = item.get("heading", 0)
            new_item["instruction"] = decoder(new_item["instr_encoding"])
            new_data.append(new_item)
        if debug:
            new_data = new_data[:20]
        gt_trajs = {x["instr_id"]: (x["scan"], x["path"])
                    for x in new_data if len(x["path"]) > 1}
        return new_data, gt_trajs


@DATASETS.register("reverie_aug")
class REVERIEAugDataset(REVERIEDataset):
    decoder: Optional[Callable[[List[int]], str]] = None

    def load_data(self, anno_file, debug=False):
        if str(anno_file).endswith(".json"):
            return super().load_data(anno_file, debug=debug)
        decoder = self.decoder or _bert_decoder()
        new_data = []
        for i, item in enumerate(_read_jsonl(anno_file, debug)):
            new_item = dict(item)
            new_item["raw_idx"] = i
            new_item["sample_idx"] = i
            new_item["data_type"] = "reverie_aug"
            new_item["instruction"] = decoder(new_item["instr_encoding"])
            new_item["objId"] = None
            new_item["path_id"] = None
            new_item["heading"] = item.get("heading", 0)
            new_item["end_vps"] = item["pos_vps"]
            del new_item["pos_vps"]
            new_data.append(new_item)
        if debug:
            new_data = new_data[:20]
        gt_trajs = {x["instr_id"]: (x["scan"], x["path"], x["objId"])
                    for x in new_data if x.get("objId") is not None}
        return new_data, gt_trajs
