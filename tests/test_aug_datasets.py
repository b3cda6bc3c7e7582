"""R2RAug / REVERIEAug loaders (reference r2r_aug.py, reverie_aug.py):
jsonl items carry bert token ids; the decoder is injectable so the
parse semantics are testable without the HF bert-base-uncased asset."""
import json

from navillm_tpu.data.datasets.aug import R2RAugDataset, REVERIEAugDataset


def _decoder(ids):
    return "tok " + " ".join(map(str, ids))


def _bare(cls):
    ds = cls.__new__(cls)   # parse-level test: load_data uses no state
    return ds


def test_r2r_aug_jsonl_parse(tmp_path, monkeypatch):
    items = [
        {"instr_id": "aug_0", "scan": "s0", "path": ["a", "b", "c"],
         "instr_encoding": [5, 6, 7], "heading": 1.5},
        {"instr_id": "aug_1", "scan": "s0", "path": ["a"],     # 1-node
         "instr_encoding": [9]},
    ]
    f = tmp_path / "aug.jsonl"
    f.write_text("\n".join(json.dumps(x) for x in items) + "\n")
    monkeypatch.setattr(R2RAugDataset, "decoder", staticmethod(_decoder))
    data, gt = _bare(R2RAugDataset).load_data(f)
    assert len(data) == 2
    assert data[0]["data_type"] == "r2r_aug"
    assert data[0]["instruction"] == "tok 5 6 7"
    assert data[0]["heading"] == 1.5 and data[1]["heading"] == 0
    assert data[0]["path_id"] is None
    assert data[0]["raw_idx"] == 0 and data[1]["sample_idx"] == 1
    # gt_trajs: keyed by instr_id, single-node paths excluded
    assert set(gt) == {"aug_0"}
    assert gt["aug_0"] == ("s0", ["a", "b", "c"])


def test_reverie_aug_jsonl_parse(tmp_path, monkeypatch):
    items = [{"instr_id": "raug_0", "scan": "s0", "path": ["a", "b"],
              "instr_encoding": [3, 4], "pos_vps": ["b", "c"]}]
    f = tmp_path / "aug.jsonl"
    f.write_text("\n".join(json.dumps(x) for x in items) + "\n")
    monkeypatch.setattr(REVERIEAugDataset, "decoder", staticmethod(_decoder))
    data, gt = _bare(REVERIEAugDataset).load_data(f)
    it = data[0]
    assert it["data_type"] == "reverie_aug"
    assert it["instruction"] == "tok 3 4"
    assert it["end_vps"] == ["b", "c"] and "pos_vps" not in it
    assert it["objId"] is None
    # no objId -> no gt entries (obj-grounding eval not applicable)
    assert gt == {}


def test_r2r_aug_json_falls_through_to_parent(tmp_path):
    items = [{"path_id": 7, "scan": "s0", "heading": 0.0, "distance": 1.0,
              "path": ["a", "b"], "instructions": ["go left", "go right"]}]
    f = tmp_path / "plain.json"
    f.write_text(json.dumps(items))
    data, gt = _bare(R2RAugDataset).load_data(f)
    # parent R2R loader: one item per instruction, r2r_{path_id}_{j} ids
    assert [d["instr_id"] for d in data] == ["r2r_7_0", "r2r_7_1"]
    assert data[0]["instruction"] == "go left"
    assert set(gt) == {"r2r_7_0", "r2r_7_1"}


def test_jsonl_debug_truncates_at_20(tmp_path, monkeypatch):
    f = tmp_path / "aug.jsonl"
    f.write_text("\n".join(json.dumps(
        {"instr_id": f"i{k}", "scan": "s0", "path": ["a", "b"],
         "instr_encoding": [k]}) for k in range(30)))
    monkeypatch.setattr(R2RAugDataset, "decoder", staticmethod(_decoder))
    data, _ = _bare(R2RAugDataset).load_data(f, debug=True)
    assert len(data) == 20
