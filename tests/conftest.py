import os
import sys

# Force an 8-device CPU mesh for all tests: multi-chip sharding is validated
# on virtual devices (the real machine has one TPU chip; see SURVEY.md §2.2).
#
# The image's sitecustomize registers a TPU PJRT plugin at *interpreter
# startup* and exports JAX_PLATFORMS=axon, so env vars set here are too
# late — but the backend itself is not yet *initialized*, so overriding
# the platform through jax.config still wins.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

# Only force CPU when actually running under pytest: this module is also
# imported as a fixture library by scripts, which must keep the real
# backend (importing it once silently moved a benchmark onto the CPU).
if any("pytest" in a for a in sys.argv) or "PYTEST_VERSION" in os.environ:
    jax.config.update("jax_platforms", "cpu")

import json
import math
from pathlib import Path

import numpy as np
import pytest


from navillm_tpu.testing import make_grid_connectivity  # noqa: E402


@pytest.fixture(scope="session")
def world_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("connectivity")
    make_grid_connectivity(d, scan="scan0", rows=4, cols=4)
    make_grid_connectivity(d, scan="scan1", rows=3, cols=5,
                           drop_edges=[((0, 1), (0, 2)), ((1, 2), (2, 2))])
    return d


@pytest.fixture(scope="session")
def world(world_dir):
    from navillm_tpu.sim import WorldModel
    return WorldModel(world_dir, scans=["scan0", "scan1"])


# ---------------- synthetic dataset fixtures ----------------

def grid_vp(r, c):
    return f"vp_{r}_{c}"


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    """A synthetic data_dir: connectivity + annotations for every task."""
    root = tmp_path_factory.mktemp("data")
    conn = root / "connectivity"
    make_grid_connectivity(conn, scan="scan0", rows=4, cols=4)
    make_grid_connectivity(conn, scan="scan1", rows=3, cols=5)

    # --- R2R: paths across scan0 with 2 instructions each ---
    r2r_dir = root / "R2R" / "annotations"
    r2r_dir.mkdir(parents=True)
    r2r_items = []
    for pid, path in enumerate([
        [grid_vp(0, 0), grid_vp(0, 1), grid_vp(0, 2), grid_vp(1, 2)],
        [grid_vp(3, 3), grid_vp(2, 3), grid_vp(2, 2)],
    ]):
        r2r_items.append({
            "distance": 2.0 * (len(path) - 1),
            "scan": "scan0",
            "path_id": pid,
            "path": path,
            "heading": 0.5,
            "instructions": [f"walk along route {pid}",
                             f"go to the end of route {pid}"],
        })
    with open(r2r_dir / "R2R_train_enc.json", "w") as f:
        json.dump(r2r_items, f)
    with open(r2r_dir / "R2R_val_unseen_enc.json", "w") as f:
        json.dump(r2r_items, f)

    # --- CVDN ---
    cvdn_dir = root / "CVDN" / "annotations"
    cvdn_dir.mkdir(parents=True)
    cvdn_items = [{
        "inst_idx": 7,
        "scan": "scan0",
        "target": "sofa",
        "dialog_history": [
            {"role": "navigator", "message": "where should I go"},
            {"role": "oracle", "message": "head to the kitchen"},
        ],
        "start_pano": {"pano": grid_vp(0, 0), "heading": 1.0},
        "planner_path": [grid_vp(0, 0), grid_vp(1, 0), grid_vp(2, 0)],
        "end_panos": [grid_vp(2, 0), grid_vp(2, 1)],
    }]
    with open(cvdn_dir / "train.json", "w") as f:
        json.dump(cvdn_items, f)
    with open(cvdn_dir / "val_unseen.json", "w") as f:
        json.dump(cvdn_items, f)

    # --- REVERIE (+ bboxes) ---
    rev_dir = root / "REVERIE" / "annotations"
    rev_dir.mkdir(parents=True)
    rev_items = [{
        "scan": "scan0",
        "path_id": 11,
        "objId": 42,
        "path": [grid_vp(0, 0), grid_vp(1, 0), grid_vp(1, 1)],
        "heading": 0.0,
        "instructions": ["bring me the pillow from the bedroom"],
    }]
    bboxes = {
        f"scan0_{grid_vp(1, 1)}": {
            "42": {"visible_pos": [1, 2], "name": "pillow"},
        },
        f"scan0_{grid_vp(1, 2)}": {
            "42": {"visible_pos": [3], "name": "pillow"},
        },
    }
    with open(rev_dir / "REVERIE_train.json", "w") as f:
        json.dump(rev_items, f)
    with open(rev_dir / "REVERIE_val_unseen.json", "w") as f:
        json.dump(rev_items, f)
    with open(rev_dir / "BBoxes.json", "w") as f:
        json.dump(bboxes, f)

    # --- SOON (jsonl) ---
    soon_dir = root / "SOON" / "annotations"
    soon_dir.mkdir(parents=True)
    soon_item = {
        "scan": "scan0",
        "path_id": 3,
        "path": [grid_vp(0, 0), grid_vp(0, 1), grid_vp(0, 2)],
        "bboxes": [{
            "image_id": grid_vp(0, 2),
            "pseudo_label": {"obj_id": 5},
            "target": {
                "center": {"heading": 1.0, "elevation": 0.1},
                "left_top": {"heading": 0.8, "elevation": 0.3},
                "right_top": {"heading": 1.2, "elevation": 0.3},
                "right_bottom": {"heading": 1.2, "elevation": -0.1},
                "left_bottom": {"heading": 0.8, "elevation": -0.1},
            },
        }],
        "instructions": [{"full": "find the round table near the window"}],
    }
    import json as _json
    with open(soon_dir / "train.jsonl", "w") as f:
        f.write(_json.dumps(soon_item) + "\n")
    with open(soon_dir / "val_unseen.jsonl", "w") as f:
        f.write(_json.dumps(soon_item) + "\n")

    # --- EQA ---
    eqa_dir = root / "EQA" / "annotations"
    eqa_dir.mkdir(parents=True)
    eqa_items = [{
        "sample_idx": 0,
        "scan": "scan0",
        "path": [grid_vp(0, 0), grid_vp(1, 0)],
        "question": {"question_text": "what color is the sofa",
                     "answer_text": "red"},
    }]
    for split in ("train", "val_unseen"):
        with open(eqa_dir / f"{split}.json", "w") as f:
            json.dump(eqa_items, f)
    with open(eqa_dir / "answer_vocab.json", "w") as f:
        json.dump(["red", "blue", "green"], f)

    # --- ScanQA ---
    sq_dir = root / "ScanQA" / "annotations"
    sq_dir.mkdir(parents=True)
    sq_items = [{
        "scene_id": "scene0000_00",
        "image_info": [{"image_id": f"frame_{i}"} for i in range(4)],
        "annotation": [{
            "question_id": "q0",
            "question": "how many chairs are there",
            "answers": ["two"],
        }],
    }]
    for split in ("train", "val_unseen"):
        with open(sq_dir / f"{split}.json", "w") as f:
            json.dump(sq_items, f)

    # --- LLaVA ---
    llava_dir = root / "LLaVA" / "annotations"
    llava_dir.mkdir(parents=True)
    llava_items = [{
        "id": "0001",
        "image": "000123.jpg",
        "conversations": [
            {"from": "human", "value": "<image>\ndescribe the image"},
            {"from": "gpt", "value": "a scenic view of mountains"},
        ],
    }]
    for split in ("train", "val_unseen"):
        with open(llava_dir / f"{split}.json", "w") as f:
            json.dump(llava_items, f)

    return root


@pytest.fixture(scope="session")
def task_config(data_dir):
    from navillm_tpu.utils.config import ConfigDict
    return ConfigDict({
        "Feature": {"image_feat_size": 32, "angle_feat_size": 4,
                    "obj_feat_size": 16, "max_objects": 3},
        "R2R": {"DIR": "R2R", "SPLIT": {
            "train": "annotations/R2R_train_enc.json",
            "val_unseen": "annotations/R2R_val_unseen_enc.json"}},
        "CVDN": {"DIR": "CVDN", "SPLIT": {
            "train": "annotations/train.json",
            "val_unseen": "annotations/val_unseen.json"}},
        "REVERIE": {"DIR": "REVERIE", "bbox_file": "annotations/BBoxes.json",
                    "SPLIT": {
                        "train": "annotations/REVERIE_train.json",
                        "val_unseen": "annotations/REVERIE_val_unseen.json"}},
        "SOON": {"DIR": "SOON", "SPLIT": {
            "train": "annotations/train.jsonl",
            "val_unseen": "annotations/val_unseen.jsonl"}},
        "EQA": {"DIR": "EQA", "ANSWER_VOCAB": "annotations/answer_vocab.json",
                "SPLIT": {"train": "annotations/train.json",
                          "val_unseen": "annotations/val_unseen.json"}},
        "ScanQA": {"DIR": "ScanQA", "SPLIT": {
            "train": "annotations/train.json",
            "val_unseen": "annotations/val_unseen.json"}},
        "LLaVA": {"DIR": "LLaVA", "SPLIT": {
            "train": "annotations/train.json",
            "val_unseen": "annotations/val_unseen.json"}},
    })


@pytest.fixture()
def train_args(data_dir):
    from navillm_tpu.utils.config import TrainArgs
    return TrainArgs(data_dir=str(data_dir), batch_size=2, seed=0)
