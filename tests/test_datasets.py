import numpy as np
import pytest

from navillm_tpu.data.datasets import load_dataset
from navillm_tpu.data.feature_db import (SyntheticImageFeaturesDB,
                                         synthetic_object_db)
from navillm_tpu.sim import WorldModel


@pytest.fixture(scope="module")
def shared_world(data_dir):
    return WorldModel(str(data_dir / "connectivity"))


def _feat_db():
    return SyntheticImageFeaturesDB(image_feat_size=32)


def test_r2r_load_and_obs(train_args, task_config, shared_world):
    ds = load_dataset("r2r", train_args, task_config, training=False,
                      source="R2R", world=shared_world)
    ds.init_feat_db(_feat_db())
    assert len(ds) == 4  # 2 paths x 2 instructions
    sample = ds[0]
    ob = sample["observations"]
    assert ob["feature"].shape == (36, 32 + 4)
    assert ob["gt_path"][0] == ob["viewpoint"]
    assert len(ob["candidate"]) >= 2
    c = ob["candidate"][0]
    assert {"heading", "elevation", "pointId", "viewpointId", "feature",
            "position", "idx"} <= set(c)
    assert c["feature"].shape == (36,)


def test_r2r_eval_perfect_and_failed(train_args, task_config, shared_world):
    ds = load_dataset("r2r", train_args, task_config, training=False,
                      source="R2R", world=shared_world)
    gt = ds.gt_trajs["r2r_0_0"][1]
    preds = [
        {"instr_id": "r2r_0_0", "trajectory": [[vp] for vp in gt]},
        {"instr_id": "r2r_1_0", "trajectory": [[ds.gt_trajs["r2r_1_0"][1][0]]]},
    ]
    avg, metrics = ds.eval_metrics(preds, None, "R2R")
    assert avg["sr"] == 50.0
    assert metrics["success"] == [1.0, 0.0]
    # perfect path has spl == 1
    assert abs(metrics["spl"][0] - 1.0) < 1e-9


def test_cvdn_instruction_and_gp(train_args, task_config, shared_world):
    ds = load_dataset("cvdn", train_args, task_config, training=False,
                      source="CVDN", world=shared_world)
    ds.init_feat_db(_feat_db())
    item = ds.alldata[0]
    assert item["instruction"].startswith("The goal room contains a sofa.")
    assert "Question: where should I go." in item["instruction"]
    assert "Answer: head to the kitchen." in item["instruction"]
    # gp for walking exactly the planner path: start->end dist 4, end->end 0
    preds = [{"instr_id": item["instr_id"],
              "trajectory": [[vp] for vp in item["path"]]}]
    avg, _ = ds.eval_metrics(preds, None, "CVDN")
    assert avg["dist_to_end_reduction"] == pytest.approx(4.0)
    assert avg["sr"] == 100.0

    # item getter applies start_pano heading
    s = ds[0]
    assert s["observations"]["heading"] >= 0


def test_reverie_success_semantics(train_args, task_config, shared_world):
    ds = load_dataset("reverie", train_args, task_config, training=False,
                      source="REVERIE", world=shared_world)
    ds.init_feat_db(_feat_db(), synthetic_object_db("reverie"))
    instr_id = ds.alldata[0]["instr_id"]
    gt_path = ds.alldata[0]["path"]
    # ending at a vp that sees the object (vp_1_1) => success
    preds = [{"instr_id": instr_id, "trajectory": [[vp] for vp in gt_path],
              "pred_objid": "42"}]
    avg, _ = ds.eval_metrics(preds, None, "REVERIE")
    assert avg["sr"] == 100.0 and avg["rgs"] == 100.0
    # ending elsewhere => failure even if close
    preds = [{"instr_id": instr_id,
              "trajectory": [[gt_path[0]], [gt_path[1]]],
              "pred_objid": "7"}]
    avg, _ = ds.eval_metrics(preds, None, "REVERIE")
    assert avg["sr"] == 0.0 and avg["rgs"] == 0.0
    # object info flows into obs
    ob = ds[0]["observations"]
    assert ob["obj_img_fts"].shape[1] == 16


def test_soon_det_success(train_args, task_config, shared_world):
    ds = load_dataset("soon", train_args, task_config, training=False,
                      source="SOON", world=shared_world)
    ds.init_feat_db(_feat_db(), synthetic_object_db("soon"))
    instr_id = ds.alldata[0]["instr_id"]
    gt = ds.gt_trajs[instr_id]
    bb = gt["bboxes"]["vp_0_2"]
    inside = (bb["heading"], bb["elevation"])
    preds = [{"instr_id": instr_id,
              "trajectory": [[vp] for vp in gt["path"]],
              "pred_obj_direction": inside}]
    avg, _ = ds.eval_metrics(preds, None, "SOON")
    assert avg["sr"] == 100.0
    assert avg["det_sr"] == 100.0
    preds[0]["pred_obj_direction"] = (bb["heading"] + 0.5, bb["elevation"])
    avg, _ = ds.eval_metrics(preds, None, "SOON")
    assert avg["det_sr"] == 0.0


def test_soon_training_resample(train_args, task_config, shared_world):
    ds = load_dataset("soon", train_args, task_config, training=True,
                      source="SOON", world=shared_world)
    ds.init_feat_db(_feat_db(), synthetic_object_db("soon"))
    s = ds[0]
    assert s["item"]["path"][0] == "vp_0_0"
    assert s["item"]["path"][-1] in s["item"]["end_image_ids"]


def test_eqa_obs_and_eval(train_args, task_config, shared_world):
    ds = load_dataset("eqa", train_args, task_config, training=False,
                      source="EQA", world=shared_world)
    ds.init_feat_db(_feat_db())
    ob = ds[0]["observations"]
    assert ob["instruction"] == "what color is the sofa"
    assert ob["answer"] == "red"
    assert ds.answer_vocab == ["red", "blue", "green"]
    instr_id = ds.alldata[0]["instr_id"]
    gt_path = ds.alldata[0]["path"]
    preds = [{"instr_id": instr_id, "trajectory": [[vp] for vp in gt_path],
              "pred_answer": "red", "oracle_pred_answer": "blue",
              "gt_answer": "red"}]
    avg, _ = ds.eval_metrics(preds, None, "EQA")
    assert avg["exact_match"] == 100.0
    assert avg["oracle_exact_match"] == 0.0


def test_scanqa_and_llava(train_args, task_config):
    ds = load_dataset("scanqa", train_args, task_config, training=False,
                      source="ScanQA")
    ds.init_feat_db(SyntheticImageFeaturesDB(image_feat_size=32, num_views=1))
    s = ds[0]
    assert s["features"].shape[1:] == (1, 32) or s["features"].ndim == 3
    preds = [{"question_id": "q0", "generated_sentences": ["two"]}]
    avg, _ = ds.eval_metrics(preds, None, "ScanQA")
    assert avg["exact_match"] == 100.0
    assert avg["rouge"] == 100.0

    lds = load_dataset("llava", train_args, task_config, training=True,
                       source="LLaVA")
    lds.init_feat_db(SyntheticImageFeaturesDB(image_feat_size=32, num_views=1))
    item = lds[0]
    assert item["question"] == "describe the image"
    assert item["answers"] == ["a scenic view of mountains"]


def test_collate_identity(train_args, task_config, shared_world):
    ds = load_dataset("r2r", train_args, task_config, training=False,
                      source="R2R", world=shared_world)
    ds.init_feat_db(_feat_db())
    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch["batch_size"] == 2
    assert len(batch["observations"]) == 2
