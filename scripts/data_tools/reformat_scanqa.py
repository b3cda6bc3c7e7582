"""Reformat ScanQA annotations: group questions per scene with frame
pose metadata (reference scripts/data_tools/reformat_scanqa.py:6-60).
"""
import argparse
import json
import os
import sys
from pathlib import Path


def get_image_metainfo(scene_id, image_dir):
    path = os.path.join(image_dir, scene_id)
    if not os.path.exists(path):
        raise ValueError(f"{scene_id} cannot be None!")

    def load_txt(filename):
        pose = []
        with open(filename) as f:
            for line in f:
                pose.append([float(s) for s in line.strip("\n").split(" ")])
        return pose

    image_info = []
    for filename in sorted(os.listdir(os.path.join(path, "color"))):
        stem = filename.split(".")[0]
        pose_file = os.path.join(path, "pose", stem + ".txt")
        if not os.path.exists(pose_file):
            raise ValueError(f"{pose_file} not exist.")
        image_info.append({"image_id": stem, "pose": load_txt(pose_file)})
    return image_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_dir", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    args = ap.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    for filename in ["ScanQA_v1.0_train.json", "ScanQA_v1.0_val.json",
                     "ScanQA_v1.0_test_w_obj.json",
                     "ScanQA_v1.0_test_wo_obj.json"]:
        src = os.path.join(args.json_dir, filename)
        if not os.path.exists(src):
            continue
        with open(src) as f:
            data = json.load(f)
        new_data, skipped = {}, 0
        for item in data:
            scene_id = item["scene_id"]
            if scene_id not in new_data:
                try:
                    image_info = get_image_metainfo(scene_id, args.image_dir)
                except ValueError:
                    skipped += 1
                    continue
                new_data[scene_id] = {"scene_id": scene_id,
                                      "image_info": image_info,
                                      "annotation": []}
            new_data[scene_id]["annotation"].append({
                "question_id": item.get("question_id"),
                "question": item["question"],
                "answers": item.get("answers", []),
            })
        out = os.path.join(
            args.output_dir, filename.replace(".json", "_reformat.json"))
        with open(out, "w") as f:
            json.dump(list(new_data.values()), f)
        print(f"{filename}: {len(new_data)} scenes, {skipped} skipped")


if __name__ == "__main__":
    main()
