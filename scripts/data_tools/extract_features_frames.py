"""Extract per-frame features (ScanQA scenes / COCO images) with the JAX
ViT — replacement for extract_features_scanqa.py / extract_features_coco.py.

Layout: --image_dir holds <scene_id>/color/<frame>.jpg (ScanQA) or flat
<image_id>.jpg (COCO, --flat). HDF5 keys: "<scene>_<frame>" or "<image_id>".
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output_file", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--flat", action="store_true",
                    help="flat image dir (COCO) instead of scene/color/*")
    args = ap.parse_args()

    import h5py
    import jax
    import numpy as np
    from PIL import Image
    from navillm_tpu.vision.vit import (ViTConfig, convert_eva02_clip,
                                        init_vit_params)
    from navillm_tpu.vision.extract import FeatureExtractor

    cfg = ViTConfig.eva02_clip_l_14_336()
    if args.checkpoint:
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()}
        params = convert_eva02_clip(sd, cfg)
    else:
        print("WARNING: no --checkpoint, using random ViT weights")
        params = init_vit_params(jax.random.PRNGKey(0), cfg)

    fe = FeatureExtractor(params, cfg, args.batch_size)
    root = Path(args.image_dir)
    with h5py.File(args.output_file, "w") as f:
        if args.flat:
            items = [(p.stem, [p]) for p in sorted(root.glob("*.jpg"))]
        else:
            items = [(d.name, sorted((d / "color").glob("*.jpg")))
                     for d in sorted(root.iterdir()) if d.is_dir()]
        for key, paths in items:
            imgs = [Image.open(p) for p in paths]
            fts = fe.encode_images(imgs)
            if args.flat:
                f.create_dataset(key, data=fts[0], compression="gzip")
            else:
                for p, ft in zip(paths, fts):
                    f.create_dataset(f"{key}_{p.stem}",
                                     data=ft.astype(np.float32),
                                     compression="gzip")
            print(key, flush=True)


if __name__ == "__main__":
    main()
