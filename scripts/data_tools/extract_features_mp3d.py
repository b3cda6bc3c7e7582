"""Extract 36-view MP3D features with the JAX ViT (TPU).

TPU-native replacement for the reference's Ray+torch extractor
(reference scripts/data_tools/extract_features_mp3d.py). Images come
from MatterSim rendering (if importable) or a pre-rendered directory.

  python scripts/data_tools/extract_features_mp3d.py \
      --connectivity_dir data/connectivity \
      --image_dir data/rendered_views \
      --checkpoint data/models/EVA02-CLIP-L-14-336.pt \
      --output_file data/eva_features/mp3d_EVA02-CLIP-L-14-336.hdf5
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--connectivity_dir", required=True)
    ap.add_argument("--scan_dir", default=None,
                    help="MP3D scans for MatterSim rendering")
    ap.add_argument("--image_dir", default=None,
                    help="pre-rendered views <scan>/<vp>_<ix>.jpg")
    ap.add_argument("--checkpoint", default=None,
                    help="EVA-CLIP state dict (torch .pt); random init if absent")
    ap.add_argument("--output_file", required=True)
    ap.add_argument("--batch_size", type=int, default=36)
    ap.add_argument("--scans", nargs="*", default=None)
    ap.add_argument("--workers", type=int, default=0,
                    help="decode worker processes (0 = serial in-process;"
                         " N>0 spawns N workers + a single HDF5 writer"
                         " thread, the reference's Ray-pool equivalent)")
    args = ap.parse_args()

    import jax
    from navillm_tpu.vision.vit import (ViTConfig, convert_eva02_clip,
                                        init_vit_params)
    from navillm_tpu.vision.extract import (DirectoryImageSource,
                                            FeatureExtractor,
                                            MatterSimImageSource,
                                            list_scan_viewpoints)

    cfg = ViTConfig.eva02_clip_l_14_336()
    if args.checkpoint:
        import torch
        sd = torch.load(args.checkpoint, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()}
        params = convert_eva02_clip(sd, cfg)
    else:
        print("WARNING: no --checkpoint, using random ViT weights")
        params = init_vit_params(jax.random.PRNGKey(0), cfg)

    import functools
    if args.image_dir:
        source = DirectoryImageSource(args.image_dir)
        factory = functools.partial(DirectoryImageSource, args.image_dir)
    else:
        source = None
        # per-worker simulator, like the reference's per-actor
        # build_simulator (extract_features_mp3d.py:36-50)
        factory = functools.partial(MatterSimImageSource,
                                    args.connectivity_dir, args.scan_dir)

    scanvps = list_scan_viewpoints(args.connectivity_dir, args.scans)
    print(f"extracting {len(scanvps)} viewpoints -> {args.output_file}")
    if args.workers > 0:
        from navillm_tpu.vision.extract import ParallelFeatureExtractor
        pe = ParallelFeatureExtractor(params, cfg, args.batch_size,
                                      num_workers=args.workers)
        ips = pe.extract_to_hdf5(args.output_file, factory, scanvps)
        print(f"throughput: {ips:.1f} images/sec "
              f"(~{len(scanvps) * 36 / max(ips, 1e-9) / 3600:.1f} h for "
              f"this viewpoint set)")
    else:
        FeatureExtractor(params, cfg, args.batch_size).extract_to_hdf5(
            args.output_file, source or factory(), scanvps)


if __name__ == "__main__":
    main()
