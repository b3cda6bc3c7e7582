"""Offline extraction pipeline: images dir -> JAX ViT -> HDF5 -> feature DB."""
import numpy as np
import pytest

pytest.importorskip("PIL")
pytest.importorskip("h5py")

import jax

from navillm_tpu.data.feature_db import ImageFeaturesDB
from navillm_tpu.vision.extract import (DirectoryImageSource,
                                        FeatureExtractor,
                                        list_scan_viewpoints,
                                        preprocess_image)
from navillm_tpu.vision.vit import ViTConfig, init_vit_params


def _write_views(root, scan, vp, n=4, size=32):
    from PIL import Image
    d = root / scan
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(hash((scan, vp)) % 2**31)
    for ix in range(n):
        arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{vp}_{ix}.png")


def test_preprocess_shapes():
    from PIL import Image
    img = Image.fromarray(np.zeros((60, 80, 3), np.uint8))
    out = preprocess_image(img, 28)
    assert out.shape == (28, 28, 3)
    assert np.isfinite(out).all()


def test_extract_to_hdf5_roundtrip(tmp_path):
    cfg = ViTConfig.tiny()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    imgroot = tmp_path / "views"
    scanvps = [("scanA", "vp0"), ("scanA", "vp1"), ("scanB", "vp0")]
    for scan, vp in scanvps:
        _write_views(imgroot, scan, vp)

    out = tmp_path / "features.hdf5"
    fe = FeatureExtractor(params, cfg, batch_size=3)
    fe.extract_to_hdf5(out, DirectoryImageSource(imgroot), scanvps,
                       num_views=4, progress=False)

    db = ImageFeaturesDB(str(out), image_feat_size=cfg.width)
    ft = db.get_image_feature("scanA", "vp0")
    assert ft.shape == (4, cfg.width)
    assert np.isfinite(ft).all()
    # deterministic: same viewpoint re-extracted == stored
    src = DirectoryImageSource(imgroot)
    again = fe.encode_images(src.views("scanA", "vp0", 4))
    np.testing.assert_allclose(ft, again, rtol=1e-4, atol=1e-5)


def test_list_scan_viewpoints(world_dir):
    pairs = list_scan_viewpoints(world_dir)
    scans = {s for s, _ in pairs}
    assert scans == {"scan0", "scan1"}
    assert len(pairs) == 16 + 15
