"""Dataset prep integration: synthetic Mip-NeRF 360 / COLMAP scene dirs ->
prepare -> GaussianDataset loads the result (SURVEY §2 C12/C13 end-to-end)."""

import os
import struct

import numpy as np

from gsplat_tpu.data.colmap import convert_colmap_to_training_format
from gsplat_tpu.data.dataset import GaussianDataset
from gsplat_tpu.data.images import save_image
from gsplat_tpu.data.mipnerf import prepare_mipnerf360_dataset
from gsplat_tpu.data.pointcloud import read_ply

from test_data_layer import _write_colmap_model


def _write_points3d_bin(path, n=20):
    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *rng.normal(0, 1, 3)))
            f.write(struct.pack("<3B", 200, 100, 50))
            f.write(struct.pack("<d", 0.3))
            f.write(struct.pack("<Q", 0))


def _make_mipnerf_scene(tmp_path, n_views=3, h=24, w=32):
    rng = np.random.default_rng(1)
    d = str(tmp_path / "garden_raw")
    os.makedirs(os.path.join(d, "images"))
    for i in range(n_views):
        save_image(
            os.path.join(d, "images", f"IMG_{i:04d}.png"),
            rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
        )
    pb = np.zeros((n_views, 17))
    for i in range(n_views):
        m = np.zeros((3, 5))
        m[:, 0] = [0, -1, 0]
        m[:, 1] = [1, 0, 0]
        m[:, 2] = [0, 0, 1]
        m[:, 3] = rng.normal(0, 0.5, 3)
        m[:, 4] = [h, w, 30.0]
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [0.5, 8.0]
    np.save(os.path.join(d, "poses_bounds.npy"), pb)
    os.makedirs(os.path.join(d, "sparse", "0"))
    _write_points3d_bin(os.path.join(d, "sparse", "0", "points3D.bin"))
    return d


def test_mipnerf_prep_to_dataset(tmp_path):
    raw = _make_mipnerf_scene(tmp_path)
    out = str(tmp_path / "garden")
    info = prepare_mipnerf360_dataset(raw, out, image_downsample=1)
    assert info["num_images"] == 3
    assert info["num_points"] == 20

    ds = GaussianDataset(out, scale_factor=1.0)
    assert len(ds) == 3
    assert (ds.height, ds.width) == (24, 32)
    assert abs(ds.fx - 30.0) < 1e-6
    v = ds[0]
    assert v["image"].shape == (24, 32, 3)
    assert v["c2w"].shape == (4, 4)
    pts = read_ply(ds.pointcloud_path())
    assert pts.shape == (20, 6)
    # points3D colors survived (200/255 etc.)
    np.testing.assert_allclose(
        pts[0, 3:], [200 / 255, 100 / 255, 50 / 255], atol=2 / 255
    )


def test_colmap_convert_to_dataset(tmp_path):
    sparse = str(tmp_path / "sparse0")
    _write_colmap_model(sparse)
    img_dir = str(tmp_path / "photos")
    os.makedirs(img_dir)
    rng = np.random.default_rng(2)
    for name in ("a.png", "b.png"):
        save_image(
            os.path.join(img_dir, name),
            rng.uniform(0, 1, (48, 64, 3)).astype(np.float32),
        )

    out = str(tmp_path / "scene")
    info = convert_colmap_to_training_format(sparse, img_dir, out)
    assert info["num_images"] == 2
    assert info["num_points"] == 3
    assert info["image_names"] == ["a.png", "b.png"]

    ds = GaussianDataset(out, scale_factor=1.0)
    assert len(ds) == 2
    assert abs(ds.fx - 500.0) < 1e-6
    assert abs(ds.cy - 240.0) < 1e-6
    # Poses are proper rigid transforms.
    R = ds.c2w[0][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
