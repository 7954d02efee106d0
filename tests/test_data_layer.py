"""Data/IO layer tests: PLY roundtrip, COLMAP binary parsers, dataset
loading, poses_bounds parsing, checkpoint roundtrip (SURVEY §2 C7/C12/C13)."""

import os
import struct

import numpy as np
import pytest

from gsplat_tpu.data.colmap import (
    colmap_pose_to_c2w,
    pinhole_intrinsics,
    qvec_wxyz_to_rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)
from gsplat_tpu.data.dataset import GaussianDataset
from gsplat_tpu.data.images import load_image, save_image
from gsplat_tpu.data.mipnerf import load_poses_bounds
from gsplat_tpu.data.pointcloud import (
    filter_outliers,
    load_point_cloud,
    read_ply,
    write_ply,
)


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.normal(0, 1, (100, 3)), rng.uniform(0, 1, (100, 3))], axis=-1
    ).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, binary=True)
    back = read_ply(path)
    np.testing.assert_allclose(back[:, :3], pts[:, :3], atol=1e-6)
    np.testing.assert_allclose(back[:, 3:], pts[:, 3:], atol=1 / 255.0)


def test_ply_roundtrip_ascii(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 2, (50, 3)).astype(np.float32)
    path = str(tmp_path / "cloud_ascii.ply")
    write_ply(path, pts, binary=False)
    back = read_ply(path)
    np.testing.assert_allclose(back, pts, rtol=1e-5)


def test_outlier_filter():
    pts = np.array(
        [[0, 0, 0], [1, 1, 1], [np.nan, 0, 0], [5000, 0, 0], [0.5, 0.2, 0.1]],
        np.float32,
    )
    out = filter_outliers(pts)
    assert out.shape[0] == 3  # NaN and ±1000-bound rows dropped


def test_load_point_cloud_npy(tmp_path):
    pts = np.random.default_rng(2).normal(0, 1, (64, 3)).astype(np.float32)
    path = str(tmp_path / "pc.npy")
    np.save(path, pts)
    out = load_point_cloud(path)
    assert out.shape[1] == 3 and out.shape[0] >= 60


def _write_colmap_model(d):
    """Synthesize a tiny COLMAP binary model (2 images, 1 camera, 3 points)."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    qvec = np.array([0.9238795, 0.0, 0.3826834, 0.0])  # 45 deg about y (wxyz)
    tvec = np.array([0.1, -0.2, 2.0])
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate([b"b.png", b"a.png"]):
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<I", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 2))  # 2 dummy observations
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", i * 1.0, 0.5, 2.0))
            f.write(struct.pack("<3B", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iI", 1, 0))
    return qvec, tvec


def test_colmap_binary_parsers(tmp_path):
    d = str(tmp_path / "sparse")
    qvec, tvec = _write_colmap_model(d)

    cams = read_cameras_binary(os.path.join(d, "cameras.bin"))
    assert cams[1]["model"] == "PINHOLE"
    fx, fy, cx, cy = pinhole_intrinsics(cams[1])
    assert (fx, fy, cx, cy) == (500.0, 510.0, 320.0, 240.0)

    imgs = read_images_binary(os.path.join(d, "images.bin"))
    assert len(imgs) == 2
    assert imgs[1]["name"] == "b.png"
    np.testing.assert_allclose(imgs[1]["qvec"], qvec)

    pts = read_points3d_binary(os.path.join(d, "points3D.bin"))
    assert pts.shape == (3, 6)
    np.testing.assert_allclose(pts[0, 3:], [1.0, 128 / 255.0, 0.0], atol=1e-6)


def test_colmap_pose_inversion():
    """c2w @ w2c must be identity; rotation orthonormal."""
    qvec = np.array([0.9238795, 0.1, 0.3826834, -0.05])
    tvec = np.array([0.3, -0.1, 1.5])
    R = qvec_wxyz_to_rotmat(qvec)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    c2w = colmap_pose_to_c2w(qvec, tvec)
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = tvec
    np.testing.assert_allclose(c2w @ w2c, np.eye(4), atol=1e-5)


def test_poses_bounds_parsing(tmp_path):
    """LLFF 3x5 layout: c2w columns remapped (down,right,back) -> the
    renderer's OpenCV z-forward (right,down,forward) convention."""
    n = 4
    rng = np.random.default_rng(3)
    pb = np.zeros((n, 17))
    for i in range(n):
        m = np.zeros((3, 5))
        m[:, 0] = [0, -1, 0]  # LLFF col0 = camera-down in world
        m[:, 1] = [1, 0, 0]  # LLFF col1 = camera-right in world
        m[:, 2] = [0, 0, 1]  # LLFF col2 = camera-back in world
        m[:, 3] = rng.normal(0, 1, 3)  # position
        m[:, 4] = [480, 640, 555.0]  # h, w, f
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [0.5, 10.0]
    path = str(tmp_path / "poses_bounds.npy")
    np.save(path, pb)
    out = load_poses_bounds(path)
    assert out["num_images"] == n
    c2w = out["c2w"][0]
    # right=(1,0,0), down=(0,-1,0), forward=(0,0,-1) after conversion
    np.testing.assert_allclose(c2w[:3, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 1], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(out["hwf"][0], [480, 640, 555.0])


def test_poses_bounds_camera_faces_scene(tmp_path):
    """Geometric round-trip: an LLFF camera at (0,0,-4) looking at the
    origin must put the origin IN FRONT (camera z > 0) and on the optical
    axis after conversion — the renderer culls with in_front = z > 0
    (ops/projection.py), so a wrong axis conversion makes every scene
    point cull away (ADVICE round-1 high finding)."""
    # Camera sits at -4 on world z, looks toward +z (at the origin).
    # OpenCV camera axes in world: right=(1,0,0), down=(0,-1,0),
    # forward=(0,0,1). LLFF stores (down, right, back):
    m = np.zeros((3, 5))
    m[:, 0] = [0, -1, 0]  # down
    m[:, 1] = [1, 0, 0]  # right
    m[:, 2] = [0, 0, -1]  # back = -forward
    m[:, 3] = [0, 0, -4.0]
    m[:, 4] = [480, 640, 555.0]
    pb = np.zeros((1, 17))
    pb[0, :15] = m.reshape(-1)
    pb[0, 15:] = [0.5, 10.0]
    path = str(tmp_path / "poses_bounds.npy")
    np.save(path, pb)
    c2w = load_poses_bounds(path)["c2w"][0]
    w2c = np.linalg.inv(c2w)
    origin_cam = (w2c @ np.array([0.0, 0.0, 0.0, 1.0]))[:3]
    assert origin_cam[2] > 0, f"scene center behind camera: {origin_cam}"
    np.testing.assert_allclose(origin_cam, [0, 0, 4.0], atol=1e-5)


def _make_dataset_dir(tmp_path, n_views=3, h=32, w=40):
    rng = np.random.default_rng(4)
    d = str(tmp_path / "scene")
    os.makedirs(os.path.join(d, "images"))
    for i in range(n_views):
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        save_image(os.path.join(d, "images", f"{i:03d}.png"), img)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    poses[:, 0, 3] = np.arange(n_views) * 0.1
    np.save(os.path.join(d, "poses.npy"), poses)
    np.save(
        os.path.join(d, "cam_meta.npy"),
        {"fx": 35.0, "fy": 36.0, "width": w, "height": h},
        allow_pickle=True,
    )
    pts = np.concatenate(
        [rng.normal(0, 1, (32, 3)) + [0, 0, 3], rng.uniform(0, 1, (32, 3))],
        axis=-1,
    ).astype(np.float32)
    write_ply(os.path.join(d, "pointcloud.ply"), pts)
    return d


def test_gaussian_dataset(tmp_path):
    d = _make_dataset_dir(tmp_path)
    ds = GaussianDataset(d, scale_factor=1.0)
    assert len(ds) == 3
    assert (ds.height, ds.width) == (32, 40)
    assert ds.cx == 20.0 and ds.cy == 16.0  # center default
    view = ds[1]
    assert view["image"].shape == (32, 40, 3)
    assert view["c2w"][0, 3] == np.float32(0.1)
    assert ds.pointcloud_path() is not None

    batch = next(ds.batches(batch_size=2, seed=0))
    assert batch["image"].shape == (2, 32, 40, 3)
    assert batch["c2w"].shape == (2, 4, 4)
    assert batch["fx"].shape == (2,)


def test_dataset_scale_factor(tmp_path):
    d = _make_dataset_dir(tmp_path, h=32, w=40)
    ds = GaussianDataset(d, scale_factor=0.5)
    assert (ds.height, ds.width) == (16, 20)
    assert ds.fx == 17.5  # intrinsics scale with resolution


def test_image_roundtrip(tmp_path):
    img = np.random.default_rng(5).uniform(0, 1, (16, 24, 3)).astype(np.float32)
    path = str(tmp_path / "img.png")
    save_image(path, img)
    back = load_image(path)
    assert back.shape == (16, 24, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255.0)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from gsplat_tpu import TrainConfig
    from gsplat_tpu.models import init_pool_from_points
    from gsplat_tpu.train import init_train_state
    from gsplat_tpu.train.trainer import (
        load_checkpoint,
        restore_pool,
        save_checkpoint,
    )

    rng = np.random.default_rng(6)
    pts = rng.normal(0, 1, (20, 3)).astype(np.float32)
    cfg = TrainConfig(capacity=64)
    state = init_train_state(init_pool_from_points(pts, capacity=64), cfg)
    state = state._replace(step=jnp.asarray(123, jnp.int32))

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)

    pool = restore_pool(path)
    assert int(pool.num_alive()) == 20
    np.testing.assert_array_equal(
        np.asarray(pool.params["pos"]), np.asarray(state.pool.params["pos"])
    )

    restored = load_checkpoint(path, init_train_state(pool, cfg))
    assert int(restored.step) == 123
    leaves_a = [np.asarray(x) for x in __import__("jax").tree.leaves(state.opt_state)]
    leaves_b = [np.asarray(x) for x in __import__("jax").tree.leaves(restored.opt_state)]
    assert all(np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b))


def test_checkpoint_roundtrip_orbax(tmp_path):
    import jax.numpy as jnp

    from gsplat_tpu import TrainConfig
    from gsplat_tpu.models import init_pool_from_points
    from gsplat_tpu.train import init_train_state
    from gsplat_tpu.train.trainer import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    pytest.importorskip("orbax.checkpoint")
    pts = np.random.default_rng(8).normal(0, 1, (16, 3)).astype(np.float32)
    cfg = TrainConfig(capacity=32)
    state = init_train_state(init_pool_from_points(pts, capacity=32), cfg)
    state = state._replace(step=jnp.asarray(9, jnp.int32))
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, state)
    restored = load_checkpoint_orbax(
        path, init_train_state(init_pool_from_points(pts, capacity=32), cfg)
    )
    assert int(restored.step) == 9
    np.testing.assert_array_equal(
        np.asarray(restored.pool.params["pos"]),
        np.asarray(state.pool.params["pos"]),
    )


def test_mismatched_view_rescaled_not_padded(tmp_path):
    """A view with a different native size must be RESCALED to the dataset
    shape (reference data_loader.py:241-249), never cropped or zero-padded
    (round-1 VERDICT Missing #2)."""
    d = str(tmp_path / "scene")
    os.makedirs(os.path.join(d, "images"))
    h, w = 24, 32
    # First view sets the standard shape; second is 2x in each dim and
    # uniformly bright — padding would leave zero rows, rescale keeps ~0.8.
    save_image(
        os.path.join(d, "images", "000.png"),
        np.full((h, w, 3), 0.5, np.float32),
    )
    save_image(
        os.path.join(d, "images", "001.png"),
        np.full((2 * h, 2 * w, 3), 0.8, np.float32),
    )
    np.save(
        os.path.join(d, "poses.npy"),
        np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
    )
    np.save(
        os.path.join(d, "cam_meta.npy"),
        {"fx": 30.0, "fy": 30.0, "width": w, "height": h},
        allow_pickle=True,
    )
    ds = GaussianDataset(d, scale_factor=1.0)
    img = ds[1]["image"]
    assert img.shape == (h, w, 3)
    # Every region keeps the source brightness (no zero padding anywhere).
    assert img.min() > 0.7
    np.testing.assert_allclose(img.mean(), 0.8, atol=0.02)


def test_render_cli_resolution_override_rescales_intrinsics():
    """--height/--width at render time must rescale fx/fy/cx/cy to keep the
    FOV (reference render_trained.py:195-203; round-1 VERDICT Missing #3)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "render_trained_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "render_trained.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    H, W, fx, fy, cx, cy = mod.apply_resolution_override(
        540, 960, 500.0, 500.0, 480.0, 270.0, height=1080, width=1920
    )
    assert (H, W) == (1080, 1920)
    np.testing.assert_allclose([fx, fy], [1000.0, 1000.0])
    np.testing.assert_allclose([cx, cy], [960.0, 540.0])

    # No override -> unchanged.
    out = mod.apply_resolution_override(540, 960, 500.0, 500.0, 480.0, 270.0)
    assert out == (540, 960, 500.0, 500.0, 480.0, 270.0)


def test_device_batches_matches_host_batches(tmp_path):
    """device_batches must yield the same batch content as batches() for
    the same seed, with device-resident images."""
    d = _make_dataset_dir(tmp_path)
    ds = GaussianDataset(d, scale_factor=1.0)
    host = ds.batches(batch_size=2, seed=7)
    dev = ds.device_batches(batch_size=2, seed=7)
    for _ in range(3):
        a = next(host)
        b = next(dev)
        np.testing.assert_allclose(np.asarray(b["image"]), a["image"],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(b["c2w"]), a["c2w"])
        np.testing.assert_allclose(np.asarray(b["fx"]), a["fx"])
    assert ds.size_bytes() == len(ds) * ds.height * ds.width * 12


def test_device_batches_quantized(tmp_path):
    """The uint8 cache tier is an exact roundtrip for unrescaled 8-bit
    sources and reports 1/4 the footprint."""
    d = _make_dataset_dir(tmp_path)
    ds = GaussianDataset(d, scale_factor=1.0)
    host = ds.batches(batch_size=2, seed=7)
    dev = ds.device_batches(batch_size=2, seed=7, quantize=True)
    for _ in range(3):
        a = next(host)
        b = next(dev)
        img = np.asarray(b["image"])
        assert img.dtype == np.float32
        # Sources are 8-bit PNGs and scale_factor=1: u8 roundtrip is exact
        # up to the /255 float rounding.
        np.testing.assert_allclose(img, a["image"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(b["c2w"]), a["c2w"])
    assert ds.size_bytes(1) * 4 == ds.size_bytes()


def test_holdout_split(tmp_path):
    """llffhold protocol: every Nth view goes to the test split; train and
    test partition the dataset with consistent poses."""
    d = _make_dataset_dir(tmp_path, n_views=9)
    full = GaussianDataset(d, scale_factor=1.0)
    train = GaussianDataset(d, scale_factor=1.0, holdout_every=3,
                            split="train")
    test = GaussianDataset(d, scale_factor=1.0, holdout_every=3,
                           split="test")
    assert len(test) == 3 and len(train) == 6
    assert len(train) + len(test) == len(full)
    # Views 0, 3, 6 held out; poses must follow their images.
    np.testing.assert_allclose(test.c2w[1], full.c2w[3])
    np.testing.assert_allclose(train.c2w[0], full.c2w[1])
    with pytest.raises(ValueError):
        GaussianDataset(d, split="train")  # needs holdout_every


def test_gsply_roundtrip_and_render_equality(tmp_path):
    """Standard-3DGS PLY export -> import must be lossless (modulo quat
    normalization) and render identically."""
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig, render_from_params
    from gsplat_tpu.data.gsply import export_gaussians_ply, import_gaussians_ply

    rng = np.random.default_rng(9)
    n = 120
    params = {
        "pos": np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                         rng.uniform(3, 5, n)], -1).astype(np.float32),
        "scale_raw": (rng.normal(0, 0.2, (n, 3)) - 2.0).astype(np.float32),
        "q_raw": (rng.normal(0, 1, (n, 4)) + [0, 0, 0, 2.0]).astype(
            np.float32
        ),
        "opacity_raw": rng.normal(1.0, 0.5, n).astype(np.float32),
        "f_dc": rng.normal(0, 0.8, (n, 3)).astype(np.float32),
        "f_rest": rng.normal(0, 0.05, (n, 45)).astype(np.float32),
    }
    alive = np.ones(n, bool)
    alive[::7] = False
    path = str(tmp_path / "scene.ply")
    written = export_gaussians_ply(path, params, alive=alive)
    assert written == int(alive.sum())

    back = import_gaussians_ply(path)
    assert back["pos"].shape == (written, 3)
    np.testing.assert_allclose(back["pos"], params["pos"][alive], atol=1e-7)
    np.testing.assert_allclose(back["f_rest"], params["f_rest"][alive],
                               atol=1e-7)
    np.testing.assert_allclose(back["opacity_raw"],
                               params["opacity_raw"][alive], atol=1e-7)

    cfg = RenderConfig(height=64, width=64, max_pairs=2048, max_per_tile=128,
                       backend="xla")
    c2w = jnp.eye(4)
    img_a, _ = render_from_params(
        {k: jnp.asarray(v) for k, v in params.items()}, c2w,
        60.0, 60.0, 32.0, 32.0, cfg, alive=jnp.asarray(alive),
    )
    img_b, _ = render_from_params(
        {k: jnp.asarray(v) for k, v in back.items()}, c2w,
        60.0, 60.0, 32.0, 32.0, cfg,
    )
    # Quaternion normalization at export is a no-op for rendering (the
    # covariance build normalizes too).
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_a),
                               atol=1e-5)

    # External-color export keeps the DC color to first order.
    path2 = str(tmp_path / "scene_ext.ply")
    export_gaussians_ply(path2, params, alive=alive, convert_colors=True)
    ext = import_gaussians_ply(path2)
    from gsplat_tpu.data.gsply import SH_C0
    ours = 1.0 / (1.0 + np.exp(-params["f_dc"][alive] * SH_C0))
    theirs = 0.5 + ext["f_dc"] * SH_C0
    np.testing.assert_allclose(theirs, ours, atol=1e-5)


def test_prefetched_batches_match_and_propagate_errors(tmp_path):
    from gsplat_tpu.data.dataset import prefetch

    d = _make_dataset_dir(tmp_path)
    ds = GaussianDataset(d, scale_factor=1.0)
    plain = ds.batches(2, seed=3)
    pre = ds.prefetched_batches(2, seed=3)
    for _ in range(4):
        a, b = next(plain), next(pre)
        np.testing.assert_allclose(b["image"], a["image"])
        np.testing.assert_allclose(b["c2w"], a["c2w"])

    def boom():
        yield {"x": 1}
        raise RuntimeError("decode failed")

    it = prefetch(boom())
    assert next(it) == {"x": 1}
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_worker_stops_when_consumer_abandons():
    """Abandoning a prefetch generator must stop the worker thread
    (round-3 'Fatal Python error: Aborted': daemon threads parked in
    queue.put outliving their consumers piled up across tests and tripped
    CPython's shutdown abort — NEXT.md §27)."""
    import threading
    import time

    from gsplat_tpu.data.dataset import prefetch

    done = threading.Event()

    def endless():
        try:
            i = 0
            while True:
                yield i
                i += 1
        finally:
            done.set()

    it = prefetch(endless(), depth=1)
    assert next(it) == 0
    it.close()  # fit()-style abandonment (close/GC)
    # The worker must give up its queue.put within the stop-poll interval.
    deadline = time.monotonic() + 5.0
    while not done.is_set() and time.monotonic() < deadline:
        time.sleep(0.02)
    assert done.is_set(), "prefetch worker still parked after consumer close"


def test_splat_export_format(tmp_path):
    """.splat export (antimatter15 web-viewer format): 32 bytes/gaussian,
    f32 position + LINEAR scale, u8 RGBA (sigmoid transfer) and u8 quat
    (w,x,y,z)*128+128, sorted by size x opacity descending."""
    from gsplat_tpu.data.gsply import export_gaussians_splat

    rng = np.random.default_rng(11)
    n = 40
    params = {
        "pos": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "scale_raw": (rng.normal(0, 0.2, (n, 3)) - 2.0).astype(np.float32),
        "q_raw": (rng.normal(0, 1, (n, 4)) + [0, 0, 0, 2.0]).astype(
            np.float32
        ),
        "opacity_raw": rng.normal(1.0, 0.5, n).astype(np.float32),
        "f_dc": rng.normal(0, 0.8, (n, 3)).astype(np.float32),
        "f_rest": rng.normal(0, 0.05, (n, 45)).astype(np.float32),
    }
    alive = np.ones(n, bool)
    alive[::5] = False
    path = str(tmp_path / "scene.splat")
    written = export_gaussians_splat(path, params, alive=alive)
    assert written == int(alive.sum())

    raw = np.fromfile(path, np.uint8).reshape(written, 32)
    pos = raw[:, 0:12].copy().view("<f4").reshape(written, 3)
    scale = raw[:, 12:24].copy().view("<f4").reshape(written, 3)
    rgba = raw[:, 24:28]
    rot = raw[:, 28:32].astype(np.float32)

    kept = params["pos"][alive]
    # Every exported position is one of the alive inputs.
    for p in pos:
        assert np.min(np.linalg.norm(kept - p, axis=1)) < 1e-6
    assert np.all(scale > 0)  # linear scales
    # Sorted by size x opacity descending.
    sig = rgba[:, 3].astype(np.float32) / 255.0
    importance = scale.prod(axis=1) * sig
    assert np.all(np.diff(importance) <= 1e-6 + importance[:-1] * 1e-3)
    # Quats decode to ~unit norm.
    q = (rot - 128.0) / 128.0
    norms = np.linalg.norm(q, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.05)


def test_photo_plane_warp_geometry():
    """warp_photo_view: ray-plane sampling hits the right texels (pure
    numpy oracle for the real-photo training pipeline's GT generator)."""
    from gsplat_tpu.data.photo_plane import warp_photo_view

    # Distinctive synthetic "photo": coordinate gradient + a marker.
    ht, wt = 64, 96
    photo = np.zeros((ht, wt, 3), np.float32)
    photo[..., 0] = np.linspace(0, 1, wt)[None, :]
    photo[..., 1] = np.linspace(0, 1, ht)[:, None]
    H, W, f = 50, 70, 80.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    # Camera at origin looking down +z at the plane: center pixel must
    # sample the photo center (gradient value 0.5, 0.5).
    c2w = np.eye(4, dtype=np.float32)
    img = warp_photo_view(photo, c2w, f, f, cx, cy, H, W,
                          plane_z=4.0, half_h=1.0)
    center = img[H // 2, W // 2]
    np.testing.assert_allclose(center[0], 0.5, atol=0.02)
    np.testing.assert_allclose(center[1], 0.5, atol=0.02)

    # Red gradient increases left -> right, green top -> bottom (sample
    # inside the plane's footprint — the far edges fall off the plane).
    assert img[H // 2, W // 2 + W // 4, 0] > img[H // 2, W // 4, 0]
    assert img[H // 2 + H // 4, W // 2, 1] > img[H // 4, W // 2, 1]

    # Shifting the camera +x shifts plane content LEFT in the image.
    c2w2 = np.eye(4, dtype=np.float32)
    c2w2[0, 3] = 0.5
    img2 = warp_photo_view(photo, c2w2, f, f, cx, cy, H, W,
                           plane_z=4.0, half_h=1.0)
    assert img2[H // 2, W // 2, 0] > img[H // 2, W // 2, 0]

    # Rays missing the plane give the background.
    c2w3 = np.eye(4, dtype=np.float32)
    c2w3[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    img3 = warp_photo_view(photo, c2w3, f, f, cx, cy, H, W,
                           plane_z=4.0, half_h=1.0, background=0.25)
    np.testing.assert_allclose(img3, 0.25, atol=1e-6)


def test_photo_multiplane_occlusion_and_parallax():
    """warp_multiplane_view: the nearest plane must win (occlusion), and a
    lateral camera move must shift front content more than back content
    (parallax) — the two properties the single-plane oracle lacks."""
    from gsplat_tpu.data.photo_plane import warp_multiplane_view

    front = np.full((32, 32, 3), [1.0, 0.0, 0.0], np.float32)
    back = np.full((32, 32, 3), [0.0, 1.0, 0.0], np.float32)
    planes = [
        {"z": 3.0, "ox": 0.0, "oy": 0.0, "half_h": 0.3},
        {"z": 5.0, "ox": 0.0, "oy": 0.0, "half_h": 2.0},
    ]
    H, W, f = 48, 64, 60.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    c2w = np.eye(4, dtype=np.float32)
    img = warp_multiplane_view([front, back], planes, c2w, f, f, cx, cy,
                               H, W)
    # Center: front (red) plane occludes the back (green).
    np.testing.assert_allclose(img[H // 2, W // 2], [1, 0, 0], atol=1e-6)
    # Periphery: back plane visible around the small front plane. Pixel
    # (v=4, u=10): at z=3 the ray is ~1.1 world units off-axis (outside the
    # 0.3-half-extent front plane) but at z=5 only ~1.8 (inside the
    # 2.0-half-extent back plane). (The image corner misses BOTH planes —
    # the back plane's x-extent ends ~2.4 units before the corner ray.)
    np.testing.assert_allclose(img[4, 10], [0, 1, 0], atol=1e-6)
    # Order of the plane list must not matter (depth sorts, not order).
    img_r = warp_multiplane_view([back, front], planes[::-1], c2w, f, f,
                                 cx, cy, H, W)
    np.testing.assert_allclose(img, img_r, atol=1e-6)

    # Parallax: the front plane's left EDGE column moves more px than the
    # back texture under a +x camera shift.
    def edge_col(im):
        red = (im[H // 2, :, 0] > 0.5).nonzero()[0]
        return red[0] if len(red) else -1

    c2w2 = np.eye(4, dtype=np.float32)
    c2w2[0, 3] = 0.15
    img2 = warp_multiplane_view([front, back], planes, c2w2, f, f, cx, cy,
                                H, W)
    shift_front = edge_col(img) - edge_col(img2)
    assert shift_front >= 2, f"front plane barely moved: {shift_front}px"


def test_photo_multiplane_scene_dir_trains(tmp_path):
    """make_photo_multiplane_scene writes a prepared dir the standard
    dataset/trainer stack consumes (tiny smoke: a few fit() iterations)."""
    from gsplat_tpu import RenderConfig, TrainConfig
    from gsplat_tpu.data import GaussianDataset
    from gsplat_tpu.data.photo_plane import make_photo_multiplane_scene
    from gsplat_tpu.train.fit import fit

    rng = np.random.default_rng(0)
    photo = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    out = str(tmp_path / "mp")
    meta = make_photo_multiplane_scene(
        out, photo=photo, n_planes=3, n_views=6, height=48, width=64,
        n_init_points=256,
    )
    assert meta["n_planes"] == 3 and meta["n_points"] > 100
    ds = GaussianDataset(out, scale_factor=1.0, holdout_every=3,
                         split="train")
    cfg = RenderConfig(height=48, width=64, max_pairs=2**13,
                       max_per_tile=256)
    tcfg = TrainConfig(iterations=6, capacity=1024, batch_size=1,
                       densification_interval=10**9,
                       opacity_reset_interval=10**9,
                       checkpoint_interval=10**9)
    state, report = fit(ds, cfg, tcfg, output_dir=str(tmp_path / "o"),
                        log_fn=lambda s: None)
    assert np.isfinite(report.final_loss)
