"""Viewer / evaluation / utils coverage: orbits, look-at geometry, PSNR,
metrics logging, camera helpers vs the reference."""

import io
import os

import numpy as np
import pytest

from gsplat_tpu.evaluation import psnr
from gsplat_tpu.utils import MetricsLogger, benchmark_fn
from gsplat_tpu.viewer import (
    colorize_depth,
    create_orbit_trajectory,
    estimate_scene_center_radius,
    look_at,
)


def test_look_at_geometry():
    c2w = look_at(np.array([0.0, 0.0, -5.0]), np.zeros(3))
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # Forward column (z) points from camera to target.
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, 1], atol=1e-6)
    # Reference convention: camera y = -up (render_trained.py:69).
    np.testing.assert_allclose(c2w[:3, 1], [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, -5.0], atol=1e-6)


def test_orbit_trajectory():
    center = np.array([1.0, 2.0, 3.0])
    traj = create_orbit_trajectory(center, radius=4.0, num_frames=8)
    assert traj.shape == (8, 4, 4)
    dists = np.linalg.norm(traj[:, :3, 3] - center, axis=1)
    np.testing.assert_allclose(dists, 4.0, rtol=1e-5)
    for c2w in traj:
        R = c2w[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        # Each camera looks at the center.
        to_center = center - c2w[:3, 3]
        to_center /= np.linalg.norm(to_center)
        np.testing.assert_allclose(c2w[:3, 2], to_center, atol=1e-5)


def test_scene_center_radius():
    # Cameras on a ring of radius 6 looking inward.
    c2ws = create_orbit_trajectory(np.zeros(3), 6.0, num_frames=12)
    center, radius = estimate_scene_center_radius(c2w_matrices=c2ws)
    assert np.linalg.norm(center) < 1.5
    assert 3.0 <= radius <= 20.0
    # Fallback: positions only.
    pts = np.random.default_rng(0).normal(0, 1, (500, 3)) + [5, 0, 0]
    center2, radius2 = estimate_scene_center_radius(positions=pts)
    assert abs(center2[0] - 5.0) < 0.5
    assert radius2 >= 3.0


def test_psnr():
    import jax.numpy as jnp

    a = jnp.zeros((8, 8, 3))
    assert float(psnr(a, a)) > 100.0
    b = a + 0.1
    np.testing.assert_allclose(float(psnr(b, a)), 20.0, atol=1e-3)


def test_colorize_depth():
    depth = np.linspace(2, 8, 64).reshape(8, 8)
    alpha = np.ones((8, 8))
    img = colorize_depth(depth, alpha)
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img[0, 0, 0] < img[-1, -1, 0]  # monotone with depth


def test_metrics_logger(tmp_path):
    buf = io.StringIO()
    with MetricsLogger(log_dir=str(tmp_path), name="t", stream=buf) as m:
        m.log(1, loss=0.5)
        m.log(2, loss=0.25, n=7)
    lines = open(os.path.join(str(tmp_path), "t_metrics.jsonl")).readlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 0.25 and rec["n"] == 7
    assert "loss 0.25000" in buf.getvalue()


def test_benchmark_fn():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2.0)
    stats = benchmark_fn(f, jnp.ones(64), iters=3, warmup=1, pixels=64)
    assert stats["iters"] == 3
    assert stats["fps"] > 0 and stats["rays_per_s"] > 0


def test_camera_utils_vs_reference(ref, torch, rng):
    """scale_intrinsics + frustum check parity (SURVEY C4)."""
    import jax.numpy as jnp

    from gsplat_tpu.ops import scale_intrinsics
    from gsplat_tpu.ops.camera import (
        check_frustum_camera_space,
        transform_to_camera_space,
    )

    args = (240, 320, 480, 640, 100.0, 110.0, 64.0, 48.0)
    ours = scale_intrinsics(*args)
    theirs = ref.scale_intrinsics(*args)
    assert tuple(float(v) for v in ours) == tuple(
        float(v) for v in theirs
    )

    pts = rng.normal(0, 3, (256, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, -0.2, -4.0]
    x, y, z = transform_to_camera_space(jnp.asarray(pts), jnp.asarray(c2w))
    from gaussian_splatting.utils import (
        check_frustum_camera_space as ref_frustum,
        transform_to_camera_space as ref_transform,
    )

    rx, ry, rz = ref_transform(torch.from_numpy(pts), torch.from_numpy(c2w))
    np.testing.assert_allclose(np.asarray(x), rx.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ry.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), rz.numpy(), atol=1e-5)

    mask_ours = np.asarray(
        check_frustum_camera_space(
            x, y, z, 120.0, 120.0, 64.0, 64.0, 128, 128,
            near=0.01, far=100.0, pix_guard=32.0,
        )
    )
    mask_ref = (
        ref_frustum(
            rx, ry, rz, 120.0, 120.0, 64.0, 64.0, 128, 128,
            near=0.01, far=100.0, pix_guard=32.0,
        )
        .numpy()
        .astype(bool)
    )
    np.testing.assert_array_equal(mask_ours, mask_ref)


def test_batched_trajectory_matches_per_pose():
    """make_batch_render_fn + render_trajectory(batch_size=B) must produce
    the same uint8 frames as per-pose rendering, including a padded last
    chunk (5 frames, B=2)."""
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.viewer import (
        make_batch_render_fn,
        make_render_fn,
        render_trajectory,
    )

    rng = np.random.default_rng(3)
    n = 64
    params = {
        "pos": jnp.asarray(
            np.stack(
                [
                    rng.uniform(-1, 1, n),
                    rng.uniform(-1, 1, n),
                    rng.uniform(2, 5, n),
                ],
                axis=-1,
            ),
            jnp.float32,
        ),
        "scale_raw": jnp.asarray(rng.normal(0, 0.3, (n, 3)) - 1.8, jnp.float32),
        "q_raw": jnp.asarray(
            rng.normal(0, 1, (n, 4)) + np.array([0, 0, 0, 2.0]), jnp.float32
        ),
        "opacity_raw": jnp.asarray(rng.normal(0.5, 1, n), jnp.float32),
        "f_dc": jnp.asarray(rng.normal(0, 0.8, (n, 3)), jnp.float32),
        "f_rest": jnp.asarray(rng.normal(0, 0.05, (n, 45)), jnp.float32),
    }
    cfg = RenderConfig(
        height=48, width=64, max_pairs=2048, max_per_tile=128,
        backend="xla",
    )
    fx = fy = 50.0
    cx, cy = 32.0, 24.0
    traj = create_orbit_trajectory(
        np.array([0.0, 0.0, 3.5]), radius=3.5, num_frames=5
    )
    single = make_render_fn(params, cfg, fx, fy, cx, cy)
    batched = make_batch_render_fn(params, cfg, fx, fy, cx, cy, batch=2)
    f1, _ = render_trajectory(single, traj, benchmark=False)
    f2, stats = render_trajectory(
        batched, traj, benchmark=True, batch_size=2
    )
    assert len(f1) == len(f2) == 5
    assert stats["frames"] == 5 and stats["batch_size"] == 2
    for i, (a, b) in enumerate(zip(f1, f2)):
        # uint8 quantization absorbs the <=1-ulp float difference.
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_bucketed_trajectory_matches_single_capacity():
    """make_bucketed_render_fn must produce the same frames as a single
    fixed-capacity render fn — bucketing only right-sizes static
    capacities per frame (orbit poses at different distances have very
    different pair demand), it never changes the kept pair set. Uses the
    pallas backend with rank truncation so the truncated/bucketed sizing
    path is exercised too."""
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.viewer import (
        make_bucketed_render_fn,
        make_render_fn,
        render_trajectory,
    )

    rng = np.random.default_rng(9)
    n = 96
    params = {
        "pos": jnp.asarray(
            np.stack(
                [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                 rng.uniform(2, 5, n)], axis=-1,
            ),
            jnp.float32,
        ),
        "scale_raw": jnp.asarray(rng.normal(0, 0.3, (n, 3)) - 1.8,
                                 jnp.float32),
        "q_raw": jnp.asarray(
            rng.normal(0, 1, (n, 4)) + np.array([0, 0, 0, 2.0]), jnp.float32
        ),
        "opacity_raw": jnp.asarray(rng.normal(0.5, 1, n), jnp.float32),
        "f_dc": jnp.asarray(rng.normal(0, 0.8, (n, 3)), jnp.float32),
        "f_rest": jnp.asarray(rng.normal(0, 0.05, (n, 45)), jnp.float32),
    }
    cfg = RenderConfig(
        height=48, width=64, max_pairs=4096, max_per_tile=128,
        backend="pallas", pair_block=32, tile_rank_cap=64,
    )
    fx = fy = 50.0
    cx, cy = 32.0, 24.0
    # Mixed-distance poses -> genuinely different demand per frame.
    traj = np.concatenate([
        create_orbit_trajectory(np.array([0.0, 0.0, 3.5]), radius=3.3,
                                num_frames=3),
        create_orbit_trajectory(np.array([0.0, 0.0, 3.5]), radius=1.2,
                                num_frames=2),
    ])
    single = make_render_fn(params, cfg, fx, fy, cx, cy, report_demand=True)
    msgs = []
    bucketed = make_bucketed_render_fn(
        params, cfg, fx, fy, cx, cy, trajectory=traj, num_buckets=3,
        report_demand=True, verbose=msgs.append,
    )
    f1, s1 = render_trajectory(single, traj, benchmark=True,
                               pair_capacity=cfg.max_pairs)
    f2, s2 = render_trajectory(bucketed, traj, benchmark=True,
                               pair_capacity=cfg.max_pairs)
    assert len(f1) == len(f2) == len(traj)
    assert msgs and "rung" in msgs[0]
    assert s1["max_pairs_seen"] == s2["max_pairs_seen"]
    for i, (a, b) in enumerate(zip(f1, f2)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_enable_compilation_cache(tmp_path):
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.utils import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "xla"), min_compile_time_secs=0.0)
    assert d is not None and os.path.isdir(d)
    jax.jit(lambda x: x * 2 + 1)(jnp.arange(8.0)).block_until_ready()
    # GSPLAT_NO_CACHE disables without error.
    os.environ["GSPLAT_NO_CACHE"] = "1"
    try:
        assert enable_compilation_cache() is None
    finally:
        del os.environ["GSPLAT_NO_CACHE"]


def test_evaluate_views_render_batch_matches_per_view():
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.evaluation import evaluate_views

    rng = np.random.default_rng(5)
    n = 48
    params = {
        "pos": jnp.asarray(
            np.stack(
                [
                    rng.uniform(-1, 1, n),
                    rng.uniform(-1, 1, n),
                    rng.uniform(2, 5, n),
                ],
                axis=-1,
            ),
            jnp.float32,
        ),
        "scale_raw": jnp.asarray(rng.normal(0, 0.3, (n, 3)) - 1.8, jnp.float32),
        "q_raw": jnp.asarray(
            rng.normal(0, 1, (n, 4)) + np.array([0, 0, 0, 2.0]), jnp.float32
        ),
        "opacity_raw": jnp.asarray(rng.normal(0.5, 1, n), jnp.float32),
        "f_dc": jnp.asarray(rng.normal(0, 0.8, (n, 3)), jnp.float32),
        "f_rest": jnp.asarray(rng.normal(0, 0.05, (n, 45)), jnp.float32),
    }
    cfg = RenderConfig(height=32, width=48, max_pairs=1024, max_per_tile=64,
                       backend="xla")
    views = []
    for i in range(3):  # 3 views, batch 2 -> padded last chunk
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.2 * i - 0.2
        views.append({
            "image": rng.uniform(0, 1, (32, 48, 3)).astype(np.float32),
            "c2w": c2w, "fx": 40.0, "fy": 40.0, "cx": 24.0, "cy": 16.0,
        })
    r1 = evaluate_views(params, views, cfg)
    r2 = evaluate_views(params, views, cfg, render_batch=2)
    assert r1["num_views"] == r2["num_views"] == 3
    for a, b in zip(r1["per_view"], r2["per_view"]):
        assert a["psnr"] == pytest.approx(b["psnr"], abs=1e-3)
        assert a["l1"] == pytest.approx(b["l1"], abs=1e-6)

    # Demand auto-sizing: a starved max_pairs must be grown, reproducing
    # the adequately-sized metrics (round 5: a stale post-fit() eval cfg
    # silently dropped the farthest gaussians and reported 11 dB for a
    # 22 dB pool).
    r3 = evaluate_views(params, views, cfg.with_(max_pairs=64))
    assert r3["max_pair_demand"] > 64
    assert r3["eval_max_pairs"] >= r3["max_pair_demand"]
    for a, b in zip(r1["per_view"], r3["per_view"]):
        assert a["psnr"] == pytest.approx(b["psnr"], abs=1e-3)
    r4 = evaluate_views(params, views, cfg.with_(max_pairs=64),
                        auto_size=False)
    assert r4["per_view"][0]["psnr"] != pytest.approx(
        r1["per_view"][0]["psnr"], abs=1e-3
    ), "starved eval should differ when auto_size is off"


def test_memory_estimates_scale_sanely():
    from gsplat_tpu import RenderConfig, TrainConfig
    from gsplat_tpu.utils import (
        estimate_render_memory,
        estimate_train_memory,
    )

    cfg = RenderConfig(height=1080, width=1920, max_pairs=2**21)
    r = estimate_render_memory(cfg, 131072)
    # Pairs-sized terms dominate at this scale; total within sane bounds.
    assert r["pair_features_mb"] > r["per_gaussian_mb"]
    assert 100 < r["total_mb"] < 4000
    # Doubling max_pairs grows the pairs-sized terms.
    r2 = estimate_render_memory(cfg.with_(max_pairs=2**22), 131072)
    assert r2["pair_features_mb"] > 1.5 * r["pair_features_mb"]

    t = estimate_train_memory(cfg, TrainConfig(capacity=131072, batch_size=1))
    assert t["total_mb"] > r["total_mb"]  # backward + optimizer on top
    tb = estimate_train_memory(
        cfg, TrainConfig(capacity=131072, batch_size=4, batched_render=True)
    )
    assert tb["total_mb"] > 2 * t["total_mb"]  # shared B x capacity
