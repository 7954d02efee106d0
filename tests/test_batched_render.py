"""Batched-view shared binning: render_batch_from_params oracle tests.

The batched path stacks B views into one virtual image and runs ONE
binning sort + ONE compositing pass (render.py::render_batch_from_params,
replacing the reference's per-view training loop,
/root/reference/scripts/train.py:471-527). Tiles never span views, uv stays
view-local (RenderConfig.view_tile_rows wraps tile rows to view-local pixel
rows in exact int32), and each view's gaussians keep their relative depth
order under the global sort, so the result must match per-view rendering to
the last ulp (same math, same compositing order; residual 1-ulp noise is
XLA fusion variance between the two graph shapes) — these tests enforce
that for images, aux planes, gradients, and the train step, on both the XLA
and (interpret-mode) Pallas backends.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import (
    RenderConfig,
    TrainConfig,
    render_batch_from_params,
    render_from_params,
)
from gsplat_tpu.models import init_pool_from_points
from gsplat_tpu.train import init_train_state, make_train_step

CFG = RenderConfig(
    height=64, width=48, max_pairs=4096, max_per_tile=128, tile_chunk=8,
    backend="xla",
)
CAM = dict(fx=60.0, fy=60.0, cx=24.0, cy=32.0)


def _pool(n=96, capacity=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [
            np.stack(
                [
                    rng.uniform(-1.5, 1.5, n),
                    rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3.0, 6.0, n),
                ],
                axis=-1,
            ),
            rng.uniform(0, 1, (n, 3)),
        ],
        axis=-1,
    ).astype(np.float32)
    return init_pool_from_points(pts, capacity=capacity, seed=seed)


def _views(b=3):
    c2ws = []
    for i in range(b):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.25 * i - 0.2
        c2w[1, 3] = 0.1 * i
        c2ws.append(c2w)
    return {
        "c2w": jnp.asarray(np.stack(c2ws)),
        "fx": jnp.full((b,), CAM["fx"], jnp.float32),
        "fy": jnp.full((b,), CAM["fy"], jnp.float32),
        "cx": jnp.full((b,), CAM["cx"], jnp.float32),
        "cy": jnp.full((b,), CAM["cy"], jnp.float32),
    }


def _batch_with_gt(pool, views):
    target = dict(pool.params)
    target["f_dc"] = target["f_dc"] + 0.5
    imgs = []
    for i in range(views["c2w"].shape[0]):
        img, _ = render_from_params(
            target, views["c2w"][i], views["fx"][i], views["fy"][i],
            views["cx"][i], views["cy"][i], CFG, alive=pool.alive,
        )
        imgs.append(np.asarray(img))
    return dict(views, image=jnp.asarray(np.stack(imgs)))


def _per_view(params, alive, views, cfg):
    outs = []
    for i in range(views["c2w"].shape[0]):
        img, aux = render_from_params(
            params, views["c2w"][i], views["fx"][i], views["fy"][i],
            views["cx"][i], views["cy"][i], cfg, alive=alive,
        )
        outs.append((np.asarray(img), aux))
    return outs


def test_batch_matches_per_view_xla():
    pool = _pool()
    views = _views(b=3)
    imgs, aux = render_batch_from_params(
        pool.params, views["c2w"], views["fx"], views["fy"], views["cx"],
        views["cy"], CFG, alive=pool.alive,
    )
    assert imgs.shape == (3, CFG.height, CFG.width, 3)
    singles = _per_view(pool.params, pool.alive, views, CFG)
    total_pairs = 0
    for i, (img, aux1) in enumerate(singles):
        np.testing.assert_allclose(
            np.asarray(imgs[i]), img, atol=1e-5,
            err_msg=f"view {i} image mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(aux.depth[i]), np.asarray(aux1.depth), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(aux.alpha[i]), np.asarray(aux1.alpha), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(aux.screen_radius[i]), np.asarray(aux1.screen_radius)
        )
        total_pairs += int(aux1.num_pairs)
    assert int(aux.num_pairs) == total_pairs
    assert aux.pair_capacity == 3 * CFG.max_pairs


def test_batch_matches_per_view_pallas_interpret():
    # Interpret-mode Pallas walks the grid in python — keep it tiny.
    cfg = RenderConfig(
        height=32, width=32, max_pairs=1024, tile_chunk=4, backend="pallas"
    )
    pool = _pool(n=24, capacity=32)
    views = _views(b=2)
    views = {
        k: (v if k == "c2w" else v[:2]) if hasattr(v, "shape") else v
        for k, v in views.items()
    }
    views["c2w"] = views["c2w"][:2]
    views["cx"] = jnp.full((2,), 16.0, jnp.float32)
    views["cy"] = jnp.full((2,), 16.0, jnp.float32)
    imgs, _ = render_batch_from_params(
        pool.params, views["c2w"], views["fx"], views["fy"], views["cx"],
        views["cy"], cfg, alive=pool.alive,
    )
    for i in range(2):
        img, _ = render_from_params(
            pool.params, views["c2w"][i], views["fx"][i], views["fy"][i],
            views["cx"][i], views["cy"][i], cfg, alive=pool.alive,
        )
        np.testing.assert_allclose(
            np.asarray(imgs[i]), np.asarray(img), atol=1e-5
        )


def test_batch_gradients_match_per_view():
    pool = _pool()
    views = _views(b=2)

    def loss_batched(p):
        imgs, _ = render_batch_from_params(
            p, views["c2w"], views["fx"], views["fy"], views["cx"],
            views["cy"], CFG, alive=pool.alive,
        )
        return jnp.sum(imgs * imgs)

    def loss_loop(p):
        total = 0.0
        for i in range(2):
            img, _ = render_from_params(
                p, views["c2w"][i], views["fx"][i], views["fy"][i],
                views["cx"][i], views["cy"][i], CFG, alive=pool.alive,
            )
            total = total + jnp.sum(img * img)
        return total

    g1 = jax.grad(loss_batched)(pool.params)
    g2 = jax.grad(loss_loop)(pool.params)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        np.testing.assert_allclose(
            a, b, atol=1e-4 + 1e-4 * np.abs(b).max(), err_msg=f"grad[{k}]"
        )


def test_train_step_batched_matches_scan():
    pool = _pool()
    batch = _batch_with_gt(pool, _views(b=3))

    tcfg_scan = TrainConfig(capacity=256, batch_size=3)
    tcfg_batched = TrainConfig(
        capacity=256, batch_size=3, batched_render=True
    )

    s1, m1 = make_train_step(CFG, tcfg_scan)(
        init_train_state(_pool(), tcfg_scan), batch
    )
    s2, m2 = make_train_step(CFG, tcfg_batched)(
        init_train_state(_pool(), tcfg_batched), batch
    )
    np.testing.assert_allclose(
        float(m1["total"]), float(m2["total"]), atol=1e-5
    )
    for k in s1.pool.params:
        np.testing.assert_allclose(
            np.asarray(s1.pool.params[k]), np.asarray(s2.pool.params[k]),
            atol=2e-5, err_msg=f"param[{k}] after step",
        )


def test_train_step_batched_paper_stats_match_scan():
    pool = _pool()
    batch = _batch_with_gt(pool, _views(b=2))

    tcfg_scan = TrainConfig(capacity=256, batch_size=2, adc_mode="paper")
    tcfg_batched = TrainConfig(
        capacity=256, batch_size=2, adc_mode="paper", batched_render=True
    )
    _, m1 = make_train_step(CFG, tcfg_scan)(
        init_train_state(_pool(), tcfg_scan), batch
    )
    _, m2 = make_train_step(CFG, tcfg_batched)(
        init_train_state(_pool(), tcfg_batched), batch
    )
    np.testing.assert_array_equal(
        np.asarray(m1["visible"]), np.asarray(m2["visible"])
    )
    np.testing.assert_array_equal(
        np.asarray(m1["max_radius"]), np.asarray(m2["max_radius"])
    )
    a = np.asarray(m1["uv_grad_sum"])
    b = np.asarray(m2["uv_grad_sum"])
    assert a.max() > 0
    np.testing.assert_allclose(a, b, atol=1e-6 + 1e-4 * np.abs(a).max())


def test_batch_overflow_reported_never_silent():
    cfg = CFG.with_(max_pairs=64)  # far below demand
    pool = _pool()
    views = _views(b=2)
    imgs, aux = render_batch_from_params(
        pool.params, views["c2w"], views["fx"], views["fy"], views["cx"],
        views["cy"], cfg, alive=pool.alive,
    )
    assert int(aux.num_pairs) > aux.pair_capacity  # demand reported
    assert bool(jnp.all(jnp.isfinite(imgs)))
