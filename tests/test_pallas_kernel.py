"""Pallas rasterizer parity: kernel forward/backward vs the XLA compositor.

Runs the Pallas kernels in interpret mode on CPU (same code path as the TPU,
minus Mosaic compilation) on a small scene, and checks:
  * forward image equality vs the XLA fallback rasterizer,
  * parameter gradients of the custom VJP vs autodiff through the XLA path,
  * early-exit correctness on a heavily saturated scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_scene

from gsplat_tpu import RenderConfig, render_from_params

CFG = RenderConfig(
    height=64,
    width=64,
    max_pairs=4096,
    max_per_tile=256,
    tile_chunk=4,
    pair_block=32,
)
CAM = dict(fx=60.0, fy=58.0, cx=32.5, cy=31.5)


def _params(scene):
    return {
        k: jnp.asarray(scene[k])
        for k in ("pos", "scale_raw", "q_raw", "opacity_raw", "f_dc", "f_rest")
    }


def _render(params, c2w, backend, cfg=CFG):
    img, aux = render_from_params(
        params,
        c2w,
        CAM["fx"],
        CAM["fy"],
        CAM["cx"],
        CAM["cy"],
        cfg.with_(backend=backend),
    )
    return img, aux


@pytest.mark.parametrize("seed", [0, 3])
def test_forward_matches_xla(seed):
    scene = make_scene(None, n=192, seed_offset=seed)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    img_x, aux_x = _render(params, c2w, "xla")
    img_p, aux_p = _render(params, c2w, "pallas")
    assert int(aux_p.num_pairs) == int(aux_x.num_pairs)
    err = float(jnp.max(jnp.abs(img_p - img_x)))
    assert err < 2e-5, f"pallas forward deviates from xla: max abs {err}"


def test_gradients_match_xla():
    scene = make_scene(None, n=128, seed_offset=1)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])

    tgt = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tgt = jnp.asarray(tgt)

    def loss(p, backend):
        img, _ = _render(p, c2w, backend)
        return jnp.mean(jnp.abs(img - tgt)) + jnp.mean(img * img)

    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    for k in params:
        gx, gp = g_x[k], g_p[k]
        scale = float(jnp.max(jnp.abs(gx))) + 1e-12
        err = float(jnp.max(jnp.abs(gp - gx)))
        assert err / scale < 5e-4, (
            f"grad[{k}] mismatch: max abs {err} (rel {err / scale:.2e})"
        )


def test_early_exit_saturated_scene():
    """Opaque front gaussians saturate pixels; result must still match."""
    scene = make_scene(None, n=256, seed_offset=2)
    scene["opacity_raw"] = scene["opacity_raw"] + 6.0  # near-opaque
    scene["scale_raw"] = scene["scale_raw"] + 1.0  # large splats
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    img_x, _ = _render(params, c2w, "xla")
    img_p, _ = _render(params, c2w, "pallas")
    err = float(jnp.max(jnp.abs(img_p - img_x)))
    assert err < 2e-5, f"saturated-scene mismatch: {err}"


def test_empty_scene_renders_black():
    scene = make_scene(None, n=64, seed_offset=4)
    scene["opacity_raw"] = scene["opacity_raw"] - 50.0  # all culled
    params = _params(scene)
    img_p, _ = _render(params, jnp.asarray(scene["c2w"]), "pallas")
    assert float(jnp.max(jnp.abs(img_p))) == 0.0


def test_depth_alpha_planes():
    """Depth/alpha planes: pallas == xla, and values are physically sane."""
    scene = make_scene(None, n=160, seed_offset=5)
    scene["opacity_raw"] = scene["opacity_raw"] + 3.0  # mostly opaque
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])

    _, aux_x = _render(params, c2w, "xla")
    _, aux_p = _render(params, c2w, "pallas")

    np.testing.assert_allclose(
        np.asarray(aux_p.depth), np.asarray(aux_x.depth), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(aux_p.alpha), np.asarray(aux_x.alpha), atol=2e-5
    )

    alpha = np.asarray(aux_p.alpha)
    depth = np.asarray(aux_p.depth)
    assert alpha.min() >= -1e-6 and alpha.max() <= 1.0 + 1e-6
    # Where opacity is high, accumulated depth must sit in the scene's
    # z range (gaussians live at z in [3, 8] in camera-ish space).
    solid = alpha > 0.95
    assert solid.any()
    mean_depth = depth[solid] / alpha[solid]
    assert 2.0 < mean_depth.mean() < 9.0


def test_depth_gradient_flows():
    """A depth-supervised loss must move positions along the ray."""
    scene = make_scene(None, n=96, seed_offset=6)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])

    def depth_loss(p):
        _, aux = _render(p, c2w, "pallas")
        return jnp.mean(aux.depth)

    g = jax.grad(depth_loss)(params)
    gz = np.asarray(g["pos"][:, 2])
    assert np.isfinite(gz).all()
    assert np.abs(gz).max() > 0.0


# The segmented compact-layout kernel ('pallas_seg', ops/raster_seg.py) was
# retired in round 5 by the raster_mega standard: measured slower end-to-end
# (tile-spanning sub-blocks defeat the saturation early-exit, NEXT.md §13),
# incompatible with rank truncation, and 2-22 min Mosaic compiles.


# The mega-stepped aligned kernel ('pallas_mega', ops/raster_mega.py) was
# retired in round 4: it regressed the trained-checkpoint bench in two
# straight rounds (NEXT.md §15); its tests went with it.


# --- per-tile rank truncation (cfg.tile_rank_cap) --------------------------

def _dense_scene():
    """A scene whose tiles exceed the rank cap (dim, overlapping splats)."""
    rng = np.random.default_rng(11)
    n = 1200
    return {
        "pos": np.stack(
            [rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n),
             rng.uniform(3, 8, n)], -1
        ).astype(np.float32),
        "scale_raw": (rng.normal(0, 0.3, (n, 3)) - 1.4).astype(np.float32),
        "q_raw": (rng.normal(0, 1, (n, 4))
                  + np.array([0, 0, 0, 2])).astype(np.float32),
        # Dim splats: the saturation early-exit rarely fires, so truncation
        # is exercised on tiles that do NOT saturate.
        "opacity_raw": rng.normal(-1.5, 0.8, n).astype(np.float32),
        "f_dc": rng.normal(0, 0.8, (n, 3)).astype(np.float32),
        "f_rest": rng.normal(0, 0.05, (n, 45)).astype(np.float32),
    }


def test_rank_truncation_matches_xla_per_tile_cap():
    """tile_rank_cap=K on the pallas path must reproduce the XLA fallback's
    front-most max_per_tile=K truncation exactly (same kept set), and must
    actually drop pairs on this scene."""
    params = {k: jnp.asarray(v) for k, v in _dense_scene().items()}
    c2w = jnp.eye(4)
    K = 32  # multiple of pair_block
    base = CFG.with_(max_pairs=2**15, max_per_tile=4096)
    img_x, aux_x = _render(params, c2w, "xla",
                           base.with_(max_per_tile=K))
    img_p, aux_p = _render(params, c2w, "pallas",
                           base.with_(tile_rank_cap=K))
    assert int(aux_p.num_pairs_kept) < int(aux_p.num_pairs), (
        "truncation test scene does not exceed the rank cap"
    )
    assert int(aux_p.trunc_demand) <= aux_p.trunc_capacity
    err = float(jnp.max(jnp.abs(img_p - img_x)))
    assert err < 2e-5, f"truncated pallas deviates from xla cap: {err}"

    tgt = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = render_from_params(
            p, c2w, CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"], cfg
        )
        return jnp.mean(jnp.abs(img - tgt)) + jnp.mean(img * img)

    g_p = jax.grad(
        lambda p: loss(p, base.with_(backend="pallas", tile_rank_cap=K))
    )(params)
    g_x = jax.grad(
        lambda p: loss(p, base.with_(backend="xla", max_per_tile=K))
    )(params)
    for k in params:
        scale = float(jnp.max(jnp.abs(g_x[k]))) + 1e-12
        err = float(jnp.max(jnp.abs(g_p[k] - g_x[k])))
        assert err / scale < 5e-4, (
            f"trunc grad[{k}]: max abs {err} (rel {err / scale:.2e})"
        )


def test_rank_truncation_static_capacity_overflow_reported():
    """trunc_pairs smaller than demand: trailing-tile blocks drop, the image
    stays finite, and the overflow is REPORTED (never silent)."""
    params = {k: jnp.asarray(v) for k, v in _dense_scene().items()}
    cfg = CFG.with_(max_pairs=2**15, max_per_tile=4096, backend="pallas",
                    tile_rank_cap=32, trunc_pairs=8 * 32)
    img, aux = _render(params, jnp.eye(4), "pallas", cfg)
    assert int(aux.trunc_demand) > aux.trunc_capacity
    assert bool(jnp.isfinite(img).all())


def test_trunc_demand_reporting_is_capacity_independent():
    """trunc_demand / num_pairs_kept must report the TRUE truncation demand
    even when the probing config's own max_pairs clips the materialized
    layout — a small-capacity pair_demand probe used to under-report ~5x,
    silently overflow-dropping most blocks in the demand-sized render
    (round-5 default-orbit ladder)."""
    params = {k: jnp.asarray(v) for k, v in _dense_scene().items()}
    c2w = jnp.eye(4)
    big = CFG.with_(max_pairs=2**15, max_per_tile=4096, tile_rank_cap=32)
    small = big.with_(max_pairs=2**10)  # clips most pairs
    _, aux_big = _render(params, c2w, "pallas", big)
    _, aux_small = _render(params, c2w, "pallas", small)
    assert int(aux_big.num_pairs) > 2**10  # the probe really clipped
    assert int(aux_small.trunc_demand) == int(aux_big.trunc_demand)
    assert int(aux_small.num_pairs_kept) == int(aux_big.num_pairs_kept)


def test_rank_truncation_off_is_exact():
    """tile_rank_cap larger than every tile's demand must be bit-identical
    to the untruncated render (the compaction is a pure relayout then)."""
    scene = make_scene(None, n=192, seed_offset=6)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    img_0, _ = _render(params, c2w, "pallas")
    img_t, aux_t = _render(params, c2w, "pallas",
                           CFG.with_(tile_rank_cap=CFG.max_per_tile))
    assert int(aux_t.num_pairs_kept) == int(aux_t.num_pairs)
    assert float(jnp.max(jnp.abs(img_t - img_0))) == 0.0

def test_occlusion_cull_bit_identical_and_reduces_demand():
    """The pre-sort occlusion cull (cfg.occlusion_cull, truncation-only)
    must leave the truncated image BIT-IDENTICAL — every culled gaussian's
    rank provably reaches >= cap_t at all of its tiles, so no tile's
    kept-block content changes — while reducing the reported pair demand
    (that demand is what pair_demand()-based auto-sizing consumes)."""
    params = {k: jnp.asarray(v) for k, v in _dense_scene().items()}
    c2w = jnp.eye(4)
    base = CFG.with_(max_pairs=2**15, max_per_tile=4096, tile_rank_cap=32,
                     cull_chunks=16)
    img_off, aux_off = _render(params, c2w, "pallas",
                               base.with_(occlusion_cull=False))
    img_on, aux_on = _render(params, c2w, "pallas",
                             base.with_(occlusion_cull=True))
    assert int(aux_on.num_pairs) < int(aux_off.num_pairs), (
        "cull removed nothing on the dense overlap scene"
    )
    assert int(aux_on.num_pairs_kept) == int(aux_off.num_pairs_kept)
    assert float(jnp.max(jnp.abs(img_on - img_off))) == 0.0

    def loss(p, cfg):
        img, _ = render_from_params(
            p, c2w, CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"], cfg
        )
        return jnp.mean(img) + jnp.mean(img * img)

    g_off = jax.grad(lambda p: loss(
        p, base.with_(backend="pallas", occlusion_cull=False)))(params)
    g_on = jax.grad(lambda p: loss(
        p, base.with_(backend="pallas", occlusion_cull=True)))(params)
    for k in params:
        err = float(jnp.max(jnp.abs(g_on[k] - g_off[k])))
        assert err < 1e-7, f"cull changed grad[{k}] by {err}"


def test_cumprod_transmittance_matches_log():
    """transmittance_math="cumprod" (exact two-level product, zero
    transcendentals; the default since the round-3 TPU A/B) must agree
    with the log-space math in both the forward image and the custom-VJP
    gradients."""
    scene = make_scene(None, n=160, seed_offset=5)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])

    img_l, aux_l = _render(
        params, c2w, "pallas", CFG.with_(transmittance_math="log")
    )
    img_c, aux_c = _render(
        params, c2w, "pallas", CFG.with_(transmittance_math="cumprod")
    )
    assert int(aux_c.num_pairs) == int(aux_l.num_pairs)
    err = float(jnp.max(jnp.abs(img_c - img_l)))
    assert err < 2e-6, f"cumprod forward deviates from log: {err}"

    tgt = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = render_from_params(
            p, c2w, CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
            cfg.with_(backend="pallas"),
        )
        return jnp.mean(jnp.abs(img - tgt)) + jnp.mean(img * img)

    g_l = jax.grad(
        lambda p: loss(p, CFG.with_(transmittance_math="log"))
    )(params)
    g_c = jax.grad(
        lambda p: loss(p, CFG.with_(transmittance_math="cumprod"))
    )(params)
    for k in params:
        scale = float(jnp.max(jnp.abs(g_l[k]))) + 1e-12
        err = float(jnp.max(jnp.abs(g_c[k] - g_l[k])))
        assert err / scale < 1e-4, (
            f"grad[{k}] cumprod vs log: max abs {err} (rel {err / scale:.2e})"
        )


# --- saturation-compacted backward reduction (cfg.bwd_pairs, round 5) ------

def _bwd_scene(n=600):
    rng = np.random.default_rng(7)
    return {
        "pos": np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                         rng.uniform(3, 8, n)], -1).astype(np.float32),
        "scale_raw": (rng.normal(0, 0.3, (n, 3)) - 1.6).astype(np.float32),
        "q_raw": (rng.normal(0, 1, (n, 4)) + [0, 0, 0, 2]).astype(np.float32),
        "opacity_raw": rng.normal(1.5, 1, n).astype(np.float32),
        "f_dc": rng.normal(0, 0.8, (n, 3)).astype(np.float32),
        "f_rest": rng.normal(0, 0.05, (n, 45)).astype(np.float32),
    }


BWD_CFG = RenderConfig(height=128, width=128, max_pairs=2**14,
                       max_per_tile=512, backend="pallas")


def _bwd_loss(params, cfg):
    img, aux = render_from_params(
        params, jnp.eye(4), 150.0, 150.0, 64.0, 64.0, cfg
    )
    w = jnp.cos(0.37 * jnp.arange(img.size).reshape(img.shape))
    return jnp.sum(img * w), aux


def test_satbwd_gradients_bit_exact_when_sized():
    """With bwd_pairs >= demand the compacted VJP sort must be BIT-exact:
    dropped blocks are identically zero and lax.sort is stable, so the
    kept cotangents reduce in the same relative order."""
    params = {k: jnp.asarray(v) for k, v in _bwd_scene().items()}
    (l0, aux0), g0 = jax.value_and_grad(
        _bwd_loss, has_aux=True)(params, BWD_CFG)
    demand = int(aux0.bwd_demand)
    assert 0 < demand <= BWD_CFG.padded_pairs
    # The demand (active blocks) must undercut the padded capacity, else
    # the compaction saves nothing on this scene and the test is vacuous.
    assert demand < BWD_CFG.padded_pairs
    (lc, auxc), gc = jax.value_and_grad(_bwd_loss, has_aux=True)(
        params, BWD_CFG.with_(bwd_pairs=demand)
    )
    assert float(l0) == float(lc)  # forward unchanged
    for k in g0:
        assert float(jnp.max(jnp.abs(g0[k] - gc[k]))) == 0.0, k


def test_satbwd_overflow_reported_never_silent():
    params = {k: jnp.asarray(v) for k, v in _bwd_scene().items()}
    cfg = BWD_CFG.with_(bwd_pairs=256)  # way under demand
    (_, aux), g = jax.value_and_grad(_bwd_loss, has_aux=True)(params, cfg)
    assert int(aux.bwd_demand) > int(aux.bwd_capacity)
    for k in g:  # lossy but finite
        assert bool(jnp.isfinite(g[k]).all()), k


def test_satbwd_with_rank_truncation():
    """bwd_pairs composes with tile_rank_cap (the trunc-compacted layout
    feeds the same gather VJP)."""
    params = {k: jnp.asarray(v) for k, v in _bwd_scene().items()}
    tcfg = BWD_CFG.with_(tile_rank_cap=256)
    (_, aux0), g0 = jax.value_and_grad(_bwd_loss, has_aux=True)(params, tcfg)
    (_, _), gc = jax.value_and_grad(_bwd_loss, has_aux=True)(
        params, tcfg.with_(bwd_pairs=int(aux0.bwd_demand))
    )
    for k in g0:
        assert float(jnp.max(jnp.abs(g0[k] - gc[k]))) == 0.0, k
