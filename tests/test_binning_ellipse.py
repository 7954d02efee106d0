"""Ellipse-interval tile culling (RenderConfig.cull_mode="ellipse").

The two-level (rows -> pairs) expansion must reproduce rect-mode images and
gradients to float-rounding tolerance — culled tiles have zero alpha at every pixel
center by construction — while strictly reducing the pair count on anisotropic scenes,
and reporting (never hiding) row-capacity overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_scene

from gsplat_tpu import RenderConfig, render_from_params
from gsplat_tpu.render import render_batch_from_params

# max_per_tile is deliberately generous: the XLA fallback truncates each
# tile at K pairs INCLUDING zero-alpha ones, so a tight K would make rect
# mode (which keeps more dead pairs) truncate real contributors that
# ellipse mode retains — a real behavioral improvement, but not the
# equality under test here.
CFG = RenderConfig(
    height=64,
    width=64,
    max_pairs=8192,
    max_per_tile=1024,
    tile_chunk=4,
    pair_block=32,
)
CAM = dict(fx=60.0, fy=58.0, cx=32.5, cy=31.5)


def _params(scene):
    return {
        k: jnp.asarray(scene[k])
        for k in ("pos", "scale_raw", "q_raw", "opacity_raw", "f_dc", "f_rest")
    }


def _aniso_scene(n=160, seed=11):
    """Elongated, randomly-rotated splats — the case rect AABBs overcount."""
    scene = make_scene(None, n=n, seed_offset=seed)
    s = scene["scale_raw"].copy()
    s[:, 0] += 1.6  # stretch one principal axis ~5x
    scene["scale_raw"] = s
    return scene


def _render(params, c2w, cfg):
    return render_from_params(
        params, c2w, CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"], cfg
    )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_ellipse_matches_rect_anisotropic(backend):
    scene = _aniso_scene()
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    img_r, aux_r = _render(params, c2w, CFG.with_(backend=backend))
    img_e, aux_e = _render(
        params, c2w, CFG.with_(backend=backend, cull_mode="ellipse")
    )
    # Same nonzero summands; only zero-alpha pairs disappear, but block
    # boundaries / reduction trees shift, so allow float-rounding noise.
    err = float(jnp.max(jnp.abs(img_e - img_r)))
    assert err < 2e-6, f"ellipse vs rect image ({backend}): max abs {err}"
    # Strict pair reduction on rotated anisotropic splats.
    pr, pe = int(aux_r.num_pairs), int(aux_e.num_pairs)
    assert pe < pr, f"no pair reduction: rect {pr}, ellipse {pe}"
    assert int(aux_e.num_rows) > 0
    assert int(aux_e.num_rows) <= CFG.row_capacity
    # Depth/alpha planes agree too.
    assert float(jnp.max(jnp.abs(aux_e.depth - aux_r.depth))) < 2e-5
    assert float(jnp.max(jnp.abs(aux_e.alpha - aux_r.alpha))) < 2e-6


def test_ellipse_gradients_match_rect():
    scene = _aniso_scene(n=128, seed=3)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    tgt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    )

    def loss(p, cfg):
        img, _ = _render(p, c2w, cfg)
        return jnp.mean(jnp.abs(img - tgt)) + jnp.mean(img * img)

    g_r = jax.grad(lambda p: loss(p, CFG.with_(backend="pallas")))(params)
    g_e = jax.grad(
        lambda p: loss(p, CFG.with_(backend="pallas", cull_mode="ellipse"))
    )(params)
    for k in params:
        scale = float(jnp.max(jnp.abs(g_r[k]))) + 1e-12
        err = float(jnp.max(jnp.abs(g_e[k] - g_r[k])))
        # Reassociation noise only (block boundaries shift when dead pairs
        # disappear); measured rel ~1.3e-5 — far below any real divergence.
        assert err / scale < 5e-5, (
            f"grad[{k}] ellipse vs rect: max abs {err} (rel {err / scale:.2e})"
        )


def test_ellipse_edge_clipped_scene():
    """Splats straddling the image border: AABB clipping must stay exact."""
    scene = make_scene(None, n=96, seed_offset=7)
    pos = scene["pos"].copy()
    pos[:, 0] = np.sign(pos[:, 0]) * np.maximum(np.abs(pos[:, 0]), 1.6)
    scene["pos"] = pos
    scene["scale_raw"] = scene["scale_raw"] + 1.0  # big splats
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    img_r, aux_r = _render(params, c2w, CFG)
    img_e, aux_e = _render(params, c2w, CFG.with_(cull_mode="ellipse"))
    assert float(jnp.max(jnp.abs(img_e - img_r))) < 2e-6
    assert int(aux_e.num_pairs) <= int(aux_r.num_pairs)


def test_ellipse_batched_views_match():
    scene = _aniso_scene(n=96, seed=5)
    params = _params(scene)
    c2ws = []
    for dx in (-0.1, 0.0, 0.15):
        c2w = np.asarray(scene["c2w"]).copy()
        c2w[0, 3] += dx
        c2ws.append(c2w)
    c2ws = jnp.asarray(np.stack(c2ws))
    B = 3
    fx = jnp.full((B,), CAM["fx"])
    fy = jnp.full((B,), CAM["fy"])
    cx = jnp.full((B,), CAM["cx"])
    cy = jnp.full((B,), CAM["cy"])
    imgs_r, _ = render_batch_from_params(params, c2ws, fx, fy, cx, cy, CFG)
    imgs_e, aux_e = render_batch_from_params(
        params, c2ws, fx, fy, cx, cy, CFG.with_(cull_mode="ellipse")
    )
    assert float(jnp.max(jnp.abs(imgs_e - imgs_r))) < 2e-6
    # Batched single-view parity as well (vs per-view ellipse renders).
    for v in range(B):
        img_v, _ = _render(params, c2ws[v], CFG.with_(cull_mode="ellipse"))
        assert float(jnp.max(jnp.abs(imgs_e[v] - img_v))) == 0.0


def test_ellipse_row_overflow_reported():
    scene = make_scene(None, n=160, seed_offset=9)
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    cfg = CFG.with_(cull_mode="ellipse", max_rows=32)  # absurdly small
    img, aux = _render(params, c2w, cfg)
    assert int(aux.num_rows) > 32  # true demand reported
    assert aux.row_capacity == 32
    assert bool(jnp.isfinite(img).all())
    # Kept prefix must still render a valid (front-most) partial scene:
    # pair demand reported consistently.
    assert int(aux.num_pairs) <= cfg.max_pairs


def test_ellipse_empty_scene():
    scene = make_scene(None, n=64, seed_offset=4)
    scene["opacity_raw"] = scene["opacity_raw"] - 50.0
    params = _params(scene)
    img, aux = _render(
        params, jnp.asarray(scene["c2w"]), CFG.with_(cull_mode="ellipse")
    )
    assert float(jnp.max(jnp.abs(img))) == 0.0
    assert int(aux.num_pairs) == 0


@pytest.mark.parametrize("n", [1, 5, 4095, 4096, 4097, 10000])
def test_cumsum_2level_matches_jnp(n):
    """_cumsum_2level must be bit-identical to jnp.cumsum for int32
    (it is the measured-faster form of the expansion cumsum)."""
    from gsplat_tpu.ops.binning import _cumsum_2level

    rng = np.random.default_rng(n)
    a = jnp.asarray(rng.integers(-5, 9, (3, n), dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(_cumsum_2level(a)), np.asarray(jnp.cumsum(a, axis=1))
    )
    a1 = a[0]
    np.testing.assert_array_equal(
        np.asarray(_cumsum_2level(a1)), np.asarray(jnp.cumsum(a1))
    )
