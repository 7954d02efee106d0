"""Public rendering entry points.

`render` mirrors the reference API surface
(/root/reference/gaussian_splatting/render.py:62) — positions, per-view
colors, raw opacity, full [N,3,3] covariances, camera — and returns an
[H, W, 3] image in [0, 1]. `render_from_params` is the fused training path:
raw parameters -> covariance + SH colors + projection + binning + compositing
in one jitted graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .ops.gaussian import build_cov3d_packed, pack_cov3d
from .ops.projection import ProjectedGaussians, project_gaussians
from .ops.rasterize import rasterize
from .ops.sh import evaluate_sh


def render(
    pos: jnp.ndarray,
    color: jnp.ndarray,
    opacity_raw: jnp.ndarray,
    sigma: jnp.ndarray,
    c2w: jnp.ndarray,
    H: int,
    W: int,
    fx,
    fy,
    cx,
    cy,
    near: float = 0.01,
    far: float = 100.0,
    pix_guard: float = 32,
    T: int = 16,
    min_conis: float = 1e-6,
    chi_square_clip: float = 6.25,
    alpha_max: float = 0.99,
    alpha_cutoff: float = 1 / 128.0,
    cfg: RenderConfig | None = None,
    return_aux: bool = False,
):
    """Render a view; signature/threshold parity with reference render.py:62-64."""
    if cfg is None:
        cfg = RenderConfig(
            height=int(H),
            width=int(W),
            tile=int(T),
            near=near,
            far=far,
            pix_guard=pix_guard,
            min_conic=min_conis,
            chi2_clip=chi_square_clip,
            alpha_max=alpha_max,
            alpha_cutoff=alpha_cutoff,
        )
    if sigma.ndim == 3:
        cov3d = pack_cov3d(sigma)
    else:
        cov3d = sigma
    img, aux = _render_jit(pos, color, opacity_raw, cov3d, c2w,
                           jnp.float32(fx), jnp.float32(fy),
                           jnp.float32(cx), jnp.float32(cy), cfg)
    return (img, aux) if return_aux else img


@functools.partial(jax.jit, static_argnums=(9,))
def _render_jit(pos, color, opacity_raw, cov3d, c2w, fx, fy, cx, cy, cfg):
    proj = project_gaussians(pos, cov3d, opacity_raw, c2w, fx, fy, cx, cy, cfg)
    return rasterize(proj, color, cfg)


def pair_demand(
    params: dict,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    cfg: RenderConfig,
    alive: jnp.ndarray | None = None,
):
    """True (pair, row, trunc) demand of a view — projection + binning only.

    A cheap-to-compile probe (no rasterization kernel) for demand-driven
    capacity sizing: `TileBinning.num_pairs`/`num_rows` report the TRUE
    demand even when it exceeds cfg's static capacities, so callers can
    probe with a generous cfg and then rebuild a right-sized one (see
    render_trained.py --auto_pairs; fit() does the same reactively from
    step metrics). Returns (num_pairs, num_rows, trunc_demand) —
    trunc_demand is the block-aligned slot demand AFTER the per-tile rank
    cap (0 when cfg.tile_rank_cap is off); size cfg.trunc_pairs from it.
    """
    from .ops.binning import bin_gaussians

    cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
    proj = project_gaussians(
        params["pos"], cov3d, params["opacity_raw"], c2w, fx, fy, cx, cy,
        cfg, extra_valid=alive,
    )
    binning = bin_gaussians(proj, cfg)
    return binning.num_pairs, binning.num_rows, binning.trunc_demand


def render_from_params(
    params: dict,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    cfg: RenderConfig,
    alive: jnp.ndarray | None = None,
    uv_tap: jnp.ndarray | None = None,
):
    """Fused differentiable forward: raw parameter pytree -> (image, aux).

    Args:
        params: dict with pos [N,3], scale_raw [N,3], q_raw [N,4],
            opacity_raw [N], f_dc [N,3], f_rest [N,45|9|0].
        alive: optional [N] bool pool-slot mask (fixed-capacity ADC).
        uv_tap: optional [N, 2] zeros; grad w.r.t. it is the view-space
            positional gradient (paper-style ADC statistic).
    """
    cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
    colors = evaluate_sh(params["f_dc"], params["f_rest"], params["pos"], c2w)
    proj = project_gaussians(
        params["pos"], cov3d, params["opacity_raw"], c2w, fx, fy, cx, cy, cfg,
        extra_valid=alive, uv_tap=uv_tap,
    )
    return rasterize(proj, colors, cfg)


def stack_view_projections(proj_b, cfg: RenderConfig):
    """Stack per-view projections [B, N, ...] into one virtual scene.

    View v lives in tile rows [v * tiles_y, (v+1) * tiles_y); uv stays
    VIEW-LOCAL — the rasterizer wraps tile rows back to view-local pixel
    rows via the returned config's `view_tile_rows` (exact int32; see
    render_batch_from_params). Tile offsets preserve the invalid-slot
    convention (tmax = tmin - 1). Returns (stacked [B*N] projections,
    derived config with height = B * padded_height and the pair capacity
    SHARED across the batch).
    """
    B, n = proj_b.uv.shape[:2]
    voff_tile = (jnp.arange(B, dtype=jnp.int32) * cfg.tiles_y)[:, None]
    tile_off = jnp.stack(
        [jnp.zeros_like(voff_tile), jnp.broadcast_to(voff_tile, (B, 1))],
        axis=-1,
    )  # [B, 1, 2]
    stacked = ProjectedGaussians(
        uv=proj_b.uv.reshape(B * n, 2),
        depth=proj_b.depth.reshape(B * n),
        conic=proj_b.conic.reshape(B * n, 3),
        opacity=proj_b.opacity.reshape(B * n),
        radius=proj_b.radius.reshape(B * n),
        tile_min=(proj_b.tile_min + tile_off).reshape(B * n, 2),
        tile_max=(proj_b.tile_max + tile_off).reshape(B * n, 2),
        valid=proj_b.valid.reshape(B * n),
    )
    bcfg = cfg.with_(
        height=B * cfg.padded_height,
        max_pairs=B * cfg.max_pairs,
        # row_capacity auto-scales with max_pairs when max_rows == 0; an
        # explicit per-view max_rows is shared across the batch like pairs.
        max_rows=B * cfg.max_rows,
        # bwd_pairs is per-view, like max_pairs: the batch's active set is
        # the union of the views' active sets (shared, like pairs).
        bwd_pairs=B * cfg.bwd_pairs,
        view_tile_rows=cfg.tiles_y,
    )
    return stacked, bcfg


def render_batch_from_params(
    params: dict,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    cfg: RenderConfig,
    alive: jnp.ndarray | None = None,
    uv_taps: jnp.ndarray | None = None,
):
    """Render B views in ONE shared binning + rasterization pass.

    Replaces the per-view loop of the reference training step
    (/root/reference/scripts/train.py:471-527) with a single sort / single
    kernel launch for the whole batch: the B views are stacked into one
    virtual image of B * padded_height rows (view v's splats get their
    TILE rows offset by v * tiles_y; uv stays VIEW-LOCAL and the
    rasterizer wraps tile rows back to view-local pixel rows via
    ``RenderConfig.view_tile_rows`` — exact int32 math, no f32 offset
    rounding), and the projections are concatenated into one B*N "pool" —
    after which the EXISTING single-view binning, pair-feature gather, and
    compositing kernel run unchanged on a derived config with

        height         = B * cfg.padded_height
        max_pairs      = B * cfg.max_pairs  (capacity SHARED across batch)
        view_tile_rows = cfg.tiles_y.

    Tiles never span views, and each view's gaussians keep their relative
    order under the global depth sort, so per-tile compositing runs the
    IDENTICAL math in the identical order as rendering the views one at a
    time (measured <= 1 ulp per pixel; the residual is XLA fusion variance
    between the two graph shapes, not ordering). Pair-capacity overflow
    drops the globally-farthest gaussians across the whole batch (reported
    via aux.num_pairs vs B * cfg.max_pairs, never silent).

    Args:
        c2w: [B, 4, 4] camera-to-world per view.
        fx, fy, cx, cy: [B] per-view intrinsics (array-like).
        alive: optional [N] bool pool mask, shared across views.
        uv_taps: optional [B, N, 2] zeros; grad w.r.t. it gives per-view
            view-space positional gradients (paper-ADC statistic).

    Returns:
        (images [B, H, W, 3], RenderAux) with batched depth/alpha planes
        [B, H, W] and per-view screen_radius [B, N].
    """
    B = c2w.shape[0]
    n = params["pos"].shape[0]
    fx = jnp.broadcast_to(jnp.asarray(fx, jnp.float32), (B,))
    fy = jnp.broadcast_to(jnp.asarray(fy, jnp.float32), (B,))
    cx = jnp.broadcast_to(jnp.asarray(cx, jnp.float32), (B,))
    cy = jnp.broadcast_to(jnp.asarray(cy, jnp.float32), (B,))

    cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
    colors_b = jax.vmap(
        lambda c: evaluate_sh(
            params["f_dc"], params["f_rest"], params["pos"], c
        )
    )(c2w)  # [B, N, 3]

    if uv_taps is None:
        proj_b = jax.vmap(
            lambda c, a, b_, u, w: project_gaussians(
                params["pos"], cov3d, params["opacity_raw"], c, a, b_, u, w,
                cfg, extra_valid=alive,
            )
        )(c2w, fx, fy, cx, cy)
    else:
        proj_b = jax.vmap(
            lambda c, a, b_, u, w, tap: project_gaussians(
                params["pos"], cov3d, params["opacity_raw"], c, a, b_, u, w,
                cfg, extra_valid=alive, uv_tap=tap,
            )
        )(c2w, fx, fy, cx, cy, uv_taps)

    stacked, bcfg = stack_view_projections(proj_b, cfg)
    img, aux = rasterize(stacked, colors_b.reshape(B * n, 3), bcfg)

    # [B * padded_height, W, *] -> per-view crops.
    imgs = img.reshape(B, cfg.padded_height, cfg.width, 3)[:, : cfg.height]
    depth = aux.depth.reshape(B, cfg.padded_height, cfg.width)[
        :, : cfg.height
    ]
    alpha = aux.alpha.reshape(B, cfg.padded_height, cfg.width)[
        :, : cfg.height
    ]
    return imgs, aux._replace(
        depth=depth, alpha=alpha, screen_radius=proj_b.radius
    )
