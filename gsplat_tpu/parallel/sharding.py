"""SPMD training/rendering over a ('data', 'tile') mesh.

The reference has no working distributed path (SURVEY §2 P1-P3); this module
is the TPU-native design:

* **data axis** — the global view batch is sharded; every device renders its
  own views; gradients are mean-reduced (`psum`) across the axis.
* **tile axis** — within a view, each device renders one horizontal BAND of
  image tiles. Band rendering reuses the single-device pipeline unchanged by
  shifting the principal point (cy' = cy - band_row0) and shrinking the
  configured height — projection, binning, and compositing then naturally
  restrict to the band. The vertical frustum guard is widened
  (`pix_guard_v`) so splats centered in other bands still composite into
  this one; the resulting image is exactly the single-device image.
* Bands are `all_gather`ed only to evaluate the SSIM loss (the 11x11 window
  crosses band boundaries); the backward of the gather is a scatter, so each
  device backprops only through its own band — `psum` over 'tile' then
  completes the parameter gradient.

Everything is expressed with `jax.shard_map` + explicit collectives so the
communication schedule is visible and portable to multi-host meshes (data on
DCN, tile on ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..config import RenderConfig, TrainConfig
from ..models.gaussians import GaussianPool
from ..ops.losses import compute_loss
from ..render import render_from_params
from ..train.trainer import (
    TrainState,
    _clip_pos_grad,
    _guard_nonfinite,
    apply_sh_warmup,
    make_optimizer,
    sh_warmup_mask,
)
from .mesh import DATA_AXIS, TILE_AXIS


def band_config(cfg: RenderConfig, n_bands: int) -> tuple[RenderConfig, int]:
    """Render config for one horizontal band out of `n_bands`.

    Returns (band_cfg, band_pixel_rows). Bands are tile-row aligned; the last
    band may cover padding rows (cropped after the gather).
    """
    rows = -(-cfg.tiles_y // n_bands)  # tile rows per band
    band_px = rows * cfg.tile
    band_cfg = cfg.with_(
        height=band_px,
        pix_guard_v=cfg.pix_guard + cfg.padded_height,
        # Each band sees ~1/n_bands of the pairs; keep capacity headroom x2.
        max_pairs=max(1024, (2 * cfg.max_pairs) // n_bands),
    )
    return band_cfg, band_px


def render_band(params, c2w, fx, fy, cx, cy, cfg: RenderConfig,
                band_cfg: RenderConfig, band_px: int, alive=None,
                uv_tap=None):
    """Render this device's band of the image (call inside shard_map)."""
    b = jax.lax.axis_index(TILE_AXIS)
    cy_local = cy - (b * band_px).astype(jnp.float32)
    img, aux = render_from_params(
        params, c2w, fx, fy, cx, cy_local, band_cfg, alive=alive,
        uv_tap=uv_tap,
    )
    return img, aux


def gather_bands(band_img: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """all_gather bands along 'tile' -> full [H, W, 3] image (cropped)."""
    full = jax.lax.all_gather(band_img, TILE_AXIS, axis=0, tiled=True)
    return full[: cfg.height]


def make_sharded_train_step(
    render_cfg: RenderConfig,
    train_cfg: TrainConfig,
    mesh: jax.sharding.Mesh,
):
    """Build the jitted SPMD train step.

    Returns step_fn(state, batch) where `batch` leaves have a leading global
    batch axis (sharded over 'data'); the state is replicated.
    """
    tx = make_optimizer(train_cfg)
    n_tile = mesh.shape[TILE_AXIS]
    band_cfg, band_px = band_config(render_cfg, n_tile)
    paper = train_cfg.adc_mode == "paper"

    def device_fn(params, alive, batch):
        n = alive.shape[0]
        b_local = batch["c2w"].shape[0]

        def loss_fn_batched(p, taps):
            # Batched-view shared binning WITHIN the band: all local views'
            # bands render through ONE sort + ONE kernel launch
            # (render.py::render_batch_from_params), then bands all_gather
            # along the row axis exactly like the scan path.
            from ..render import render_batch_from_params

            b = jax.lax.axis_index(TILE_AXIS)
            cy_local = batch["cy"] - (b * band_px).astype(jnp.float32)
            bands, aux = render_batch_from_params(
                p, batch["c2w"], batch["fx"], batch["fy"], batch["cx"],
                cy_local, band_cfg, alive=alive,
                uv_taps=None if not paper else taps,
            )  # [B_local, band_px, W, 3]
            full = jax.lax.all_gather(
                bands, TILE_AXIS, axis=1, tiled=True
            )[:, : render_cfg.height]
            total, comps = compute_loss(
                full, batch["image"], train_cfg.lambda_l1,
                train_cfg.lambda_ssim,
            )
            radii = (
                jax.lax.stop_gradient(aux.screen_radius) if paper else None
            )
            # aux.num_pairs counts the WHOLE local batch (capacity is
            # b_local * band_cfg.max_pairs, reported by step_fn). Packed as
            # [pairs, rows] so the ellipse cull's row-stage demand rides the
            # same pmax reduction (rows is 0 in rect mode).
            demand = jnp.stack([aux.num_pairs, aux.num_rows])
            return total, (comps["l1"], comps["ssim"], demand, radii)

        def loss_fn(p, taps):
            def view_loss(carry, xs):
                view, tap = xs
                band, aux = render_band(
                    p, view["c2w"], view["fx"], view["fy"], view["cx"],
                    view["cy"], render_cfg, band_cfg, band_px, alive=alive,
                    uv_tap=None if not paper else tap,
                )
                img = gather_bands(band, render_cfg)
                total, comps = compute_loss(
                    img, view["image"], train_cfg.lambda_l1,
                    train_cfg.lambda_ssim,
                )
                demand = jnp.stack([aux.num_pairs, aux.num_rows])
                out = (total, comps["l1"], comps["ssim"], demand)
                if paper:
                    out += (jax.lax.stop_gradient(aux.screen_radius),)
                return carry, out

            # No outer remat: the rasterizer's VJP keeps O(pixels)
            # residuals (see train/trainer.py note).
            _, outs = jax.lax.scan(view_loss, 0.0, (batch, taps))
            totals, l1s, ssims, pairs = outs[:4]
            radii = outs[4] if paper else None
            return jnp.mean(totals), (
                jnp.mean(l1s), jnp.mean(ssims), jnp.max(pairs, axis=0), radii
            )

        if train_cfg.batched_render:
            loss_fn = loss_fn_batched

        taps = jnp.zeros((b_local, n, 2), jnp.float32)
        if paper:
            (loss, (l1, ssim, band_pairs, radii)), (grads, tap_grads) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    params, taps
                )
            )
        else:
            (loss, (l1, ssim, band_pairs, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, taps)
        # Band partials -> full gradient; then average over the data axis.
        # pmean (not psum) over 'tile': every tile device evaluates the SAME
        # full-image loss, so each band's cotangent arrives n_tile-scaled
        # through the gather_bands transpose (measured ratio exactly n_tile;
        # Adam's scale invariance hid this, but grad_clip_pos and the ADC's
        # pos_grad statistics must see the true gradient).
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, TILE_AXIS), grads)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        l1 = jax.lax.pmean(l1, DATA_AXIS)
        ssim = jax.lax.pmean(ssim, DATA_AXIS)
        # Worst per-band pair demand across the whole mesh — a band whose
        # demand exceeds band_cfg.max_pairs silently drops splats, so
        # training must SEE it (round-1 VERDICT Weak #7).
        band_pairs = jax.lax.pmax(
            jax.lax.pmax(band_pairs, TILE_AXIS), DATA_AXIS
        )
        if not paper:
            return grads, loss, l1, ssim, band_pairs
        # Paper-ADC statistics (3DGS §5.2), assembled across the mesh to
        # match the single-device convention (batch-MEAN loss, so per-view
        # tap grads carry a 1/B factor):
        # * view-space gradient: bands combine with pmean over 'tile'
        #   (measured: per-device tap cotangents arrive n_tile-scaled
        #   through the gather_bands transpose — the pmean yields exactly
        #   the single-device per-view gradient), then pmean over 'data'
        #   restores the global-batch 1/B scale.
        # * visibility: a gaussian is visible in a view if any band saw a
        #   positive screen radius (pmax over 'tile' BEFORE thresholding);
        #   counts sum over the global batch (psum over 'data').
        tap_view = jax.lax.pmean(tap_grads, TILE_AXIS)  # [B, N, 2]
        # Pixel -> NDC scaling of the statistic (see trainer.py): keeps
        # the paper's 2e-4 threshold meaningful; same factor on every
        # device, so sharded-vs-single equality is preserved.
        ndc = jnp.asarray(
            [render_cfg.width * 0.5, render_cfg.height * 0.5], jnp.float32
        )
        uv_grad_sum = jax.lax.pmean(
            jnp.sum(jnp.linalg.norm(tap_view * ndc, axis=-1), axis=0),
            DATA_AXIS,
        )  # [N]
        radii_view = jax.lax.pmax(radii, TILE_AXIS)  # [B, N]
        visible = jax.lax.psum(
            jnp.sum((radii_view > 0).astype(jnp.int32), axis=0), DATA_AXIS
        )  # [N]
        max_radius = jax.lax.pmax(jnp.max(radii_view, axis=0), DATA_AXIS)
        return grads, loss, l1, ssim, band_pairs, (
            uv_grad_sum, visible, max_radius
        )

    n_stats = 6 if paper else 5
    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(),) * n_stats,
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch: dict):
        # SH warmup: mask f_rest before the sharded loss; the returned
        # grads are w.r.t. the masked input, so chain the mask back on.
        params_in = apply_sh_warmup(state.pool.params, state.step, train_cfg)
        outs = sharded(params_in, state.pool.alive, batch)
        grads, loss, l1, ssim, band_pairs = outs[:5]
        _m = sh_warmup_mask(state.step, train_cfg)
        if _m is not None:
            grads = {**grads, "f_rest": grads["f_rest"] * _m}
        paper_stats = outs[5] if paper else None
        grads = _clip_pos_grad(grads, train_cfg.grad_clip_pos)
        grads = jax.tree.map(
            lambda g: jnp.where(
                state.pool.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0
            ),
            grads,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.pool.params)
        params = optax.apply_updates(state.pool.params, updates)
        # Batched render shares ONE pair capacity across the device's local
        # views, so the reported capacity scales with the local batch.
        local_b = batch["c2w"].shape[0] // mesh.shape[DATA_AXIS]
        cap = band_cfg.max_pairs * (
            local_b if train_cfg.batched_render else 1
        )
        metrics = {"total": loss, "l1": l1, "ssim": ssim,
                   "pos_grad": grads["pos"],
                   "max_band_pairs": band_pairs[0],
                   "band_pair_capacity": jnp.int32(cap)}
        if band_cfg.cull_mode == "ellipse":
            metrics["row_demand"] = band_pairs[1]
            metrics["row_capacity"] = jnp.int32(
                band_cfg.row_capacity
                * (local_b if train_cfg.batched_render else 1)
            )
        if paper:
            metrics["uv_grad_sum"], metrics["visible"], \
                metrics["max_radius"] = paper_stats
        if train_cfg.nan_guard:
            params, opt_state, skipped = _guard_nonfinite(
                loss, grads, params, state.pool.params,
                opt_state, state.opt_state,
            )
            metrics["nonfinite_skipped"] = skipped
        new_state = TrainState(
            pool=GaussianPool(params=params, alive=state.pool.alive),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return step_fn


def make_gauss_sharded_train_step(
    render_cfg: RenderConfig,
    train_cfg: TrainConfig,
    mesh: jax.sharding.Mesh,
    ring: bool = False,
    ring_capacity: int | None = None,
):
    """SPMD train step with the Gaussian POOL sharded over the 'tile' axis.

    The scale path for large scenes (SURVEY §5.7): parameters, gradients and
    optimizer state are all sharded over the capacity axis (ZeRO-style —
    per-device state shrinks 1/T), and the N-heavy stages (covariance, SH,
    projection) run on local shards only. Each device projects ITS gaussians,
    the compact per-gaussian screen features (16 floats vs 52+ parameter +
    104 optimizer floats) are all-gathered over 'tile' (ICI), and each device
    rasterizes its pixel band of the full set. The all_gather's transpose is
    a reduce-scatter, so per-gaussian gradients land pre-sharded.

    State layout contract: every pool/optimizer leaf with a leading capacity
    dim is sharded P(TILE_AXIS) on dim 0; batch leaves are P(DATA_AXIS);
    use `shard_train_state` to lay out an existing state.
    """
    from ..ops.binning import bin_gaussians
    from ..ops.gaussian import build_cov3d_packed
    from ..ops.projection import project_gaussians
    from ..ops.rasterize import rasterize_binned
    from ..ops.sh import evaluate_sh

    if train_cfg.batched_render and ring:
        raise ValueError(
            "batched_render with ring-streamed gaussian exchange is not "
            "implemented (the ring scan is per-view); use the all_gather "
            "exchange (gauss_sharded=True) or batched_render=False"
        )
    tx = make_optimizer(train_cfg)
    n_tile = mesh.shape[TILE_AXIS]
    band_cfg, band_px = band_config(render_cfg, n_tile)

    band_rows = band_px // render_cfg.tile

    def band_localize(proj_in, row0):
        """Shift pixel v / tile rows into this band; drop non-overlapping."""
        tmin_y = proj_in.tile_min[:, 1] - row0
        tmax_y = proj_in.tile_max[:, 1] - row0
        valid = proj_in.valid & (tmax_y >= 0) & (tmin_y <= band_rows - 1)
        tmin_y = jnp.where(valid, jnp.clip(tmin_y, 0, band_rows - 1), 0)
        tmax_y = jnp.where(valid, jnp.clip(tmax_y, 0, band_rows - 1), -1)
        uv = proj_in.uv - jnp.stack(
            [jnp.zeros((), jnp.float32),
             (row0 * render_cfg.tile).astype(jnp.float32)]
        )[None, :]
        return proj_in._replace(
            uv=uv,
            valid=valid,
            tile_min=jnp.stack([proj_in.tile_min[:, 0], tmin_y], axis=-1),
            tile_max=jnp.stack([proj_in.tile_max[:, 0], tmax_y], axis=-1),
        )

    def collect_all_gather(proj, colors, row0):
        """Baseline exchange: all_gather the full projected set (its
        transpose is a psum-scatter, so grads return shard-local)."""
        proj_full, colors_full = jax.tree.map(
            lambda x: jax.lax.all_gather(x, TILE_AXIS, axis=0, tiled=True),
            (proj, colors),
        )
        return band_localize(proj_full, row0), colors_full, jnp.int32(0)

    def collect_ring(proj, colors, row0):
        """Ring exchange (SURVEY §5.7/§7.6): stream gaussian shard blocks
        around the 'tile' ring with ppermute, keeping ONLY the gaussians
        whose splats reach this device's band, compacted into a fixed
        `ring_capacity` buffer. Per-device working-set memory drops from
        O(N) to O(ring_capacity); overflow (band demand > capacity) is
        returned for reporting, never silent. Depth ordering across shards
        is free: binning globally depth-sorts whatever order the buffer
        holds.

        Backward: scatter transposes to gather, ppermute to the reverse
        ring — gradients stream back to the owning shard automatically.
        """
        n_local = proj.depth.shape[0]
        cap = ring_capacity if ring_capacity is not None else n_local * n_tile
        perm = [(i, (i + 1) % n_tile) for i in range(n_tile)]

        def init_buf(leaf, fill, dtype=None):
            return jnp.full((cap,) + leaf.shape[1:], fill,
                            dtype or leaf.dtype)

        bufs = (
            proj._replace(
                uv=init_buf(proj.uv, 0.0),
                depth=init_buf(proj.depth, 0.0),
                conic=init_buf(proj.conic, 0.0),
                opacity=init_buf(proj.opacity, 0.0),
                radius=init_buf(proj.radius, 0),
                tile_min=init_buf(proj.tile_min, 0),
                tile_max=init_buf(proj.tile_max, -1),
                valid=init_buf(proj.valid, False),
            ),
            init_buf(colors, 0.0),
        )

        def ring_step(carry, _):
            bufs, count, cur_proj, cur_col = carry
            piece = band_localize(cur_proj, row0)
            sel = piece.valid
            k = count + jnp.cumsum(sel.astype(jnp.int32)) - 1
            dest = jnp.where(sel & (k < cap), k, cap)

            def put(buf, vals):
                if vals.ndim == 1:
                    return buf.at[dest].set(vals, mode="drop")
                return buf.at[dest].set(vals, mode="drop")

            new_bufs = jax.tree.map(put, bufs, (piece, cur_col))
            count = count + jnp.sum(sel.astype(jnp.int32))
            nxt_proj, nxt_col = jax.lax.ppermute(
                (cur_proj, cur_col), TILE_AXIS, perm
            )
            return (new_bufs, count, nxt_proj, nxt_col), None

        (bufs, demand, _, _), _ = jax.lax.scan(
            ring_step, (bufs, jnp.int32(0), proj, colors), None,
            length=n_tile,
        )
        proj_band, colors_band = bufs
        overflow = jnp.maximum(demand - cap, 0)
        return proj_band, colors_band, overflow

    paper = train_cfg.adc_mode == "paper"

    def render_band_gauss_sharded(params, alive, c2w, fx, fy, cx, cy,
                                  uv_tap=None):
        """Project the LOCAL gaussian shard, exchange over 'tile', render
        my band.

        Projection MUST use the full-frame camera (every tile-device holds a
        different gaussian shard, so projecting against per-band cameras
        would gather an inconsistent mix); the exchanged screen-space data
        is then localized to this device's band by shifting v / tile rows.
        """
        cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
        colors = evaluate_sh(
            params["f_dc"], params["f_rest"], params["pos"], c2w
        )
        proj = project_gaussians(
            params["pos"], cov3d, params["opacity_raw"], c2w,
            fx, fy, cx, cy, render_cfg, extra_valid=alive, uv_tap=uv_tap,
        )
        b = jax.lax.axis_index(TILE_AXIS)
        row0 = (b * band_rows).astype(jnp.int32)
        collect = collect_ring if ring else collect_all_gather
        proj_band, colors_band, ring_overflow = collect(proj, colors, row0)
        binning = bin_gaussians(proj_band, band_cfg)
        img, _ = rasterize_binned(proj_band, colors_band, binning, band_cfg)
        # radius is the LOCAL shard's full-frame screen radius (computed
        # before band localization) — exactly the per-view visibility /
        # screen-size statistic the paper ADC wants, already shard-local.
        demand = jnp.stack([binning.num_pairs, binning.num_rows])
        return img, demand, ring_overflow, proj.radius

    def device_fn(params, alive, batch):
        n_local = alive.shape[0]
        b_local = batch["c2w"].shape[0]

        def loss_fn_batched(p, taps):
            """All local views at once: ONE projection vmap, ONE [B, ...]
            all_gather over 'tile' (bigger ICI messages than B per-view
            gathers), ONE shared binning sort + kernel launch for the
            stacked per-view bands (render.py::stack_view_projections)."""
            from ..render import stack_view_projections

            cov3d = build_cov3d_packed(p["scale_raw"], p["q_raw"])
            colors_b = jax.vmap(
                lambda c: evaluate_sh(p["f_dc"], p["f_rest"], p["pos"], c)
            )(batch["c2w"])  # [B, n_local, 3]
            if paper:
                proj_b = jax.vmap(
                    lambda c, f1, f2, u, v, tap: project_gaussians(
                        p["pos"], cov3d, p["opacity_raw"], c, f1, f2, u, v,
                        render_cfg, extra_valid=alive, uv_tap=tap,
                    )
                )(batch["c2w"], batch["fx"], batch["fy"], batch["cx"],
                  batch["cy"], taps)
            else:
                proj_b = jax.vmap(
                    lambda c, f1, f2, u, v: project_gaussians(
                        p["pos"], cov3d, p["opacity_raw"], c, f1, f2, u, v,
                        render_cfg, extra_valid=alive,
                    )
                )(batch["c2w"], batch["fx"], batch["fy"], batch["cx"],
                  batch["cy"])
            radii = jax.lax.stop_gradient(proj_b.radius)  # [B, n_local]
            b = jax.lax.axis_index(TILE_AXIS)
            row0 = (b * band_rows).astype(jnp.int32)
            # Exchange the whole batch in one collective (transpose is a
            # psum-scatter, so grads return shard-local exactly like the
            # per-view path).
            proj_full, colors_full = jax.tree.map(
                lambda x: jax.lax.all_gather(
                    x, TILE_AXIS, axis=1, tiled=True
                ),
                (proj_b, colors_b),
            )
            proj_band = jax.vmap(band_localize, in_axes=(0, None))(
                proj_full, row0
            )
            stacked, bcfg = stack_view_projections(proj_band, band_cfg)
            ng = proj_full.uv.shape[1]
            binning = bin_gaussians(stacked, bcfg)
            img, _ = rasterize_binned(
                stacked, colors_full.reshape(b_local * ng, 3), binning, bcfg
            )
            bands = img.reshape(
                b_local, band_cfg.padded_height, render_cfg.width, 3
            )[:, :band_px]
            full = jax.lax.all_gather(
                bands, TILE_AXIS, axis=1, tiled=True
            )[:, : render_cfg.height]
            total, comps = compute_loss(
                full, batch["image"], train_cfg.lambda_l1,
                train_cfg.lambda_ssim,
            )
            # Whole-batch [pair, row] demand vs the b_local * band capacity
            # (reported scaled by step_fn); no ring in the batched path.
            return total, (
                comps["l1"], comps["ssim"],
                jnp.stack([binning.num_pairs, binning.num_rows]),
                jnp.int32(0), radii if paper else None,
            )

        def loss_fn(p, taps):
            def view_loss(carry, xs):
                view, tap = xs
                band, n_pairs, ring_ovf, radius = render_band_gauss_sharded(
                    p, alive, view["c2w"], view["fx"], view["fy"],
                    view["cx"], view["cy"],
                    uv_tap=None if not paper else tap,
                )
                img = gather_bands(band, render_cfg)
                total, comps = compute_loss(
                    img, view["image"], train_cfg.lambda_l1,
                    train_cfg.lambda_ssim,
                )
                out = (total, comps["l1"], comps["ssim"], n_pairs, ring_ovf)
                if paper:
                    out += (jax.lax.stop_gradient(radius),)
                return carry, out

            # No outer remat: the rasterizer's VJP keeps O(pixels)
            # residuals (see train/trainer.py note).
            _, outs = jax.lax.scan(view_loss, 0.0, (batch, taps))
            totals, l1s, ssims, pairs, ring_ovfs = outs[:5]
            radii = outs[5] if paper else None
            return jnp.mean(totals), (
                jnp.mean(l1s), jnp.mean(ssims), jnp.max(pairs, axis=0),
                jnp.max(ring_ovfs), radii,
            )

        if train_cfg.batched_render:
            loss_fn = loss_fn_batched

        taps = jnp.zeros((b_local, n_local, 2), jnp.float32)
        if paper:
            (loss, (l1, ssim, band_pairs, ring_ovf, radii)), (
                grads, tap_grads
            ) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, taps
            )
        else:
            (loss, (l1, ssim, band_pairs, ring_ovf, _)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params, taps)
            )
        # Grads are already shard-local along the capacity axis (all_gather
        # transpose), but n_tile-scaled: every tile device evaluates the SAME
        # full-image loss, so the exchange transpose sums n_tile identical
        # cotangent contributions (measured ratio exactly n_tile; Adam hid
        # it, but clipping and ADC statistics must see the true gradient).
        # Then average over the data axis.
        grads = jax.tree.map(lambda g: g / n_tile, grads)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        l1 = jax.lax.pmean(l1, DATA_AXIS)
        ssim = jax.lax.pmean(ssim, DATA_AXIS)

        # Position-grad clip needs the GLOBAL norm across shards.
        gp = grads["pos"]
        norm_sq = jax.lax.psum(jnp.sum(gp * gp), TILE_AXIS)
        scale = jnp.minimum(
            1.0, train_cfg.grad_clip_pos / (jnp.sqrt(norm_sq) + 1e-6)
        )
        grads = dict(grads)
        grads["pos"] = gp * scale
        band_pairs = jax.lax.pmax(
            jax.lax.pmax(band_pairs, TILE_AXIS), DATA_AXIS
        )
        ring_ovf = jax.lax.pmax(
            jax.lax.pmax(ring_ovf, TILE_AXIS), DATA_AXIS
        )
        if not paper:
            return grads, loss, l1, ssim, band_pairs, ring_ovf
        # Paper-ADC statistics, SHARD-LOCAL [N_local] (same P(TILE) layout
        # as the pool): tap grads arrive through the exchange collective's
        # transpose n_tile-scaled (same mechanism as the param grads above);
        # radius comes from the local full-frame projection. pmean over
        # 'data' restores the single-device global-batch 1/B loss scale.
        ndc = jnp.asarray(
            [render_cfg.width * 0.5, render_cfg.height * 0.5], jnp.float32
        )  # pixel -> NDC statistic scale (see trainer.py)
        uv_grad_sum = jax.lax.pmean(
            jnp.sum(jnp.linalg.norm(tap_grads * ndc / n_tile, axis=-1),
                    axis=0),
            DATA_AXIS,
        )
        visible = jax.lax.psum(
            jnp.sum((radii > 0).astype(jnp.int32), axis=0), DATA_AXIS
        )
        max_radius = jax.lax.pmax(jnp.max(radii, axis=0), DATA_AXIS)
        return grads, loss, l1, ssim, band_pairs, ring_ovf, (
            uv_grad_sum, visible, max_radius
        )

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(DATA_AXIS)),
        out_specs=(P(TILE_AXIS), P(), P(), P(), P(), P())
        + ((P(TILE_AXIS),) if paper else ()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batch: dict):
        # SH warmup: mask f_rest before the sharded loss; the returned
        # grads are w.r.t. the masked input, so chain the mask back on.
        params_in = apply_sh_warmup(state.pool.params, state.step, train_cfg)
        outs = sharded(params_in, state.pool.alive, batch)
        grads, loss, l1, ssim, band_pairs, ring_ovf = outs[:6]
        _m = sh_warmup_mask(state.step, train_cfg)
        if _m is not None:
            grads = {**grads, "f_rest": grads["f_rest"] * _m}
        paper_stats = outs[6] if paper else None
        grads = jax.tree.map(
            lambda g: jnp.where(
                state.pool.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0
            ),
            grads,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.pool.params)
        params = optax.apply_updates(state.pool.params, updates)
        local_b = batch["c2w"].shape[0] // mesh.shape[DATA_AXIS]
        cap = band_cfg.max_pairs * (
            local_b if train_cfg.batched_render else 1
        )
        metrics = {"total": loss, "l1": l1, "ssim": ssim,
                   "pos_grad": grads["pos"],
                   "max_band_pairs": band_pairs[0],
                   "band_pair_capacity": jnp.int32(cap),
                   "ring_overflow": ring_ovf}
        if band_cfg.cull_mode == "ellipse":
            metrics["row_demand"] = band_pairs[1]
            metrics["row_capacity"] = jnp.int32(
                band_cfg.row_capacity
                * (local_b if train_cfg.batched_render else 1)
            )
        if paper:
            metrics["uv_grad_sum"], metrics["visible"], \
                metrics["max_radius"] = paper_stats
        if train_cfg.nan_guard:
            params, opt_state, skipped = _guard_nonfinite(
                loss, grads, params, state.pool.params,
                opt_state, state.opt_state,
            )
            metrics["nonfinite_skipped"] = skipped
        new_state = TrainState(
            pool=GaussianPool(params=params, alive=state.pool.alive),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return step_fn


def shard_train_state(state: TrainState, mesh: jax.sharding.Mesh) -> TrainState:
    """Lay out a train state for `make_gauss_sharded_train_step`.

    Every leaf whose leading dim is the pool capacity is sharded over the
    'tile' axis; everything else is replicated.
    """
    cap = state.pool.capacity
    shard = jax.sharding.NamedSharding(mesh, P(TILE_AXIS))
    repl = jax.sharding.NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return jax.device_put(leaf, shard)
        return jax.device_put(leaf, repl)

    return jax.tree.map(place, state)


def make_sharded_batch_render(
    render_cfg: RenderConfig, mesh: jax.sharding.Mesh
):
    """Data x band parallel inference: B poses -> [B, H, W, 3] images.

    The multi-chip serving path (the reference's orbit/FPS loop,
    /root/reference/scripts/render_trained.py:319-358, is single-GPU): the
    pose batch is sharded over 'data' (frame throughput scales with the data
    axis) and each frame is split into horizontal tile bands over 'tile'
    (per-frame latency scales with the band axis). Each device renders its
    local poses' bands through the shared-binning batched path — ONE sort +
    ONE kernel launch per device per call — then bands all_gather along the
    row axis. Results match per-pose single-device rendering exactly
    (tests/test_sharding.py::test_sharded_batch_render_matches_single).

    Returns fn(params, alive, c2w_b, fx, fy, cx, cy) with c2w_b [B, 4, 4],
    B a multiple of the mesh's 'data' size; intrinsics may be scalars
    (shared) or per-view [B] arrays.
    """
    n_tile = mesh.shape[TILE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    band_cfg, band_px = band_config(render_cfg, n_tile)

    def device_fn(params, alive, c2w, fx, fy, cx, cy):
        from ..render import render_batch_from_params

        b = jax.lax.axis_index(TILE_AXIS)
        cy_local = cy - (b * band_px).astype(jnp.float32)
        bands, _ = render_batch_from_params(
            params, c2w, fx, fy, cx, cy_local, band_cfg,
            alive=alive,
        )  # [B_local, band_px(+pad), W, 3]
        full = jax.lax.all_gather(bands, TILE_AXIS, axis=1, tiled=True)
        return full[:, : render_cfg.height]

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )

    @jax.jit
    def render_fn(params, alive, c2w_b, fx, fy, cx, cy):
        B = c2w_b.shape[0]
        if B % n_data:
            raise ValueError(
                f"pose batch {B} not divisible by the mesh's "
                f"data axis ({n_data})"
            )

        def bc(x):
            x = jnp.asarray(x, jnp.float32)
            return jnp.broadcast_to(x, (B,)) if x.ndim == 0 else x

        return sharded(
            params, alive, c2w_b, bc(fx), bc(fy), bc(cx), bc(cy)
        )

    return render_fn


def make_sharded_render(render_cfg: RenderConfig, mesh: jax.sharding.Mesh):
    """Band-parallel inference renderer: (params, alive, camera) -> image."""
    n_tile = mesh.shape[TILE_AXIS]
    band_cfg, band_px = band_config(render_cfg, n_tile)

    def device_fn(params, alive, c2w, fx, fy, cx, cy):
        band, _ = render_band(
            params, c2w, fx[0], fy[0], cx[0], cy[0], render_cfg, band_cfg,
            band_px, alive=alive,
        )
        return gather_bands(band, render_cfg)

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def render_fn(params, alive, c2w, fx, fy, cx, cy):
        return sharded(
            params, alive, c2w,
            jnp.atleast_1d(fx), jnp.atleast_1d(fy),
            jnp.atleast_1d(cx), jnp.atleast_1d(cy),
        )

    return render_fn
