"""Pallas TPU rasterization kernels: fused tile compositing, forward + VJP.

This is the TPU-native replacement for the reference's python tile loop and
its autograd backward (/root/reference/gaussian_splatting/render.py:325-410)
— the component SURVEY.md §2 marks ★★. Design:

* The binning stage (ops/binning.py) emits a BLOCK-ALIGNED pair list: each
  tile's depth-ordered gaussians occupy consecutive blocks of
  ``cfg.pair_block`` pairs, so one grid step processes exactly one
  (tile, pair-block) and blocks of the same tile are consecutive grid steps.
* The kernel's grid walks pair blocks; the OUTPUT block (one tile's pixels)
  is revisited across consecutive steps, acting as the on-chip accumulator:
  rows 0-2 hold the composited RGB, row 3 holds the running transmittance.
  Pallas keeps the block in VMEM until the owning tile changes — the
  standard grid-reduction pattern, with zero HBM traffic between blocks.
* Transmittance is composed in log space: T_i = T_carry * exp(cumsum
  log1p(-alpha)); mathematically identical to the reference's shifted
  cumprod (render.py:379-383) and cheap on the VPU.
* EARLY EXIT: once every pixel of a tile saturates (T <= transmittance_min)
  remaining blocks of that tile are skipped — the dominant win over the XLA
  fallback, which always composites the full static capacity.
* The BACKWARD kernel re-walks the same blocks front-to-back, reconstructing
  T_i and the prefix color sum; the suffix sum needed for dL/dalpha_i is
  S_i = C_final - prefix_i (C_final comes from the forward output), so
  NOTHING per-pair is stored between passes — O(pixels) residuals instead of
  the reference's O(pairs x pixels) autograd tape (its OOM mode).

Feature packing — FEATURE-MAJOR [16, padded_pairs] (a [pairs, 16] array
gets the TPU T(8,128) layout: 16 lanes padded to 128 = 8x physical HBM
amplification on every kernel block DMA; feature-major rows are dense).
Rows (only 10 used):
    0:u  1:v  2:conic_a  3:conic_b  4:conic_c  5:opacity  6:r  7:g  8:b  9:depth
Gradient packing mirrors it, so the pair-feature gather's autodiff (an XLA
scatter-add) routes per-pair grads back to per-gaussian grads for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig

FEAT_WIDTH = 16

# Per-block metadata is ONE packed int32 in SMEM (scalar prefetch):
#     meta = (owning_tile << 2) | (dead << 1) | first
# with first = 1 on a tile's first block, dead = 1 on static-capacity
# headroom blocks past the real pair demand (all-zero features; the
# kernels skip them outright). One array instead of the former two
# (block_tile, block_first) halves the scalar-prefetch SMEM footprint —
# the 1 MB SMEM budget is what capped batched rendering and demand-sized
# capacities at 1080p scale (round-3 queue: "Used 1.25M of 1.00M").
META_SHIFT = 2
META_FIRST = 1
META_DEAD = 2


def pack_block_meta(block_tile, block_first):
    """(tile, first/dead) arrays -> packed meta (block_first: 1 first,
    0 continuation, -1 dead; tile must already be clipped in-range)."""
    dead = (block_first < 0).astype(jnp.int32)
    first = (block_first == 1).astype(jnp.int32)
    return (block_tile << META_SHIFT) | (dead << 1) | first


def _pixel_grid(t: int, P: int, tiles_x: int, tile_id, rows_mod: int = 0):
    """Pixel-center coordinates of a tile's P = t*t pixels.

    Pixel order matches the reference meshgrid(indexing='xy') flatten:
    index = py * t + px  (render.py:325-340).

    rows_mod > 0 (batched-view rendering, RenderConfig.view_tile_rows):
    tile rows wrap every `rows_mod` so each stacked view sees VIEW-LOCAL
    pixel rows — exact int32 math, keeping batched rendering bit-identical
    to per-view rendering.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ox = (tile_id % tiles_x) * t
    ty = tile_id // tiles_x
    if rows_mod:
        ty = ty % rows_mod
    oy = ty * t
    px = (lane % t + ox).astype(jnp.float32)
    py = (lane // t + oy).astype(jnp.float32)
    return px, py


def _tri_matmul(L, x):
    """L [K, K] @ x [..., K, P] -> [..., K, P] (f32, full precision)."""
    return jnp.einsum(
        "ij,...jp->...ip",
        L,
        x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _lower_tri(k: int, strict: bool, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((row > col) if strict else (row >= col)).astype(dtype)


def _cumsum_rows_incl(x):
    """Inclusive cumulative sum along axis 0 of [G, P].

    Mosaic has no native cumsum lowering; a lower-triangular ones matmul on
    the MXU ([G, G] @ [G, P]) is supported and effectively free — the MXU
    runs concurrently with the VPU-bound alpha math (measured: a two-level
    scan with 16x fewer MXU FLOPs was 25% SLOWER end-to-end, and switching
    this matmul from bf16 to f32-highest precision cost nothing).
    """
    G = x.shape[0]
    return _tri_matmul(_lower_tri(G, False, x.dtype), x)


def _transmittance(alpha, T_in, cfg: RenderConfig):
    """Per-row exclusive transmittance for one block.

    Returns (T_excl [G, P], T_out [1, P]) — row i's transmittance BEFORE
    compositing row i, and the block's outgoing transmittance.

    cfg.transmittance_math selects the implementation (see config.py):
    "log" composes in log space on the MXU; "cumprod" is the exact direct
    two-level product of (1 - alpha) with zero transcendentals — the torch
    reference's shifted-cumprod semantics (render.py:379-383).
    """
    G, P = alpha.shape
    if cfg.transmittance_math == "cumprod":
        m = 1.0 - alpha
        R = 8 if G % 8 == 0 else (4 if G % 4 == 0 else 1)
        K = G // R
        mg = m.reshape(K, R, P)
        # Within-group EXCLUSIVE prefixes, built serially (R-1 multiplies);
        # rows assembled with concatenate (no in-kernel scatter — Mosaic).
        parts = [jnp.ones((K, 1, P), jnp.float32)]
        run = mg[:, 0:1, :]
        for j in range(1, R):
            parts.append(run)
            run = run * mg[:, j : j + 1, :]
        within = jnp.concatenate(parts, axis=1) if R > 1 else parts[0]
        gtot = run[:, 0, :]  # [K, P] full group products
        if K == 1:
            T_excl = within.reshape(G, P) * T_in
            return T_excl, T_in * gtot
        gparts = [jnp.ones((1, P), jnp.float32)]
        grun = gtot[0:1, :]
        for k in range(1, K):
            gparts.append(grun)
            grun = grun * gtot[k : k + 1, :]
        gpre = jnp.concatenate(gparts, axis=0)  # [K, P] exclusive
        T_excl = (within * gpre[:, None, :]).reshape(G, P) * T_in
        return T_excl, T_in * grun  # grun = full G-row product
    s = jnp.log1p(-alpha)
    cum = _cumsum_rows_incl(s)
    T_excl = jnp.exp(cum - s) * T_in
    return T_excl, T_in * jnp.exp(jnp.sum(s, axis=0, keepdims=True))


def _block_alpha(feats, px, py, cfg: RenderConfig):
    """Per-(pair, pixel) alpha for one block. feats [G, 16] -> alpha [G, P].

    Math parity with the reference python tile loop (render.py:351-374):
    q = A du^2 + 2 B du dv + C dv^2; g = exp(-q/2) masked at chi2_clip;
    alpha = min(op * g, alpha_max) zeroed below alpha_cutoff.
    Returns (alpha, du, dv, g, a_raw) — the extras feed the backward pass.
    """
    u = feats[:, 0:1]
    v = feats[:, 1:2]
    ca = feats[:, 2:3]
    cb = feats[:, 3:4]
    cc = feats[:, 4:5]
    op = feats[:, 5:6]

    du = px - u  # [G, P]
    dv = py - v
    q = ca * du * du + 2.0 * cb * du * dv + cc * dv * dv
    g = jnp.where(q <= cfg.chi2_clip, jnp.exp(-0.5 * q), 0.0)
    a_raw = op * g
    a_clamped = jnp.minimum(a_raw, cfg.alpha_max)
    alpha = jnp.where(a_clamped >= cfg.alpha_cutoff, a_clamped, 0.0)
    return alpha, du, dv, g, a_raw


def _fwd_kernel(block_meta_ref, feat_ref, out_ref, *, cfg: RenderConfig):
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    state = meta & 3  # META_FIRST = first block, 0 = continuation, META_DEAD
    P = cfg.tile * cfg.tile

    garbage_free = state == META_FIRST  # out_ref holds garbage at first visit
    T_in = jnp.where(
        garbage_free, jnp.ones((1, P), jnp.float32), out_ref[0, 4:5, :]
    )
    rgb_in = jnp.where(
        garbage_free, jnp.zeros((4, P), jnp.float32), out_ref[0, 0:4, :]
    )

    # Skip saturated tiles (every pixel's transmittance below threshold)
    # and DEAD blocks (static-capacity headroom past the actual pair
    # demand — all-zero features, nothing to composite).
    @pl.when(
        (state == META_FIRST)
        | ((state == 0) & (jnp.max(T_in) > cfg.transmittance_min))
    )
    def _():
        feats = feat_ref[...].T  # [16, G] feature-major block -> [G, 16]
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id, cfg.view_tile_rows)
        alpha, *_ = _block_alpha(feats, px, py, cfg)

        # T_i = T_carry * prod_{j<i}(1 - alpha_j).
        T_excl, T_out = _transmittance(alpha, T_in, cfg)  # [G, P], [1, P]
        alive = T_excl > cfg.transmittance_min
        w = jnp.where(alive, alpha * T_excl, 0.0)

        chans = feats[:, 6:10]  # [G, 4]: rgb + depth
        contrib = jax.lax.dot_general(
            chans, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [4, P]
        out_ref[0, 0:4, :] = rgb_in + contrib
        out_ref[0, 4:5, :] = T_out
        # Row 5: ACTIVE block count for this tile (blocks the early-exit
        # did not skip). Skipped/dead blocks never write, so the final
        # value is the per-tile backward-pass block demand — the backward
        # kernel emits exact zeros for skipped blocks, and the
        # saturation-compacted VJP reduction (cfg.bwd_pairs,
        # rasterize.gather_pair_features) needs this demand reported
        # (RenderAux.bwd_demand) to size its static capacity.
        cnt_in = out_ref[0, 5:6, :]
        out_ref[0, 5:6, :] = jnp.where(garbage_free, 1.0, cnt_in + 1.0)


def _bwd_kernel(block_meta_ref, feat_ref, fwd_ref, gout_ref,
                dfeat_ref, carry_ref, *, cfg: RenderConfig):
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    state = meta & 3
    G = cfg.pair_block
    P = cfg.tile * cfg.tile

    T_in = jnp.where(
        state == META_FIRST, jnp.ones((1, P), jnp.float32), carry_ref[4:5, :]
    )
    prefix_in = jnp.where(
        state == META_FIRST, jnp.zeros((4, P), jnp.float32), carry_ref[0:4, :]
    )

    active = (state == META_FIRST) | (
        (state == 0) & (jnp.max(T_in) > cfg.transmittance_min)
    )

    @pl.when(active)
    def _():
        feats = feat_ref[...].T  # [16, G] feature-major block -> [G, 16]
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id, cfg.view_tile_rows)
        alpha, du, dv, g, a_raw = _block_alpha(feats, px, py, cfg)
        ca = feats[:, 2:3]
        cb = feats[:, 3:4]
        op = feats[:, 5:6]
        rgb = feats[:, 6:10]  # [G, 4]: rgb + depth

        T_excl, T_out = _transmittance(alpha, T_in, cfg)  # [G, P], [1, P]
        alive = T_excl > cfg.transmittance_min
        w = jnp.where(alive, alpha * T_excl, 0.0)  # [G, P]

        gC = gout_ref[0, 0:4, :]  # [4, P] cotangent of rgb + depth
        gT = gout_ref[0, 4:5, :]  # [1, P] cotangent of final transmittance
        C_final = fwd_ref[0, 0:4, :]  # [4, P]
        T_final = fwd_ref[0, 4:5, :]

        # d rgb: dL/drgb[i, c] = sum_p gC[c, p] * w[i, p]
        drgb = jax.lax.dot_general(
            w, gC, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, 3]

        # Prefix color sums INCLUDING row i: prefix_i = prefix_in + cumsum.
        # gdotc[i, p] = sum_c gC[c, p] * rgb[i, c]
        gdotc = jax.lax.dot_general(
            rgb, gC, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [G, P]
        # gP[i, p] = sum_c gC[c, p] * prefix_incl[c][i, p]; build via cumsum
        # of per-row weighted contributions.
        gP_in = jnp.sum(gC * prefix_in, axis=0)[None, :]  # [1, P]
        gS_full = jnp.sum(gC * C_final, axis=0)[None, :]  # [1, P]
        gP_incl = gP_in + _cumsum_rows_incl(gdotc * w)  # [G, P]
        gS = gS_full - gP_incl  # sum_c gC * S_i  (suffix after row i)

        # dL/dalpha_i = sum_c gC (rgb_i T_i alive) - (gS + gT T_final)/(1-a)
        one_minus = jnp.maximum(1.0 - alpha, 1.0 - cfg.alpha_max)
        dalpha = jnp.where(alive, gdotc * T_excl, 0.0) - (
            gS + gT * T_final
        ) / one_minus
        # alpha gates: min() clamp and the cutoff zeroing.
        gate = (a_raw < cfg.alpha_max) & (
            jnp.minimum(a_raw, cfg.alpha_max) >= cfg.alpha_cutoff
        )
        ga = jnp.where(gate, dalpha, 0.0)  # d a_raw

        dop_px = ga * g  # [G, P]
        dg = ga * op
        dq = dg * (-0.5) * g  # g = exp(-q/2) (zero where q > chi2 since g=0)

        dca = jnp.sum(dq * du * du, axis=1, keepdims=True)
        dcb = jnp.sum(2.0 * dq * du * dv, axis=1, keepdims=True)
        dcc = jnp.sum(dq * dv * dv, axis=1, keepdims=True)
        cc_ = feats[:, 4:5]
        ddu = dq * (2.0 * ca * du + 2.0 * cb * dv)
        ddv = dq * (2.0 * cc_ * dv + 2.0 * cb * du)
        du_ = -jnp.sum(ddu, axis=1, keepdims=True)  # du = px-u -> d/du = -1
        dv_ = -jnp.sum(ddv, axis=1, keepdims=True)
        dop = jnp.sum(dop_px, axis=1, keepdims=True)

        dfeat_ref[...] = jnp.concatenate(
            [
                du_, dv_, dca, dcb, dcc, dop, drgb,
                jnp.zeros((G, FEAT_WIDTH - 10), jnp.float32),
            ],
            axis=1,
        ).T

        # Advance the carry.
        carry_ref[0:4, :] = prefix_in + jax.lax.dot_general(
            rgb, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        carry_ref[4:5, :] = T_out

    @pl.when(jnp.logical_not(active))
    def _():
        dfeat_ref[...] = jnp.zeros((FEAT_WIDTH, G), jnp.float32)


def _fwd_pallas(pair_feat, block_meta, cfg: RenderConfig):
    P = cfg.tile * cfg.tile
    num_blocks = cfg.num_trunc_blocks
    G = cfg.pair_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, G), lambda b, bm: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, P), lambda b, bm: (bm[b] >> META_SHIFT, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.num_tiles, 8, P), jnp.float32),
        interpret=_use_interpret(),
    )(block_meta, pair_feat)


def _bwd_pallas(pair_feat, block_meta, fwd_out, gout, cfg: RenderConfig):
    """Backward kernel over `block_meta.shape[0]` blocks.

    The block list may be the full binning grid or a COMPACTED subset of
    it (rasterize._composite_gathered: only the forward's active blocks) —
    the kernel only requires that each tile's blocks are consecutive, in
    depth order, starting with a META_FIRST block.
    """
    P = cfg.tile * cfg.tile
    num_blocks = block_meta.shape[0]
    G = cfg.pair_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, G), lambda b, bm: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda b, bm: (bm[b] >> META_SHIFT, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda b, bm: (bm[b] >> META_SHIFT, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FEAT_WIDTH, G), lambda b, bm: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, P), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT_WIDTH, num_blocks * G),
                                       jnp.float32),
        interpret=_use_interpret(),
    )(block_meta, pair_feat, fwd_out, gout)


def _use_interpret() -> bool:
    """Interpret mode on non-TPU backends (CPU tests run the same code)."""
    return jax.default_backend() != "tpu"


def _composite_impl(pair_feat, block_meta, cfg: RenderConfig):
    """Composite the block-aligned pair list into per-tile pixel buffers.

    Args:
        pair_feat: [16, padded_pairs] f32 feature-major per-pair features
            (see module doc); padding slots must be all-zero.
        block_meta: [num_pair_blocks] int32 packed (tile, dead, first)
            per-block metadata (see ``pack_block_meta``).
        cfg: static render config (non-differentiable).

    Returns:
        [num_tiles, 8, tile*tile] f32: rows 0-2 composited RGB, row 3
        accumulated depth (sum w_i * z_i), row 4 final transmittance.
        Tiles that own no block are NOT written — mask with tile_count > 0
        downstream.
    """
    return _fwd_pallas(pair_feat, block_meta, cfg)


composite_pairs = jax.custom_vjp(_composite_impl, nondiff_argnums=(2,))


def _cp_fwd(pair_feat, block_meta, cfg):
    out = _fwd_pallas(pair_feat, block_meta, cfg)
    return out, (pair_feat, block_meta, out)


def _cp_bwd(cfg, res, gout):
    pair_feat, block_meta, fwd_out = res
    dfeat = _bwd_pallas(pair_feat, block_meta, fwd_out, gout, cfg)
    zero_bm = np.zeros(block_meta.shape, dtype=jax.dtypes.float0)
    return dfeat, zero_bm


composite_pairs.defvjp(_cp_fwd, _cp_bwd)
