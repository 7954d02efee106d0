"""Tile rasterization: depth-sorted alpha compositing of projected Gaussians.

Replaces the reference's python loop over occupied tiles
(/root/reference/gaussian_splatting/render.py:325-410) with a fully-traced
static-shape sweep:

* per-pair features (uv, conic, opacity, color) are gathered ONCE into a flat
  tile-major depth-ordered array, so each tile's gaussians are a contiguous
  slice — gathers become dynamic slices;
* tiles are processed `tile_chunk` at a time inside a `lax.map`, bounding peak
  memory; each chunk is rematerialized (`jax.checkpoint`) in the backward pass
  so autodiff does not keep every [chunk, K, T*T] intermediate alive (the
  reference's OOM mode, SURVEY §3.2);
* compositing math matches the reference exactly: q = A du^2 + 2B du dv +
  C dv^2, g = exp(-q/2) masked at chi2_clip, alpha = min(op*g, alpha_max)
  zeroed below alpha_cutoff, T_i = shifted cumprod(1 - alpha), survivors
  masked at T > transmittance_min, color = sum alpha*T*c, final clip to [0,1].

A dense (every-gaussian-every-pixel) oracle `rasterize_dense` is kept for
tests; tiling only ever *excludes* contributions the chi2 cutoff already
zeroes, so the two agree to float tolerance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import RenderConfig
from .binning import (
    TileBinning,
    bin_gaussians,
    depth_order,
    depth_order_and_rank,
)
from .projection import ProjectedGaussians


class RenderAux(NamedTuple):
    """Extra render outputs: capacity diagnostics (never silently
    truncate) plus depth / alpha planes."""

    num_pairs: jnp.ndarray  # [] int32 true (gaussian, tile) pair count
    pair_capacity: int
    max_tile_count: jnp.ndarray  # [] int32 largest per-tile gaussian count
    per_tile_capacity: int
    depth: jnp.ndarray  # [H, W] accumulated depth (sum w_i * z_i)
    alpha: jnp.ndarray  # [H, W] opacity = 1 - final transmittance
    # Per-gaussian screen radius for this view ([N] int32, 0 = culled);
    # consumed by the paper-style ADC's screen-size pruning.
    screen_radius: jnp.ndarray | None = None
    # Ellipse cull mode only: true (gaussian, tile-row) demand of the
    # two-level expansion's row stage vs its static capacity (overflow drops
    # whole far gaussians — reported here, never silent).
    num_rows: jnp.ndarray | None = None
    row_capacity: int = 0
    # Per-tile rank truncation (cfg.tile_rank_cap): pairs surviving the cap
    # and the block-aligned slot demand vs the static trunc capacity
    # (trunc_demand > trunc_capacity means trailing-tile blocks were
    # dropped — reported, never silent).
    num_pairs_kept: jnp.ndarray | None = None
    trunc_demand: jnp.ndarray | None = None
    trunc_capacity: int = 0
    # Saturation-compacted backward (cfg.bwd_pairs): pair slots whose
    # blocks the forward kernel actually composited (skipped blocks carry
    # exact-zero cotangents and are dropped from the VJP reduction sort).
    # bwd_demand > bwd_capacity means overflow blocks lost their
    # gradients — reported, never silent; fit() auto-grows.
    bwd_demand: jnp.ndarray | None = None
    bwd_capacity: int = 0


def _composite_chunk(feats: jnp.ndarray, mask: jnp.ndarray, cfg: RenderConfig):
    """Composite one chunk of tiles.

    Args:
        feats: [C, K, 9] per-(tile, slot) features:
            (u, v, conic_a, conic_b, conic_c, opacity, r, g, b).
        mask: [C, K] slot validity.
        Returns: [C, T*T, 3] tile colors.
    """
    T = cfg.tile
    P = T * T
    u = feats[..., 0:1]  # [C, K, 1]
    v = feats[..., 1:2]
    ca = feats[..., 2:3]
    cb = feats[..., 3:4]
    cc = feats[..., 4:5]
    op = feats[..., 5:6]
    chans = feats[..., 6:10]  # [C, K, 4]: rgb + depth

    # Pixel centers of each tile in the chunk: stored per-chunk in feats'
    # companion origin array is folded into u/v by the caller (u,v already
    # relative to the tile origin). Pixel order matches the reference
    # meshgrid(indexing='xy') flatten: index = py * T + px.
    px = jnp.arange(P, dtype=feats.dtype) % T  # [P]
    py = jnp.arange(P, dtype=feats.dtype) // T

    du = px[None, None, :] - u  # [C, K, P]
    dv = py[None, None, :] - v
    q = ca * du * du + 2.0 * cb * du * dv + cc * dv * dv
    inside = q <= cfg.chi2_clip
    g = jnp.exp(-0.5 * jnp.minimum(q, cfg.chi2_clip))
    g = jnp.where(inside, g, 0.0)

    alpha = jnp.minimum(op * g, cfg.alpha_max)
    alpha = jnp.where(alpha >= cfg.alpha_cutoff, alpha, 0.0)
    alpha = jnp.where(mask[..., None], alpha, 0.0)

    # Front-to-back transmittance: T_i = prod_{j<i} (1 - alpha_j).
    one_minus = 1.0 - alpha
    trans = jnp.cumprod(one_minus, axis=1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1
    )
    alive = (trans > cfg.transmittance_min).astype(alpha.dtype)
    w = alpha * trans * alive  # [C, K, P]

    # [C, P, K] @ [C, K, 4] -> [C, P, 4] (rgb + depth). HIGHEST precision:
    # the weight sum is the image itself; bf16-truncated weights shift
    # colors ~1e-3. Tiny next to the [C,K,P] elementwise work above.
    out = jnp.einsum("ckp,ckd->cpd", w, chans, precision="highest")
    # Final per-pixel transmittance (for the alpha plane).
    t_final = trans[:, -1, :] * one_minus[:, -1, :]  # [C, P]
    return jnp.concatenate([out, t_final[..., None]], axis=-1)  # [C, P, 5]


def _pair_features(proj: ProjectedGaussians, colors: jnp.ndarray, dtype):
    """[N, 10] per-gaussian features (u, v, conic x3, opacity, rgb, z)."""
    feat = jnp.concatenate(
        [
            proj.uv,
            proj.conic,
            proj.opacity[:, None],
            colors,
            proj.depth[:, None],
        ],
        axis=-1,
    ).astype(dtype)  # [N, 10]
    # Zero invalid rows: masked (not filtered) slots may hold NaN/inf from
    # culled gaussians, and 0-weight * NaN would still poison the composite.
    return jnp.where(proj.valid[:, None], feat, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def gather_pair_features(cap: int, truncated: bool, bwd_cap: int, feat10,
                         pair_slot, gauss_offsets):
    """Expand per-gaussian features to the sorted pair list, [10, padded].

    Forward: one pairs-sized gather through the depth-rank index
    (feat10 is in depth order; pair_slot[q] is the depth rank of sorted
    pair q; padding slots are -1 and come out zero).

    Backward: the naive transpose is a pairs-sized DUPLICATE-index
    scatter-add — measured 63 ms on v5e at 2.6M pairs (and a unique-index
    scatter is 390 ms, a random big-table gather 70 ms: every XLA index op
    on a pairs-sized array loses). Instead we exploit that `lax.sort`
    STREAMS (measured 39 ms carrying 10 f32 payload rows at the same
    scale) and that the reduction is a per-gaussian SUM (within-gaussian
    order is irrelevant):
      1. one multi-operand sort keyed by ``pair_slot`` itself groups the
         per-pair cotangent rows by owning gaussian (padding slots are
         keyed to the tail, where their cotangents are the kernel's
         zeros) — no presort-index payload ever rides the MAIN binning
         sort (each payload row there costs ~2.6 ms at bench scale);
      2. cumsum along the pair axis;
      3. per-gaussian grad = segment difference at `gauss_offsets` (group
         sizes are exactly the per-gaussian footprint counts) — two
         N-sized gathers.
    Replaces autograd through the reference's repeat_interleave expansion
    (/root/reference/gaussian_splatting/render.py:251-281).

    ``truncated`` (per-tile rank truncation, cfg.tile_rank_cap): the pair
    list holds a rank-dependent SUBSET of each gaussian's pairs, so the
    group boundaries are no longer `gauss_offsets`; they are recovered as
    "number of kept pairs with slot < i" via one
    searchsorted(method='sort') of arange(N+1) over the sorted keys (a
    sort, not a per-query scan; the N-query scan form is the
    measured-catastrophic one). Dropped pairs contribute exactly zero
    gradient, matching their zero contribution to the truncated forward.

    ``bwd_cap`` (cfg.bwd_pairs, round 5): saturation-compacted backward.
    The Pallas backward kernel writes EXACT ZEROS for every skipped block
    (saturated-tile continuation blocks + dead capacity headroom —
    60-70% of blocks on dense trained scenes), yet those zero cotangents
    ride the 10-payload reduction sort, which dominates the training
    backward (~47 of 89 ms at the trained-ckpt 1080p bench). With
    bwd_cap > 0 the VJP first drops all-zero 128-pair blocks with one
    block-granular compaction gather (a [nb]-sized any-nonzero reduce +
    a tiny argsort; index-COUNT cheap), then sorts only the kept
    ``bwd_cap`` slots. Exact: dropped rows are identically zero. If more
    than bwd_cap nonzero slots exist, the overflow blocks' gradients are
    dropped — the forward kernel reports the per-view demand as
    ``RenderAux.bwd_demand`` (never silent; fit() auto-grows).
    """
    n = feat10.shape[0]
    out = feat10[jnp.clip(pair_slot, 0, n - 1)].T  # [10, padded_pairs]
    return jnp.where(pair_slot[None, :] >= 0, out, 0.0)


def _gpf_fwd(cap, truncated, bwd_cap, feat10, pair_slot, gauss_offsets):
    out = gather_pair_features(
        cap, truncated, bwd_cap, feat10, pair_slot, gauss_offsets
    )
    return out, (pair_slot, gauss_offsets, feat10.shape[0])


_BWD_BLOCK = 128  # = RenderConfig.pair_block default; zero runs written by
# the backward kernel are whole pair blocks, so any 128-divisor aligns.


def _gpf_bwd(cap, truncated, bwd_cap, res, g):
    pair_slot, gauss_offsets, n = res
    rows = g.shape[0]
    padded = g.shape[1]
    key = jnp.where(pair_slot >= 0, pair_slot, n)  # padding groups last

    compacted = bool(bwd_cap) and padded % _BWD_BLOCK == 0
    if compacted:
        nb = padded // _BWD_BLOCK
        kb = min(-(-int(bwd_cap) // _BWD_BLOCK), nb)
        gb = g.reshape(rows, nb, _BWD_BLOCK)
        nz = jnp.any(gb != 0.0, axis=(0, 2))  # [nb] streaming reduce
        # Kept-block ids first (order irrelevant — the sort follows).
        order = jnp.argsort(jnp.logical_not(nz)).astype(jnp.int32)
        src = order[:kb]
        g_c = gb[:, src, :].reshape(rows, kb * _BWD_BLOCK)
        key_b = key.reshape(nb, _BWD_BLOCK)[src].reshape(-1)
        # Dropped-but-nonzero blocks (demand > bwd_cap) lose their grads;
        # the forward reports bwd_demand so this is never silent.
        key, g = key_b, g_c

    sorted_ops = lax.sort(
        (key,) + tuple(g[i] for i in range(rows)), num_keys=1
    )
    dpre = jnp.stack(sorted_ops[1:], axis=0)
    if truncated or compacted:
        # Subset of each gaussian's pairs -> recover group boundaries from
        # the sorted keys themselves.
        bounds = jnp.searchsorted(
            sorted_ops[0], jnp.arange(n + 1, dtype=jnp.int32), side="left",
            method="sort",
        ).astype(jnp.int32)
    else:
        bounds = gauss_offsets
    c = jnp.cumsum(dpre, axis=1)
    cpad = jnp.concatenate([jnp.zeros((rows, 1), g.dtype), c], axis=1)
    # Segment sums per depth-ranked gaussian (zero for overflow-dropped
    # gaussians, whose offsets collapse).
    seg = cpad[:, bounds[1:]] - cpad[:, bounds[:-1]]  # [10, N]
    zero_i32 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (
        seg.T,
        zero_i32(pair_slot),
        zero_i32(gauss_offsets),
    )


gather_pair_features.defvjp(_gpf_fwd, _gpf_bwd)


def _reduce_pair_grads(key, g_rows, n):
    """Sorted-reduction of per-pair cotangent rows to per-gaussian grads.

    key: [M] group key in [0, n] (n = padding); g_rows: [10, M].
    Returns [N, 10] via sort + cumsum + searchsorted segment difference
    (boundaries recovered from the keys — works for any pair SUBSET).
    """
    rows = g_rows.shape[0]
    sorted_ops = lax.sort(
        (key,) + tuple(g_rows[i] for i in range(rows)), num_keys=1
    )
    dpre = jnp.stack(sorted_ops[1:], axis=0)
    bounds = jnp.searchsorted(
        sorted_ops[0], jnp.arange(n + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    c = jnp.cumsum(dpre, axis=1)
    cpad = jnp.concatenate([jnp.zeros((rows, 1), dpre.dtype), c], axis=1)
    return (cpad[:, bounds[1:]] - cpad[:, bounds[:-1]]).T  # [N, 10]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite_gathered(cfg, feat10, pair_slot, block_meta):
    """Fused pair-feature gather + Pallas composite with a COMPACTED
    backward (cfg.bwd_pairs > 0 required).

    Forward: identical to gather_pair_features + composite_pairs.
    Backward: the forward kernel's per-tile active-block counts (output
    row 5) identify the only blocks whose cotangents can be nonzero —
    each tile's active blocks are a PREFIX of its block run (transmittance
    is monotone), so the backward kernel itself runs on a block-compacted
    grid (bwd_pairs/pair_block blocks instead of the full padded grid: at
    the trained-ckpt bench pose 2k of 41k blocks are active), writes the
    compacted [16, bwd_pairs] cotangents directly (never materializing
    the padded dfeat), and the 10-payload reduction sort runs at
    bwd_pairs length. Exact while RenderAux.bwd_demand <= bwd_pairs
    (overflow drops trailing blocks' grads — reported, never silent).
    """
    from .raster_pallas import FEAT_WIDTH, _fwd_pallas

    n = feat10.shape[0]
    pf = feat10[jnp.clip(pair_slot, 0, n - 1)].T
    pf = jnp.where(pair_slot[None, :] >= 0, pf, 0.0)
    pair_feat = jnp.concatenate(
        [pf, jnp.zeros((FEAT_WIDTH - 10, pair_slot.shape[0]), jnp.float32)],
        axis=0,
    )
    return _fwd_pallas(pair_feat, block_meta, cfg)


def _cg_fwd(cfg, feat10, pair_slot, block_meta):
    from .raster_pallas import FEAT_WIDTH, _fwd_pallas

    n = feat10.shape[0]
    pf = feat10[jnp.clip(pair_slot, 0, n - 1)].T
    pf = jnp.where(pair_slot[None, :] >= 0, pf, 0.0)
    pair_feat = jnp.concatenate(
        [pf, jnp.zeros((FEAT_WIDTH - 10, pair_slot.shape[0]), jnp.float32)],
        axis=0,
    )
    out = _fwd_pallas(pair_feat, block_meta, cfg)
    return out, (pair_feat, pair_slot, block_meta, out, n)


def _cg_bwd(cfg, res, gout):
    from .raster_pallas import META_DEAD, META_FIRST, META_SHIFT, _bwd_pallas

    pair_feat, pair_slot, block_meta, out, n = res
    G = cfg.pair_block
    nb = block_meta.shape[0]
    kb = min(-(-cfg.bwd_pairs // G), nb)

    # Forward-active blocks: each tile's first cnt blocks (prefix — the
    # early-exit condition is monotone in the block index).
    cnt = out[:, 5, 0].astype(jnp.int32)  # [num_tiles]; valid where blocks
    blk_tile = block_meta >> META_SHIFT
    dead = (block_meta & META_DEAD) != 0
    first = (block_meta & 3) == META_FIRST
    b_idx = jnp.arange(nb, dtype=jnp.int32)
    start = lax.cummax(jnp.where(first, b_idx, -1), axis=0)
    rank = b_idx - start
    keep = (
        (~dead) & (start >= 0)
        & (rank < cnt[jnp.clip(blk_tile, 0, cnt.shape[0] - 1)])
    )
    # Kept block ids first, ascending (stable) — per-tile prefixes stay
    # consecutive and in depth order, as _bwd_pallas requires. Overflow
    # (more than kb active blocks) drops trailing TILES' grads; the
    # forward reports bwd_demand so fit()/the CLI can resize.
    src = jnp.argsort(jnp.logical_not(keep)).astype(jnp.int32)[:kb]
    meta_c = block_meta[src]
    # Overflow-dropped slots must not run in the kernel: mark them dead.
    valid_c = keep[src]
    meta_c = jnp.where(valid_c, meta_c, META_DEAD)
    feat_c = pair_feat.reshape(
        pair_feat.shape[0], nb, G)[:, src, :].reshape(
        pair_feat.shape[0], kb * G)
    dfeat_c = _bwd_pallas(feat_c, meta_c, out, gout, cfg)  # [16, kb*G]
    key_c = pair_slot.reshape(nb, G)[src].reshape(-1)
    valid_k = jnp.repeat(valid_c[:, None], G, axis=1).reshape(-1)
    key_c = jnp.where(valid_k & (key_c >= 0), key_c, n)
    seg = _reduce_pair_grads(key_c, dfeat_c[0:10], n)
    zero_i32 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (seg, zero_i32(pair_slot), zero_i32(block_meta))


_composite_gathered.defvjp(_cg_fwd, _cg_bwd)


def rasterize_binned_xla(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    binning: TileBinning,
    cfg: RenderConfig,
):
    """Rasterize using a precomputed pair list. Returns (image, aux)."""
    dtype = colors.dtype
    T = cfg.tile
    K = cfg.max_per_tile
    C = cfg.tile_chunk
    num_tiles = cfg.num_tiles
    num_chunks = -(-num_tiles // C)

    # Flat per-pair features, tile-major depth-ordered. One global gather
    # through the depth order (pair_slot indexes depth-sorted gaussians).
    # (pair_slot is the trunc-compacted layout when tile_rank_cap is set.)
    cap = binning.pair_slot.shape[0]
    s_idx = binning.pair_slot  # [cap], -1 = padding slot
    feat = _pair_features(proj, colors, dtype)[binning.depth_order]
    pair_feat = feat[jnp.clip(s_idx, 0, feat.shape[0] - 1)]  # [cap, 9]
    pair_feat = jnp.where(s_idx[:, None] >= 0, pair_feat, 0.0)

    # Tile origins for every tile (static). view_tile_rows (batched-view
    # rendering) wraps tile rows per view — exact int32 math, see
    # raster_pallas._pixel_grid.
    tids = jnp.arange(num_chunks * C, dtype=jnp.int32)
    tys = tids // cfg.tiles_x
    if cfg.view_tile_rows:
        tys = tys % cfg.view_tile_rows
    ox = (tids % cfg.tiles_x * T).astype(dtype)
    oy = (tys * T).astype(dtype)
    starts_all = jnp.concatenate(
        [
            binning.tile_start,
            jnp.zeros((num_chunks * C - num_tiles,), jnp.int32),
        ]
    )
    counts_all = jnp.concatenate(
        [
            binning.tile_count,
            jnp.zeros((num_chunks * C - num_tiles,), jnp.int32),
        ]
    )

    slot = jnp.arange(K, dtype=jnp.int32)

    @jax.checkpoint
    def chunk_fn(chunk_idx):
        t0 = chunk_idx * C
        st = lax.dynamic_slice_in_dim(starts_all, t0, C)  # [C]
        ct = lax.dynamic_slice_in_dim(counts_all, t0, C)
        cox = lax.dynamic_slice_in_dim(ox, t0, C)
        coy = lax.dynamic_slice_in_dim(oy, t0, C)
        idx = jnp.clip(st[:, None] + slot[None, :], 0, cap - 1)  # [C, K]
        mask = slot[None, :] < jnp.minimum(ct, K)[:, None]
        feats = pair_feat[idx]  # [C, K, 10]
        # Make uv tile-local so the composite kernel works in [0, T) coords.
        local = feats.at[..., 0].add(-cox[:, None]).at[..., 1].add(-coy[:, None])
        return _composite_chunk(local, mask, cfg)  # [C, T*T, 3]

    tiles_out = lax.map(chunk_fn, jnp.arange(num_chunks, dtype=jnp.int32))
    # [num_chunks, C, T*T, 5] -> [tiles_y, tiles_x, T, T, 5]
    tiles_out = tiles_out.reshape(num_chunks * C, T, T, 5)[:num_tiles]
    planes = tiles_out.reshape(cfg.tiles_y, cfg.tiles_x, T, T, 5)
    planes = planes.transpose(0, 2, 1, 3, 4).reshape(
        cfg.padded_height, cfg.padded_width, 5
    )[: cfg.height, : cfg.width]
    img = jnp.clip(planes[..., 0:3], 0.0, 1.0)

    aux = RenderAux(
        num_pairs=binning.num_pairs,
        pair_capacity=cfg.max_pairs,
        max_tile_count=jnp.max(binning.tile_count),
        per_tile_capacity=K,
        depth=planes[..., 3],
        alpha=1.0 - planes[..., 4],
        num_rows=binning.num_rows,
        row_capacity=cfg.row_capacity if cfg.cull_mode == "ellipse" else 0,
        num_pairs_kept=binning.num_pairs_kept,
        trunc_demand=binning.trunc_demand,
        trunc_capacity=cfg.trunc_padded_pairs if cfg.tile_rank_cap else 0,
    )
    return img, aux._replace(screen_radius=proj.radius)


def rasterize_binned_pallas(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    binning: TileBinning,
    cfg: RenderConfig,
):
    """Rasterize via the Pallas TPU kernel (ops/raster_pallas.py)."""
    from .raster_pallas import FEAT_WIDTH, _use_interpret, composite_pairs

    if not _use_interpret():
        # Mosaic block-shape constraint: the last two dims of every block
        # must divide (8, 128) (or span the array). Feature blocks are
        # (16, pair_block); tile output blocks are (1, 8, tile*tile).
        if cfg.pair_block % 128 != 0:
            raise ValueError(
                f"backend='pallas' on TPU requires pair_block to be a "
                f"multiple of 128 (got {cfg.pair_block}); use the default "
                f"128, or backend='xla'"
            )
        if (cfg.tile * cfg.tile) % 128 != 0:
            raise ValueError(
                f"backend='pallas' on TPU requires tile*tile divisible by "
                f"128 (got tile={cfg.tile}); use tile=16, or backend='xla'"
            )

    T = cfg.tile
    P = T * T
    feat10 = _pair_features(proj, colors, jnp.float32)[binning.depth_order]
    s_idx = binning.pair_slot
    # Feature-major pair array [16, padded_pairs]: a [pairs, 16] layout gets
    # 8x physical HBM amplification under the TPU (8, 128) tiling, which
    # multiplies both this gather's writes and every kernel block DMA.
    # Gather/scatter stay 10 rows wide (the kernel's pad rows carry no
    # gradient). The custom VJP reduces per-pair grads via the presort
    # permutation instead of a duplicate-index scatter-add.
    if cfg.bwd_pairs:
        # Fused gather+composite with the block-compacted backward: the
        # backward kernel grid, the padded dfeat materialization AND the
        # reduction sort all shrink to the forward-active block set
        # (see _composite_gathered).
        out = _composite_gathered(cfg, feat10, s_idx, binning.block_meta)
    else:
        pair_feat10 = gather_pair_features(
            cfg.max_pairs, cfg.tile_rank_cap > 0, 0, feat10, s_idx,
            binning.gauss_offsets,
        )
        pair_feat = jnp.concatenate(
            [
                pair_feat10,
                jnp.zeros((FEAT_WIDTH - 10, s_idx.shape[0]), jnp.float32),
            ],
            axis=0,
        )
        out = composite_pairs(
            pair_feat, binning.block_meta, cfg
        )  # [num_tiles, 8, P]: rows 0-2 rgb, 3 depth, 4 transmittance

    # Tiles with no pairs own no block and are never written: mask them.
    occupied = (binning.tile_count > 0)[:, None, None]
    tiles_out = jnp.where(occupied, out[:, 0:4, :], 0.0)
    tiles_T = jnp.where(occupied[:, 0, :], out[:, 4, :], 1.0)
    planes = jnp.concatenate(
        [tiles_out, tiles_T[:, None, :]], axis=1
    )  # [num_tiles, 5, P]

    planes = planes.reshape(cfg.tiles_y, cfg.tiles_x, 5, T, T)
    planes = planes.transpose(0, 3, 1, 4, 2).reshape(
        cfg.padded_height, cfg.padded_width, 5
    )[: cfg.height, : cfg.width]
    img = jnp.clip(planes[..., 0:3], 0.0, 1.0)

    aux = RenderAux(
        num_pairs=binning.num_pairs,
        pair_capacity=cfg.max_pairs,
        max_tile_count=jnp.max(binning.tile_count),
        per_tile_capacity=cfg.padded_pairs,
        depth=planes[..., 3],
        alpha=1.0 - planes[..., 4],
        num_rows=binning.num_rows,
        row_capacity=cfg.row_capacity if cfg.cull_mode == "ellipse" else 0,
        num_pairs_kept=binning.num_pairs_kept,
        trunc_demand=binning.trunc_demand,
        trunc_capacity=cfg.trunc_padded_pairs if cfg.tile_rank_cap else 0,
        # Row 5 of the kernel output = per-tile ACTIVE block count; unread
        # tiles hold garbage -> mask by occupancy. Diagnostic only.
        bwd_demand=lax.stop_gradient(
            jnp.sum(
                jnp.where(
                    binning.tile_count > 0, out[:, 5, 0], 0.0
                ).astype(jnp.int32)
            )
            * cfg.pair_block
        ),
        bwd_capacity=(
            -(-cfg.bwd_pairs // cfg.pair_block) * cfg.pair_block
            if cfg.bwd_pairs else 0
        ),
    )
    return img, aux._replace(screen_radius=proj.radius)


def resolve_backend(cfg: RenderConfig) -> str:
    backend = cfg.backend
    if backend == "auto":
        # Aligned Pallas kernel on TPU; XLA fallback elsewhere
        # (interpret-mode Pallas is only for small kernel-parity tests —
        # it walks the grid in python). Two retired kernel variants:
        # 'pallas_mega' (8 blocks/grid step, round 4 — regressed the
        # trained-ckpt bench two rounds running, NEXT.md §15) and
        # 'pallas_seg' (compact unaligned layout, round 5 — slower end-to-
        # end because tile-spanning sub-blocks defeat the saturation
        # early-exit, incompatible with rank truncation, 2-22 min Mosaic
        # compiles; NEXT.md §13).
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def rasterize_binned(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    binning: TileBinning,
    cfg: RenderConfig,
):
    """Rasterize a precomputed ALIGNED binning (Pallas or XLA fallback)."""
    backend = resolve_backend(cfg)
    if backend == "pallas":
        return rasterize_binned_pallas(proj, colors, binning, cfg)
    return rasterize_binned_xla(proj, colors, binning, cfg)


def rasterize(proj: ProjectedGaussians, colors: jnp.ndarray, cfg: RenderConfig):
    """Bin + rasterize one view. Returns (image [H, W, 3], RenderAux)."""
    backend = resolve_backend(cfg)
    binning = bin_gaussians(proj, cfg)
    if backend == "pallas":
        out = rasterize_binned_pallas(proj, colors, binning, cfg)
    else:
        out = rasterize_binned_xla(proj, colors, binning, cfg)
    if cfg.background != (0.0, 0.0, 0.0):
        # Composite over a solid background (Blender-style white-bg scenes;
        # beyond reference parity — it composites over black only,
        # render.py:404-410). Differentiable: the alpha plane rides the
        # kernels' hand-written VJP like the color planes.
        img, aux = out
        bg = jnp.asarray(cfg.background, img.dtype)
        img = img + (1.0 - aux.alpha)[..., None] * bg
        out = (img, aux)
    return out


def rasterize_dense(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    cfg: RenderConfig,
    row_chunk: int = 16,
):
    """Oracle rasterizer: every gaussian against every pixel (tests only).

    Mirrors the reference math with NO tiling; memory O(N * row_chunk * W).
    """
    dtype = colors.dtype
    order = depth_order(proj.depth, proj.valid)
    ok = proj.valid[order]
    # Zero every field of invalid slots — culled gaussians may carry NaNs.
    u = jnp.where(ok, proj.uv[order, 0], 0.0)
    v = jnp.where(ok, proj.uv[order, 1], 0.0)
    con = jnp.where(ok[:, None], proj.conic[order], 0.0)
    op = jnp.where(ok, proj.opacity[order], 0.0)
    rgb = jnp.where(ok[:, None], colors[order], 0.0)

    H, W = cfg.height, cfg.width
    pad_h = -(-H // row_chunk) * row_chunk
    xs = jnp.arange(W, dtype=dtype)

    def rows_fn(r0):
        ys = r0 * row_chunk + jnp.arange(row_chunk, dtype=dtype)
        du = xs[None, None, :] - u[:, None, None]  # [N, 1, W]
        dv = ys[None, :, None] - v[:, None, None]  # [N, R, 1]
        q = (
            con[:, 0, None, None] * du * du
            + 2.0 * con[:, 1, None, None] * du * dv
            + con[:, 2, None, None] * dv * dv
        )
        inside = q <= cfg.chi2_clip
        g = jnp.where(inside, jnp.exp(-0.5 * jnp.minimum(q, cfg.chi2_clip)), 0.0)
        alpha = jnp.minimum(op[:, None, None] * g, cfg.alpha_max)
        alpha = jnp.where(alpha >= cfg.alpha_cutoff, alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha, axis=0)
        trans = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
        alive = (trans > cfg.transmittance_min).astype(dtype)
        w = alpha * trans * alive  # [N, R, W]
        return jnp.einsum("nrw,nd->rwd", w, rgb, precision="highest")

    img = lax.map(rows_fn, jnp.arange(pad_h // row_chunk, dtype=jnp.int32))
    img = img.reshape(pad_h, W, 3)[:H]
    return jnp.clip(img, 0.0, 1.0)
