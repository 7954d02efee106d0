"""Static-shape tile binning: (gaussian, tile) pair expansion + sort.

Replaces the reference's dynamic-shape binning
(/root/reference/gaussian_splatting/render.py:221-303: repeat_interleave
expansion, composite-key sort with a python-int multiplier, and
unique_consecutive) with an XLA/TPU-friendly fixed-capacity design built
around three measured TPU facts (v5e, 4M pairs / 131k gaussians):

* ``lax.sort`` is nearly free (~12 ms stable 1-key 4M) — sorting is NOT the
  bottleneck the CUDA literature assumes;
* random-access gathers of 4M indices are expensive (~33 ms EACH), and
  ``searchsorted`` with 4M queries is catastrophic (547 ms, scan method);
* scatter-of-131k + 4M cumsum is cheap (~6 ms).

So the pipeline is gather-free on the pair axis and sort-centric:

1. Footprint counts per depth-ordered gaussian -> exclusive ``offsets``.
   Capacity overflow drops WHOLE gaussians from the back of the depth
   order, which keeps per-tile counts computable in closed form pre-sort.
2. Expansion: the owning depth-slot of pair p is ``count(offsets <= p)-1``
   — a histogram of the N+1 offsets plus one cumsum (NOT searchsorted).
3. Every per-pair value X[slot[p]] is produced by DELTA ENCODING: scatter
   ``X[i]-X[i-1]`` at position ``offsets[i]`` and cumsum — the running sum
   telescopes to exactly X[owner(p)] at every position (duplicate offsets
   from empty gaussians accumulate correctly because deltas ADD). The three
   footprint fields (tile x0, y0, width) are packed 10 bits each into one
   int32 so ONE cumsum carries all three (packing is linear, so packed
   deltas telescope exactly like scalar ones). All three scatter->cumsum
   passes share one [3, cap+1] array and one cumsum.
4. Exact per-tile counts BEFORE the sort: signed footprint-rectangle
   corners scattered into a (tiles_y+1, tiles_x+1) grid + 2D prefix sum.
5. Block alignment comes from the SORT itself: explicit padding pairs
   (keyed to land right after each tile's real pairs) make every tile's
   run a multiple of ``cfg.pair_block``, so one stable sort emits the
   aligned layout directly — no scatter pass, no boundary searchsorted.
6. Per-block metadata (owning tile, is-first flag) for scalar prefetch.

Overflow is never silent: `num_pairs` (actual) and `capacity` are both
reported; pairs past capacity are dropped deterministically from the BACK of
the depth order (farthest gaussians), matching what occlusion would hide.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import RenderConfig
from .projection import ProjectedGaussians

_PACK_BITS = 10  # per-field width for the packed footprint cumsum
_PACK_MASK = (1 << _PACK_BITS) - 1


class TileBinning(NamedTuple):
    """Sorted, block-aligned (gaussian, tile) pair list + per-tile ranges.

    The pair list has static length ``cfg.padded_pairs`` and is tile-major
    with each tile's run starting at a multiple of ``cfg.pair_block``;
    padding slots hold -1. ``pair_slot`` indexes into the DEPTH-SORTED
    gaussian order: gaussian_id = depth_order[pair_slot]. Consumers should
    gather per-gaussian features through ``depth_order`` once (an N-sized
    gather) rather than materializing per-pair gaussian ids (a pairs-sized
    gather).
    """

    pair_slot: jnp.ndarray  # [padded_pairs] int32 depth-rank; -1 = padding
    tile_start: jnp.ndarray  # [num_tiles] int32 first pair slot of tile
    tile_count: jnp.ndarray  # [num_tiles] int32 real pairs in tile
    block_tile: jnp.ndarray  # [num_blocks] int32 owning tile of each block
    block_first: jnp.ndarray  # [num_blocks] int32 1 if first block of tile
    num_pairs: jnp.ndarray  # [] int32 true pair count (may exceed capacity!)
    depth_order: jnp.ndarray  # [N] int32 gaussian indices sorted by depth
    # Pre-sort (gaussian-major) pair index of each sorted pair; cfg.max_pairs
    # for padding slots. Carried through the sort as a payload so the
    # backward pass can land per-pair gradients in PRE-SORT order, where
    # each gaussian's pairs are CONTIGUOUS — turning the per-gaussian
    # gradient reduction into cumsum + segment-diff instead of a pairs-sized
    # duplicate-index scatter-add (the round-1 65 ms backward bottleneck).
    perm: jnp.ndarray  # [padded_pairs] int32 presort pair index
    gauss_offsets: jnp.ndarray  # [N+1] int32 presort segment boundaries


def depth_order_and_rank(depth: jnp.ndarray, valid: jnp.ndarray):
    """Global front-to-back order; invalid gaussians sort last.

    Returns (order [N] indices ascending by depth, rank [N] = inverse perm).
    """
    n = depth.shape[0]
    key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return order.astype(jnp.int32), rank


def _expand_pairs(proj: ProjectedGaussians, cfg: RenderConfig):
    """Shared pair expansion: depth order, per-pair (tile, slot), tile counts.

    Returns a dict with the presort (gaussian-major) pair fields used by both
    the block-aligned and the compact binning layouts.
    """
    n = proj.depth.shape[0]
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs

    order, _ = depth_order_and_rank(proj.depth, proj.valid)

    # Footprint counts in DEPTH order so that capacity overflow drops the
    # farthest gaussians' pairs first. (N-sized gathers are cheap.)
    tile_min = proj.tile_min[order]
    tile_max = proj.tile_max[order]
    n_u = jnp.maximum(tile_max[:, 0] - tile_min[:, 0] + 1, 0)
    n_v = jnp.maximum(tile_max[:, 1] - tile_min[:, 1] + 1, 0)
    counts = (n_u * n_v).astype(jnp.int32)

    # Capacity overflow drops WHOLE gaussians from the back of the depth
    # order (the first non-fitting gaussian and everything behind it): the
    # per-tile pair counts then remain computable in closed form BEFORE the
    # sort, which is what lets the sort itself produce the aligned layout.
    full_cum = jnp.cumsum(counts, dtype=jnp.int32)
    total = full_cum[-1]  # true demand (reported; may exceed cap)
    counts = jnp.where(full_cum <= cap, counts, 0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # [N+1] exclusive offsets (post-drop)

    # --- expansion, gather-free ---
    # Three scatter->cumsum passes fused into ONE [3, cap+1] cumsum:
    #   row 0: histogram of offsets  -> owning depth-slot per pair
    #   row 1: delta-encoded packed footprint (x0 | y0 | width)
    #   row 2: delta-encoded range starts -> local index within footprint
    p = jnp.arange(cap, dtype=jnp.int32)
    packed = (
        tile_min[:, 0]
        | (tile_min[:, 1] << _PACK_BITS)
        | (jnp.maximum(n_u, 1) << (2 * _PACK_BITS))
    ).astype(jnp.int32)
    starts = offsets[:-1]
    acc = jnp.zeros((3, cap + 1), jnp.int32)
    acc = acc.at[0, jnp.clip(offsets, 0, cap)].add(1)
    # mode='drop' discards deltas at positions >= cap (capacity overflow) —
    # do NOT clip them in range, that would corrupt the last slot's value.
    acc = acc.at[1, starts].add(
        jnp.concatenate([packed[:1], packed[1:] - packed[:-1]]), mode="drop"
    )
    acc = acc.at[2, starts].add(
        jnp.concatenate([starts[:1], starts[1:] - starts[:-1]]), mode="drop"
    )
    cums = jnp.cumsum(acc, axis=1)[:, :cap]
    slot = cums[0] - 1  # searchsorted(offsets, p, 'right') - 1, in [0, n]
    packed_p = cums[1]
    start_p = cums[2]
    pair_ok = slot < n

    local = p - start_p
    x0 = packed_p & _PACK_MASK
    y0 = (packed_p >> _PACK_BITS) & _PACK_MASK
    nu = jnp.maximum((packed_p >> (2 * _PACK_BITS)) & _PACK_MASK, 1)
    tx = x0 + local % nu
    ty = y0 + local // nu
    tile_id = jnp.where(
        pair_ok, (ty * cfg.tiles_x + tx).astype(jnp.int32), num_tiles
    )
    slot = jnp.where(pair_ok, slot, -1)

    # --- exact per-tile counts BEFORE the sort ---
    # Each kept gaussian covers an axis-aligned tile rectangle; scatter the
    # four signed corners into a [tiles_y+1, tiles_x+1] grid and take the 2D
    # inclusive prefix sum. Whole-gaussian overflow dropping (above) is what
    # keeps this exact: partial footprints never occur.
    kept = counts > 0
    one = jnp.where(kept, 1, 0).astype(jnp.int32)
    y0g = tile_min[:, 1]
    x0g = tile_min[:, 0]
    y1g = y0g + n_v  # exclusive
    x1g = x0g + n_u
    grid2 = jnp.zeros((cfg.tiles_y + 1, cfg.tiles_x + 1), jnp.int32)
    grid2 = grid2.at[y0g, x0g].add(one, mode="drop")
    grid2 = grid2.at[y0g, x1g].add(-one, mode="drop")
    grid2 = grid2.at[y1g, x0g].add(-one, mode="drop")
    grid2 = grid2.at[y1g, x1g].add(one, mode="drop")
    cnt2d = jnp.cumsum(jnp.cumsum(grid2, axis=0), axis=1)
    tile_count = cnt2d[: cfg.tiles_y, : cfg.tiles_x].reshape(num_tiles)

    return {
        "n": n,
        "order": order,
        "slot": slot,
        "tile_id": tile_id,
        "pair_ok": pair_ok,
        "offsets": offsets,
        "tile_count": tile_count,
        "total": total,
    }


def bin_gaussians(proj: ProjectedGaussians, cfg: RenderConfig) -> TileBinning:
    """Build the block-aligned sorted pair list for one view (static shapes)."""
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs
    G = cfg.pair_block
    cap_pad = cfg.padded_pairs
    num_blocks = cap_pad // G

    ex = _expand_pairs(proj, cfg)
    n = ex["n"]
    order = ex["order"]
    slot = ex["slot"]
    tile_id = ex["tile_id"]
    pair_ok = ex["pair_ok"]
    offsets = ex["offsets"]
    tile_count = ex["tile_count"]
    total = ex["total"]

    # --- block alignment: explicit padding pairs, ONE sort does it all ---
    # Every tile's run is padded to a multiple of G with dummy pairs whose
    # key sorts after the tile's real pairs (slot = n); the sorted array is
    # then block-aligned by construction — no scatter pass at all.
    pad_count = (-tile_count) % G
    padded_count = tile_count + pad_count
    padded_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_count)]
    )  # [num_tiles + 1]

    n_pad_slots = num_tiles * (G - 1)
    pad_col = jnp.arange(G - 1, dtype=jnp.int32)[None, :]
    pad_tile = jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
    pad_active = pad_col < pad_count[:, None]

    # Payload carried through the sort: the presort pair index (cap for
    # padding slots — out-of-range so backward scatters drop it).
    payload_in = jnp.concatenate(
        [
            jnp.arange(cap, dtype=jnp.int32),
            jnp.full((cap_pad - cap,), cap, jnp.int32),
        ]
    )
    if (num_tiles + 1) * (n + 1) < 2**31:
        # Packed single-key sort (keys are unique for real pairs, so
        # stability is irrelevant; measured ~15% faster than 2-key form).
        sentinel = num_tiles * (n + 1) + n
        key_real = jnp.where(
            pair_ok, tile_id * (n + 1) + slot, sentinel
        )
        key_pad = jnp.where(
            pad_active, pad_tile * (n + 1) + n, sentinel
        ).reshape(n_pad_slots)
        keys = jnp.concatenate(
            [
                key_real,
                key_pad,
                jnp.full((cap_pad - cap - n_pad_slots,), sentinel, jnp.int32),
            ]
        )
        sorted_key, perm = lax.sort((keys, payload_in), num_keys=1)
        pair_slot = sorted_key % (n + 1)
        pair_slot = jnp.where(pair_slot == n, -1, pair_slot)
        perm = jnp.where(pair_slot >= 0, perm, cap)
    else:
        slot = jnp.where(pair_ok, slot, n)
        tile_real = jnp.where(pair_ok, tile_id, num_tiles)
        tile_pad = jnp.where(pad_active, pad_tile, num_tiles).reshape(
            n_pad_slots
        )
        tail = cap_pad - cap - n_pad_slots
        tiles_all = jnp.concatenate(
            [tile_real, tile_pad, jnp.full((tail,), num_tiles, jnp.int32)]
        )
        slots_all = jnp.concatenate(
            [slot, jnp.full((n_pad_slots + tail,), n, jnp.int32)]
        )
        _, pair_slot, perm = lax.sort(
            (tiles_all * 2 + (slots_all == n), slots_all, payload_in),
            num_keys=2,
        )
        pair_slot = jnp.where(pair_slot == n, -1, pair_slot)
        perm = jnp.where(pair_slot >= 0, perm, cap)

    # Per-block metadata: owning tile + first-block flag (scalar prefetch).
    # block_tile[b] = searchsorted(padded_start, b*G, 'right') - 1, but
    # padded_start values are multiples of G, so a histogram over block
    # indices + cumsum does it without the (measured ~5 ms) vmapped binary
    # search: count of starts <= b*G == count of starts//G <= b.
    b0 = jnp.arange(num_blocks, dtype=jnp.int32) * G
    bhist = jnp.zeros(num_blocks + 1, jnp.int32).at[
        jnp.clip(padded_start // G, 0, num_blocks)
    ].add(1)
    block_tile = jnp.cumsum(bhist)[:num_blocks] - 1
    block_used = b0 < padded_start[num_tiles]
    block_tile = jnp.clip(block_tile, 0, num_tiles - 1)
    # block_first: 1 = first block of a tile, 0 = continuation, -1 = DEAD
    # (trailing static-capacity headroom beyond the actual pair demand —
    # ~25% of the grid at the bench scale). Dead blocks carry all-zero
    # features, so they used to recompute no-op alpha math against the last
    # tile every step; the kernels now skip them outright on the flag.
    block_first = jnp.where(
        block_used,
        (b0 == padded_start[block_tile]).astype(jnp.int32),
        -1,
    )

    return TileBinning(
        pair_slot=pair_slot,
        tile_start=padded_start[:num_tiles],
        tile_count=tile_count,
        block_tile=block_tile.astype(jnp.int32),
        block_first=block_first.astype(jnp.int32),
        num_pairs=total,
        depth_order=order,
        perm=perm,
        gauss_offsets=offsets,
    )


class CompactBinning(NamedTuple):
    """Compact (no alignment padding) sorted pair list for the segmented
    rasterizer (ops/raster_seg.py).

    The pair list has static length ``cfg.compact_pairs`` (max_pairs rounded
    up to the mega-block size) in tile-major depth order with NO per-tile
    block alignment — tile runs abut, so kernel blocks may span several
    tiles. Per-pair tile ids are therefore part of the pair data; the
    kernel segments each block by tile in-register (tiles are
    NON-DECREASING along the sorted order, so segments are grouped).
    """

    pair_slot: jnp.ndarray  # [compact_pairs] int32 depth-rank; -1 = empty
    pair_tile: jnp.ndarray  # [compact_pairs] int32 tile id; num_tiles = empty
    tile_start: jnp.ndarray  # [num_tiles] int32 first pair of each tile
    tile_count: jnp.ndarray  # [num_tiles] int32 pairs in tile
    # Distinct nonempty tiles intersecting each mega block, ascending,
    # padded with num_tiles; used by the backward kernel to prefetch the
    # per-tile pixel cotangent planes. block_ntiles may exceed
    # cfg.tile_list_cap (reported via max_block_tiles; the kernel falls back
    # to a blocking fetch for ranks past the cap — never silent corruption).
    block_tiles: jnp.ndarray  # [num_mega, tile_list_cap] int32
    block_ntiles: jnp.ndarray  # [num_mega] int32 true distinct-tile count
    num_pairs: jnp.ndarray  # [] int32 true pair demand (may exceed capacity)
    max_block_tiles: jnp.ndarray  # [] int32 max distinct tiles per block
    depth_order: jnp.ndarray  # [N] int32 gaussian indices sorted by depth
    perm: jnp.ndarray  # [compact_pairs] int32 presort pair index (cap = pad)
    gauss_offsets: jnp.ndarray  # [N+1] int32 presort segment boundaries


def bin_gaussians_compact(
    proj: ProjectedGaussians, cfg: RenderConfig
) -> CompactBinning:
    """Compact-layout binning: one short sort, no alignment padding.

    vs `bin_gaussians`: the sorted array is `compact_pairs` long instead of
    `padded_pairs` (= max_pairs + num_tiles*(pair_block-1)) — at 1080p that
    removes ~1M dead slots from every pairs-sized sort/gather downstream.
    """
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs
    cap_m = cfg.compact_pairs
    M = cfg.mega_block
    num_mega = cap_m // M
    K = cfg.tile_list_cap

    ex = _expand_pairs(proj, cfg)
    n = ex["n"]

    sentinel = num_tiles * (n + 1) + n
    key = jnp.where(
        ex["pair_ok"], ex["tile_id"] * (n + 1) + ex["slot"], sentinel
    )
    if cap_m > cap:
        key = jnp.concatenate(
            [key, jnp.full((cap_m - cap,), sentinel, jnp.int32)]
        )
    payload = jnp.concatenate(
        [
            jnp.arange(cap, dtype=jnp.int32),
            jnp.full((cap_m - cap,), cap, jnp.int32),
        ]
    )
    if (num_tiles + 1) * (n + 1) >= 2**31:
        raise ValueError(
            "compact binning requires (num_tiles+1)*(N+1) < 2^31 for the "
            f"packed sort key (num_tiles={num_tiles}, N={n}); reduce the "
            "pool capacity or image size"
        )
    sorted_key, perm = lax.sort((key, payload), num_keys=1)
    pair_slot = sorted_key % (n + 1)
    pair_tile = jnp.minimum(sorted_key // (n + 1), num_tiles)
    pair_slot = jnp.where(pair_slot == n, -1, pair_slot)
    perm = jnp.where(pair_slot >= 0, perm, cap)

    tile_count = ex["tile_count"]
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_count)]
    )  # [num_tiles + 1]; tile_start[num_tiles] = total kept pairs
    total_kept = tile_start[num_tiles]

    # --- per-mega-block distinct-tile lists (backward prefetch) ---
    # Nonempty tile runs are dense and ordered, so the tiles intersecting a
    # block form a contiguous range of the nonempty-tile list; two
    # small searchsorted calls (num_mega queries) find the range.
    nz = tile_count > 0
    nz_rank = jnp.cumsum(nz.astype(jnp.int32)) - nz.astype(jnp.int32)
    tidx = jnp.arange(num_tiles, dtype=jnp.int32)
    nz_tiles = jnp.full((num_tiles + 1,), num_tiles, jnp.int32).at[
        jnp.where(nz, nz_rank, num_tiles)
    ].set(tidx, mode="drop")
    nz_starts = jnp.full((num_tiles + 1,), cap_m + 1, jnp.int32).at[
        jnp.where(nz, nz_rank, num_tiles)
    ].set(tile_start[:num_tiles], mode="drop")

    b0 = jnp.arange(num_mega, dtype=jnp.int32) * M
    lo = jnp.searchsorted(nz_starts, b0, side="right").astype(jnp.int32) - 1
    hi = (
        jnp.searchsorted(nz_starts, b0 + (M - 1), side="right").astype(
            jnp.int32
        )
        - 1
    )
    has_pairs = b0 < total_kept
    ntiles = jnp.where(has_pairs, hi - lo + 1, 0)
    lo = jnp.clip(lo, 0, num_tiles)
    block_tiles = nz_tiles[
        jnp.clip(lo[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :],
                 0, num_tiles)
    ]
    block_tiles = jnp.where(
        jnp.arange(K, dtype=jnp.int32)[None, :] < ntiles[:, None],
        block_tiles,
        num_tiles,
    )

    return CompactBinning(
        pair_slot=pair_slot,
        pair_tile=pair_tile.astype(jnp.int32),
        tile_start=tile_start[:num_tiles],
        tile_count=tile_count,
        block_tiles=block_tiles.astype(jnp.int32),
        block_ntiles=ntiles.astype(jnp.int32),
        num_pairs=ex["total"],
        max_block_tiles=jnp.max(ntiles),
        depth_order=ex["order"],
        perm=perm,
        gauss_offsets=ex["offsets"],
    )
