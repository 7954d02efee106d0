"""Static-shape tile binning: (gaussian, tile) pair expansion + sort.

Replaces the reference's dynamic-shape binning
(/root/reference/gaussian_splatting/render.py:221-303: repeat_interleave
expansion, composite-key sort with a python-int multiplier, and
unique_consecutive) with an XLA-friendly fixed-capacity design:

1. Per-Gaussian tile-footprint counts come from the clamped AABBs computed by
   projection (zero for invalid slots).
2. The flat pair list is produced WITHOUT dynamic shapes via the
   exclusive-cumsum + searchsorted "expand" trick: pair p belongs to gaussian
   g = searchsorted(offsets, p, 'right') - 1 and covers the (p - offsets[g])-th
   tile of g's footprint (row-major over the footprint rectangle).
3. Pairs are sorted lexicographically by (tile_id, depth_rank) with ONE
   multi-operand `lax.sort` (num_keys=2) — no int64 composite key needed
   (int32 tile_id * N would overflow; the reference relies on python ints).
4. Per-tile [start, count) ranges come from two vectorized searchsorteds over
   the sorted tile ids — the static-shape equivalent of unique_consecutive.

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


class TileBinning(NamedTuple):
    """Sorted (gaussian, tile) pair list + per-tile ranges."""

    pair_gauss: jnp.ndarray  # [max_pairs] int32 gaussian index (tile-major, depth-ordered)
    pair_tile: jnp.ndarray  # [max_pairs] int32 tile id (num_tiles = invalid sentinel)
    tile_start: jnp.ndarray  # [num_tiles] int32 first pair index of tile
    tile_count: jnp.ndarray  # [num_tiles] int32 pairs in tile
    num_pairs: jnp.ndarray  # [] int32 true pair count (may exceed capacity!)
    depth_order: jnp.ndarray  # [N] int32 gaussian indices sorted by depth


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


def bin_gaussians(proj: ProjectedGaussians, cfg: RenderConfig) -> TileBinning:
    """Build the sorted pair list for one view. All shapes static."""
    n = proj.depth.shape[0]
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs

    order, rank = depth_order_and_rank(proj.depth, proj.valid)

    # Footprint counts in DEPTH order so that capacity overflow drops the
    # farthest gaussians' pairs first.
    tile_min = proj.tile_min[order]
    tile_max = proj.tile_max[order]
    n_u = jnp.maximum(tile_max[:, 0] - tile_min[:, 0] + 1, 0)
    n_v = jnp.maximum(tile_max[:, 1] - tile_min[:, 1] + 1, 0)
    counts = (n_u * n_v).astype(jnp.int32)

    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # [N+1] exclusive offsets
    total = offsets[-1]

    p = jnp.arange(cap, dtype=jnp.int32)
    # Which depth-slot does pair p belong to?
    slot = jnp.clip(
        jnp.searchsorted(offsets, p, side="right").astype(jnp.int32) - 1, 0, n - 1
    )
    local = p - offsets[slot]
    nu = jnp.maximum(n_u[slot], 1)
    tx = tile_min[slot, 0] + local % nu
    ty = tile_min[slot, 1] + local // nu
    tile_id = (ty * cfg.tiles_x + tx).astype(jnp.int32)
    pair_ok = p < total
    tile_id = jnp.where(pair_ok, tile_id, num_tiles)

    gauss = order[slot]
    depth_rank = jnp.where(pair_ok, rank[gauss], n)

    # Lexicographic (tile, depth) sort; stable not required since keys are
    # unique per (tile, gaussian).
    sorted_tile, _, sorted_gauss = lax.sort(
        (tile_id, depth_rank.astype(jnp.int32), gauss.astype(jnp.int32)),
        num_keys=2,
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(
        jnp.int32
    )

    return TileBinning(
        pair_gauss=sorted_gauss,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=total,
        depth_order=order,
    )
