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
   deltas telescope exactly like scalar ones). Each channel runs as an
   INDEPENDENT rank-1 scatter + 1-D cumsum: a batched [3, cap+1]
   shared-index scatter measured 2.4x SLOWER than three pipelined 1-D
   scatters on v5e (12.9 vs 5.3 ms at bench shapes, round 4).
4. Exact per-tile counts BEFORE the sort: one MXU matmul of 0/1 row/col
   interval indicators (outer-product decomposition of each footprint
   rectangle — `_rect_cover_counts`; exact on the int8xint8->int32 path).
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
    # Packed per-block metadata (tile << 2 | dead << 1 | first) — ONE int32
    # per block instead of separate (tile, first) arrays, because the
    # kernel scalar-prefetches this into the 1 MB SMEM
    # (raster_pallas.pack_block_meta).
    block_meta: jnp.ndarray  # [num_blocks] int32 packed block metadata
    num_pairs: jnp.ndarray  # [] int32 true pair count (may exceed capacity!)
    depth_order: jnp.ndarray  # [N] int32 gaussian indices sorted by depth
    # Presort (gaussian-major) segment boundaries per depth-ranked gaussian:
    # the backward pass re-sorts per-pair gradients keyed by ``pair_slot``
    # (grouping by owning gaussian — within-gaussian order is irrelevant to
    # the segment SUM), then reduces with cumsum + segment-diff at these
    # boundaries instead of a pairs-sized duplicate-index scatter-add (the
    # round-1 65 ms backward bottleneck). No presort-index payload rides
    # the main binning sort (round 4: payload rows cost ~2.6 ms each at
    # bench scale and pair_slot already identifies the gaussian).
    gauss_offsets: jnp.ndarray  # [N+1] int32 presort segment boundaries
    # True (gaussian, tile-row) demand of the ellipse expansion's row stage
    # (0 in rect mode); may exceed cfg.row_capacity — reported, never silent.
    num_rows: jnp.ndarray | None = None
    # Per-tile rank truncation (cfg.tile_rank_cap > 0): the pair list above
    # is the block-COMPACTED truncated layout (length trunc_padded_pairs).
    # num_pairs_kept = real pairs surviving the per-tile cap;
    # trunc_demand = block-aligned slots the kept blocks need — compare
    # against cfg.trunc_padded_pairs for static-capacity overflow (whole
    # trailing-tile blocks are dropped when it exceeds; reported, never
    # silent). Both equal num_pairs / 0 when truncation is off.
    num_pairs_kept: jnp.ndarray | None = None
    trunc_demand: jnp.ndarray | None = None


def depth_order(depth: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Global front-to-back order [N]; invalid gaussians sort last."""
    key = jnp.where(valid, depth, jnp.inf)
    return jnp.argsort(key).astype(jnp.int32)


def depth_order_and_rank(depth: jnp.ndarray, valid: jnp.ndarray):
    """Global front-to-back order; invalid gaussians sort last.

    Returns (order [N] indices ascending by depth, rank [N] = inverse perm).
    The rank is an N-sized unique-index scatter (the expensive scatter
    class) — call :func:`depth_order` when only the order is needed (every
    binning path: the expansion keys on depth SLOTS, never on rank).
    """
    n = depth.shape[0]
    order = depth_order(depth, valid)
    rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return order, rank


def _rect_cover_counts(y0, y1, x0, x1, kept, tiles_y: int, tiles_x: int,
                       chunks: int = 0):
    """Tile cover counts of N axis-aligned tile rects — on the MXU.

    counts[y, x] = |{i : kept_i and y0_i <= y < y1_i and x0_i <= x < x1_i}|
    computed as one matmul of 0/1 interval indicators,
    ``einsum('yn,nx->yx', Ry, Cx)`` — an outer-product-of-intervals
    decomposition of each rect. Replaces the 4-corner signed scatter +
    2D prefix sum: scatters are index-rate bound on v5e (~9 ns/index =
    ~4.9 ms for the 4N = 524k corner indices at bench scale) while this
    matmul is bandwidth-bound on the [TY, N] + [N, TX] indicators.
    EXACT: int8 0/1 products accumulate on the MXU's int32 path (counts
    exact to 2^31; measured 1.96 vs 2.34 ms for the bf16->f32 form).

    ``kept`` may be [K, N] (K stacked masks sharing one column-indicator
    operand -> [K, TY, TX], one batched matmul — the truncation path
    needs both post- and pre-capacity-drop counts).

    With ``chunks = C > 0`` returns [C, TY, TX] per-depth-chunk counts
    (the occlusion cull's grids) via one BATCHED matmul over the depth
    axis split into C contiguous chunks; chunk boundaries are padded with
    zero rows, so ragged N is handled exactly.
    """
    n = y0.shape[0]
    ty_i = jnp.arange(tiles_y, dtype=jnp.int32)
    tx_i = jnp.arange(tiles_x, dtype=jnp.int32)
    if not chunks:
        if kept.ndim == 2:
            # K stacked kept-masks share one column-indicator operand:
            # returns [K, TY, TX] in a single batched matmul (the
            # truncation path needs post-drop AND pre-drop counts).
            ry = (
                (y0[None, None, :] <= ty_i[None, :, None])
                & (ty_i[None, :, None] < y1[None, None, :])
                & kept[:, None, :]
            ).astype(jnp.int8)  # [K, TY, N]
            cx = (
                (x0[:, None] <= tx_i[None, :])
                & (tx_i[None, :] < x1[:, None])
            ).astype(jnp.int8)  # [N, TX]
            return jnp.einsum(
                "kyn,nx->kyx", ry, cx, preferred_element_type=jnp.int32
            )
        ry = (
            (y0[None, :] <= ty_i[:, None]) & (ty_i[:, None] < y1[None, :])
            & kept[None, :]
        ).astype(jnp.int8)  # [TY, N]
        cx = (
            (x0[:, None] <= tx_i[None, :]) & (tx_i[None, :] < x1[:, None])
        ).astype(jnp.int8)  # [N, TX]
        return jnp.einsum(
            "yn,nx->yx", ry, cx, preferred_element_type=jnp.int32
        )
    chunk = cdiv_i(n, chunks)
    pad = chunks * chunk - n

    def padded(a, fill):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(
            chunks, chunk
        )

    y0r = padded(y0, 0)[:, None, :]  # [C, 1, chunk]
    y1r = padded(y1, 0)[:, None, :]
    keptr = padded(kept, False)[:, None, :]
    x0r = padded(x0, 0)[:, :, None]  # [C, chunk, 1]
    x1r = padded(x1, 0)[:, :, None]
    ty3 = ty_i[None, :, None]
    tx3 = tx_i[None, None, :]
    ry = ((y0r <= ty3) & (ty3 < y1r) & keptr).astype(jnp.int8)
    cx = ((x0r <= tx3) & (tx3 < x1r)).astype(jnp.int8)
    return jnp.einsum(
        "cyk,ckx->cyx", ry, cx, preferred_element_type=jnp.int32
    )


def _occlusion_cull(tile_min, n_u, n_v, counts, cfg: RenderConfig):
    """Pre-sort occlusion cull for the rank-truncated pipeline.

    Zeroes the footprint count of every gaussian whose within-tile depth
    rank PROVABLY reaches >= cap_t = rank_cap_blocks * pair_block at EVERY
    tile of its footprint. Such a gaussian's pairs are all dropped by the
    per-tile block truncation in bin_gaussians, and removing them cannot
    change any tile's kept-block content: the kept set of a tile is its
    first cap_t pairs in depth order, the culled pairs all rank >= cap_t
    at their own tile, and a tile whose count was >= cap_t stays >= cap_t
    after the cull (its first cap_t pairs are untouched). The truncated
    output is therefore BIT-IDENTICAL with the cull on or off — what
    changes is the pre-sort pair DEMAND, i.e. the size every
    expansion/sort/gather stage (and `pair_demand` auto-sizing) runs at.

    Rank lower bound (conservative, gather-light):
      * split the depth order into `cfg.cull_chunks` chunks;
      * per chunk, build the [chunks, tiles_y, tiles_x] footprint-count
        grid with ONE batched 0/1-indicator matmul on the MXU
        (:func:`_rect_cover_counts`; replaced the 4N-corner scatter, which
        was index-rate bound at ~5 ms) and take the cumulative-through-
        chunk sum cnt[c];
      * build corner-anchored min tables of cnt (sparse-table doubling:
        level l = min over the 2^l-square anchored at each tile); for
        gaussian g in chunk c the bound is ONE lookup of cnt[c-1] at g's
        own rect corner, level ceil_log2(span) — a superset-region min
        anchored exactly at the rect, hence a true lower bound of
        min-over-rect of the number of strictly-earlier-chunk gaussians
        covering each tile.

    Gaussians of chunk 0 are never culled. Cost: one batched indicator
    matmul + ~1M-element elementwise grid/table work + four N-sized
    gathers from a [chunks, levels, tiles] table. No reference
    counterpart (the reference composites every pair, render.py:325-410).
    """
    n = counts.shape[0]
    C = max(int(cfg.cull_chunks), 1)
    chunk = cdiv_i(n, C)
    TY, TX = cfg.tiles_y, cfg.tiles_x
    cap_t = cfg.rank_cap_blocks * cfg.pair_block

    kept = counts > 0
    x0 = tile_min[:, 0]
    y0 = tile_min[:, 1]
    x1 = x0 + n_u  # exclusive
    y1 = y0 + n_v
    cidx = jnp.arange(n, dtype=jnp.int32) // chunk

    g2 = _rect_cover_counts(y0, y1, x0, x1, kept, TY, TX, chunks=C)
    cnt = jnp.cumsum(g2, axis=0)  # [C, TY, TX] counts through chunk c

    # Corner-anchored min tables (sparse-table doubling): tab[l][y][x] =
    # min of cnt over the 2^l x 2^l square ANCHORED at (y, x). A rect of
    # span s queried at level ceil_log2(s) is covered by the ONE square
    # anchored at its own corner — a superset that starts exactly at the
    # rect (dilation < s per axis), strictly tighter than an aligned
    # 4-cell pyramid query (whose union can pre/post-extend by a full
    # cell per side: on small grids that diluted the bound to the global
    # min and culled nothing). Squares reaching past the grid edge are
    # padded with a huge sentinel, which can only RAISE nothing (min with
    # BIG is identity) — still a valid lower bound over the rect.
    # The cull only ever compares lb >= cap_t, so counts can be CLAMPED at
    # cap_t before the min tables: clamp commutes with min, and it lets the
    # table live in int16 (cap_t = rank_cap_blocks * pair_block is far
    # below 2^15 for practical K) — half the lookup working set, so the
    # four N-sized corner gathers read a cache-resident table. The clamp
    # value doubles as the pad sentinel (min with cap_t never lowers a
    # clamped value below a true bound).
    tab_dtype = jnp.int16 if cap_t < 2**15 else jnp.int32
    cnt_c = jnp.minimum(cnt, cap_t).astype(tab_dtype)
    BIG = jnp.asarray(cap_t if cap_t < 2**15 else 2**30, tab_dtype)
    L = 1
    while (1 << (L - 1)) < max(TY, TX):
        L += 1  # 2^(L-1) >= any possible span -> every query level exists
    tabs = [cnt_c]
    cur = cnt_c
    for l in range(1, L):
        sh = 1 << (l - 1)
        cur = jnp.minimum(
            cur,
            jnp.pad(cur, ((0, 0), (0, sh), (0, 0)),
                    constant_values=BIG)[:, sh:, :],
        )
        cur = jnp.minimum(
            cur,
            jnp.pad(cur, ((0, 0), (0, 0), (0, sh)),
                    constant_values=BIG)[:, :, sh:],
        )
        tabs.append(cur)
    flat1 = jnp.stack(tabs, axis=1).reshape(-1)  # [C * L * TY * TX]

    # Level per gaussian: smallest l with 2^l >= max span.
    span = jnp.maximum(jnp.maximum(n_u, n_v), 1)
    lvl = jnp.zeros(n, jnp.int32)
    for l in range(L - 1):
        lvl = lvl + (span > (1 << l)).astype(jnp.int32)

    # FOUR corner-anchored squares each cover the rect (anchor = corner,
    # or end - 2^l for the far corners; 2^l >= span makes every one a
    # covering superset), so the MAX of their four mins is a tighter
    # valid lower bound — measured 0.56x -> 0.39x of demand at the bench
    # pose, within 3% of the exact min-over-rect (sparse-table RMQ)
    # ceiling, for three extra N-sized lookups.
    s = jnp.left_shift(jnp.int32(1), lvl)
    base_i = ((cidx - 1) * L + lvl) * (TY * TX)
    lim = C * L * TY * TX - 1
    ya, xa = y0, x0
    yb = jnp.clip(y1 - s, 0, TY - 1)
    xb = jnp.clip(x1 - s, 0, TX - 1)

    def cell(cy, cx):
        i = base_i + jnp.clip(cy, 0, TY - 1) * TX + jnp.clip(cx, 0, TX - 1)
        return flat1[jnp.clip(i, 0, lim)]

    lb = jnp.maximum(
        jnp.maximum(cell(ya, xa), cell(ya, xb)),
        jnp.maximum(cell(yb, xa), cell(yb, xb)),
    )
    occluded = kept & (cidx > 0) & (lb >= cap_t)
    return jnp.where(occluded, 0, counts)


def cdiv_i(a: int, b: int) -> int:
    return -(-a // b)


def _cumsum_2level(a: jnp.ndarray, block: int = 4096) -> jnp.ndarray:
    """Exact two-level inclusive cumsum along the last axis.

    Within-4096-block minor-axis scan + a tiny block-total cumsum +
    broadcast add — bit-identical to ``jnp.cumsum`` for integer inputs
    (addition of int32 is associative), measured 3.64 vs 4.51 ms on the
    [3, 4.19M] int32 expansion cumsum (v5e, profile_binning cs-2lvl,
    round 5). Zero-padding the tail adds zeros that never change sums.
    """
    n = a.shape[-1]
    pad = (-n) % block
    ap = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    ap = ap.reshape(a.shape[:-1] + (-1, block))
    within = jnp.cumsum(ap, axis=-1)
    totals = within[..., -1]
    offs = jnp.cumsum(totals, axis=-1) - totals  # exclusive block offsets
    out = within + offs[..., None]
    return out.reshape(a.shape[:-1] + (-1,))[..., :n]


def _expand_pairs(proj: ProjectedGaussians, cfg: RenderConfig):
    """Shared pair expansion: depth order, per-pair (tile, slot), tile counts.

    Returns a dict with the presort (gaussian-major) pair fields used by both
    the rect and ellipse cull modes.
    """
    if cfg.cull_mode == "ellipse":
        return _expand_pairs_ellipse(proj, cfg)
    if cfg.cull_mode != "rect":
        raise ValueError(f"unknown cull_mode {cfg.cull_mode!r}")
    n = proj.depth.shape[0]
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs

    order = depth_order(proj.depth, proj.valid)

    # Footprint counts in DEPTH order so that capacity overflow drops the
    # farthest gaussians' pairs first. (N-sized gathers are cheap.)
    tile_min = proj.tile_min[order]
    tile_max = proj.tile_max[order]
    n_u = jnp.maximum(tile_max[:, 0] - tile_min[:, 0] + 1, 0)
    n_v = jnp.maximum(tile_max[:, 1] - tile_min[:, 1] + 1, 0)
    counts = (n_u * n_v).astype(jnp.int32)

    if cfg.tile_rank_cap and cfg.occlusion_cull:
        # Truncation-only: zero the counts of provably-truncated gaussians
        # BEFORE expansion (bit-identical truncated output; the reported
        # demand below becomes the post-cull demand — the size the
        # truncated pipeline actually needs materialized, which is what
        # pair_demand()-based auto-sizing should size for).
        counts = _occlusion_cull(tile_min, n_u, n_v, counts, cfg)

    # Capacity overflow drops WHOLE gaussians from the back of the depth
    # order (the first non-fitting gaussian and everything behind it): the
    # per-tile pair counts then remain computable in closed form BEFORE the
    # sort, which is what lets the sort itself produce the aligned layout.
    full_cum = jnp.cumsum(counts, dtype=jnp.int32)
    total = full_cum[-1]  # true demand (reported; may exceed cap)
    kept_pre = counts > 0  # pre-capacity-drop cover mask (true tile counts)
    counts = jnp.where(full_cum <= cap, counts, 0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )  # [N+1] exclusive offsets (post-drop)

    # --- expansion, gather-free ---
    # Three independent rank-1 scatter->cumsum channels:
    #   ch 0: histogram of offsets  -> owning depth-slot per pair
    #   row 1: delta-encoded packed footprint (x0 | y0 | width)
    #   row 2: delta-encoded range starts -> local index within footprint
    p = jnp.arange(cap, dtype=jnp.int32)
    packed = (
        tile_min[:, 0]
        | (tile_min[:, 1] << _PACK_BITS)
        | (jnp.maximum(n_u, 1) << (2 * _PACK_BITS))
    ).astype(jnp.int32)
    starts = offsets[:-1]
    # THREE INDEPENDENT 1-D scatters, one per channel. The former fused
    # [3, cap+1] shared-index scatter measured 12.9 ms on v5e vs 5.3 ms
    # for the 1-D trio at bench shapes (scatter_variants, round 4): XLA
    # lowers a batched multi-row scatter through a far slower path than
    # three pipelined rank-1 scatters, even though it touches the index
    # vector once instead of three times. The delta channels originally
    # scatter at starts = offsets[:-1]; scattering at offsets with a
    # trailing zero delta is identical (the extra add at offsets[-1]
    # contributes 0). offsets <= cap by construction (overflow zeroes
    # counts), so index cap stays in range.
    zero1 = jnp.zeros((1,), jnp.int32)
    zrow = jnp.zeros((cap + 1,), jnp.int32)
    acc0 = zrow.at[offsets].add(jnp.ones((n + 1,), jnp.int32), mode="drop")
    acc1 = zrow.at[offsets].add(
        jnp.concatenate([packed[:1], packed[1:] - packed[:-1], zero1]),
        mode="drop",
    )
    acc2 = zrow.at[offsets].add(
        jnp.concatenate([starts[:1], starts[1:] - starts[:-1], zero1]),
        mode="drop",
    )
    # The three cumsums run BATCHED over one stacked [3, cap+1] array:
    # cumsum is pass-count bound on TPU, and one 3-row sweep costs 2.7 ms
    # where three 1-D sweeps cost 3 x 1.7 (profile_binning, round 5) —
    # the mirror image of the scatter finding above (scatters want to be
    # rank-1, cumsums want to be batched). Two-level form: another -20%
    # (profile_binning cs-2lvl).
    cums = _cumsum_2level(jnp.stack([acc0, acc1, acc2]))
    slot = cums[0, :cap] - 1  # searchsorted(offsets, p, 'right') - 1
    packed_p = cums[1, :cap]
    start_p = cums[2, :cap]
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
    # Each kept gaussian covers an axis-aligned tile rectangle; one MXU
    # indicator matmul counts covers per tile (_rect_cover_counts — exact;
    # replaced the index-rate-bound 4-corner scatter). Whole-gaussian
    # overflow dropping (above) is what keeps this exact: partial
    # footprints never occur.
    kept = counts > 0
    y0g = tile_min[:, 1]
    x0g = tile_min[:, 0]
    y1g = y0g + n_v  # exclusive
    x1g = x0g + n_u
    # TRUE per-tile counts, independent of the pair-capacity drop: the
    # demand numbers a probe reports (pair_demand -> trunc_demand /
    # num_pairs_kept) must not be silently clipped by the PROBE config's
    # own max_pairs — a small probe capacity used to under-report the
    # truncation demand ~5x at close-in orbit poses, silently
    # overflow-dropping most blocks in the sized render (round-5 ladder).
    # Both counts come from ONE batched matmul (stacked kept-masks).
    if cfg.tile_rank_cap:
        both = _rect_cover_counts(
            y0g, y1g, x0g, x1g, jnp.stack([kept, kept_pre]),
            cfg.tiles_y, cfg.tiles_x,
        ).reshape(2, num_tiles)
        tile_count = both[0]
        tile_count_true = both[1]
    else:
        tile_count = _rect_cover_counts(
            y0g, y1g, x0g, x1g, kept, cfg.tiles_y, cfg.tiles_x
        ).reshape(num_tiles)
        tile_count_true = tile_count

    return {
        "n": n,
        "order": order,
        "slot": slot,
        "tile_id": tile_id,
        "pair_ok": pair_ok,
        "offsets": offsets,
        "tile_count": tile_count,
        "tile_count_true": tile_count_true,
        "total": total,
        "rows_total": jnp.int32(0),  # rect mode has no row stage
    }


def _expand_pairs_ellipse(proj: ProjectedGaussians, cfg: RenderConfig):
    """Two-level (tile-rows -> pairs) expansion with exact per-row ellipse
    x-intervals — same output contract as the rect branch of
    :func:`_expand_pairs`, with strictly fewer pairs.

    A gaussian's contribution vanishes at every pixel with
    ``q = A du^2 + 2B du dv + C dv^2 > k2`` where
    ``k2 = min(chi2_clip, 2 ln(op / alpha_cutoff))`` — exactly the zero set
    the compositor enforces (raster_pallas._block_alpha; reference cutoff
    semantics render.py:361-374). For a fixed pixel-row band
    ``dy in [l, h]`` the reachable x-extent is

        xhi(dy) = (-B dy + sqrt(A k2 - det dy^2)) / A      (concave in dy)
        xlo(dy) = (-B dy - sqrt(A k2 - det dy^2)) / A      (convex in dy)

    with ``det = AC - B^2 > 0``; xhi's unconstrained peak sits at
    ``dy* = -B sqrt(k2 / (C det))`` where ``xhi = sqrt(k2 C / det)`` (the
    marginal extent), so the band maximum is ``xhi(clip(dy*, l, h))`` by
    concavity (and symmetrically ``xlo(clip(-dy*, l, h))``). One closed-form
    evaluation per (gaussian, tile-row) therefore gives the EXACT tile
    x-interval; a 0.25 px guard absorbs f32 rounding so the cull stays
    conservative vs the kernel's own f32 alpha test. Rect-mode images and
    gradients are reproduced bit-for-bit (tests/test_binning_ellipse.py).

    Pipeline (all static shapes, gather-free on the pair axis):
      rows stage: per-gaussian AABB row counts -> row offsets -> the usual
        histogram + delta-cumsum decode gives each row its gaussian slot and
        local row index; ONE rows-sized row gather fetches the 10 per-gaussian
        cull terms; closed-form interval math yields (txlo, row_len).
      counts: per-tile pair counts via a rows-sized +/-1 interval scatter and
        an x-axis prefix sum (exact, pre-sort — required by the alignment-
        padding sort trick).
      pairs stage: row pair-offsets -> histogram + THREE delta channels
        (packed txlo|ty, row pair-start, gaussian slot) decode every pair's
        tile id and depth slot with one [4, cap+1] cumsum.

    Capacity overflow (rows or pairs) drops whole gaussians from the back of
    the depth order, exactly like rect mode; both demands are reported.
    """
    n = proj.depth.shape[0]
    num_tiles = cfg.num_tiles
    cap = cfg.max_pairs
    cap_r = cfg.row_capacity
    T = cfg.tile

    order = depth_order(proj.depth, proj.valid)

    tile_min = proj.tile_min[order]
    tile_max = proj.tile_max[order]
    n_v = jnp.maximum(tile_max[:, 1] - tile_min[:, 1] + 1, 0)

    # --- per-gaussian cull terms (depth order, sanitized) ---
    valid_o = proj.valid[order]
    uv = proj.uv[order]
    conic = proj.conic[order]
    opac = proj.opacity[order]
    a = jnp.where(valid_o, conic[:, 0], 1.0)
    b = jnp.where(valid_o, conic[:, 1], 0.0)
    c = jnp.where(valid_o, conic[:, 2], 1.0)
    k2 = jnp.minimum(
        cfg.chi2_clip,
        2.0 * jnp.log(jnp.maximum(opac, 1e-12) / cfg.alpha_cutoff),
    )
    # Slight widening keeps the algebraic boundary conservative vs the
    # kernel's directly-evaluated q (different f32 rounding order).
    k2 = jnp.where(valid_o, jnp.maximum(k2, 0.0), 1.0) * (1.0 + 1e-5) + 1e-6
    det = jnp.maximum(a * c - b * b, 1e-12)
    table = jnp.stack(
        [
            jnp.where(valid_o, uv[:, 0], 0.0),
            jnp.where(valid_o, uv[:, 1], 0.0),
            b,
            1.0 / a,
            a * k2,  # P1: discriminant D(dy) = P1 - det dy^2
            det,
            -b * jnp.sqrt(k2 / (c * det)),  # dy* peak of xhi
            tile_min[:, 0].astype(jnp.float32),  # AABB clip (image bounds)
            tile_max[:, 0].astype(jnp.float32),
            tile_min[:, 1].astype(jnp.float32),  # first tile row
        ],
        axis=-1,
    )  # [N, 10]

    # --- rows stage ---
    rows_cum = jnp.cumsum(n_v, dtype=jnp.int32)
    rows_total = rows_cum[-1]
    nrows = jnp.where(rows_cum <= cap_r, n_v, 0).astype(jnp.int32)
    row_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nrows, dtype=jnp.int32)]
    )  # [N+1]

    r = jnp.arange(cap_r, dtype=jnp.int32)
    rstarts = row_off[:-1]
    # TWO INDEPENDENT 1-D scatters (batched multi-row scatters lower
    # pathologically — see the rect branch): the delta channel gains a
    # harmless trailing zero so it shares row_off as index.
    zrowR = jnp.zeros((cap_r + 1,), jnp.int32)
    accR0 = zrowR.at[row_off].add(jnp.ones((n + 1,), jnp.int32), mode="drop")
    accR1 = zrowR.at[row_off].add(
        jnp.concatenate([
            rstarts[:1], rstarts[1:] - rstarts[:-1],
            jnp.zeros((1,), jnp.int32),
        ]),
        mode="drop",
    )
    cumsR0 = jnp.cumsum(accR0)[:cap_r]
    cumsR1 = jnp.cumsum(accR1)[:cap_r]
    gslot = cumsR0 - 1  # [cap_r] depth rank of the row's gaussian, or n
    row_ok = gslot < n
    tv = table[jnp.clip(gslot, 0, n - 1)]  # [cap_r, 10] the ONE row gather

    ly = r - cumsR1
    ty = tv[:, 9].astype(jnp.int32) + ly  # global tile row (exact: <= 1023)
    tyl = ty % cfg.view_tile_rows if cfg.view_tile_rows else ty
    dyl = tyl.astype(jnp.float32) * T - tv[:, 1]  # band of pixel-center dys
    dyh = dyl + (T - 1)
    dy0 = jnp.clip(0.0, dyl, dyh)
    nonempty = tv[:, 4] - tv[:, 5] * dy0 * dy0 >= 0.0  # D at band's best dy
    dyc_h = jnp.clip(tv[:, 6], dyl, dyh)
    dyc_l = jnp.clip(-tv[:, 6], dyl, dyh)
    rt_h = jnp.sqrt(jnp.maximum(tv[:, 4] - tv[:, 5] * dyc_h * dyc_h, 0.0))
    rt_l = jnp.sqrt(jnp.maximum(tv[:, 4] - tv[:, 5] * dyc_l * dyc_l, 0.0))
    xhi = tv[:, 0] + (-tv[:, 2] * dyc_h + rt_h) * tv[:, 3] + 0.25
    xlo = tv[:, 0] + (-tv[:, 2] * dyc_l - rt_l) * tv[:, 3] - 0.25
    rmask = row_ok & nonempty  # NaN-safe: NaN >= 0 is False
    xhi = jnp.where(rmask, xhi, 0.0)
    xlo = jnp.where(rmask, xlo, 0.0)
    txlo = jnp.maximum(
        jnp.where(rmask, tv[:, 7], 0.0), jnp.floor(xlo / T)
    ).astype(jnp.int32)
    txhi = jnp.minimum(
        jnp.where(rmask, tv[:, 8], -1.0), jnp.floor(xhi / T)
    ).astype(jnp.int32)
    ty = jnp.where(rmask, ty, 0)
    rlen = jnp.where(rmask, jnp.maximum(txhi - txlo + 1, 0), 0).astype(
        jnp.int32
    )
    # Packing-safe txlo (only consumed where rlen > 0; clamp keeps the
    # delta-encoded int32 packing in range for empty/garbage rows).
    txlo = jnp.clip(txlo, 0, _PACK_MASK)

    # --- per-gaussian pair totals; whole-gaussian drop at pair capacity ---
    S = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rlen, dtype=jnp.int32)]
    )
    g_pairs = S[row_off[1:]] - S[row_off[:-1]]  # [N]
    full_cum = jnp.cumsum(g_pairs, dtype=jnp.int32)
    total = full_cum[-1]  # demand over materialized rows (exact unless the
    # row stage itself overflowed — then rows_total > cap_r flags it)
    cut = jnp.sum(full_cum <= cap).astype(jnp.int32)
    rlen = jnp.where(gslot < cut, rlen, 0)
    S2 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rlen, dtype=jnp.int32)]
    )  # [cap_r+1]; S2[-1] = kept pairs <= cap
    offsets = S2[row_off]  # [N+1] presort pair boundaries per gaussian

    # --- exact per-tile counts BEFORE the sort (interval scatter) ---
    one = (rlen > 0).astype(jnp.int32)
    ty_sc = jnp.where(rlen > 0, ty, cfg.tiles_y)  # out-of-range -> dropped
    # ONE scatter for both interval endpoints (see the rect branch's
    # corner scatter: dependent .add chains serialize).
    gridr = jnp.zeros((cfg.tiles_y, cfg.tiles_x + 1), jnp.int32).at[
        jnp.concatenate([ty_sc, ty_sc]),
        jnp.concatenate([txlo, txlo + rlen]),
    ].add(jnp.concatenate([one, -one]), mode="drop")
    tile_count = jnp.cumsum(gridr, axis=1)[:, : cfg.tiles_x].reshape(
        num_tiles
    )

    # --- pairs stage: histogram + three delta channels, one cumsum ---
    packed = (txlo | (ty << _PACK_BITS)).astype(jnp.int32)
    pstarts = S2[:-1]  # [cap_r] first pair of each row
    # Three delta channels, ONE cumsum. (No boundary-count channel: when
    # zero-length rows share a pstart with the owning row their deltas sum,
    # and the telescoped cumsum still lands on the owner's value — the last
    # row scattered at a given start is the one whose pairs begin there.)
    zrowP = jnp.zeros((cap + 1,), jnp.int32)
    accP0 = zrowP.at[pstarts].add(
        jnp.concatenate([packed[:1], packed[1:] - packed[:-1]]), mode="drop")
    accP1 = zrowP.at[pstarts].add(
        jnp.concatenate([pstarts[:1], pstarts[1:] - pstarts[:-1]]),
        mode="drop")
    accP2 = zrowP.at[pstarts].add(
        jnp.concatenate([gslot[:1], gslot[1:] - gslot[:-1]]), mode="drop")
    cumsP0 = jnp.cumsum(accP0)[:cap]
    cumsP1 = jnp.cumsum(accP1)[:cap]
    cumsP2 = jnp.cumsum(accP2)[:cap]
    p = jnp.arange(cap, dtype=jnp.int32)
    pair_ok = p < S2[-1]
    packed_p = cumsP0
    local = p - cumsP1  # x offset within the row interval
    tx = (packed_p & _PACK_MASK) + local
    ty_p = (packed_p >> _PACK_BITS) & _PACK_MASK
    tile_id = jnp.where(
        pair_ok, (ty_p * cfg.tiles_x + tx).astype(jnp.int32), num_tiles
    )
    slot = jnp.where(pair_ok, cumsP2, -1)

    return {
        "n": n,
        "order": order,
        "slot": slot,
        "tile_id": tile_id,
        "pair_ok": pair_ok,
        "offsets": offsets,
        "tile_count": tile_count,
        # Ellipse tile counts come from the materialized row stage, so a
        # row/pair-capacity-limited probe may still under-report the
        # truncation demand (ellipse mode is frozen as a capacity-saver;
        # rect mode reports capacity-independent demand).
        "tile_count_true": tile_count,
        "total": total,
        "rows_total": rows_total,
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

    if (num_tiles + 1) * (n + 1) < 2**31:
        # Packed single-key PAYLOAD-FREE sort (keys are unique for real
        # pairs, so stability is irrelevant; each extra payload row costs
        # ~2.6 ms at bench scale — the backward reduction keys on
        # pair_slot instead, see gather_pair_features).
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
        (sorted_key,) = lax.sort((keys,), num_keys=1)
        pair_slot = sorted_key % (n + 1)
        pair_slot = jnp.where(pair_slot == n, -1, pair_slot)
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
        _, pair_slot = lax.sort(
            (tiles_all * 2 + (slots_all == n), slots_all),
            num_keys=2,
        )
        pair_slot = jnp.where(pair_slot == n, -1, pair_slot)

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
    # tile every step; the kernels skip them outright on the flag. Packed
    # with the tile id into ONE int32 per block (SMEM budget).
    from .raster_pallas import pack_block_meta

    block_first = jnp.where(
        block_used,
        (b0 == padded_start[block_tile]).astype(jnp.int32),
        -1,
    )
    block_meta = pack_block_meta(
        block_tile.astype(jnp.int32), block_first.astype(jnp.int32)
    )
    tile_start = padded_start[:num_tiles]
    kept_pairs = total
    trunc_demand = jnp.int32(0)

    if cfg.tile_rank_cap:
        # --- per-tile rank truncation: compact the kept blocks ---
        # Deep-ranked pairs (rank >= tile_rank_cap within their tile) sit
        # behind hundreds of closer splats; dropping them approximates the
        # composite like the XLA fallback's front-most max_per_tile cap.
        # Kept blocks are the first Kb blocks of every tile — a CONTIGUOUS
        # subsequence per tile — so compaction is a block-granular gather
        # (num_trunc_blocks indices moving whole [16, G] rows: index-count
        # cheap, bandwidth-bound), not a pairs-sized index op.
        Kb = cfg.rank_cap_blocks
        keepb = jnp.minimum(padded_count // G, Kb)  # [num_tiles] blocks
        new_start_b = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(keepb, dtype=jnp.int32)]
        )  # [num_tiles + 1]
        n_new = cfg.num_trunc_blocks
        nb0 = jnp.arange(n_new, dtype=jnp.int32)
        # Owner tile per new block: histogram of new starts + cumsum (the
        # same gather-free trick as block_tile above).
        nhist = jnp.zeros(n_new + 1, jnp.int32).at[
            jnp.clip(new_start_b, 0, n_new)
        ].add(1)
        nb_tile = jnp.clip(
            jnp.cumsum(nhist)[:n_new] - 1, 0, num_tiles - 1
        )
        nb_used = nb0 < new_start_b[num_tiles]
        src_block = jnp.clip(
            padded_start[nb_tile] // G + (nb0 - new_start_b[nb_tile]),
            0, num_blocks - 1,
        )
        nb_first = jnp.where(
            nb_used, (nb0 == new_start_b[nb_tile]).astype(jnp.int32), -1
        )
        block_meta = pack_block_meta(nb_tile.astype(jnp.int32), nb_first)
        pair_slot = jnp.where(
            nb_used[:, None], pair_slot.reshape(num_blocks, G)[src_block], -1
        ).reshape(-1)
        cap_t = Kb * G
        # Reported demand uses the TRUE (capacity-independent) tile counts
        # so probes can't under-report when their own max_pairs clipped the
        # materialized layout (the layout itself stays materialized).
        tile_count_true = ex["tile_count_true"]
        kept_pairs = jnp.sum(jnp.minimum(tile_count_true, cap_t))
        trunc_demand = jnp.sum(
            jnp.minimum((tile_count_true + G - 1) // G, Kb)
        ) * G  # block-aligned slots
        tile_start = jnp.minimum(new_start_b[:num_tiles] * G,
                                 cfg.trunc_padded_pairs - 1)
        # Static-capacity overflow drops trailing blocks: a tile whose
        # FIRST block fell past the capacity is never written by the
        # kernel — zero its count so the occupied mask stays truthful
        # (tiles losing only their deeper blocks keep a front-most prefix
        # composite; the overflow itself is reported via trunc_demand).
        tile_count = jnp.where(
            new_start_b[:num_tiles] < n_new,
            jnp.minimum(tile_count, cap_t),
            0,
        )

    return TileBinning(
        pair_slot=pair_slot,
        tile_start=tile_start,
        tile_count=tile_count,
        block_meta=block_meta,
        num_pairs=total,
        depth_order=order,
        gauss_offsets=offsets,
        num_rows=ex["rows_total"],
        num_pairs_kept=kept_pairs,
        trunc_demand=trunc_demand,
    )
