"""Segmented compact-layout Pallas rasterizer: tile-spanning mega blocks.

Second-generation TPU kernel replacing the python tile loop of the
reference (/root/reference/gaussian_splatting/render.py:325-410). It differs
from the block-aligned kernel (ops/raster_pallas.py) in two measured ways:

* NO per-tile block alignment. The aligned layout pads every tile's pair
  run to a multiple of 128, a worst case of num_tiles*(pair_block-1) dead
  slots (~1M at 1080p) that every pairs-sized sort/gather — forward sort,
  feature gather, backward payload sort — then pays for. Here tile runs
  abut; a kernel block may span several tiles and the kernel SEGMENTS each
  block in-register. This works because the sorted order is tile-major:
  per-pair tile ids are NON-DECREASING, so a block's segments are grouped
  and a finished tile never reappears.
* MEGA BLOCKS. The grid walks blocks of `cfg.mega_block` (default 1024)
  pairs instead of 128: the per-grid-step fixed cost (~0.5 us/step
  measured in round 1, invariant to DMA/compute restructuring) amortizes
  8x. Within a block, compositing math runs on 128-pair sub-blocks so the
  triangular-matmul cumsum stays [128 x 128 x P] on the MXU.

Completed tiles are flushed from a VMEM accumulator to the HBM output with
double-buffered async DMAs keyed by the (runtime) tile id — the one thing
BlockSpec index maps cannot express.

Per-pair feature rows (feature-major [16, compact_pairs]; see
ops/raster_pallas.py for the layout rationale):
    0:u_local 1:v_local 2:conic_a 3:conic_b 4:conic_c 5:opacity
    6:r 7:g 8:b 9:depth 10:tile_id (exact integer in f32) 11-15:zero
u/v are TILE-LOCAL pixel coordinates (tile origin pre-subtracted at
feature-build time) so the kernel needs no per-block tile metadata.

The backward kernel re-walks the same blocks, reconstructing transmittance
and prefix sums per segment; per-tile pixel cotangent planes are
prefetched one grid step ahead through a double-buffered VMEM cache keyed
by the per-mega-block distinct-tile lists from binning (CompactBinning).
O(pixels) residuals, same as the aligned kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .raster_pallas import (
    FEAT_WIDTH,
    _block_alpha as _sub_alpha,  # identical per-pair alpha math
    _lower_tri,
    _pixel_grid,
    _tri_matmul,
    _use_interpret,
)

SUB = 128  # sub-block width: cumsum/MXU granularity


def _lower_tri_f32(k: int, strict: bool = False):
    return _lower_tri(k, strict, jnp.float32)


def _seg_cumsum(Lseg, x):
    """Segmented inclusive cumsum along axis 0 of [SUB, P] via one MXU
    matmul with the masked lower-triangular matrix."""
    return _tri_matmul(Lseg, x)


def _local_pixel_grid(t: int, P: int):
    """Tile-local pixel coordinates (= the aligned kernel's grid at the
    origin tile of a single-column layout)."""
    return _pixel_grid(t, P, tiles_x=1, tile_id=0)


def _seg_fwd_kernel(feat_ref, out_ref, acc_ref, stage_ref, sem_ref,
                    cur_ref, hist_ref, cnt_ref, *, cfg: RenderConfig):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    P = cfg.tile * cfg.tile
    M = cfg.mega_block
    num_tiles = cfg.num_tiles
    px, py = _local_pixel_grid(cfg.tile, P)
    Ltri = _lower_tri_f32(SUB)
    Lstrict = _lower_tri_f32(SUB, strict=True)

    def wait_slot(slot):
        pltpu.make_async_copy(
            stage_ref.at[slot], out_ref.at[hist_ref[slot]], sem_ref.at[slot]
        ).wait()

    def flush(t_scalar_f, rows03, rowT):
        """Stage (rows03 [4,P], rowT [1,P]) and DMA to out[tile]."""
        t_i = t_scalar_f.astype(jnp.int32)

        @pl.when(t_i < num_tiles)
        def _():
            cnt = cnt_ref[0]
            slot = lax.rem(cnt, 2)

            @pl.when(cnt >= 2)
            def _():
                wait_slot(slot)

            stage_ref[slot, 0:4, :] = rows03
            stage_ref[slot, 4:5, :] = rowT
            stage_ref[slot, 5:8, :] = jnp.zeros((3, P), jnp.float32)
            hist_ref[slot] = t_i
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[t_i], sem_ref.at[slot]
            ).start()
            cnt_ref[0] = cnt + 1

    def process_sub(off):
        f = feat_ref[:, pl.ds(off, SUB)].T  # [SUB, 16]
        tiles = f[:, 10:11]  # [SUB, 1] f32 (exact ints)
        cur_f = cur_ref[0].astype(jnp.float32)

        alpha, _, _, _, _ = _sub_alpha(f, px, py, cfg)
        s_log = jnp.log1p(-alpha)
        same = (tiles == tiles.T).astype(jnp.float32)  # [SUB, SUB]
        cum = _seg_cumsum(Ltri * same, s_log)
        is_cur = tiles == cur_f  # [SUB, 1]
        T_base = jnp.where(is_cur, acc_ref[4:5, :], 1.0)  # [SUB, P]
        T_excl = jnp.exp(cum - s_log) * T_base
        alive = T_excl > cfg.transmittance_min
        w = jnp.where(alive, alpha * T_excl, 0.0)
        chans = f[:, 6:10]  # [SUB, 4]

        # Number of closed segments = first occurrences of each distinct
        # tile, minus one if the leading tile continues `cur` (Mosaic has
        # no sublane concat/shift; derive from the `same` matrix).
        occ_prior = jnp.sum(Lstrict * same, axis=1, keepdims=True)
        first_occ = occ_prior == 0.0  # [SUB, 1]
        nflush = jnp.sum(first_occ.astype(jnp.int32)) - (
            tiles[0, 0] == cur_f
        ).astype(jnp.int32)

        def flush_body(fidx, tprev):
            mask = (tiles == tprev).astype(jnp.float32)
            wm = w * mask
            contrib = jax.lax.dot_general(
                chans, wm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [4, P]
            logT = jnp.sum(s_log * mask, axis=0, keepdims=True)
            first = fidx == 0
            rows03 = jnp.where(first, acc_ref[0:4, :], 0.0) + contrib
            rowT = jnp.where(first, acc_ref[4:5, :], 1.0) * jnp.exp(logT)
            flush(tprev, rows03, rowT)
            tnext = jnp.min(
                jnp.where(tiles > tprev, tiles, jnp.float32(num_tiles))
            )
            return tnext

        t_last = lax.fori_loop(0, nflush, flush_body, cur_f)

        maskc = (tiles == t_last).astype(jnp.float32)
        fresh = nflush > 0
        contrib_c = jax.lax.dot_general(
            chans, w * maskc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        logT_c = jnp.sum(s_log * maskc, axis=0, keepdims=True)
        acc_ref[0:4, :] = (
            jnp.where(fresh, 0.0, acc_ref[0:4, :]) + contrib_c
        )
        acc_ref[4:5, :] = jnp.where(
            fresh, 1.0, acc_ref[4:5, :]
        ) * jnp.exp(logT_c)
        cur_ref[0] = t_last.astype(jnp.int32)

    @pl.when(b == 0)
    def _():
        cur_ref[0] = feat_ref[10, 0].astype(jnp.int32)
        cnt_ref[0] = 0
        acc_ref[0:4, :] = jnp.zeros((4, P), jnp.float32)
        acc_ref[4:5, :] = jnp.ones((1, P), jnp.float32)
        acc_ref[5:8, :] = jnp.zeros((3, P), jnp.float32)

    def sub_body(s, carry):
        off = pl.multiple_of(s * SUB, SUB)
        tiles_sub = feat_ref[10:11, pl.ds(off, SUB)]  # [1, SUB]
        cur_f = cur_ref[0].astype(jnp.float32)
        # Per-sub-block early exit — the round-1 dominant win preserved at
        # the same 128-pair granularity: once a tile saturates, its
        # remaining all-cur sub-blocks skip the entire alpha/composite
        # math. (Correctness: a skipped sub is all-cur with w == 0
        # everywhere, so acc, cur and flushes are unchanged by it.)
        sub_mono = (jnp.min(tiles_sub) == cur_f) & (
            jnp.max(tiles_sub) == cur_f
        )
        sub_sat = jnp.max(acc_ref[4:5, :]) <= cfg.transmittance_min
        sub_skip = sub_mono & sub_sat & ((b > 0) | (s > 0))

        @pl.when(jnp.logical_not(sub_skip))
        def _():
            process_sub(off)

        return carry

    lax.fori_loop(0, M // SUB, sub_body, 0)

    @pl.when(b == nb - 1)
    def _():
        flush(
            cur_ref[0].astype(jnp.float32), acc_ref[0:4, :], acc_ref[4:5, :]
        )
        cnt = cnt_ref[0]

        @pl.when(cnt >= 1)
        def _():
            wait_slot(lax.rem(cnt - 1, 2))

        @pl.when(cnt >= 2)
        def _():
            wait_slot(lax.rem(cnt - 2, 2))


def _seg_fwd_pallas(pair_feat, cfg: RenderConfig):
    P = cfg.tile * cfg.tile
    return pl.pallas_call(
        functools.partial(_seg_fwd_kernel, cfg=cfg),
        grid=(cfg.num_mega_blocks,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, cfg.mega_block), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((cfg.num_tiles, 8, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),  # acc
            pltpu.VMEM((2, 8, P), jnp.float32),  # stage
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),  # cur tile
            pltpu.SMEM((2,), jnp.int32),  # DMA dst history
            pltpu.SMEM((1,), jnp.int32),  # flush count
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_use_interpret(),
    )(pair_feat)


def _seg_bwd_kernel(block_tiles_ref, block_ntiles_ref, feat_ref, gf_ref,
                    dfeat_ref, carry_ref, cache_ref, cur_ref, sem_ref,
                    *, cfg: RenderConfig):
    """Backward re-walk of the segmented forward.

    Per-tile pixel planes (stacked fwd_out rows 0-7 + cotangent rows 8-15)
    are prefetched one grid step ahead into a double-buffered VMEM cache,
    keyed by the per-mega-block distinct-tile lists (scalar prefetch).
    Slot `K` of each cache half is reserved for the blocking fallback when a
    block touches more than cfg.tile_list_cap tiles.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    P = cfg.tile * cfg.tile
    M = cfg.mega_block
    K = cfg.tile_list_cap
    num_tiles = cfg.num_tiles
    px, py = _local_pixel_grid(cfg.tile, P)
    Ltri = _lower_tri_f32(SUB)
    Lstrict = _lower_tri_f32(SUB, strict=True)

    def list_at(block, k):
        # block_tiles is flattened [num_mega * K] (a 2D SMEM operand pads
        # rows to 128 lanes and blows the SMEM budget).
        return block_tiles_ref[block * K + k]

    def cache_copy(buf, k, tile):
        return pltpu.make_async_copy(
            gf_ref.at[tile], cache_ref.at[buf, k], sem_ref.at[buf, k]
        )

    def issue_for(block, buf):
        for k in range(K):
            @pl.when(k < jnp.minimum(block_ntiles_ref[block], K))
            def _():
                cache_copy(buf, k, list_at(block, k)).start()

    def wait_for(block, buf):
        for k in range(K):
            @pl.when(k < jnp.minimum(block_ntiles_ref[block], K))
            def _():
                cache_copy(buf, k, list_at(block, k)).wait()

    buf = lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        cur_ref[0] = feat_ref[10, 0].astype(jnp.int32)
        carry_ref[0:4, :] = jnp.zeros((4, P), jnp.float32)
        carry_ref[4:5, :] = jnp.ones((1, P), jnp.float32)
        carry_ref[5:8, :] = jnp.zeros((3, P), jnp.float32)
        issue_for(0, 0)

    wait_for(b, buf)

    @pl.when(b + 1 < nb)
    def _():
        issue_for(b + 1, 1 - buf)

    def process_sub(off):
        if True:
            f = feat_ref[:, pl.ds(off, SUB)].T  # [SUB, 16]
            tiles = f[:, 10:11]
            cur_f = cur_ref[0].astype(jnp.float32)

            alpha, du, dv, g, a_raw = _sub_alpha(f, px, py, cfg)
            ca = f[:, 2:3]
            cb = f[:, 3:4]
            cc_ = f[:, 4:5]
            op = f[:, 5:6]
            rgb = f[:, 6:10]

            s_log = jnp.log1p(-alpha)
            same = (tiles == tiles.T).astype(jnp.float32)
            Lseg = Ltri * same
            cum = _seg_cumsum(Lseg, s_log)
            is_cur = tiles == cur_f
            T_base = jnp.where(is_cur, carry_ref[4:5, :], 1.0)
            T_excl = jnp.exp(cum - s_log) * T_base
            alive = T_excl > cfg.transmittance_min
            w = jnp.where(alive, alpha * T_excl, 0.0)

            occ_prior = jnp.sum(Lstrict * same, axis=1, keepdims=True)
            first_occ = occ_prior == 0.0
            nflush = jnp.sum(first_occ.astype(jnp.int32)) - (
                tiles[0, 0] == cur_f
            ).astype(jnp.int32)

            def seg_body(j, state):
                t_j, dacc = state
                mask = (tiles == t_j).astype(jnp.float32)  # [SUB, 1]
                nmask = jnp.sum(mask)
                t_i = t_j.astype(jnp.int32)

                # Cache slot of tile t_j: its rank in the ascending list.
                idx = jnp.int32(0)
                ntl = jnp.minimum(block_ntiles_ref[b], K)
                for k in range(K):
                    in_range = k < ntl
                    idx = idx + jnp.where(
                        in_range & (list_at(b, k) < t_i), 1, 0
                    )
                hit = (idx < ntl)
                need_fallback = (
                    (nmask > 0.0) & (t_i < num_tiles)
                    & jnp.logical_not(hit)
                )

                @pl.when(need_fallback)
                def _():
                    dma = cache_copy(buf, K, t_i)
                    dma.start()
                    dma.wait()

                slot = jnp.where(hit, jnp.minimum(idx, K - 1), K)
                gfs = cache_ref[buf, slot]  # [16, P]
                C_final = gfs[0:4, :]
                T_final = gfs[4:5, :]
                gC = gfs[8:12, :]
                gT = gfs[12:13, :]

                prefix_in = jnp.where(
                    t_j == cur_f, carry_ref[0:4, :], 0.0
                )  # [4, P]

                drgb = jax.lax.dot_general(
                    w * mask, gC, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [SUB, 4]
                gdotc = jax.lax.dot_general(
                    rgb, gC, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [SUB, P]
                gP_in = jnp.sum(gC * prefix_in, axis=0)[None, :]
                gS_full = jnp.sum(gC * C_final, axis=0)[None, :]
                gP_incl = gP_in + _seg_cumsum(Lseg, gdotc * w)
                gS = gS_full - gP_incl

                one_minus = jnp.maximum(1.0 - alpha, 1.0 - cfg.alpha_max)
                dalpha = jnp.where(alive, gdotc * T_excl, 0.0) - (
                    gS + gT * T_final
                ) / one_minus
                gate = (a_raw < cfg.alpha_max) & (
                    jnp.minimum(a_raw, cfg.alpha_max) >= cfg.alpha_cutoff
                )
                ga = jnp.where(gate & (mask > 0.0), dalpha, 0.0)

                dop_px = ga * g
                dg = ga * op
                dq = dg * (-0.5) * g
                dca = jnp.sum(dq * du * du, axis=1, keepdims=True)
                dcb = jnp.sum(2.0 * dq * du * dv, axis=1, keepdims=True)
                dcc = jnp.sum(dq * dv * dv, axis=1, keepdims=True)
                ddu = dq * (2.0 * ca * du + 2.0 * cb * dv)
                ddv = dq * (2.0 * cc_ * dv + 2.0 * cb * du)
                du_ = -jnp.sum(ddu, axis=1, keepdims=True)
                dv_ = -jnp.sum(ddv, axis=1, keepdims=True)
                dop = jnp.sum(dop_px, axis=1, keepdims=True)

                contrib = jnp.concatenate(
                    [du_, dv_, dca, dcb, dcc, dop, drgb,
                     jnp.zeros((SUB, FEAT_WIDTH - 10), jnp.float32)],
                    axis=1,
                )  # [SUB, 16]
                dacc = dacc + contrib * mask

                t_next = jnp.min(
                    jnp.where(tiles > t_j, tiles, jnp.float32(num_tiles))
                )
                return t_next, dacc

            t_after, dacc = lax.fori_loop(
                0, nflush + 1, seg_body,
                (cur_f, jnp.zeros((SUB, FEAT_WIDTH), jnp.float32)),
            )
            dfeat_ref[:, pl.ds(off, SUB)] = dacc.T

            # t_after overshoots by one (the loop advances past the last
            # processed segment); the continuing tile is the block's last.
            t_last = tiles[SUB - 1, 0]
            maskc = (tiles == t_last).astype(jnp.float32)
            fresh = t_last != cur_f
            prefix_add = jax.lax.dot_general(
                rgb, w * maskc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [4, P]
            carry_ref[0:4, :] = (
                jnp.where(fresh, 0.0, carry_ref[0:4, :]) + prefix_add
            )
            carry_ref[4:5, :] = jnp.where(
                fresh, 1.0, carry_ref[4:5, :]
            ) * jnp.exp(jnp.sum(s_log * maskc, axis=0, keepdims=True))
            cur_ref[0] = t_last.astype(jnp.int32)

    def sub_body(s, carry):
        off = pl.multiple_of(s * SUB, SUB)
        tiles_sub = feat_ref[10:11, pl.ds(off, SUB)]  # [1, SUB]
        cur_f = cur_ref[0].astype(jnp.float32)
        # Per-sub-block early exit, mirroring the forward kernel: saturated
        # all-cur sub-blocks have w == 0 and zero gradients everywhere.
        sub_mono = (jnp.min(tiles_sub) == cur_f) & (
            jnp.max(tiles_sub) == cur_f
        )
        sub_sat = jnp.max(carry_ref[4:5, :]) <= cfg.transmittance_min
        sub_skip = sub_mono & sub_sat & ((b > 0) | (s > 0))

        @pl.when(sub_skip)
        def _():
            dfeat_ref[:, pl.ds(off, SUB)] = jnp.zeros(
                (FEAT_WIDTH, SUB), jnp.float32
            )

        @pl.when(jnp.logical_not(sub_skip))
        def _():
            process_sub(off)

        return carry

    lax.fori_loop(0, M // SUB, sub_body, 0)


def _seg_bwd_pallas(pair_feat, block_tiles, block_ntiles, fwd_out, gout,
                    cfg: RenderConfig):
    P = cfg.tile * cfg.tile
    K = cfg.tile_list_cap
    gf = jnp.concatenate([fwd_out, gout], axis=1)  # [num_tiles, 16, P]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.num_mega_blocks,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, cfg.mega_block),
                         lambda b, bt, bn: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((FEAT_WIDTH, cfg.mega_block),
                               lambda b, bt, bn: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),  # carry
            pltpu.VMEM((2, K + 1, 16, P), jnp.float32),  # tile cache
            pltpu.SMEM((1,), jnp.int32),  # cur tile
            pltpu.SemaphoreType.DMA((2, K + 1)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_seg_bwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (FEAT_WIDTH, pair_feat.shape[1]), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_use_interpret(),
    )(block_tiles.reshape(-1), block_ntiles, pair_feat, gf)


def _composite_seg_impl(pair_feat, block_tiles, block_ntiles,
                        cfg: RenderConfig):
    """Composite the compact pair list into per-tile pixel buffers.

    Returns [num_tiles, 8, tile*tile] f32: rows 0-3 rgb+depth, row 4 final
    transmittance. Tiles owning no pairs are never written — mask with
    tile_count > 0 downstream.
    """
    return _seg_fwd_pallas(pair_feat, cfg)


composite_pairs_seg = jax.custom_vjp(_composite_seg_impl, nondiff_argnums=(3,))


def _cps_fwd(pair_feat, block_tiles, block_ntiles, cfg):
    out = _seg_fwd_pallas(pair_feat, cfg)
    return out, (pair_feat, block_tiles, block_ntiles, out)


def _cps_bwd(cfg, res, gout):
    pair_feat, block_tiles, block_ntiles, fwd_out = res
    dfeat = _seg_bwd_pallas(
        pair_feat, block_tiles, block_ntiles, fwd_out, gout, cfg
    )
    zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dfeat, zero(block_tiles), zero(block_ntiles)


composite_pairs_seg.defvjp(_cps_fwd, _cps_bwd)
