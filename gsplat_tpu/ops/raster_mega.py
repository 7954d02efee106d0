"""Mega-stepped ALIGNED Pallas rasterizer: 8 pair-blocks per grid step.

Third kernel generation, combining the measured winners of the first two
(see NEXT.md §13 for the post-mortem that motivates it):

* ALIGNED pair layout (ops/binning.py `bin_gaussians`): every 128-pair
  block belongs to ONE tile, so the per-block saturation early-exit — the
  dominant win on dense scenes (~60-70% of blocks skipped) — keeps firing,
  unlike the segmented compact layout (ops/raster_seg.py) where tile
  boundaries land inside blocks.
* MEGA grid steps: the grid walks `mega_block/128` aligned blocks per
  step, amortizing the ~0.5 us/grid-step fixed cost (measured invariant
  to DMA/compute restructuring in round 1) by 8x. Tile outputs accumulate
  in VMEM scratch and flush to HBM with double-buffered DMAs on
  tile-change boundaries, which `block_first` marks exactly — no
  in-register segmentation needed.

The backward kernel re-walks the same blocks; the per-tile pixel planes
(fwd output + cotangents, stacked [num_tiles, 16, P]) are prefetched one
grid step ahead, keyed directly by the scalar-prefetched `block_tile` /
`block_first` metadata (at most 8 new tiles per mega step).

Feature layout and math are identical to ops/raster_pallas.py (rows 0-9:
u, v, conic a/b/c, opacity, r, g, b, depth; GLOBAL pixel coordinates);
`composite_pairs_mega` is a drop-in replacement for `composite_pairs`.
Replaces the reference python tile loop + autograd
(/root/reference/gaussian_splatting/render.py:325-410).
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
    _block_alpha,
    _cumsum_rows_incl,
    _pixel_grid,
    _use_interpret,
)

SUB = 128  # aligned pair-block width


def _mega_fwd_kernel(block_tile_ref, block_first_ref, feat_ref, out_ref,
                     acc_ref, stage_ref, sem_ref, state_ref,
                     *, cfg: RenderConfig):
    """state_ref (SMEM [6]): 0 = cur tile (-1 none), 1 = flush count,
    2..5 = DMA destination history per staging slot."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    P = cfg.tile * cfg.tile
    subs = cfg.mega_block // SUB
    num_tiles = cfg.num_tiles

    def wait_slot(slot):
        pltpu.make_async_copy(
            stage_ref.at[slot], out_ref.at[state_ref[2 + slot]],
            sem_ref.at[slot],
        ).wait()

    def flush_cur():
        t_i = state_ref[0]

        @pl.when((t_i >= 0) & (t_i < num_tiles))
        def _():
            cnt = state_ref[1]
            slot = lax.rem(cnt, 4)

            @pl.when(cnt >= 4)
            def _():
                wait_slot(slot)

            stage_ref[slot, 0:4, :] = acc_ref[0:4, :]
            stage_ref[slot, 4:5, :] = acc_ref[4:5, :]
            stage_ref[slot, 5:8, :] = jnp.zeros((3, P), jnp.float32)
            state_ref[2 + slot] = t_i
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[t_i], sem_ref.at[slot]
            ).start()
            state_ref[1] = cnt + 1

    @pl.when(b == 0)
    def _():
        state_ref[0] = -1
        state_ref[1] = 0

    for s in range(subs):
        g = b * subs + s
        t_id = block_tile_ref[g]
        first = block_first_ref[g]

        @pl.when(first == 1)
        def _(t_id=t_id):
            flush_cur()
            state_ref[0] = t_id
            acc_ref[0:4, :] = jnp.zeros((4, P), jnp.float32)
            acc_ref[4:5, :] = jnp.ones((1, P), jnp.float32)

        # Saturation early-exit at the original per-128-block granularity;
        # first == -1 marks DEAD capacity-headroom blocks (skip outright).
        active = (first == 1) | (
            (first == 0)
            & (jnp.max(acc_ref[4:5, :]) > cfg.transmittance_min)
        )

        @pl.when(active & (state_ref[0] >= 0))
        def _(s=s, t_id=t_id):
            feats = feat_ref[:, s * SUB:(s + 1) * SUB].T  # [SUB, 16]
            px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id, cfg.view_tile_rows)
            alpha, *_ = _block_alpha(feats, px, py, cfg)
            s_log = jnp.log1p(-alpha)
            cum = _cumsum_rows_incl(s_log)
            T_excl = jnp.exp(cum - s_log) * acc_ref[4:5, :]
            alive = T_excl > cfg.transmittance_min
            w = jnp.where(alive, alpha * T_excl, 0.0)
            chans = feats[:, 6:10]
            contrib = jax.lax.dot_general(
                chans, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc_ref[0:4, :] = acc_ref[0:4, :] + contrib
            acc_ref[4:5, :] = acc_ref[4:5, :] * jnp.exp(
                jnp.sum(s_log, axis=0, keepdims=True)
            )

    @pl.when(b == nb - 1)
    def _():
        flush_cur()
        cnt = state_ref[1]
        for back in range(1, 5):
            @pl.when(cnt >= back)
            def _(back=back):
                wait_slot(lax.rem(cnt - back, 4))


def _mega_fwd_pallas(pair_feat, block_tile, block_first, cfg: RenderConfig):
    P = cfg.tile * cfg.tile
    subs = cfg.mega_block // SUB
    num_mega = -(-cfg.num_pair_blocks // subs)
    pad_blocks = num_mega * subs - cfg.num_pair_blocks
    if pad_blocks:
        # Trailing unused blocks: tile sentinel (never flushed as cur
        # because first == 0 and their features are zeros).
        block_tile = jnp.concatenate(
            [block_tile, jnp.full((pad_blocks,), 0, jnp.int32)]
        )
        block_first = jnp.concatenate(
            [block_first, jnp.full((pad_blocks,), -1, jnp.int32)]
        )
        pair_feat = jnp.concatenate(
            [
                pair_feat,
                jnp.zeros((FEAT_WIDTH, pad_blocks * SUB), jnp.float32),
            ],
            axis=1,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_mega,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, cfg.mega_block),
                         lambda b, bt, bf: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),  # acc
            pltpu.VMEM((4, 8, P), jnp.float32),  # stage
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SMEM((6,), jnp.int32),  # cur / count / dst history
        ],
    )
    return pl.pallas_call(
        functools.partial(_mega_fwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.num_tiles, 8, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_use_interpret(),
    )(block_tile, block_first, pair_feat)


def _mega_bwd_kernel(block_tile_ref, block_first_ref, feat_ref, gf_ref,
                     dfeat_ref, carry_ref, cache_ref, cur_slab_ref, sem_ref,
                     state_ref, *, cfg: RenderConfig):
    """Backward re-walk. carry_ref rows 0-3 = color prefix, row 4 = T.
    cache_ref [2, subs, 16, P]: per-half, the slabs for each sub's tile
    (fetched one grid step ahead where block_first == 1); cur_slab_ref
    holds the ACTIVE tile's slab (copied from cache on tile change).
    state_ref (SMEM [2]): 0 = cur tile (-1 none), 1 = unused."""
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    P = cfg.tile * cfg.tile
    subs = cfg.mega_block // SUB
    buf = lax.rem(b, 2)

    def issue_for(block, half):
        for s in range(subs):
            g = block * subs + s

            @pl.when(block_first_ref[g] == 1)
            def _(s=s, g=g):
                pltpu.make_async_copy(
                    gf_ref.at[block_tile_ref[g]], cache_ref.at[half, s],
                    sem_ref.at[half, s],
                ).start()

    def wait_for(block, half):
        for s in range(subs):
            g = block * subs + s

            @pl.when(block_first_ref[g] == 1)
            def _(s=s, g=g):
                pltpu.make_async_copy(
                    gf_ref.at[block_tile_ref[g]], cache_ref.at[half, s],
                    sem_ref.at[half, s],
                ).wait()

    @pl.when(b == 0)
    def _():
        state_ref[0] = -1
        issue_for(0, 0)

    wait_for(b, buf)

    @pl.when(b + 1 < nb)
    def _():
        issue_for(b + 1, 1 - buf)

    for s in range(subs):
        g = b * subs + s
        t_id = block_tile_ref[g]
        first = block_first_ref[g]

        @pl.when(first == 1)
        def _(s=s, t_id=t_id):
            state_ref[0] = t_id
            carry_ref[0:4, :] = jnp.zeros((4, P), jnp.float32)
            carry_ref[4:5, :] = jnp.ones((1, P), jnp.float32)
            cur_slab_ref[...] = cache_ref[buf, s]

        active = ((first == 1) | (
            (first == 0)
            & (jnp.max(carry_ref[4:5, :]) > cfg.transmittance_min)
        )) & (state_ref[0] >= 0)

        @pl.when(active)
        def _(s=s, t_id=t_id):
            feats = feat_ref[:, s * SUB:(s + 1) * SUB].T  # [SUB, 16]
            px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id, cfg.view_tile_rows)
            alpha, du, dv, gau, a_raw = _block_alpha(feats, px, py, cfg)
            ca = feats[:, 2:3]
            cb = feats[:, 3:4]
            cc_ = feats[:, 4:5]
            op = feats[:, 5:6]
            rgb = feats[:, 6:10]

            s_log = jnp.log1p(-alpha)
            cum = _cumsum_rows_incl(s_log)
            T_excl = jnp.exp(cum - s_log) * carry_ref[4:5, :]
            alive = T_excl > cfg.transmittance_min
            w = jnp.where(alive, alpha * T_excl, 0.0)

            C_final = cur_slab_ref[0:4, :]
            T_final = cur_slab_ref[4:5, :]
            gC = cur_slab_ref[8:12, :]
            gT = cur_slab_ref[12:13, :]

            drgb = jax.lax.dot_general(
                w, gC, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            gdotc = jax.lax.dot_general(
                rgb, gC, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            gP_in = jnp.sum(gC * carry_ref[0:4, :], axis=0)[None, :]
            gS_full = jnp.sum(gC * C_final, axis=0)[None, :]
            gP_incl = gP_in + _cumsum_rows_incl(gdotc * w)
            gS = gS_full - gP_incl

            one_minus = jnp.maximum(1.0 - alpha, 1.0 - cfg.alpha_max)
            dalpha = jnp.where(alive, gdotc * T_excl, 0.0) - (
                gS + gT * T_final
            ) / one_minus
            gate = (a_raw < cfg.alpha_max) & (
                jnp.minimum(a_raw, cfg.alpha_max) >= cfg.alpha_cutoff
            )
            ga = jnp.where(gate, dalpha, 0.0)

            dop_px = ga * gau
            dg = ga * op
            dq = dg * (-0.5) * gau
            dca = jnp.sum(dq * du * du, axis=1, keepdims=True)
            dcb = jnp.sum(2.0 * dq * du * dv, axis=1, keepdims=True)
            dcc = jnp.sum(dq * dv * dv, axis=1, keepdims=True)
            ddu = dq * (2.0 * ca * du + 2.0 * cb * dv)
            ddv = dq * (2.0 * cc_ * dv + 2.0 * cb * du)
            du_ = -jnp.sum(ddu, axis=1, keepdims=True)
            dv_ = -jnp.sum(ddv, axis=1, keepdims=True)
            dop = jnp.sum(dop_px, axis=1, keepdims=True)

            dfeat_ref[:, s * SUB:(s + 1) * SUB] = jnp.concatenate(
                [du_, dv_, dca, dcb, dcc, dop, drgb,
                 jnp.zeros((SUB, FEAT_WIDTH - 10), jnp.float32)],
                axis=1,
            ).T

            carry_ref[0:4, :] = carry_ref[0:4, :] + jax.lax.dot_general(
                rgb, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            carry_ref[4:5, :] = carry_ref[4:5, :] * jnp.exp(
                jnp.sum(s_log, axis=0, keepdims=True)
            )

        @pl.when(jnp.logical_not(active))
        def _(s=s):
            dfeat_ref[:, s * SUB:(s + 1) * SUB] = jnp.zeros(
                (FEAT_WIDTH, SUB), jnp.float32
            )


def _mega_bwd_pallas(pair_feat, block_tile, block_first, fwd_out, gout,
                     cfg: RenderConfig):
    P = cfg.tile * cfg.tile
    subs = cfg.mega_block // SUB
    num_mega = -(-cfg.num_pair_blocks // subs)
    pad_blocks = num_mega * subs - cfg.num_pair_blocks
    out_cols = pair_feat.shape[1]
    if pad_blocks:
        block_tile = jnp.concatenate(
            [block_tile, jnp.full((pad_blocks,), 0, jnp.int32)]
        )
        block_first = jnp.concatenate(
            [block_first, jnp.full((pad_blocks,), -1, jnp.int32)]
        )
        pair_feat = jnp.concatenate(
            [
                pair_feat,
                jnp.zeros((FEAT_WIDTH, pad_blocks * SUB), jnp.float32),
            ],
            axis=1,
        )
    gf = jnp.concatenate([fwd_out, gout], axis=1)  # [num_tiles, 16, P]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_mega,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, cfg.mega_block),
                         lambda b, bt, bf: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((FEAT_WIDTH, cfg.mega_block),
                               lambda b, bt, bf: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),  # carry
            pltpu.VMEM((2, subs, 16, P), jnp.float32),  # prefetch cache
            pltpu.VMEM((16, P), jnp.float32),  # cur tile slab
            pltpu.SemaphoreType.DMA((2, subs)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    dfeat = pl.pallas_call(
        functools.partial(_mega_bwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (FEAT_WIDTH, pair_feat.shape[1]), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_use_interpret(),
    )(block_tile, block_first, pair_feat, gf)
    return dfeat[:, :out_cols]


def _composite_mega_impl(pair_feat, block_tile, block_first,
                         cfg: RenderConfig):
    """Drop-in for composite_pairs: [num_tiles, 8, P] tile planes."""
    return _mega_fwd_pallas(pair_feat, block_tile, block_first, cfg)


composite_pairs_mega = jax.custom_vjp(
    _composite_mega_impl, nondiff_argnums=(3,)
)


def _cpm_fwd(pair_feat, block_tile, block_first, cfg):
    out = _mega_fwd_pallas(pair_feat, block_tile, block_first, cfg)
    return out, (pair_feat, block_tile, block_first, out)


def _cpm_bwd(cfg, res, gout):
    pair_feat, block_tile, block_first, fwd_out = res
    dfeat = _mega_bwd_pallas(
        pair_feat, block_tile, block_first, fwd_out, gout, cfg
    )
    zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dfeat, zero(block_tile), zero(block_first)


composite_pairs_mega.defvjp(_cpm_fwd, _cpm_bwd)
