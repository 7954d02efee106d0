#!/usr/bin/env python
"""Instruction-class breakdown of ONE rasterizer-kernel invocation.

VERDICT r2 #4 / NEXT §17c: the aligned Pallas kernel costs a flat
~0.5 us per 128-pair block that survived every grid restructuring
(per-tile grids, DMA chunking, mega-stepping — NEXT §1b/13/15). This
harness times the BARE kernel on a synthetic block-aligned pair list
(no binning, no gather, no saturation skips) across ablations that
remove one instruction class at a time:

  full        the shipped forward kernel (raster_pallas._fwd_kernel)
  no-transc   exp/log1p replaced by same-shape mul/add (VPU cheap ops)
  no-mxu      cumsum tri-matmul + channel dot_general removed (VPU only)
  no-compute  feat block read + trivial writeback (DMA + grid only)
  no-input    full compute from iota, feat block never read (no in-DMA)
  empty       touch nothing but the carry row (grid overhead floor)

Each variant reports ns/block; differences attribute the unit cost to
VPU transcendentals vs MXU vs input DMA vs per-step pipeline overhead.
Run on the real TPU (nohup — first compile of 6 kernels takes minutes).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu import RenderConfig
from gsplat_tpu.ops.raster_pallas import (
    FEAT_WIDTH,
    META_SHIFT,
    _block_alpha,
    _cumsum_rows_incl,
    _fwd_kernel,
    _pixel_grid,
    _use_interpret,
    pack_block_meta,
)


def _kernel_no_transc(block_meta_ref, feat_ref, out_ref, *, cfg):
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    first = meta & 3
    P = cfg.tile * cfg.tile
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    rgb_in = jnp.where(first == 1, jnp.zeros((4, P), jnp.float32),
                       out_ref[0, 0:4, :])

    @pl.when((first == 1) | (jnp.max(T_in) > cfg.transmittance_min))
    def _():
        feats = feat_ref[...].T
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id)
        u, v = feats[:, 0:1], feats[:, 1:2]
        ca, cb, cc, op = (feats[:, 2:3], feats[:, 3:4], feats[:, 4:5],
                          feats[:, 5:6])
        du = px - u
        dv = py - v
        q = ca * du * du + 2.0 * cb * du * dv + cc * dv * dv
        # exp(-q/2) -> rational stand-in: same masking, zero transcendentals.
        g = jnp.where(q <= cfg.chi2_clip, 1.0 / (1.0 + 0.5 * q), 0.0)
        a_raw = op * g
        alpha = jnp.minimum(a_raw, cfg.alpha_max)
        alpha = jnp.where(alpha >= cfg.alpha_cutoff, alpha, 0.0)
        s = -alpha  # log1p(-a) ~ -a stand-in
        cum = _cumsum_rows_incl(s)
        T_excl = (1.0 + (cum - s)) * T_in  # exp(x) -> 1+x stand-in
        w = jnp.where(T_excl > cfg.transmittance_min, alpha * T_excl, 0.0)
        chans = feats[:, 6:10]
        contrib = jax.lax.dot_general(
            chans, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, 0:4, :] = rgb_in + contrib
        out_ref[0, 4:5, :] = T_in * (1.0 + jnp.sum(s, axis=0, keepdims=True))


def _kernel_cumprod(block_meta_ref, feat_ref, out_ref, *, cfg):
    """EXACT candidate replacement (not an ablation): transmittance via a
    two-level direct cumprod of (1 - alpha) — zero transcendentals, zero
    MXU — instead of exp(cumsum(log1p(-alpha))). Same math as the torch
    reference's shifted cumprod (render.py:379-383); f32 product error over
    128 factors is comparable to the log-space path's exp/log rounding."""
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    first = meta & 3
    P = cfg.tile * cfg.tile
    G = cfg.pair_block
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    rgb_in = jnp.where(first == 1, jnp.zeros((4, P), jnp.float32),
                       out_ref[0, 0:4, :])

    @pl.when((first == 1) | (jnp.max(T_in) > cfg.transmittance_min))
    def _():
        feats = feat_ref[...].T
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id)
        alpha, *_ = _block_alpha(feats, px, py, cfg)
        m = 1.0 - alpha  # [G, P]
        # Two-level exclusive cumprod: groups of 8 rows.
        R = 8
        K = G // R
        mg = m.reshape(K, R, P)
        # Within-group exclusive prefixes, built serially (7 multiplies).
        parts = [jnp.ones((K, 1, P), jnp.float32)]
        run = mg[:, 0:1, :]
        for j in range(1, R):
            parts.append(run)
            run = run * mg[:, j : j + 1, :]
        within = jnp.concatenate(parts, axis=1)  # [K, R, P] exclusive
        gtot = run[:, 0, :]  # [K, P] full group products
        # Exclusive prefix over the K groups (serial, K-1 multiplies).
        gparts = [jnp.ones((1, P), jnp.float32)]
        grun = gtot[0:1, :]
        for k in range(1, K):
            gparts.append(grun)
            grun = grun * gtot[k : k + 1, :]
        gpre = jnp.concatenate(gparts, axis=0)  # [K, P]
        T_excl = (within * gpre[:, None, :]).reshape(G, P) * T_in
        alive = T_excl > cfg.transmittance_min
        w = jnp.where(alive, alpha * T_excl, 0.0)
        chans = feats[:, 6:10]
        contrib = jax.lax.dot_general(
            chans, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, 0:4, :] = rgb_in + contrib
        out_ref[0, 4:5, :] = T_in * grun  # grun = full 128-row product


def _kernel_no_mxu(block_meta_ref, feat_ref, out_ref, *, cfg):
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    first = meta & 3
    P = cfg.tile * cfg.tile
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    rgb_in = jnp.where(first == 1, jnp.zeros((4, P), jnp.float32),
                       out_ref[0, 0:4, :])

    @pl.when((first == 1) | (jnp.max(T_in) > cfg.transmittance_min))
    def _():
        feats = feat_ref[...].T
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id)
        alpha, *_ = _block_alpha(feats, px, py, cfg)
        s = jnp.log1p(-alpha)
        # NO cumsum matmul: order-free approximation (T_in only).
        w = jnp.where(T_in > cfg.transmittance_min, alpha * T_in, 0.0)
        chans = feats[:, 6:10]  # [G, 4]
        # NO dot_general: VPU reduce over G per channel.
        contrib = jnp.stack(
            [jnp.sum(chans[:, c:c + 1] * w, axis=0) for c in range(4)]
        )
        out_ref[0, 0:4, :] = rgb_in + contrib
        out_ref[0, 4:5, :] = T_in * jnp.exp(jnp.sum(s, axis=0, keepdims=True))


def _kernel_no_compute(block_meta_ref, feat_ref, out_ref, *, cfg):
    b = pl.program_id(0)
    first = block_meta_ref[b] & 3
    P = cfg.tile * cfg.tile
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    feats = feat_ref[...]  # force the input DMA
    # One cheap reduce so the read can't be dead-code-eliminated.
    out_ref[0, 4:5, :] = T_in + jnp.sum(feats[0:1, :], axis=1, keepdims=True)


def _kernel_no_input(block_meta_ref, feat_ref, out_ref, *, cfg):
    b = pl.program_id(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    first = meta & 3
    P = cfg.tile * cfg.tile
    G = cfg.pair_block
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    rgb_in = jnp.where(first == 1, jnp.zeros((4, P), jnp.float32),
                       out_ref[0, 0:4, :])

    @pl.when((first == 1) | (jnp.max(T_in) > cfg.transmittance_min))
    def _():
        # Same compute as `full`, but features come from iota (feat_ref is
        # in the signature yet never read -> Mosaic drops the input DMA).
        # NB: tpu.iota is INTEGER-only (the round-3 TPU run crashed on a
        # float32 broadcasted_iota); generate int32 and cast.
        base = jax.lax.broadcasted_iota(jnp.int32, (G, FEAT_WIDTH), 0)
        feats = base.astype(jnp.float32) * 1e-3 + jax.lax.broadcasted_iota(
            jnp.int32, (G, FEAT_WIDTH), 1
        ).astype(jnp.float32)
        px, py = _pixel_grid(cfg.tile, P, cfg.tiles_x, t_id)
        alpha, *_ = _block_alpha(feats, px, py, cfg)
        s = jnp.log1p(-alpha)
        cum = _cumsum_rows_incl(s)
        T_excl = jnp.exp(cum - s) * T_in
        w = jnp.where(T_excl > cfg.transmittance_min, alpha * T_excl, 0.0)
        chans = feats[:, 6:10]
        contrib = jax.lax.dot_general(
            chans, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, 0:4, :] = rgb_in + contrib
        out_ref[0, 4:5, :] = T_in * jnp.exp(jnp.sum(s, axis=0, keepdims=True))


def _kernel_empty(block_meta_ref, feat_ref, out_ref, *, cfg):
    b = pl.program_id(0)
    first = block_meta_ref[b] & 3
    P = cfg.tile * cfg.tile
    T_in = jnp.where(first == 1, jnp.ones((1, P), jnp.float32),
                     out_ref[0, 4:5, :])
    out_ref[0, 4:5, :] = T_in


def _kernel_pg(block_meta_ref, feat_ref, out_ref, acc_ref, *, cfg, mode):
    """[P, G] orientation candidate (NEXT §26's layout lever): pairs on
    LANES, pixels on sublanes — every per-pair feature row of the native
    [16, G] block broadcasts along sublanes for FREE, killing the
    per-block [16, G] -> [G, 16] transpose (~930 ns measured, the top
    remaining kernel cost in cumprod mode). Consequences handled here:

    * the accumulator lives in a [P, 8] VMEM scratch (cols 0-3 rgbd,
      col 4 transmittance) and is transposed into the [8, P] out block
      only ONCE PER TILE (flush when the next block's tile differs),
      amortizing the transpose across the tile's blocks;
    * transmittance runs along lanes: ``mode="log"`` uses an MXU
      right-matmul against an inclusive upper-triangular mask;
      ``mode="roll"`` is an exact product doubling-scan (7 lane-rolls) —
      the cumprod-family variant with zero transcendentals;
    * the channel contribution is the canonical MN matmul
      [P, G] @ [G, 4] (the [4, G] -> [G, 4] operand transpose is 1/8 the
      old block transpose).
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    meta = block_meta_ref[b]
    t_id = meta >> META_SHIFT
    state = meta & 3
    t = cfg.tile
    P = t * t
    G = cfg.pair_block

    @pl.when(state == 1)
    def _():
        acc_ref[:, 0:4] = jnp.zeros((P, 4), jnp.float32)
        acc_ref[:, 4:5] = jnp.ones((P, 1), jnp.float32)

    T_head = acc_ref[:, 4:5]  # [P, 1]
    active = (state == 1) | (
        (state == 0) & (jnp.max(T_head) > cfg.transmittance_min)
    )

    @pl.when(active)
    def _():
        T_in = acc_ref[:, 4:5]  # [P, 1]
        u = feat_ref[0:1, :]  # [1, G] rows: sublane broadcast is free
        v = feat_ref[1:2, :]
        ca = feat_ref[2:3, :]
        cb = feat_ref[3:4, :]
        cc = feat_ref[4:5, :]
        op = feat_ref[5:6, :]
        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        ox = (t_id % cfg.tiles_x) * t
        oy = (t_id // cfg.tiles_x) * t
        px = (pix % t + ox).astype(jnp.float32)  # [P, 1]
        py = (pix // t + oy).astype(jnp.float32)
        du = px - u  # [P, G]
        dv = py - v
        q = ca * du * du + 2.0 * cb * du * dv + cc * dv * dv
        g = jnp.where(q <= cfg.chi2_clip, jnp.exp(-0.5 * q), 0.0)
        a_raw = op * g
        a_cl = jnp.minimum(a_raw, cfg.alpha_max)
        alpha = jnp.where(a_cl >= cfg.alpha_cutoff, a_cl, 0.0)
        if mode == "log":
            s = jnp.log1p(-alpha)
            row = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
            upper_incl = (row <= col).astype(jnp.float32)
            cum = jax.lax.dot_general(
                s, upper_incl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [P, G] inclusive lane-cumsum
            T_excl = jnp.exp(cum - s) * T_in
            T_out = T_in * jnp.exp(cum[:, G - 1 : G])
        else:
            m = 1.0 - alpha
            lane = jax.lax.broadcasted_iota(jnp.int32, (P, G), 1)
            x = m
            k = 1
            while k < G:
                x = x * jnp.where(lane >= k, pltpu.roll(x, k, 1), 1.0)
                k *= 2
            # x = inclusive lane cumprod; exclusive = shift right by one.
            excl = jnp.where(lane >= 1, pltpu.roll(x, 1, 1), 1.0)
            T_excl = excl * T_in
            T_out = T_in * x[:, G - 1 : G]
        alive = T_excl > cfg.transmittance_min
        w = jnp.where(alive, alpha * T_excl, 0.0)  # [P, G]
        chans = feat_ref[6:10, :].T  # [G, 4]
        contrib = jax.lax.dot_general(
            w, chans, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, 4]
        acc_ref[:, 0:4] = acc_ref[:, 0:4] + contrib
        acc_ref[:, 4:5] = T_out

    nxt = block_meta_ref[jnp.minimum(b + 1, nb - 1)]
    flush = (b == nb - 1) | ((nxt >> META_SHIFT) != t_id)

    @pl.when(flush)
    def _():
        out_ref[0, 0:8, :] = acc_ref[...].T  # one [P,8]->[8,P] per TILE


VARIANTS = {
    "full": _fwd_kernel,
    "cumprod": _kernel_cumprod,
    "pg-roll": functools.partial(_kernel_pg, mode="roll"),
    "pg-log": functools.partial(_kernel_pg, mode="log"),
    "no-transc": _kernel_no_transc,
    "no-mxu": _kernel_no_mxu,
    "no-compute": _kernel_no_compute,
    "no-input": _kernel_no_input,
    "empty": _kernel_empty,
}
PG_VARIANTS = {"pg-roll", "pg-log"}


def run_variant(name, kernel, pair_feat, block_meta, cfg, iters):
    P = cfg.tile * cfg.tile
    num_blocks = block_meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((FEAT_WIDTH, cfg.pair_block),
                         lambda b, bm: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, P), lambda b, bm: (bm[b] >> META_SHIFT, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((P, 8), jnp.float32)] if name in PG_VARIANTS else []
        ),
    )
    fn = jax.jit(lambda bm, f: pl.pallas_call(
        functools.partial(kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.num_tiles, 8, P), jnp.float32),
        interpret=_use_interpret(),
    )(bm, f))
    out = fn(block_meta, pair_feat)
    out.block_until_ready()
    chk = float(jnp.sum(out[0, 0:5, :]))  # tile-0 digest: cross-variant sanity
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(block_meta, pair_feat)
    # Host fetch: block_until_ready can no-op on axon re-dispatch (bench.py).
    float(out[0, 4, 0])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:11s} {dt * 1e3:8.2f} ms  "
        f"{dt / num_blocks * 1e9:7.1f} ns/block  tile0-digest {chk:.4f}",
        flush=True,
    )
    return dt


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--blocks-per-tile", type=int, default=4)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--only", default=None,
                   help="comma-separated variant subset")
    args = p.parse_args()

    # Workload: every tile owns `blocks_per_tile` consecutive blocks; low
    # opacity keeps transmittance above threshold so NO block is skipped
    # (isolates per-block cost from the saturation early-exit).
    # max_pairs is irrelevant here: the pallas_call is built directly from
    # the synthesized block list, not from cfg.padded_pairs.
    cfg = RenderConfig(
        height=args.height, width=args.width, max_pairs=2**18
    )
    bpt = args.blocks_per_tile
    num_tiles = cfg.num_tiles
    num_blocks = num_tiles * bpt
    block_tile = jnp.asarray(
        np.repeat(np.arange(num_tiles, dtype=np.int32), bpt)
    )
    bf = np.zeros((num_blocks,), np.int32)
    bf[::bpt] = 1
    block_meta = pack_block_meta(block_tile, jnp.asarray(bf))

    rng = np.random.default_rng(0)
    npairs = num_blocks * cfg.pair_block
    feat = np.zeros((FEAT_WIDTH, npairs), np.float32)
    feat[0] = rng.uniform(0, cfg.tile, npairs)   # u (tile-local-ish)
    feat[1] = rng.uniform(0, cfg.tile, npairs)   # v
    feat[2] = rng.uniform(0.05, 0.3, npairs)     # conic a
    feat[3] = rng.uniform(-0.02, 0.02, npairs)   # conic b
    feat[4] = rng.uniform(0.05, 0.3, npairs)     # conic c
    feat[5] = 0.05                               # opacity: never saturates
    feat[6:10] = rng.uniform(0, 1, (4, npairs))
    # u/v must be in GLOBAL pixel coords for the real kernel: offset by tile.
    tile_of_pair = np.repeat(np.asarray(block_tile), cfg.pair_block)
    feat[0] += (tile_of_pair % cfg.tiles_x) * cfg.tile
    feat[1] += (tile_of_pair // cfg.tiles_x) * cfg.tile
    pair_feat = jnp.asarray(feat)

    names = list(VARIANTS) if not args.only else args.only.split(",")
    print(
        f"device={jax.devices()[0]} tiles={num_tiles} "
        f"blocks={num_blocks} ({bpt}/tile)",
        flush=True,
    )
    for name in names:
        run_variant(name, VARIANTS[name], pair_feat, block_meta,
                    cfg, args.iters)


if __name__ == "__main__":
    main()
