#!/usr/bin/env python
"""Sub-stage attribution of the binning pipeline at bench shapes.

Round-4 stage cuts put `fwd to pair_feat` at ~25 ms of a ~30 ms truncated
1080p forward — binning + feature gather is now ~85% of the frame. This
harness times each constituent op on the REAL shapes so the next
optimization targets the dominant term:

  sort        payload-free packed int32 lax.sort at cap_pad
  cumsum3     the [3, cap+1] int32 expansion cumsum
  scatter3    the fused 3-channel expansion scatter (N-sized indices)
  decode      elementwise pair decode (mod/div/shift chain)
  corners     4-corner tile-count scatter + 2D prefix
  argsortN    depth argsort + rank scatter (N-sized)
  bin-full    bin_gaussians end-to-end
  bin-trunc   bin_gaussians with tile_rank_cap
  gather      gather_pair_features forward at truncated size
  project     cov3d + SH + projection (the non-binning front end)

Run on the real TPU under nohup (compiles are quick — no Pallas here).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(label, fn, *args, iters=20):
    f = jax.jit(fn)  # ONE wrapper: warm the SAME jit cache the loop uses
    # (a second jax.jit(fn) owns a separate cache and recompiles inside
    # the timed loop — that bug cost this script its first TPU run).
    out = jax.block_until_ready(f(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(jax.device_get(jnp.ravel(leaf)[0]))  # host-fetch sync
        reps.append((time.perf_counter() - t0) / iters)
    dt = sorted(reps)[1]
    print(f"{label:12s} {dt*1e3:8.2f} ms  (reps "
          f"{' '.join(f'{r*1e3:.2f}' for r in reps)})", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default="bench_assets/trained_ckpt.npz")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--max_pairs", type=int, default=2**22)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.ops.rasterize import gather_pair_features
    from gsplat_tpu.ops.gaussian import build_cov3d_packed
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.ops.sh import evaluate_sh
    from gsplat_tpu.train.trainer import restore_pool
    from gsplat_tpu.viewer import estimate_scene_center_radius, look_at

    pool = restore_pool(args.checkpoint)
    pos = np.asarray(pool.params["pos"])[np.asarray(pool.alive)]
    center, radius = estimate_scene_center_radius(positions=pos)
    c2w = jnp.asarray(
        look_at(center + np.array([0.0, -0.6 * radius, -4.4 * radius]), center)
    )
    H, W = args.height, args.width
    cfg = RenderConfig(height=H, width=W, max_pairs=args.max_pairs)
    fx = fy = jnp.float32(0.85 * W)
    cx, cy = jnp.float32(W / 2), jnp.float32(H / 2)

    params, alive = pool.params, pool.alive
    n = params["pos"].shape[0]
    print(f"device={jax.devices()[0]} n={n} cap={cfg.max_pairs} "
          f"tiles={cfg.num_tiles}", flush=True)

    def front(params, alive):
        cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
        colors = evaluate_sh(params["f_dc"], params["f_rest"], params["pos"],
                             c2w)
        proj = project_gaussians(
            params["pos"], cov3d, params["opacity_raw"], c2w, fx, fy, cx, cy,
            cfg, extra_valid=alive,
        )
        return proj, colors

    proj, colors = jax.jit(front)(params, alive)
    proj = jax.block_until_ready(proj)
    bench("project", front, params, alive, iters=args.iters)

    bench("bin-full", lambda pr: B.bin_gaussians(pr, cfg), proj,
          iters=args.iters)
    tcfg = cfg.with_(tile_rank_cap=1024, trunc_pairs=2**20)
    bench("bin-trunc", lambda pr: B.bin_gaussians(pr, tcfg), proj,
          iters=args.iters)

    binning = jax.block_until_ready(jax.jit(
        lambda pr: B.bin_gaussians(pr, tcfg))(proj))

    # --- isolated constituents at the same shapes ---
    cap = cfg.max_pairs
    num_tiles = cfg.num_tiles
    rng = np.random.default_rng(0)
    G = cfg.pair_block

    # sort: same key structure as the real packed sort.
    cap_pad = binning.pair_slot.shape[0]
    keys = jnp.asarray(
        rng.integers(0, num_tiles * (n + 1), cap_pad, dtype=np.int32)
    )
    bench("sort", lambda k: lax.sort((k,), num_keys=1)[0], keys,
          iters=args.iters)

    # cumsum3 over [3, cap+1] int32.
    acc = jnp.asarray(rng.integers(0, 3, (3, cap + 1), dtype=np.int32))
    bench("cumsum3", lambda a: jnp.cumsum(a, axis=1), acc, iters=args.iters)
    acc1 = acc[0]
    bench("cumsum1", lambda a: jnp.cumsum(a), acc1, iters=args.iters)

    # scatter3: N+1 shared-index fused scatter into [3, cap+1].
    offs = jnp.asarray(
        np.sort(rng.integers(0, cap, n + 1).astype(np.int32))
    )
    vals = jnp.asarray(rng.integers(0, 5, (3, n + 1), dtype=np.int32))
    bench(
        "scatter3",
        lambda o, v: jnp.zeros((3, cap + 1), jnp.int32).at[:, o].add(
            v, mode="drop"),
        offs, vals, iters=args.iters,
    )

    # decode: the elementwise chain over cap pairs.
    cums = jnp.asarray(rng.integers(0, 2**30, (3, cap), dtype=np.int32))

    def decode(cums):
        slot = cums[0] - 1
        packed_p = cums[1]
        start_p = cums[2]
        pair_ok = slot < n
        p = jnp.arange(cap, dtype=jnp.int32)
        local = p - start_p
        x0 = packed_p & B._PACK_MASK
        y0 = (packed_p >> B._PACK_BITS) & B._PACK_MASK
        nu = jnp.maximum((packed_p >> (2 * B._PACK_BITS)) & B._PACK_MASK, 1)
        tx = x0 + local % nu
        ty = y0 + local // nu
        tile_id = jnp.where(pair_ok, ty * cfg.tiles_x + tx, num_tiles)
        return tile_id, jnp.where(pair_ok, slot, -1)

    bench("decode", decode, cums, iters=args.iters)

    # corners: 4-corner signed scatter + 2D prefix.
    x0g = jnp.asarray(rng.integers(0, cfg.tiles_x, n, dtype=np.int32))
    y0g = jnp.asarray(rng.integers(0, cfg.tiles_y, n, dtype=np.int32))
    x1g = jnp.minimum(x0g + 4, cfg.tiles_x)
    y1g = jnp.minimum(y0g + 4, cfg.tiles_y)
    one = jnp.ones((n,), jnp.int32)

    def corners(x0g, y0g, x1g, y1g):
        grid2 = jnp.zeros((cfg.tiles_y + 1, cfg.tiles_x + 1), jnp.int32).at[
            jnp.concatenate([y0g, y0g, y1g, y1g]),
            jnp.concatenate([x0g, x1g, x0g, x1g]),
        ].add(jnp.concatenate([one, -one, -one, one]), mode="drop")
        return jnp.cumsum(jnp.cumsum(grid2, axis=0), axis=1)

    bench("corners", corners, x0g, y0g, x1g, y1g, iters=args.iters)

    # argsortN + rank scatter.
    depth = jnp.asarray(rng.uniform(0.1, 10, n).astype(np.float32))
    valid = jnp.asarray(rng.uniform(0, 1, n) > 0.1)
    bench("argsortN", B.depth_order_and_rank, depth, valid, iters=args.iters)

    # gather: pair-feature expansion at the truncated size.
    feat10 = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
    bench(
        "gather",
        lambda f, s: gather_pair_features(
            tcfg.max_pairs, True, 0, f, s, binning.gauss_offsets),
        feat10, binning.pair_slot, iters=args.iters,
    )

    # gather split A/B: one [16, N] multi-row gather vs independent
    # narrower gathers (the scatter-trio finding in reverse: does XLA
    # pipeline independent 1-D gathers better than one batched gather?)
    tp = binning.pair_slot.shape[0]
    idx = jnp.clip(binning.pair_slot, 0, n - 1)
    tab16 = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32))
    # Gather splitting measured CATASTROPHIC (round 5): 8x[2,N] gathers
    # 19,923 ms vs 4.08 ms for the one [16,N] gather — keep only the
    # canonical form here (NEXT.md 38).
    bench("g16x1", lambda t, i: t[:, i], tab16, idx, iters=args.iters)

    # cumsum variants at [3, cap+1]: flat (current) vs two-level
    # (within-4096-block minor-axis scan + block-offset broadcast).
    acc3 = jnp.asarray(rng.integers(0, 3, (3, cap + 1), dtype=np.int32))

    def cs2(a):
        K = 4096
        pad = (-a.shape[1]) % K
        ap = jnp.pad(a, ((0, 0), (0, pad))).reshape(3, -1, K)
        within = jnp.cumsum(ap, axis=2)
        offs_b = jnp.cumsum(within[:, :, -1], axis=1)
        offs_b = jnp.concatenate(
            [jnp.zeros((3, 1), a.dtype), offs_b[:, :-1]], axis=1)
        return (within + offs_b[:, :, None]).reshape(3, -1)[:, :a.shape[1]]

    bench("cs-2lvl", cs2, acc3, iters=args.iters)

    # scatter trio (the REAL expansion scatters): three rank-1
    # scatter-adds sharing one index vector (vs the batched scatter3).
    v3 = [jnp.asarray(rng.integers(0, 5, n + 1, dtype=np.int32))
          for _ in range(3)]
    bench(
        "scat3x1",
        lambda o, a, b, c: jnp.stack([
            jnp.zeros((cap + 1,), jnp.int32).at[o].add(a, mode="drop"),
            jnp.zeros((cap + 1,), jnp.int32).at[o].add(b, mode="drop"),
            jnp.zeros((cap + 1,), jnp.int32).at[o].add(c, mode="drop"),
        ]),
        offs, *v3, iters=args.iters,
    )

    # isolated occlusion cull at bench geometry (cfg.cull_chunks).
    order = jax.jit(lambda pr: B.depth_order(pr.depth, pr.valid))(proj)
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    n_u = jnp.maximum(tmax[:, 0] - tmin[:, 0] + 1, 0)
    n_v = jnp.maximum(tmax[:, 1] - tmin[:, 1] + 1, 0)
    cnts = (n_u * n_v).astype(jnp.int32)
    bench("cull", lambda *a: B._occlusion_cull(*a, tcfg), tmin, n_u, n_v,
          cnts, iters=args.iters)

    # cover-count matmul (replaced the 4-corner scatter).
    bench("cover-mm", lambda y0, y1, x0, x1, k: B._rect_cover_counts(
        y0, y1, x0, x1, k, cfg.tiles_y, cfg.tiles_x),
        tmin[:, 1], tmin[:, 1] + n_v, tmin[:, 0], tmin[:, 0] + n_u,
        cnts > 0, iters=args.iters)

    # int8 x int8 -> int32 MXU variant of the cover-count matmul.
    def cover_i8(y0, y1, x0, x1, k):
        ty_i = jnp.arange(cfg.tiles_y, dtype=jnp.int32)
        tx_i = jnp.arange(cfg.tiles_x, dtype=jnp.int32)
        ry = ((y0[None, :] <= ty_i[:, None]) & (ty_i[:, None] < y1[None, :])
              & k[None, :]).astype(jnp.int8)
        cx = ((x0[:, None] <= tx_i[None, :])
              & (tx_i[None, :] < x1[:, None])).astype(jnp.int8)
        return jnp.einsum("yn,nx->yx", ry, cx,
                          preferred_element_type=jnp.int32)

    bench("cover-i8", cover_i8,
          tmin[:, 1], tmin[:, 1] + n_v, tmin[:, 0], tmin[:, 0] + n_u,
          cnts > 0, iters=args.iters)


if __name__ == "__main__":
    main()
