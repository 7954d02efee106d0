#!/usr/bin/env python
"""Occlusion-cull sweep: post-cull pair demand AND cull cost vs cull_chunks.

The pre-sort occlusion cull (ops/binning.py::_occlusion_cull) trades a
per-frame bound computation against the size every expansion/sort/gather
stage runs at. This sweep measures, at the bench pose (4.4x scene radius)
and a close-in default-orbit pose (1.0x), for each chunk count C:

  * post-cull pair demand (what auto-sizing would size the pipeline for),
  * kept pairs (the truncation floor — demand can't go below this), and
  * the isolated cull cost (jit of counts -> culled counts).

Run on TPU: nohup python scripts/cull_sweep.py > .tpuruns/cull_sweep.log &
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="bench_assets/trained_ckpt.npz")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--tile_rank_cap", type=int, default=1024)
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[16, 32, 64, 128, 256])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.ops import binning as B
    from gsplat_tpu.ops.gaussian import build_cov3d_packed
    from gsplat_tpu.ops.projection import project_gaussians
    from gsplat_tpu.train.trainer import restore_pool
    from gsplat_tpu.viewer import estimate_scene_center_radius, look_at

    pool = restore_pool(args.checkpoint)
    pos = np.asarray(pool.params["pos"])[np.asarray(pool.alive)]
    center, radius = estimate_scene_center_radius(positions=pos)
    H, W = args.height, args.width
    fx = fy = jnp.float32(0.85 * W)
    cx, cy = jnp.float32(W / 2), jnp.float32(H / 2)
    poses = {
        "bench(4.4x)": look_at(
            center + np.array([0.0, -0.6 * radius, -4.4 * radius]), center),
        "orbit(1.0x)": look_at(
            center + np.array([0.0, -0.3 * radius, -1.0 * radius]), center),
    }
    print(f"device={jax.devices()[0]} K={args.tile_rank_cap}", flush=True)

    for name, c2w in poses.items():
        c2w = jnp.asarray(c2w)
        cfg0 = RenderConfig(height=H, width=W, max_pairs=2**20,
                            tile_rank_cap=args.tile_rank_cap)

        def tile_geom(params, alive):
            cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
            proj = project_gaussians(
                params["pos"], cov3d, params["opacity_raw"], c2w,
                fx, fy, cx, cy, cfg0, extra_valid=alive,
            )
            order = B.depth_order(proj.depth, proj.valid)
            tile_min = proj.tile_min[order]
            tile_max = proj.tile_max[order]
            n_u = jnp.maximum(tile_max[:, 0] - tile_min[:, 0] + 1, 0)
            n_v = jnp.maximum(tile_max[:, 1] - tile_min[:, 1] + 1, 0)
            counts = (n_u * n_v).astype(jnp.int32)
            return tile_min, n_u, n_v, counts

        tile_min, n_u, n_v, counts = jax.block_until_ready(
            jax.jit(tile_geom)(pool.params, pool.alive))
        pre = int(jnp.sum(counts))
        cap_t = cfg0.rank_cap_blocks * cfg0.pair_block
        # truncation floor: per-tile exact counts clipped at cap_t
        tc = B._rect_cover_counts(
            tile_min[:, 1], tile_min[:, 1] + n_v,
            tile_min[:, 0], tile_min[:, 0] + n_u,
            counts > 0, cfg0.tiles_y, cfg0.tiles_x)
        kept = int(jnp.sum(jnp.minimum(tc, cap_t)))
        print(f"{name}: pre-cull demand {pre}  truncation floor {kept}",
              flush=True)

        for C in args.chunks:
            cfg = cfg0.with_(cull_chunks=C)
            f = jax.jit(lambda tm, nu, nv, c: B._occlusion_cull(
                tm, nu, nv, c, cfg))
            out = jax.block_until_ready(f(tile_min, n_u, n_v, counts))
            post = int(jnp.sum(out))
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = f(tile_min, n_u, n_v, counts)
                _ = np.asarray(jax.device_get(out[0]))
                reps.append((time.perf_counter() - t0) / args.iters)
            dt = sorted(reps)[1] * 1e3
            print(f"  C={C:4d}  cull {dt:7.2f} ms  post-cull demand {post}"
                  f"  ({post/pre:.3f}x pre, {post/max(kept,1):.3f}x floor)",
                  flush=True)


if __name__ == "__main__":
    main()
