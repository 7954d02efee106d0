"""Truncation image-error ladder: err vs tile_rank_cap K across orbit poses.

Round-4 VERDICT Weak #3: the K=1024 "bitwise identical" result was
validated at ONE pose (the bench camera at 4.4x scene radius, where every
dropped pair sits past the kernel's alive-gate). Close-in poses on the
reference-convention orbit (1.0x radius, render_trained.py:237-309 in
/root/reference) have p50 per-tile counts of ~4000 > K, so the error
there was unknown. This script renders N poses of the default orbit
exactly (full-integrity capacity) and truncated at each K, and records
max-abs error + PSNR per (pose, K) — the measured ladder the README
headline must cite.

Run on TPU: nohup python scripts/trunc_error_ladder.py \
    --checkpoint bench_assets/trained_ckpt.npz > .tpuruns/ladder.log &
"""

import argparse
import json

import numpy as np

import sys
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="bench_assets/trained_ckpt.npz")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--orbit_scale", type=float, default=1.0)
    ap.add_argument("--poses", type=int, default=4)
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--exact_pairs", type=int, default=0,
                    help="full-integrity capacity (0 = 1.2x max probed "
                         "demand across the poses)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig, pair_demand, render_from_params
    from gsplat_tpu.train.trainer import restore_pool
    from gsplat_tpu.utils import enable_compilation_cache
    from gsplat_tpu.viewer import (
        create_orbit_trajectory,
        estimate_scene_center_radius,
    )

    enable_compilation_cache()
    pool = restore_pool(args.checkpoint)
    pos = np.asarray(pool.params["pos"])[np.asarray(pool.alive)]
    center, radius = estimate_scene_center_radius(positions=pos)
    traj = create_orbit_trajectory(
        center, radius * args.orbit_scale, num_frames=args.poses
    )
    H, W = args.height, args.width
    fx = fy = jnp.float32(0.85 * W)
    cx, cy = jnp.float32(W / 2), jnp.float32(H / 2)

    def rup(x):
        return max(4096, -(-int(x) // 4096) * 4096)

    # Probe exact demand per pose (truncation off -> no occlusion cull).
    base = RenderConfig(height=H, width=W, max_pairs=2**20,
                        max_per_tile=8192)
    probe = jax.jit(lambda p, a, c: pair_demand(
        p, c, fx, fy, cx, cy, base, alive=a))
    demands = [int(probe(pool.params, pool.alive, jnp.asarray(c2w))[0])
               for c2w in traj]
    print("exact pair demand per pose:", demands, flush=True)
    exact_cap = args.exact_pairs or rup(max(demands) * 1.2)
    print(f"exact capacity {exact_cap}", flush=True)

    # The exact (full-integrity) render at the 1.0x orbit needs ~38-45M
    # padded pairs — more block-meta than the 1 MB scalar-prefetch SMEM
    # holds. Render it in horizontal BANDS via principal-point shift
    # (cy - r0): each band is an exact crop with its own (much smaller)
    # pair demand. Band count auto-doubles until the worst band's
    # block-meta fits comfortably in SMEM.
    bands = 2
    while True:
        bh = H // bands
        bcfg0 = base.with_(height=bh)
        bprobe = jax.jit(lambda p, a, c, by: pair_demand(
            p, c, fx, fy, cx, cy - by, bcfg0, alive=a))
        bdemand = max(
            int(bprobe(pool.params, pool.alive, jnp.asarray(c2w),
                       jnp.float32(b * bh))[0])
            for c2w in traj for b in range(bands)
        )
        band_cap = rup(bdemand * 1.2)
        if (band_cap // 128) * 4 <= 700_000 or bands >= 16:
            break
        bands *= 2
    print(f"exact render: {bands} bands, band capacity {band_cap}",
          flush=True)
    ecfg = base.with_(height=H // bands, max_pairs=band_cap)
    efwd = jax.jit(lambda p, a, c, by: render_from_params(
        p, c, fx, fy, cx, cy - by, ecfg, alive=a)[0])

    def exact_render(c2w):
        bh = H // bands
        return np.concatenate(
            [np.asarray(efwd(pool.params, pool.alive, jnp.asarray(c2w),
                             jnp.float32(b * bh)))
             for b in range(bands)], axis=0)

    exact_imgs = [exact_render(c2w) for c2w in traj]

    # One config per K, capacity-sized to the max demand over the poses,
    # so each K costs ONE compile instead of one per pose.
    results = []
    for K in args.caps:
        tcfg0 = base.with_(tile_rank_cap=K)
        tp = jax.jit(lambda p, a, cc: pair_demand(
            p, cc, fx, fy, cx, cy, tcfg0, alive=a))
        probes = [tp(pool.params, pool.alive, jnp.asarray(c2w))
                  for c2w in traj]
        pds = [int(x[0]) for x in probes]
        tds = [int(x[2]) for x in probes]
        tcfg = tcfg0.with_(max_pairs=rup(max(pds) * 1.2),
                           trunc_pairs=rup(max(tds) * 1.2))
        tfwd = jax.jit(lambda p, a, cc: render_from_params(
            p, cc, fx, fy, cx, cy, tcfg, alive=a)[0])
        for i, c2w in enumerate(traj):
            timg = np.asarray(tfwd(pool.params, pool.alive,
                                   jnp.asarray(c2w)))
            err = float(np.abs(timg - exact_imgs[i]).max())
            mse = float(((timg - exact_imgs[i]) ** 2).mean())
            psnr = float(10 * np.log10(1.0 / mse)) if mse > 0 else float(
                "inf")
            row = {"pose": i, "K": K, "max_abs_err": err,
                   "psnr_vs_exact": round(psnr, 2),
                   "demand_culled": pds[i], "kept": tds[i],
                   "exact_demand": demands[i]}
            results.append(row)
            print(json.dumps(row), flush=True)

    # Summary: worst pose per K.
    print("--- worst-pose summary ---", flush=True)
    for K in args.caps:
        rows = [r for r in results if r["K"] == K]
        worst = max(rows, key=lambda r: r["max_abs_err"])
        print(json.dumps({"K": K, "worst_max_abs_err": worst["max_abs_err"],
                          "worst_psnr": worst["psnr_vs_exact"],
                          "worst_pose": worst["pose"]}), flush=True)


if __name__ == "__main__":
    main()
