#!/usr/bin/env python
"""Evaluate a trained checkpoint: PSNR / SSIM / L1 over dataset views.

New capability beyond the reference (which reports only training losses).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():

    from gsplat_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # big Pallas graphs; recompiles -> disk loads
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--scale_factor", type=float, default=0.5)
    p.add_argument("--max_views", type=int, default=None)
    p.add_argument("--holdout_every", type=int, default=0,
                   help="evaluate on the held-out test views (every Nth; "
                        "must match the --holdout_every used in training)")
    p.add_argument("--max_pairs", type=int, default=2**21)
    p.add_argument("--cull_mode", default="rect",
                   choices=("rect", "ellipse"),
                   help="tile culling granularity (ellipse: exact per-row "
                        "intervals, fewer pairs, identical images)")
    p.add_argument("--transmittance_math", default="cumprod",
                   choices=("log", "cumprod"))
    p.add_argument("--tile_rank_cap", type=int, default=0,
                   help="keep only the front-most K pairs per tile "
                        "(K=1024: ~4x fewer pairs at ~0 image error on "
                        "trained scenes; small quality-neutral speedup "
                        "for training too); 0 = exact")
    p.add_argument("--background", default="black",
                   help="render background: 'black' (reference parity), "
                        "'white' (Blender-style), or 'r,g,b'")
    p.add_argument("--aa_mode", default="none",
                   choices=("none", "dilate", "mip"),
                   help="screen-space antialiasing: 'dilate' adds the 0.3 px "
                        "low-pass, 'mip' also energy-compensates opacity "
                        "(Mip-Splatting Eq. 6)")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "pallas", "xla"))
    p.add_argument("--json", action="store_true", help="print JSON only")
    p.add_argument("--render_batch", type=int, default=1,
                   help="views rendered per launch via the shared-binning "
                        "batched path")
    p.add_argument("--spmd", action="store_true",
                   help="evaluate over ALL devices (views shard over the "
                        "mesh 'data' axis, frames split into --spmd_bands)")
    p.add_argument("--spmd_bands", type=int, default=1,
                   help="tile-band ('tile' mesh axis) size under --spmd")
    args = p.parse_args()

    from render_trained import load_params, resolve_checkpoint

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.config import parse_background
    from gsplat_tpu.data import GaussianDataset
    from gsplat_tpu.evaluation import evaluate_views

    params, alive = load_params(resolve_checkpoint(args.checkpoint))
    ds = GaussianDataset(
        args.data_dir, scale_factor=args.scale_factor,
        holdout_every=args.holdout_every,
        split="test" if args.holdout_every else "all",
    )
    cfg = RenderConfig(height=ds.height, width=ds.width,
                       max_pairs=args.max_pairs, backend=args.backend,
                       cull_mode=args.cull_mode,
                       transmittance_math=args.transmittance_math,
                       tile_rank_cap=args.tile_rank_cap,
                       aa_mode=args.aa_mode,
                       background=parse_background(args.background))
    n = len(ds) if args.max_views is None else min(len(ds), args.max_views)
    views = [ds[i] for i in range(n)]
    mesh = None
    if args.spmd:
        from gsplat_tpu.parallel import make_mesh

        mesh = make_mesh(tile=args.spmd_bands)
        print(f"SPMD evaluation: mesh {dict(mesh.shape)}")
    result = evaluate_views(
        params, views, cfg, alive=alive, render_batch=args.render_batch,
        mesh=mesh,
    )
    if args.json:
        print(json.dumps(result))
    else:
        print(
            f"{result['num_views']} views: PSNR {result['psnr']:.2f} dB  "
            f"SSIM {result['ssim']:.4f}  L1 {result['l1']:.4f}"
        )


if __name__ == "__main__":
    main()
