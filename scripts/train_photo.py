#!/usr/bin/env python
"""Train on a REAL photograph via the textured-plane warp oracle.

The closest no-network stand-in for the reference's Mip-NeRF 360 use-case
(/root/reference/scripts/train.py:222-604): ground-truth views are made by
ray-plane homography warping of an actual photo (natural image statistics,
sharp edges, high-frequency texture), NOT by any gaussian renderer — a
non-circular end-to-end oracle for the whole optimization stack. Reports
held-out PSNR/SSIM like scripts/evaluate.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():

    from gsplat_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", default="matplotlib",
                   help="photo path ('matplotlib' = the bundled real photo)")
    p.add_argument("--output_dir", default="output/photo_plane")
    p.add_argument("--scene_dir", default=None,
                   help="where to write the warped scene "
                        "(default <output_dir>/scene)")
    p.add_argument("--n_views", type=int, default=16)
    p.add_argument("--planes", type=int, default=1,
                   help="number of stacked textured planes (1 = the "
                        "legacy single-plane oracle; 2-4 add real "
                        "occlusion boundaries + parallax between "
                        "depth layers)")
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--capacity", type=int, default=2**15)
    p.add_argument("--max_pairs", type=int, default=2**19)
    p.add_argument("--holdout_every", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--batched_render", action="store_true")
    p.add_argument("--sh_warmup_interval", type=int, default=0)
    p.add_argument("--adc_mode", default="paper",
                   choices=("reference", "paper"),
                   help="densification rule. 'paper' (view-space gradient "
                        "statistic) is the measured winner on the 3-plane "
                        "oracle: 32.1 dB / 0.953 SSIM at 133k splats vs "
                        "22.3 dB at 380k for 'reference' (whose world-space "
                        "rule over-densifies into floaters) — round 5, "
                        "480x640 / 24 views / 3000 it")
    # ADC tuning (the round-3 full-scale run under-densified to 611
    # splats / 23.5 dB: the reference's world-space max_grad=0.01 never
    # fires on this scene — typical position gradients are 1e-5..1e-3).
    p.add_argument("--max_grad", type=float, default=2e-5,
                   help="reference-mode world-space grad threshold. The "
                        "round-4 sweep on this oracle: 2e-5 -> 28.1 dB "
                        "(82k splats), 1e-4 -> 26.8, the reference's own "
                        "0.01 never fires (23.5 dB, 611 splats)")
    p.add_argument("--densify_grad_threshold", type=float, default=None,
                   help="paper-mode view-space grad threshold in px "
                        "(TrainConfig default 2e-4)")
    p.add_argument("--scene_extent", type=float, default=2.8,
                   help="paper-mode scene extent (camera arc radius of the "
                        "plane scene)")
    p.add_argument("--percent_dense", type=float, default=None)
    p.add_argument("--opacity_reset_interval", type=int, default=None,
                   help="default: off for short runs (a reset near the end "
                        "of a short run leaves no iterations to recover)")
    p.add_argument("--densification_interval", type=int, default=None)
    p.add_argument("--backend", default="auto",
                   choices=("auto", "pallas", "xla"))
    p.add_argument("--json", action="store_true", help="print JSON only")
    args = p.parse_args()

    from gsplat_tpu import RenderConfig, TrainConfig
    from gsplat_tpu.data import GaussianDataset
    from gsplat_tpu.data.photo_plane import (
        load_photo,
        make_photo_multiplane_scene,
        make_photo_plane_scene,
    )
    from gsplat_tpu.evaluation import evaluate_views
    from gsplat_tpu.train.fit import fit

    scene_dir = args.scene_dir or os.path.join(args.output_dir, "scene")
    photo = load_photo(args.image)
    if args.planes > 1:
        meta = make_photo_multiplane_scene(
            scene_dir, photo=photo, n_planes=args.planes,
            n_views=args.n_views, height=args.height, width=args.width,
        )
    else:
        meta = make_photo_plane_scene(
            scene_dir, photo=photo, n_views=args.n_views,
            height=args.height, width=args.width,
        )
    log = (lambda s: None) if args.json else print
    log(f"scene: {meta['n_views']} warped views of a "
        f"{photo.shape[1]}x{photo.shape[0]} photo -> {scene_dir}")

    train_ds = GaussianDataset(
        scene_dir, scale_factor=1.0,
        holdout_every=args.holdout_every, split="train",
    )
    render_cfg = RenderConfig(
        height=train_ds.height, width=train_ds.width,
        max_pairs=args.max_pairs, backend=args.backend,
    )
    adc_kw = {}
    if args.max_grad is not None:
        adc_kw["max_grad"] = args.max_grad
    if args.densify_grad_threshold is not None:
        adc_kw["densify_grad_threshold"] = args.densify_grad_threshold
    if args.percent_dense is not None:
        adc_kw["percent_dense"] = args.percent_dense
    if args.densification_interval is not None:
        adc_kw["densification_interval"] = args.densification_interval
    # Opacity resets need thousands of iterations of recovery; default them
    # off for runs shorter than two reset intervals.
    reset = (args.opacity_reset_interval
             if args.opacity_reset_interval is not None
             else (3000 if args.iterations >= 6000 else 10**9))
    train_cfg = TrainConfig(
        iterations=args.iterations,
        batch_size=args.batch_size,
        capacity=args.capacity,
        position_lr_max_steps=args.iterations,
        adc_mode=args.adc_mode,
        scene_extent=args.scene_extent,
        opacity_reset_interval=reset,
        batched_render=args.batched_render,
        sh_warmup_interval=args.sh_warmup_interval,
        checkpoint_interval=10**9,
        **adc_kw,
    )
    t0 = time.time()
    state, report = fit(
        train_ds, render_cfg, train_cfg,
        output_dir=args.output_dir, log_fn=log,
    )
    train_s = time.time() - t0

    test_ds = GaussianDataset(
        scene_dir, scale_factor=1.0,
        holdout_every=args.holdout_every, split="test",
    )
    views = [test_ds[i] for i in range(len(test_ds))]
    result = evaluate_views(
        state.pool.params, views, render_cfg, alive=state.pool.alive
    )
    out = {
        "metric": "photo_plane_holdout_psnr",
        "planes": args.planes,
        "psnr": round(result["psnr"], 3),
        "ssim": round(result["ssim"], 4),
        "holdout_views": result["num_views"],
        "train_views": len(train_ds),
        "iterations": args.iterations,
        "gaussians": int(np.asarray(state.pool.alive).sum()),
        "train_seconds": round(train_s, 1),
        "final_loss": round(report.final_loss, 5),
        "adc_mode": args.adc_mode,
        "n_views": args.n_views,
        # Eval capacity audit (evaluate_views auto-sizes from probed
        # demand; a stale post-growth cfg used to starve the eval).
        "eval_max_pair_demand": result.get("max_pair_demand"),
        "eval_max_pairs": result.get("eval_max_pairs"),
        "per_view_psnr": [round(v["psnr"], 2) for v in result["per_view"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
