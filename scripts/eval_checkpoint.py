#!/usr/bin/env python
"""Re-evaluate a trained checkpoint on a prepared scene's holdout split.

Uses evaluate_views' demand-driven capacity auto-sizing, so the score is
capacity-honest regardless of what the training config was.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--holdout_every", type=int, default=8)
    ap.add_argument("--split", default="test", choices=("test", "train",
                                                        "all"))
    ap.add_argument("--max_pairs", type=int, default=2**20,
                    help="starting capacity (auto-grown from demand)")
    args = ap.parse_args()

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.data import GaussianDataset
    from gsplat_tpu.evaluation import evaluate_views
    from gsplat_tpu.train.trainer import restore_pool
    from gsplat_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    pool = restore_pool(args.checkpoint)
    ds = GaussianDataset(args.scene_dir, scale_factor=1.0,
                         holdout_every=args.holdout_every, split=args.split)
    cfg = RenderConfig(height=ds.height, width=ds.width,
                       max_pairs=args.max_pairs)
    views = [ds[i] for i in range(len(ds))]
    result = evaluate_views(pool.params, views, cfg, alive=pool.alive)
    print(json.dumps({
        "metric": "checkpoint_eval",
        "checkpoint": args.checkpoint,
        "split": args.split,
        "psnr": round(result["psnr"], 3),
        "ssim": round(result["ssim"], 4),
        "num_views": result["num_views"],
        "gaussians": int(np.asarray(pool.alive).sum()),
        "max_pair_demand": result["max_pair_demand"],
        "eval_max_pairs": result["eval_max_pairs"],
        "per_view_psnr": [round(v["psnr"], 2) for v in result["per_view"]],
    }))


if __name__ == "__main__":
    main()
