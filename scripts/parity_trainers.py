#!/usr/bin/env python
"""Trainer-vs-trainer parity: reference train() vs our fit(), same scene.

The last oracle axis (VERDICT r2 Missing #2): renderer parity is certified by
tests/test_render_vs_reference.py, but the OPTIMIZATION stack (LR schedules,
ADC dynamics, loss weighting, optimizer settings) had only been validated
against reference-*rendered* targets. This script trains BOTH stacks on the
same miniature scene and compares held-out PSNR:

  1. synthesize a GT scene: random gaussians, GT images rendered by the
     PYTORCH REFERENCE renderer (so our trainer chases the reference's
     output, never its own) — train views in <out>/scene, held-out views
     kept aside;
  2. run the reference's own train() (/root/reference/scripts/train.py:222,
     its real ADC/optimizer path) on CPU;
  3. run our fit() (gsplat_tpu/train/fit.py) with matching hyperparameters;
  4. render the held-out poses with each stack's OWN renderer and report
     PSNR vs the shared GT.

Pass criterion (recorded in BASELINE.md): ours_psnr >= ref_psnr - 0.3 dB.

Usage:
  python scripts/parity_trainers.py --iterations 400 --size 128 --out /tmp/pt
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_ROOT = "/root/reference"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def look_at_np(pos, target, up=(0.0, 1.0, 0.0)):
    from gsplat_tpu.viewer import look_at

    return look_at(np.asarray(pos, np.float64), np.asarray(target, np.float64))


def make_gt_scene(rng, n_gauss):
    """Random GT gaussians in a box in front of the orbit cameras."""
    pts = np.stack(
        [
            rng.uniform(-1.2, 1.2, n_gauss),
            rng.uniform(-1.2, 1.2, n_gauss),
            rng.uniform(3.0, 5.0, n_gauss),
        ],
        axis=-1,
    ).astype(np.float32)
    return {
        "pos": pts,
        "scale_raw": (rng.normal(0, 0.25, (n_gauss, 3)) - 1.9).astype(
            np.float32
        ),
        "q_raw": (rng.normal(0, 0.5, (n_gauss, 4))
                  + np.array([0, 0, 0, 1.5])).astype(np.float32),
        "opacity_raw": rng.normal(1.2, 0.6, n_gauss).astype(np.float32),
        "f_dc": rng.uniform(0.1, 0.95, (n_gauss, 3)).astype(np.float32),
        "f_rest": (rng.normal(0, 0.03, (n_gauss, 45))).astype(np.float32),
    }


def reference_render(ref, torch, params_t, c2w_np, H, W, fx, fy, cx, cy):
    c2w = torch.from_numpy(np.asarray(c2w_np, np.float32))
    with torch.no_grad():
        sigma = ref.build_sigma_from_params(
            params_t["scale_raw"], params_t["q_raw"]
        )
        colors = ref.evaluate_sh(
            params_t["f_dc"], params_t["f_rest"], params_t["pos"], c2w
        )
        img = ref.render(
            params_t["pos"], colors, params_t["opacity_raw"], sigma, c2w,
            H, W, fx, fy, cx, cy,
        )
    return np.clip(img.numpy(), 0.0, 1.0)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iterations", type=int, default=400)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n_train", type=int, default=8)
    p.add_argument("--n_holdout", type=int, default=2)
    p.add_argument("--n_gauss", type=int, default=384, help="GT gaussians")
    p.add_argument("--n_init", type=int, default=512, help="init cloud size")
    p.add_argument("--capacity", type=int, default=4096)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", default="/tmp/parity_trainers")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    # Deterministic CPU for both stacks.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    torch.manual_seed(args.seed)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import gaussian_splatting as ref

    H = W = args.size
    fx = fy = 0.9 * args.size
    cx = cy = args.size / 2.0
    rng = np.random.default_rng(args.seed)
    gt = make_gt_scene(rng, args.n_gauss)
    gt_t = {k: torch.from_numpy(v) for k, v in gt.items()}

    # Orbit poses; every (n_train//n_holdout)-th view is held out.
    n_views = args.n_train + args.n_holdout
    poses = []
    for i in range(n_views):
        th = 0.9 * (i / max(n_views - 1, 1) - 0.5)
        pos = np.array([4.0 * np.sin(th), 0.3, 4.0 - 4.0 * np.cos(th)])
        poses.append(look_at_np(pos, [0.0, 0.0, 4.0]))
    hold_every = max(n_views // max(args.n_holdout, 1), 2)
    hold_idx = [i for i in range(n_views) if i % hold_every == 1][
        : args.n_holdout
    ]
    train_idx = [i for i in range(n_views) if i not in hold_idx]

    print(f"GT: {args.n_gauss} gaussians, {len(train_idx)} train / "
          f"{len(hold_idx)} holdout views @ {W}x{H}", flush=True)

    from gsplat_tpu.data.images import save_image

    scene_dir = os.path.join(args.out, "scene")
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    train_poses, hold = [], []
    for i in range(n_views):
        img = reference_render(ref, torch, gt_t, poses[i], H, W, fx, fy, cx, cy)
        if i in hold_idx:
            hold.append((poses[i], img))
        else:
            k = len(train_poses)
            save_image(
                os.path.join(scene_dir, "images", f"{k:03d}.png"), img
            )
            train_poses.append(poses[i])
    np.save(os.path.join(scene_dir, "poses.npy"),
            np.stack(train_poses).astype(np.float32))
    np.save(
        os.path.join(scene_dir, "cam_meta.npy"),
        {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
        allow_pickle=True,
    )

    # Shared init cloud: jittered GT points with GT base colors.
    sel = rng.choice(args.n_gauss, args.n_init, replace=True)
    init_pts = gt["pos"][sel] + rng.normal(0, 0.15, (args.n_init, 3))
    init_rgb = np.clip(
        gt["f_dc"][sel] + rng.normal(0, 0.05, (args.n_init, 3)), 0.0, 1.0
    )
    # .npy [N, 6] — both loaders accept it (the reference's PLY reader is
    # ASCII-only; ours writes binary PLY).
    np.save(
        os.path.join(scene_dir, "pointcloud.npy"),
        np.concatenate([init_pts, init_rgb], axis=-1).astype(np.float32),
    )

    shared_hp = dict(
        iterations=args.iterations,
        position_lr_init=0.00016,
        position_lr_final=0.0000016,
        position_lr_delay_mult=0.01,
        position_lr_max_steps=args.iterations,
        feature_lr=0.0025,
        opacity_lr=0.05,
        scaling_lr=0.005,
        rotation_lr=0.001,
        lambda_l1=0.8,
        lambda_ssim=0.2,
        densification_interval=100,
        opacity_reset_interval=3000,
        prune_opacity_threshold=0.01,
        max_grad=0.01,
        scale_threshold=0.01,
    )

    # ---- reference trainer ----
    spec = importlib.util.spec_from_file_location(
        "ref_train_script", os.path.join(REFERENCE_ROOT, "scripts/train.py")
    )
    ref_train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_train_mod)

    ref_out = os.path.join(args.out, "ref_out")
    t0 = time.time()
    ref_train_mod.train(
        scene_dir,
        output_dir=ref_out,
        device="cpu",
        num_gpus=0,
        scale_factor=1.0,
        densify_until_iter=args.iterations,
        checkpoint_interval=10 * args.iterations,  # final save only
        num_sh_bands=3,
        batch_size=1,
        **shared_hp,
    )
    ref_secs = time.time() - t0
    ckpt = torch.load(os.path.join(ref_out, "checkpoint_final.pt"),
                      weights_only=False)
    ref_params = {
        k: torch.as_tensor(v)
        for k, v in ckpt["params"].items()
    } if "params" in ckpt else {
        k: torch.as_tensor(ckpt[k])
        for k in ("pos", "scale_raw", "q_raw", "opacity_raw", "f_dc",
                  "f_rest")
    }
    ref_scores = [
        psnr(reference_render(ref, torch, ref_params, c2w, H, W, fx, fy,
                              cx, cy), img)
        for c2w, img in hold
    ]
    ref_psnr = float(np.mean(ref_scores))
    print(f"reference train(): {ref_psnr:.2f} dB holdout "
          f"({ref_secs:.0f}s, {int(ref_params['pos'].shape[0])} gaussians)",
          flush=True)

    # ---- our trainer ----
    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig, TrainConfig, render_from_params
    from gsplat_tpu.data import GaussianDataset
    from gsplat_tpu.train.fit import fit

    ds = GaussianDataset(scene_dir, scale_factor=1.0)
    rcfg = RenderConfig(
        height=H, width=W, max_pairs=1 << 17, backend="xla", tile_chunk=8
    )
    tcfg = TrainConfig(
        capacity=args.capacity,
        batch_size=1,
        densify_until_iter=args.iterations,
        checkpoint_interval=10 * args.iterations,
        num_sh_bands=3,
        **shared_hp,
    )
    t0 = time.time()
    state, report = fit(ds, rcfg, tcfg, seed=args.seed)
    ours_secs = time.time() - t0

    params = state.pool.params
    our_scores = []
    for c2w, img in hold:
        out, _ = render_from_params(
            params, jnp.asarray(c2w, jnp.float32), fx, fy, cx, cy, rcfg,
            alive=state.pool.alive,
        )
        our_scores.append(psnr(np.asarray(out), img))
    ours_psnr = float(np.mean(our_scores))
    print(f"our fit():         {ours_psnr:.2f} dB holdout "
          f"({ours_secs:.0f}s, {report.num_gaussians} gaussians)", flush=True)

    result = {
        "metric": "trainer_parity_holdout_psnr",
        "ref_psnr": round(ref_psnr, 3),
        "ours_psnr": round(ours_psnr, 3),
        "delta_db": round(ours_psnr - ref_psnr, 3),
        "iterations": args.iterations,
        "size": args.size,
        "ref_seconds": round(ref_secs, 1),
        "ours_seconds": round(ours_secs, 1),
        "ref_gaussians": int(ref_params["pos"].shape[0]),
        "ours_gaussians": report.num_gaussians,
        "pass": bool(ours_psnr >= ref_psnr - 0.3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
