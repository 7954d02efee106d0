#!/usr/bin/env python
"""Render novel views along a precomputed [K, 4, 4] trajectory.

CLI counterpart of /root/reference/scripts/inference.py:122-165. The
trajectory is a .npy/.npz/.pt array of camera-to-world matrices; frames are
written as PNGs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_trajectory(path: str) -> np.ndarray:
    if path.endswith(".pt"):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        traj = np.asarray(t, np.float32)
    elif path.endswith(".npz"):
        data = np.load(path)
        traj = data[list(data.keys())[0]].astype(np.float32)
    else:
        traj = np.load(path).astype(np.float32)
    if traj.ndim != 3 or traj.shape[1:] != (4, 4):
        raise ValueError(f"trajectory must be [K, 4, 4], got {traj.shape}")
    return traj


def main():

    from gsplat_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # big Pallas graphs; recompiles -> disk loads
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--trajectory", required=True,
                   help="[K, 4, 4] c2w array (.npy/.npz/.pt)")
    p.add_argument("--output_dir", default="novel_views")
    p.add_argument("--data_dir", default=None,
                   help="dataset dir for intrinsics")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--scale_factor", type=float, default=0.5,
                   help="resolution MULTIPLIER (0.5 = half size). NOTE: the "
                        "reference's inference.py used an integer divisor; "
                        "this framework uses the multiplier convention "
                        "everywhere")
    p.add_argument("--max_pairs", type=int, default=2**21)
    p.add_argument("--cull_mode", default="rect",
                   choices=("rect", "ellipse"),
                   help="tile culling granularity (ellipse: exact per-row "
                        "intervals, fewer pairs, identical images)")
    p.add_argument("--tile_rank_cap", type=int, default=0,
                   help="keep only the front-most K pairs per tile "
                        "(K=1024: ~4x fewer pairs at ~1e-7 image error on "
                        "trained scenes); 0 = exact")
    p.add_argument("--transmittance_math", default="cumprod",
                   choices=("log", "cumprod"))
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
    p.add_argument("--spmd", action="store_true",
                   help="render over ALL devices: poses shard over the mesh "
                        "'data' axis, frames split into --spmd_bands bands")
    p.add_argument("--spmd_bands", type=int, default=1,
                   help="tile-band ('tile' mesh axis) size under --spmd")
    p.add_argument("--render_batch", type=int, default=1,
                   help="poses rendered per launch via the shared-binning "
                        "batched path")
    p.add_argument("--bucket_pairs", type=int, default=0,
                   help="per-frame capacity bucketing over the known "
                        "trajectory (see render_trained.py --bucket_pairs); "
                        "0 = off")
    args = p.parse_args()

    from render_trained import load_params, resolve_checkpoint

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.config import parse_background
    from gsplat_tpu.data.images import save_image
    from gsplat_tpu.viewer import make_render_fn

    params, alive = load_params(resolve_checkpoint(args.checkpoint))
    traj = load_trajectory(args.trajectory)

    if args.data_dir:
        from gsplat_tpu.data import GaussianDataset

        ds = GaussianDataset(args.data_dir, scale_factor=args.scale_factor)
        H, W, fx, fy, cx, cy = ds.height, ds.width, ds.fx, ds.fy, ds.cx, ds.cy
    else:
        H = args.height or 720
        W = args.width or 1280
        fx = fy = 0.85 * W
        cx, cy = W / 2.0, H / 2.0
    if args.height:
        H = args.height
    if args.width:
        W = args.width

    cfg = RenderConfig(height=H, width=W, max_pairs=args.max_pairs,
                       backend=args.backend, cull_mode=args.cull_mode,
                       tile_rank_cap=args.tile_rank_cap,
                       transmittance_math=args.transmittance_math,
                       aa_mode=args.aa_mode,
                       background=parse_background(args.background))
    os.makedirs(args.output_dir, exist_ok=True)
    if args.render_batch > 1 or args.spmd:
        from gsplat_tpu.viewer import make_batch_render_fn, render_trajectory

        if args.spmd:
            import jax
            import jax.numpy as jnp

            from gsplat_tpu.parallel import (
                make_mesh,
                make_sharded_batch_render,
            )

            mesh = make_mesh(tile=args.spmd_bands)
            print(f"SPMD: mesh {dict(mesh.shape)} over "
                  f"{len(jax.devices())} devices")
            if args.render_batch == 1:
                args.render_batch = mesh.shape["data"]
            if args.render_batch % mesh.shape["data"]:
                p.error("--render_batch must be a multiple of the mesh's "
                        "data axis")
            sfn = make_sharded_batch_render(cfg, mesh)
            n_slots = params["pos"].shape[0]
            alive_m = (jnp.ones((n_slots,), bool) if alive is None
                       else jnp.asarray(alive))

            def batch_fn(c2w_b):
                return sfn(params, alive_m, jnp.asarray(c2w_b),
                           fx, fy, cx, cy)
        else:
            batch_fn = make_batch_render_fn(
                params, cfg, fx, fy, cx, cy, alive=alive,
                batch=args.render_batch,
            )
        frames, _ = render_trajectory(
            batch_fn, traj, benchmark=False, batch_size=args.render_batch
        )
        for i, frame in enumerate(frames):
            save_image(
                os.path.join(args.output_dir, f"view_{i:05d}.png"), frame
            )
    else:
        if args.bucket_pairs:
            from gsplat_tpu.viewer import make_bucketed_render_fn

            render_fn = make_bucketed_render_fn(
                params, cfg, fx, fy, cx, cy, alive=alive, trajectory=traj,
                num_buckets=args.bucket_pairs,
            )
        else:
            render_fn = make_render_fn(params, cfg, fx, fy, cx, cy,
                                       alive=alive)
        for i, c2w in enumerate(traj):
            img = np.asarray(render_fn(c2w))
            save_image(os.path.join(args.output_dir, f"view_{i:05d}.png"), img)
    print(f"rendered {len(traj)} views to {args.output_dir}")


if __name__ == "__main__":
    main()
